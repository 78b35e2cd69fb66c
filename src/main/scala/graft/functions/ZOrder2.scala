package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave of the low 16 bits of two integer
  * columns — the space-filling-curve clustering key for MULTI-column
  * data skipping.
  *
  * Sorting a table by a single column gives that column tight per-file
  * min/max ranges and leaves every other column's ranges as wide as
  * the table; sorting by the z-value gives BOTH dimensions
  * `O(sqrt(rows_per_file))`-tight ranges, so parquet row-group /
  * partition pruning works for predicates on either column (the
  * clustered-layout technique Delta/Iceberg expose as `ZORDER BY` /
  * `write.sort-order`; here it is just `repartitionByRange(z)` +
  * `sortWithinPartitions(z)` before the write — measured in
  * WarehouseOpsSpec). At 100 TB the z-sort is one range-shuffle of the
  * write path, identical in cost to the single-column sorted write the
  * engine already does (SURVEY §2.3 K3).
  *
  * Bit-spreading uses the standard shift-or-mask ladder (4 steps per
  * operand), not a per-bit loop. Inputs are masked to 16 bits; the
  * result is a non-negative 32-bit value in a LONG. Both inputs
  * widened from any integral type via the query-side cast; the
  * expression itself requires LONG children to keep the semantics
  * single-typed (the DuckDB oracle replicates the interleave with
  * 32 shift-mask-multiply terms — bit-identical).
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"zorder2 expects (bigint, bigint), got ($l, $r)")
    }

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "zorder2"

  def compute(x: Long, y: Long): Long =
    ZOrder2.part1by1(x) | (ZOrder2.part1by1(y) << 1)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = ZOrder2.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.part1by1($a) | ($cls.part1by1($b) << 1);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {
  /** Spread the low 16 bits of `v` to the even bit positions. */
  def part1by1(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }
}

/** Dense projection of an embedding onto `coeffs.length` principal
  * components, one fused per-row kernel: out[j] = Σᵢ emb[i]·c[j][i]
  * (double accumulation in index order, result cast to float).
  *
  * Bit-identical to the declarative form — `array(Σ getItem(i) *
  * lit(c))` over 64 dims × 8 components — but that form is a 512-node
  * expression tree PER projection: Catalyst ANALYSIS of the q110 plan
  * alone measured 1.8 s, and the generated code falls out of the JIT's
  * method-size sweet spot. The kernel removes both (plan is one node;
  * codegen is one reference call), the MinHashSigs/SortedGramHashes
  * pattern applied to the ANN projection path. Coefficients are
  * captured state, not expressions — built via [[graft]] Bridge's
  * `column`, not the function registry. */
case class PcaProject(child: Expression, coeffs: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pca_project expects array<float>, got $other")
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.FloatType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "pca_project"

  def compute(a: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = a.numElements()
    val out = new Array[Float](coeffs.length)
    var j = 0
    while (j < coeffs.length) {
      val row = coeffs(j)
      val m = math.min(n, row.length)
      var s = 0.0
      var i = 0
      while (i < m) { s += a.getFloat(i).toDouble * row(i); i += 1 }
      out(j) = s.toFloat
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("pcaProject", this, classOf[PcaProject].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
