package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructField, StructType}

/** Nearest-centroid assignment in EXACT integer space — the per-row
  * kernel of the distributed Lloyd iteration (q135).
  *
  * Input is the microunit-quantized embedding (`array<long>`, each
  * component `floor(x·1e6)`); the centroid matrix rides along as
  * captured state (`ctx.addReferenceObj`, the [[PcaProject]] pattern),
  * so the plan carries ONE node instead of a k×d-literal expression
  * tree — the q110 lesson: literal-heavy generated trees cost seconds
  * of Catalyst analysis before a row moves.
  *
  * All arithmetic is BIGINT (`Σ (q_i − c_i)²`), so the assignment is
  * bit-reproducible across engines, partitionings, and input orders —
  * no float summation-order hazard. `cids` is sorted ascending and the
  * scan keeps the FIRST strict minimum, which equals the lexicographic
  * `(dist, cid)` minimum the DuckDB oracle spells as
  * `arg_min(cid, dist*k + cid)`.
  *
  * Magnitudes: |q_i| ≤ ~5e6 for unit-scale embeddings, so a squared
  * diff is ≤ 1e14 and the 64-term sum ≤ 6.4e15 — well inside BIGINT
  * even after the tie-break scale-by-k.
  *
  * Returns `struct(cid int, dist long)` — assignment and its squared
  * distance in one pass (the distance feeds the inertia aggregate).
  */
case class NearestCentroidQ(child: Expression,
    cids: Array[Int], cents: Array[Array[Long]])
    extends UnaryExpression {

  require(cids.length == cents.length && cids.nonEmpty,
    "centroid ids and matrix must align and be non-empty")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid_q expects array<bigint>, got $other")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("cid", IntegerType, nullable = false),
    StructField("dist", LongType, nullable = false)))

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "nearest_centroid_q"

  def compute(a: org.apache.spark.sql.catalyst.util.ArrayData)
      : GenericInternalRow = {
    val n = a.numElements()
    var bestJ = 0
    var best = Long.MaxValue
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      val m = math.min(n, c.length)
      var s = 0L
      var d = 0
      while (d < m) {
        val t = a.getLong(d) - c(d)
        s += t * t
        d += 1
      }
      // ascending-cid order + strict < keeps the smallest cid on ties
      if (s < best) { best = s; bestJ = j }
      j += 1
    }
    new GenericInternalRow(Array[Any](cids(bestJ), best))
  }

  override protected def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("nearestCentroidQ", this,
        classOf[NearestCentroidQ].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
