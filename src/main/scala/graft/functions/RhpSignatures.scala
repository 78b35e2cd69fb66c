package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** All `tables` random-hyperplane LSH signatures of one embedding in a
  * single fused pass — the per-row kernel of the multi-table ANN tier
  * (q41, round 13).
  *
  * BIT-IDENTICAL to the declarative [[graft.queries.VectorOps]]
  * `rhpSignature(v, bits, base = t·bits)` column for every table t
  * (pinned by the twin test in `LlmOpsSpec`): hyperplane m's element i
  * is ±1 from the parity of `xxhash64(m, i)` — replicated here by
  * calling Spark's own [[XXH64]] with the expression's fold semantics
  * (seed 42, each child's hash seeding the next: `hashInt(i,
  * hashInt(m, 42))`) — and each dot product is the same ascending-i
  * double fold (`acc + x_i·(±1.0)`; negation is exact in IEEE, so the
  * conditional negate equals the ±1.0 multiply bit-for-bit). The
  * declarative form yields signature 0 for a NULL-diluted fold (an
  * array SHORTER than dims → zip_with pads the array side with nulls →
  * every `when(dot > 0)` falls to 0), replicated by the zero-signature
  * short-circuit below; an array LONGER than dims keeps folding in the
  * twin (the padded-null INDEX is skipped by xxhash64, giving every
  * extra element the hash-of-null sign), replicated by the padSigns
  * tail fold; NULL INPUT handling stays at the call site
  * (`coalesce(sig, 0)` matches the declarative NULL → 0 collapse).
  *
  * Why a kernel: the declarative form is `tables × bits` interpreted
  * zip_with/aggregate lambdas per row — 64 hyperplane folds of 64
  * terms each at the q41 config, ~4096 lambda evaluations per row
  * OUTSIDE codegen (the round-10 lesson: HOF lambdas are interpreted
  * per element). The sign matrix is captured state
  * (`ctx.addReferenceObj`, the [[NearestCentroidQ]]/PcaProject
  * pattern), so the plan carries ONE node, not a 4096-literal tree
  * (the q110 analysis-cost lesson). Measured at sf0.1: the signature
  * stage drops ~8× (see PERF round-13).
  */
case class RhpSignatures(child: Expression, bits: Int, tables: Int,
    dims: Int) extends UnaryExpression {

  require(bits >= 1 && bits <= 63 && tables >= 1 && dims >= 1,
    s"rhp_signatures: bits=$bits tables=$tables dims=$dims")

  // signs(m)(i) = ±1.0 from the parity of xxhash64(m, i), hyperplane
  // m = t·bits + j — identical to the SQL xxhash64(lit(m), i) fold
  @transient private lazy val signs: Array[Array[Double]] =
    Array.tabulate(tables * bits) { m =>
      Array.tabulate(dims) { i =>
        if ((XXH64.hashInt(i, XXH64.hashInt(m, 42L)) & 1L) == 1L) 1.0
        else -1.0
      }
    }

  // padSigns(m) = the sign an element BEYOND dims gets in the
  // declarative twin: zip_with pads the (shorter) sequence side with
  // null indices, and xxhash64 SKIPS a null child — the hash is just
  // hashInt(m, 42), the same for every padded position of hyperplane m
  @transient private lazy val padSigns: Array[Double] =
    Array.tabulate(tables * bits) { m =>
      if ((XXH64.hashInt(m, 42L) & 1L) == 1L) 1.0 else -1.0
    }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rhp_signatures expects array<float>, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "rhp_signatures"

  def compute(a: ArrayData): GenericArrayData = {
    val out = new Array[Any](tables)
    val n = a.numElements()
    if (n < dims) {
      // declarative twin: zip_with pads the SHORTER array side with
      // nulls, each null term null-dilutes the whole fold, so every
      // bit's `when(dot > 0)` yields 0 — the zero short-circuit holds
      // ONLY for arrays shorter than dims (r13 ADVICE)
      var t = 0
      while (t < tables) { out(t) = 0L; t += 1 }
      return new GenericArrayData(out)
    }
    val x = a.toFloatArray()
    var t = 0
    while (t < tables) {
      var sig = 0L
      var j = 0
      while (j < bits) {
        val m = t * bits + j
        val s = signs(m)
        var dot = 0.0
        var i = 0
        while (i < dims) {
          // same fold as the declarative form: acc + x_i.toDouble·(±1)
          dot += x(i).toDouble * s(i)
          i += 1
        }
        // a LONGER array keeps folding in the declarative twin: the
        // sequence side pads with null indices, and each padded term
        // carries the hash-of-null sign padSigns(m)
        val ps = padSigns(m)
        while (i < n) {
          dot += x(i).toDouble * ps
          i += 1
        }
        if (dot > 0) sig |= (1L << j)
        j += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("rhpSignatures", this,
        classOf[RhpSignatures].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
