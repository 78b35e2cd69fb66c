package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken, SIGMOD
  * '03) in one pass per row: ascending distinct selected hashes of the
  * string's K-char grams under a W-window rightmost-tie min rule.
  *
  * Value-compatible with the declarative chain the q197 oracle runs in
  * DuckDB (and the spec replays in memory):
  *
  *   keys  = transform(positions p = 1..N−K+1,
  *             polyhash31(gram(p)) · 2²¹ + (2²¹ − 1 − p))
  *   fps   = distinct(transform(windows ending at j = W..N,
  *             min(keys[j−W+1..j]) div 2²¹))
  *
  * where polyhash31 is the Karp-Rabin base-31 hash over the gram's
  * code points (Horner form — identical to
  * `ascii(c₀)·31⁴ + … + ascii(c₄)` for K = 5 on both engines; code
  * points, not UTF-16 units, so supplementary-plane text agrees with
  * DuckDB's ascii()). The interpreted lambda chain measured 11.5 s at
  * sf0.1 (7.3M substring allocations through non-codegen higher-order
  * functions); this kernel is one char walk + an O(N·W) min scan per
  * document. Equality vs the chain is unit-tested.
  */
case class WinnowFingerprints(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, IntegerType)
        if second.foldable && third.foldable =>
        // values, not just types: non-positive k or w would silently
        // produce garbage (w = 0 leaves the window min at Long.MaxValue)
        (second.eval(), third.eval()) match {
          case (kv: Integer, wv: Integer) if kv > 0 && wv > 0 =>
            TypeCheckResult.TypeCheckSuccess
          case (kv, wv) => TypeCheckResult.TypeCheckFailure(
            s"winnow_fingerprints expects k > 0 and w > 0, got (k=$kv, w=$wv)")
        }
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"winnow_fingerprints expects (string, foldable int, foldable int), got ($a, $b, $c)")
    }

  private lazy val k: Int = second.eval().asInstanceOf[Int]
  private lazy val w: Int = third.eval().asInstanceOf[Int]

  private val Enc = 2097152L // 2^21 — positions must stay below this

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "winnow_fingerprints"

  /** Per-row kernel — also the codegen target. */
  def compute(u: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val s = u.toString
    // code points, to match DuckDB's per-character ascii()
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n < k || n - k + 1 < w) return new GenericArrayData(Array.empty[Long])
    val np = n - k + 1
    // the key packs (hash · 2²¹ + (2²¹ − 1 − pos)); a 1-based pos at or
    // beyond 2²¹ would drive the tie-break term negative and corrupt
    // neighboring hashes. Fail loudly instead of silently fingerprinting
    // garbage — a >2M-gram document needs chunking upstream (q52).
    if (np + 1 >= Enc) throw new IllegalArgumentException(
      s"winnow_fingerprints: document has $np gram positions, exceeding " +
      s"the 2^21-1 position budget of the packed tie-break encoding; " +
      s"chunk the document upstream")
    val keys = new Array[Long](np)
    var i = 0
    while (i < np) {
      var h = 0L
      var j = 0
      while (j < k) { h = h * 31 + cps(i + j); j += 1 }
      keys(i) = h * Enc + (Enc - 1 - (i + 1)) // 1-based position
      i += 1
    }
    val sel = new Array[Long](np - w + 1)
    var m = 0
    var jEnd = w - 1 // 0-based index of window end
    while (jEnd < np) {
      var mn = Long.MaxValue
      var t = jEnd - w + 1
      while (t <= jEnd) { if (keys(t) < mn) mn = keys(t); t += 1 }
      sel(m) = mn / Enc
      m += 1
      jEnd += 1
    }
    java.util.Arrays.sort(sel, 0, m)
    var out = 0
    var r = 0
    while (r < m) {
      if (out == 0 || sel(r) != sel(out - 1)) { sel(out) = sel(r); out += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(sel, out))
  }

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    compute(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _, _) => {
      val ref = ctx.addReferenceObj("winnowFp", this,
        classOf[WinnowFingerprints].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
