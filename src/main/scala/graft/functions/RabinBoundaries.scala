package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** The Rabin rolling-polynomial constants — ONE definition shared by
  * the kernels here and every declarative/oracle spelling
  * (`CorpusOps` q230 gram keys, q215 CDC boundaries): base prime
  * ABOVE the Unicode ceiling (0x10FFFF) so no two code points alias
  * within a step; modulus a power of two with base·modulus < 2^63,
  * so every intermediate fits a long and each mod is a mask. */
object RabinHash {
  val Base = 2097143L
  val Mod = 1L << 41
}

/** Content-defined chunk boundaries by a ROLLING Rabin window
  * polynomial, in one codegen'd pass per document: returns the
  * 1-based character positions `i` (window END positions, `i` in
  * `[window, n]`) where the polynomial of the trailing `window`
  * characters ≡ 0 (mod `mask`) — the boundary rule of
  * `CorpusOps.cdcChunkFrame` (q215 / the chunk store).
  *
  * Bit-compatible with the declarative twin
  * `filter(sequence(window, n), i -> poly(cp, i) % mask = 0)` over
  * `cp = transform(split(text, ""), ascii)` — spec-asserted — but
  * with none of its costs: no per-document split array, no
  * localCheckpoint barrier, no interpreted per-position lambda (HOFs
  * sit outside whole-stage codegen), and O(1) per character instead
  * of O(window) per position thanks to the rolling update
  * key' = (key − c_out·B^(w−1))·B + c_in (mod M). The measured
  * ladder at sf0.1: md5 rule 3.2 s → HOF polynomial 2.8 s → this
  * kernel (see PERF.md round-10).
  *
  * Character semantics mirror `split("")` + `ascii()` EXACTLY so the
  * twin equality holds on any input (spec-checked on CJK/accents/
  * astral): Spark's `split(t, "")` cuts per CODE POINT (one element
  * even for supplementary characters) and `ascii()` returns the TRUE
  * code point (233 for é, 128512 for 😀) — which is also exactly
  * DuckDB's `ord(substr(...))`, so the boundary rule is cross-engine
  * exact on arbitrary Unicode, not just ASCII. (Do not trust a
  * REPL-piped probe here: a mis-encoded heredoc turns é into two
  * mojibake chars and makes ascii() look like it returns U+FFFD —
  * that cost this kernel two wrong decode designs before the
  * escape-constructed probe settled it.) The kernel decodes UTF-8
  * in place, one unit per code point. Base and modulus come from the
  * shared [[RabinHash]] definition. */
case class RabinBoundaries(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (org.apache.spark.sql.types.StringType, IntegerType, IntegerType)
        if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"rabin_boundaries expects (string, foldable int, foldable int), " +
          s"got ($a, $b, $c)")
    }

  private lazy val window: Int = {
    val w = second.eval().asInstanceOf[Int]
    require(w >= 1, s"rabin_boundaries window must be >= 1, got $w")
    w
  }
  private lazy val mask: Long = {
    val m = third.eval().asInstanceOf[Int].toLong
    require(m > 0 && (m & (m - 1)) == 0,
      s"rabin_boundaries mask must be a power of two, got $m")
    m
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "rabin_boundaries"

  private val B = RabinHash.Base
  private val M = RabinHash.Mod // power of 2 => mod is a mask
  private lazy val bPow: Long = {         // B^(window-1) mod M
    var p = 1L
    var j = 1
    while (j < window) { p = (p * B) & (M - 1); j += 1 }
    p
  }

  /** Per-row kernel — also the codegen target. */
  def compute(u: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val nb = u.numBytes()
    // decode to split("")+ascii() units: one TRUE code point per
    // element (ascii() returns the code point, split cuts per code
    // point — verified against escape-constructed fixtures)
    val units = new Array[Int](nb) // upper bound: one cp per byte
    var n = 0
    var i = 0
    while (i < nb) {
      val b0 = u.getByte(i) & 0xff
      val step = org.apache.spark.unsafe.types.UTF8String
        .numBytesForFirstByte(u.getByte(i))
      units(n) =
        if (step == 1 || i + step > nb) b0
        else if (step == 2)
          ((b0 & 0x1f) << 6) | (u.getByte(i + 1) & 0x3f)
        else if (step == 3)
          ((b0 & 0x0f) << 12) | ((u.getByte(i + 1) & 0x3f) << 6) |
            (u.getByte(i + 2) & 0x3f)
        else
          ((b0 & 0x07) << 18) | ((u.getByte(i + 1) & 0x3f) << 12) |
            ((u.getByte(i + 2) & 0x3f) << 6) | (u.getByte(i + 3) & 0x3f)
      n += 1
      i += step
    }
    if (n < window) return new GenericArrayData(Array.empty[Int])
    val out = new java.util.ArrayList[Integer](n / 8)
    var key = 0L
    var j = 0
    while (j < window) { key = ((key * B) + units(j)) & (M - 1); j += 1 }
    if ((key & (mask - 1)) == 0L) out.add(window)
    j = window
    while (j < n) {
      key = (((key - units(j - window) * bPow) & (M - 1)) * B + units(j)) &
        (M - 1)
      if ((key & (mask - 1)) == 0L) out.add(j + 1)
      j += 1
    }
    val arr = new Array[Int](out.size())
    var k = 0
    while (k < arr.length) { arr(k) = out.get(k); k += 1 }
    new GenericArrayData(arr)
  }

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    compute(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _, _) => {
      val ref = ctx.addReferenceObj("rabinBoundaries", this,
        classOf[RabinBoundaries].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$ref.compute($a);"
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(first = f, second = s, third = t)
}

/** ALL k-gram Rabin keys of a string, one per window (n−k+1 entries,
  * empty when n < k), in one codegen'd rolling pass — the gram-key
  * producer for q230's novelty anti-join: `explode(rabin_gram_keys(n,
  * k))` emits bare BIGINTs with no payload column riding the
  * Generate, replacing the split-array + element_at chain (whose
  * per-gram lambda work and array-through-explode costs PERF.md
  * documents). Unit semantics, base, and modulus are identical to
  * [[RabinBoundaries]] — and to the declarative ascii()-polynomial
  * twin, which stays as the oracle spelling and the bit-equality
  * spec. */
case class RabinGramKeys(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.StringType, IntegerType)
        if right.foldable => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"rabin_gram_keys expects (string, foldable int), got ($l, $r)")
    }

  private lazy val k: Int = {
    val v = right.eval().asInstanceOf[Int]
    require(v >= 1, s"rabin_gram_keys k must be >= 1, got $v")
    v
  }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "rabin_gram_keys"

  private val B = RabinHash.Base
  private val M = RabinHash.Mod
  private lazy val bPow: Long = {
    var p = 1L
    var j = 1
    while (j < k) { p = (p * B) & (M - 1); j += 1 }
    p
  }

  /** Per-row kernel — also the codegen target. */
  def compute(u: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val nb = u.numBytes()
    val units = new Array[Int](nb)
    var n = 0
    var i = 0
    while (i < nb) {
      val b0 = u.getByte(i) & 0xff
      val step = org.apache.spark.unsafe.types.UTF8String
        .numBytesForFirstByte(u.getByte(i))
      units(n) =
        if (step == 1 || i + step > nb) b0
        else if (step == 2)
          ((b0 & 0x1f) << 6) | (u.getByte(i + 1) & 0x3f)
        else if (step == 3)
          ((b0 & 0x0f) << 12) | ((u.getByte(i + 1) & 0x3f) << 6) |
            (u.getByte(i + 2) & 0x3f)
        else
          ((b0 & 0x07) << 18) | ((u.getByte(i + 1) & 0x3f) << 12) |
            ((u.getByte(i + 2) & 0x3f) << 6) | (u.getByte(i + 3) & 0x3f)
      n += 1
      i += step
    }
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](n - k + 1)
    var key = 0L
    var j = 0
    while (j < k) { key = ((key * B) + units(j)) & (M - 1); j += 1 }
    out(0) = key
    j = k
    while (j < n) {
      key = (((key - units(j - k) * bPow) & (M - 1)) * B + units(j)) &
        (M - 1)
      out(j - k + 1) = key
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val ref = ctx.addReferenceObj("rabinGramKeys", this,
        classOf[RabinGramKeys].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$ref.compute($a);"
    })

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}
