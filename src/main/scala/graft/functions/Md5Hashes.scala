package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MD5-derived hashing kernels (round 16).
  *
  * Why a SECOND hash basis next to the xxhash64 kernels: xxhash64 is
  * Spark-native and fastest, but no other engine speaks it — every
  * query built on it is condemned to a rows-only correctness check.
  * MD5 is the one hash both Spark and DuckDB (and Trino, Flink,
  * PostgreSQL…) compute bit-identically over UTF-8 bytes, so a
  * signature derived from MD5 makes the whole near-dup family
  * END-TO-END oracle-verifiable: the r15 verdict's item 2
  * ("the md5-determinism precedent — q37/q38/q87/q47"). The sampling
  * queries (q58/q105/q138) established the discipline; these kernels
  * extend it from Bernoulli keep-decisions to full signatures.
  *
  * Cost calibration: MD5 over a ≤5-byte shingle or ≤12-byte token is
  * ~0.2 µs — a 5000-doc corpus (~550 shingles/doc) hashes in well
  * under a second across 32 threads, and the per-doc work is
  * embarrassingly parallel at any corpus size. The xxhash64 kernels
  * remain registered for hash-agnostic consumers (q45's gram family,
  * sorted-neighborhood, winnowing) where cross-engine hash equality
  * is NOT needed because the oracle re-derives from the strings.
  */
private[functions] object Md5Kernel {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** MD5 digest of `len` bytes of `bytes` starting at `off`. */
  def digest(bytes: Array[Byte], off: Int, len: Int): Array[Byte] = {
    val d = md.get()
    d.reset()
    d.update(bytes, off, len)
    d.digest()
  }

  /** First 8 digest bytes big-endian as a Long — the bit pattern of
    * DuckDB's `('0x' || substr(md5(s), 1, 16))::UBIGINT`. */
  def head64(d: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  /** First 4 digest bytes big-endian as an unsigned int in a Long —
    * DuckDB's `('0x' || substr(md5(s), 1, 8))::BIGINT`. */
  def head32(d: Array[Byte]): Long =
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)

  def head64OfString(s: String): Long = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    head64(digest(b, 0, b.length))
  }

  def head32OfString(s: String): Long = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    head32(digest(b, 0, b.length))
  }
}

/** 64-bit SimHash of a string's whitespace tokens where each token's
  * bit vector is the FIRST 64 BITS OF ITS MD5 — the oracle-pairable
  * sibling of [[SimHash64]] (same tokenization `Pattern.split(s, -1)`,
  * same ±1 votes, same strictly-positive sign test; only the token
  * hash changes from xxhash64 to md5-head). DuckDB twin of the token
  * hash: `('0x' || substr(md5(tok), 1, 16))::UBIGINT`. */
case class Md5SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"md5_simhash64 expects string, got $t")
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_simhash64"

  /** Per-row kernel — also the codegen target. */
  def compute(u: UTF8String): Long = {
    val tokens = u.toString.split("\\s+", -1)
    val votes = new Array[Int](64)
    var t = 0
    while (t < tokens.length) {
      val b = tokens(t).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val h = Md5Kernel.head64(Md5Kernel.digest(b, 0, b.length))
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override protected def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("md5SimHash", this, classOf[Md5SimHash64].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All `numHashes` MinHash values of a string's k-character shingle
  * multiset under MD5-seeded Carter–Wegman permutations — the
  * oracle-pairable sibling of [[MinHashSigs]].
  *
  * Per shingle window (code-point based, whole-string shingle for
  * short inputs — same windowing as [[MinHashSigs]]): base hash
  * h = first 32 bits of md5(window) (0 ≤ h < 2³²). Permutation j:
  * p_j(h) = (a_j·h + b_j) mod (2³¹−1), with
  * a_j = (first 32 md5 bits of "mh_a:j") mod (2³⁰−1) + 1 and
  * b_j = (first 32 md5 bits of "mh_b:j") mod 2³¹ — every constant
  * itself md5-derived so the oracle RE-DERIVES the permutations
  * instead of trusting baked literals. a_j < 2³⁰ and h < 2³² keep
  * a_j·h + b_j < 2⁶² — overflow-free in BOTH engines' signed-64
  * arithmetic (DuckDB errors on BIGINT overflow rather than wrapping,
  * so the bound is load-bearing, not a nicety). */
case class Md5MinHashSigs(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, IntegerType)
        if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"md5_minhash_sigs expects (string, foldable int, foldable int), got ($a, $b, $c)")
    }

  private lazy val k: Int = second.eval().asInstanceOf[Int]
  private lazy val numHashes: Int = third.eval().asInstanceOf[Int]

  val Mod: Long = 2147483647L // 2^31 - 1

  private lazy val permA: Array[Long] = Array.tabulate(numHashes)(j =>
    Md5Kernel.head32OfString(s"mh_a:$j") % 1073741823L + 1L)
  private lazy val permB: Array[Long] = Array.tabulate(numHashes)(j =>
    Md5Kernel.head32OfString(s"mh_b:$j") % 2147483648L)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_minhash_sigs"

  /** Per-row kernel — also the codegen target. */
  def compute(u: UTF8String): ArrayData = {
    val bytes = u.getBytes
    val nb = bytes.length
    // code-point start byte offsets (substr counts characters)
    val starts = new Array[Int](nb + 1)
    var nCps = 0
    var i = 0
    while (i < nb) {
      starts(nCps) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      nCps += 1
    }
    starts(nCps) = nb
    val nWin = math.max(nCps - k + 1, 1)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var w = 0
    while (w < nWin) {
      val s = starts(math.min(w, nCps))
      val e = starts(math.min(w + k, nCps))
      val h = Md5Kernel.head32(Md5Kernel.digest(bytes, s, e - s))
      var j = 0
      while (j < numHashes) {
        val p = (permA(j) * h + permB(j)) % Mod
        if (p < mins(j)) mins(j) = p
        j += 1
      }
      w += 1
    }
    new GenericArrayData(mins)
  }

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _, _) => {
      val ref = ctx.addReferenceObj("md5MinHash", this, classOf[Md5MinHashSigs].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(first = f, second = s, third = t)
}

/** All `tables` md5-parity random-hyperplane LSH signatures of one
  * embedding in a single fused pass — the oracle-pairable sibling of
  * [[RhpSignatures]] (q41, r16). Hyperplane m = t·bits + j has sign
  * s(m, i) = parity of the first md5 byte of "rhp:m:i", the SAME key
  * family as [[Md5RhpBucket]] — so tables = 1 at equal bits is
  * exactly q47's hyperplane block, preserving the RhpSignatures
  * coherence property. Arrays whose length ≠ dims get the
  * all-zero signature array (oracle mirrors with a len() guard —
  * Md5RhpBucket's contract, lifted per-table). */
case class Md5RhpSignatures(child: Expression, bits: Int, tables: Int,
    dims: Int) extends UnaryExpression {

  require(bits >= 1 && bits <= 63 && tables >= 1 && dims >= 1,
    s"md5_rhp_signatures: bits=$bits tables=$tables dims=$dims")

  @transient private lazy val signs: Array[Array[Double]] =
    Array.tabulate(tables * bits) { m =>
      Array.tabulate(dims) { i =>
        if ((Md5Kernel.head32OfString(s"rhp:$m:$i") >> 24 & 1L) == 1L) 1.0
        else -1.0
      }
    }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_rhp_signatures expects array<float>, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_rhp_signatures"

  def compute(a: ArrayData): GenericArrayData = {
    val out = new Array[Any](tables)
    if (a.numElements() != dims) {
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
        val s = signs(t * bits + j)
        var dot = 0.0
        var i = 0
        while (i < dims) {
          dot += x(i).toDouble * s(i)
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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("md5RhpSigs", this,
        classOf[Md5RhpSignatures].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Single random-hyperplane LSH bucket of a float-array embedding
  * under MD5-parity hyperplane signs — the oracle-pairable sibling of
  * [[RhpSignatures]] (tables = 1).
  *
  * Hyperplane j's element i is +1.0 when the low bit of the first
  * md5 byte of the string "rhp:j:i" is set, else −1.0 — DuckDB twin:
  * `('0x' || substr(md5('rhp:' || j || ':' || i), 1, 2))::INT & 1`.
  * Bucket bit j = (Σ_i x_i·s_ji > 0), the dot product folded over
  * ascending i in doubles (negation exact in IEEE, so the oracle's
  * `CAST(x AS DOUBLE) * (±1)` term list reproduces it bit-for-bit as
  * a left-associated sum). Arrays whose length ≠ dims get bucket 0 —
  * the oracle mirrors with a `len(embedding) = dims` CASE guard. */
case class Md5RhpBucket(child: Expression, bits: Int, dims: Int)
    extends UnaryExpression {

  require(bits >= 1 && bits <= 63 && dims >= 1,
    s"md5_rhp_bucket: bits=$bits dims=$dims")

  // signs(j)(i) = ±1.0 from the md5 parity of "rhp:j:i"
  @transient private lazy val signs: Array[Array[Double]] =
    Array.tabulate(bits) { j =>
      Array.tabulate(dims) { i =>
        if ((Md5Kernel.head32OfString(s"rhp:$j:$i") >> 24 & 1L) == 1L) 1.0
        else -1.0
      }
    }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_rhp_bucket expects array<float>, got $other")
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_rhp_bucket"

  def compute(a: ArrayData): Long = {
    if (a.numElements() != dims) return 0L
    val x = a.toFloatArray()
    var sig = 0L
    var j = 0
    while (j < bits) {
      val s = signs(j)
      var dot = 0.0
      var i = 0
      while (i < dims) {
        dot += x(i).toDouble * s(i)
        i += 1
      }
      if (dot > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("md5Rhp", this, classOf[Md5RhpBucket].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
