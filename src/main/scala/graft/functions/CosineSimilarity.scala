package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native codegen'd cosine similarity over two `array<float>` columns.
  *
  * The declarative form (`zip_with` + `aggregate` higher-order
  * functions, [[graft.queries.VectorOps.cosine]]) is semantically
  * identical but allocates a lambda-variable frame per element and
  * boxes floats; this expression compiles to a primitive fused loop
  * (one pass computes dot product and both norms), which is what the
  * ANN re-rank hot path wants at 100 TB.
  *
  * Float discipline matches the declarative form and the DuckDB oracle
  * bit-for-bit: each float is widened to double before multiplying,
  * accumulation is a strict left fold in element order, and the final
  * value is `dot / (sqrt(na) * sqrt(nb))`.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects (array<float>, array<float>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, dot, na, nb, i) = (ctx.freshName("n"), ctx.freshName("dot"),
        ctx.freshName("na"), ctx.freshName("nb"), ctx.freshName("i"))
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double xi = (double) $a.getFloat($i);
         |  double yi = (double) $b.getFloat($i);
         |  $dot += xi * yi; $na += xi * xi; $nb += yi * yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Set-intersection cardinality of two SORTED ascending `array<bigint>`
  * columns as a zero-allocation merge loop.
  *
  * `array_intersect` builds a boxed hash set per row evaluation; on the
  * near-dup pair stage (hundreds of thousands of pairs × ~300-element
  * gram sets) that allocation dominates. Sorting once per DOCUMENT and
  * merging per PAIR moves the n·log n out of the quadratic stage.
  * Inputs must be duplicate-free and sorted (see `q45NgramJaccard`).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count expects (array<bigint>, array<bigint>), got ($l, $r)")
    }

  override def dataType: DataType = IntegerType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (n, m) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi < yj) i += 1
      else if (xi > yj) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, m, i, j, c) = (ctx.freshName("n"), ctx.freshName("m"),
        ctx.freshName("i"), ctx.freshName("j"), ctx.freshName("c"))
      s"""
         |int $n = $a.numElements(); int $m = $b.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $n && $j < $m) {
         |  long xi = $a.getLong($i); long yj = $b.getLong($j);
         |  if (xi < yj) $i++;
         |  else if (xi > yj) $j++;
         |  else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Number of DISTINCT k-character substrings (character k-grams) of a
  * string, in one pass over the row — no explode, no shuffle.
  *
  * The declarative form (explode grams → count-distinct aggregate) is
  * the right shape when the grams themselves flow onward (joins,
  * global vocabularies); when only the per-document cardinality is
  * needed (q73's repetition signal) it pays an explode of ~len rows
  * per document plus a count-distinct shuffle for what is a per-row
  * scalar. This expression computes it in place: code-point-correct
  * windows (matching `substr`/DuckDB `substring` semantics), exact
  * distinct via a per-row hash set — identical to the oracle's
  * `len(list_distinct(...))`, with no hash-collision caveat.
  *
  * `k` must be a foldable integer literal (embedded into codegen). */
case class DistinctGramCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.StringType, IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"distinct_gram_count expects (string, foldable int), got ($l, $r)")
    }

  private lazy val k: Int = right.eval().asInstanceOf[Int]

  override def dataType: DataType = IntegerType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "distinct_gram_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val cps = a.toString.codePoints().toArray
    val n = cps.length - k + 1
    if (n <= 0) 0
    else {
      val set = new java.util.HashSet[String](Math.max(16, n * 2))
      var i = 0
      while (i < n) { set.add(new String(cps, i, k)); i += 1 }
      set.size()
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val (cps, n, set, i) = (ctx.freshName("cps"), ctx.freshName("n"),
        ctx.freshName("set"), ctx.freshName("i"))
      s"""
         |int[] $cps = $a.toString().codePoints().toArray();
         |int $n = $cps.length - $k + 1;
         |if ($n <= 0) { ${ev.value} = 0; } else {
         |  java.util.HashSet $set = new java.util.HashSet(java.lang.Math.max(16, $n * 2));
         |  for (int $i = 0; $i < $n; $i++) $set.add(new String($cps, $i, $k));
         |  ${ev.value} = $set.size();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All `numHashes` MinHash signature values of a string's k-character
  * shingle multiset, in ONE zero-allocation pass per row.
  *
  * Bit-compatible with the declarative pipeline
  * `min(xxhash64(lit(j), shingle))` per j over
  * `explode(transform(sequence(...), substr(...)))`: shingle windows
  * are code-point based like `substr` (a string shorter than k yields
  * its single whole-string shingle, matching the clamped sequence),
  * and each hash chains exactly like the two-arg `xxhash64(j, sh)` —
  * seed 42 → hash(j: int) → hash(shingle bytes). Instead of exploding
  * ~len rows per document and min-aggregating 16 columns through a
  * shuffle, this walks the UTF8 bytes once, hashing each window
  * in-place via XXH64 over (base, offset, len) — no substring
  * allocation, no explode, no aggregate. Equality with the
  * explode-aggregate form is asserted in LlmOpsSpec.
  *
  * `k` and `numHashes` must be foldable integer literals. */
case class MinHashSigs(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (org.apache.spark.sql.types.StringType, IntegerType, IntegerType)
        if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"minhash_sigs expects (string, foldable int, foldable int), got ($a, $b, $c)")
    }

  private lazy val k: Int = second.eval().asInstanceOf[Int]
  private lazy val numHashes: Int = third.eval().asInstanceOf[Int]

  // seed_j = the state of two-arg xxhash64(j, sh) after hashing j
  private lazy val seeds: Array[Long] = {
    val hasher = org.apache.spark.sql.catalyst.expressions.XxHash64Function
    Array.tabulate(numHashes)(j =>
      hasher.hash(j, IntegerType, 42L))
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "minhash_sigs"

  /** The per-row kernel — also the codegen target (called via a
    * captured reference, so whole-stage codegen stays intact). */
  def compute(u: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val nb = u.numBytes()
    val base = u.getBaseObject
    val off = u.getBaseOffset
    // code-point start byte offsets (substr counts characters)
    val starts = new Array[Int](nb + 1)
    var nCps = 0
    var i = 0
    while (i < nb) {
      starts(nCps) = i
      i += org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte(
        u.getByte(i))
      nCps += 1
    }
    starts(nCps) = nb
    // a string shorter than k yields its single whole-string shingle
    // (mirror of sequence(0, greatest(len - k, 0)): always >= 1 window)
    val nWin = math.max(nCps - k + 1, 1)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var w = 0
    while (w < nWin) {
      val s = starts(math.min(w, nCps))
      val e = starts(math.min(w + k, nCps))
      var j = 0
      while (j < numHashes) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(base, off + s, e - s, seeds(j))
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      w += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    compute(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _, _) => {
      val ref = ctx.addReferenceObj("minhashSigs", this, classOf[MinHashSigs].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(first = f, second = s, third = t)
}

/** Sorted DISTINCT xxhash64 values of a string's k-character grams —
  * the per-document input of the sorted-merge Jaccard/overlap family,
  * in one pass per row.
  *
  * Bit-compatible with the declarative chain
  * `sort_array(array_distinct(transform(<k-gram windows>, xxhash64)))`
  * (code-point windows with the clamped whole-string shingle for
  * short inputs, single-arg xxhash64 = seed 42 over the gram bytes),
  * but with no per-element lambda frames or substring allocations:
  * one UTF8-byte walk hashes each window in place, then a primitive
  * sort + in-place dedup. The chain measured 4.6 s for the corpus
  * projection at sf0.1; this is the q45/q67/q74/q80 feeder, so the
  * whole near-dup tail inherits the win. Equality is unit-tested. */
case class SortedGramHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.StringType, IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_gram_hashes expects (string, foldable int), got ($l, $r)")
    }

  private lazy val k: Int = right.eval().asInstanceOf[Int]

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "sorted_gram_hashes"

  /** Per-row kernel — also the codegen target. */
  def compute(u: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val nb = u.numBytes()
    val base = u.getBaseObject
    val off = u.getBaseOffset
    val starts = new Array[Int](nb + 1)
    var nCps = 0
    var i = 0
    while (i < nb) {
      starts(nCps) = i
      i += org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte(
        u.getByte(i))
      nCps += 1
    }
    starts(nCps) = nb
    val nWin = math.max(nCps - k + 1, 1)
    val hs = new Array[Long](nWin)
    var w = 0
    while (w < nWin) {
      val s = starts(math.min(w, nCps))
      val e = starts(math.min(w + k, nCps))
      hs(w) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(base, off + s, e - s, 42L)
      w += 1
    }
    java.util.Arrays.sort(hs)
    var m = 0
    var j = 0
    while (j < nWin) {
      if (m == 0 || hs(j) != hs(m - 1)) { hs(m) = hs(j); m += 1 }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOfRange(hs, 0, m))
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val ref = ctx.addReferenceObj("sortedGramHashes", this,
        classOf[SortedGramHashes].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 64-bit SimHash of a string's whitespace tokens in one pass —
  * sig bit b = sign of Σ over tokens of (±1 from bit b of
  * xxhash64(token)).
  *
  * Bit-compatible with the declarative pipeline
  * `explode(split(s, "\\s+"))` → `xxhash64(token)` → 64 conditional
  * SUM votes → sign/OR fold: tokenization is `Pattern.split(s, -1)`
  * exactly like Spark's `split` (leading separators yield an empty
  * first token, an empty string yields one empty token), each token
  * hashes its UTF8 bytes with seed 42, and the sign test is
  * strictly-positive. Replaces a ~len-row explode + 64-column
  * aggregate shuffle per document with a per-row kernel. Equality
  * with the explode-aggregate form is unit-tested. */
case class SimHash64(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"simhash64 expects string, got $t")
    }

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "simhash64"

  /** Per-row kernel — also the codegen target. */
  def compute(u: org.apache.spark.unsafe.types.UTF8String): Long = {
    val tokens = u.toString.split("\\s+", -1)
    val votes = new Array[Int](64)
    var t = 0
    while (t < tokens.length) {
      val tok = org.apache.spark.unsafe.types.UTF8String.fromString(tokens(t))
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(tok.getBaseObject, tok.getBaseOffset, tok.numBytes, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("simhash64", this, classOf[SimHash64].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Registration: either call [[GraftFunctions.register]] on a live
  * session, or set `spark.sql.extensions=graft.functions.GraftExtensions`
  * so every session in the deployment gets the functions injected. */
object GraftFunctions {

  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("cosine_sim", classOf[CosineSimilarity].getName,
      children => CosineSimilarity(children(0), children(1))),
    ("sorted_intersect_count", classOf[SortedIntersectCount].getName,
      children => SortedIntersectCount(children(0), children(1))),
    ("distinct_gram_count", classOf[DistinctGramCount].getName,
      children => DistinctGramCount(children(0), children(1))),
    ("minhash_sigs", classOf[MinHashSigs].getName,
      children => MinHashSigs(children(0), children(1), children(2))),
    ("sorted_gram_hashes", classOf[SortedGramHashes].getName,
      children => SortedGramHashes(children(0), children(1))),
    ("simhash64", classOf[SimHash64].getName,
      children => SimHash64(children(0))),
    // md5-basis siblings (r16): cross-engine-derivable signatures so
    // the near-dup family is DuckDB-oracle-verifiable end-to-end
    ("md5_simhash64", classOf[Md5SimHash64].getName,
      children => Md5SimHash64(children(0))),
    ("md5_minhash_sigs", classOf[Md5MinHashSigs].getName,
      children => Md5MinHashSigs(children(0), children(1), children(2))),
    ("zorder2", classOf[ZOrder2].getName,
      children => ZOrder2(children(0), children(1))),
    ("pcm16_stats", classOf[PcmStats].getName,
      children => PcmStats(children(0))),
    ("jaro_winkler", classOf[JaroWinkler].getName,
      children => JaroWinkler(children(0), children(1))),
    ("bmp_stats", classOf[BmpStats].getName,
      children => BmpStats(children(0))),
    ("winnow_fingerprints", classOf[WinnowFingerprints].getName,
      children => WinnowFingerprints(children(0), children(1), children(2))),
    ("rabin_boundaries", classOf[RabinBoundaries].getName,
      children => RabinBoundaries(children(0), children(1), children(2))),
    ("rabin_gram_keys", classOf[RabinGramKeys].getName,
      children => RabinGramKeys(children(0), children(1))))

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, cls, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), new ExpressionInfo(cls, name), builder)
    }
}

class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, cls, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(cls, name), builder))
    }
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.AsofJoinPushdown)
    // pre-CBO, not injectOptimizerRule: the Pre CBO batch runs ONCE per
    // query after the operator-optimization fixed point, so the lint
    // sees the post-pushdown plan and never re-logs per iteration
    ext.injectPreCBORule(_ => graft.plans.WindowGuardRule)
    // same once-per-query batch; default-off (see BroadcastGuardRule
    // scaladoc for the warn-vs-off asymmetry with the window rule)
    ext.injectPreCBORule(_ => graft.plans.BroadcastGuardRule)
    // materialization-width + Generate-payload lint; default-off (a
    // session rule can't see cross-query cache consumers — see
    // WidthGuardRule scaladoc)
    ext.injectPreCBORule(_ => graft.plans.WidthGuardRule)
    // shuffle-key lint; default-off, low-card keys declared per
    // session via spark.graft.shuffleKeyGuard.keys (the typed
    // mapGroups/cogroup half is domain-free and runs without keys)
    ext.injectPreCBORule(_ => graft.plans.ShuffleKeyGuardRule)
    // skew (key-multiplicity) lint; default-off, entity/bounded key
    // names declared per session via spark.graft.skewGuard.entityKeys
    // / .boundedKeys (without them every untraceable raw×raw content
    // join lints)
    ext.injectPreCBORule(_ => graft.plans.SkewGuardRule)
  }
}
