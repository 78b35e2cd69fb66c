package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

import graft.Tables

/** Text-analysis and deduplication operators over `documents` — the
  * core of a large-scale training-data pipeline. Everything is pure
  * Catalyst expressions (codegen'd, no UDFs); the dedup family is
  * designed bucket-first so no step is all-pairs at 100 TB:
  *
  *   - exact dedup: hash-groupBy on normalized text — one shuffle on the
  *     (high-cardinality, well-distributed) text hash;
  *   - MinHash-LSH near-dup: shingle → k minhashes → band signatures →
  *     candidate pairs ONLY within equal band buckets (the LSH trick:
  *     O(n·bands) shuffle instead of O(n²) crossJoin);
  *   - SimHash: 64-bit signature, near-dups bucketed by 16-bit band.
  */
object TextOps {

  /** Whitespace normalization shared by dedup + fingerprint (and the
    * curation pipeline): lowercase, collapse runs of whitespace, trim. */
  private[graft] def normText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Whitespace tokens of the raw text. (private[graft]: the
    * streaming CMS maintenance tokenizes micro-batches through the
    * SAME expression so incremental cells stay additive with q214's.) */
  private[graft] def tokens(c: Column): Column = split(c, "\\s+")

  /** q30 — exact deduplication: group by normalized text, keep the
    * smallest doc_id as the canonical representative. At scale the
    * group key is effectively `xxhash64(norm)` — same shuffle, 8-byte
    * keys; kept as the string here so DuckDB can oracle it. */
  def q30ExactDedup(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(normText(col("text")).as("norm"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_cnt"))
      .select("keep_id", "dup_cnt")
      .orderBy("keep_id")

  /** q31 — corpus dedup stats: total vs distinct (exact + HLL approx)
    * in one pass. */
  def q31DedupStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(normText(col("text")).as("norm"), col("lang"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("norm")).as("n_distinct"))
      .orderBy("lang")

  /** q32 — per-document text statistics: length, token count, mean token
    * length, punctuation count. The whole row is one codegen'd project. */
  def q32TextStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        length(col("text")).as("text_len"),
        size(tokens(col("text"))).as("n_tokens"),
        size(regexp_extract_all(col("text"), lit("[^A-Za-z0-9\\s]"), lit(0))).as("n_punct"),
        (length(regexp_replace(col("text"), "\\s+", "")).cast(DoubleType) /
          size(tokens(col("text")))).as("mean_token_len"))
      .orderBy("doc_id")

  /** q33 — corpus profile per (lang, source): doc counts + exact char
    * sums; the group-level rollup a curation pipeline reports. */
  def q33LangProfile(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        (sum(col("n_chars")).cast(DoubleType) / count(lit(1))).as("avg_chars"))
      .orderBy("lang", "source")

  /** q34 — quality scoring: stopword ratio + punctuation ratio +
    * length band — the length/punct/stopword heuptics used for corpus
    * filtering, as one expression program. */
  def q34QualityScore(s: SparkSession, dir: String): DataFrame = {
    val nTok = size(tokens(col("text")))
    val stopCnt = size(regexp_extract_all(col("text"),
      lit("\\b(the|a|of|and|to|in|is)\\b"), lit(0)))
    val punctCnt = size(regexp_extract_all(col("text"),
      lit("[^A-Za-z0-9\\s]"), lit(0)))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        nTok.as("n_tokens"),
        stopCnt.as("n_stop"),
        // nullif: empty or null text yields NULL ratios instead of an
        // ANSI divide-by-zero (found by the NullRowSpec sweep; the
        // oracle corpus has no empty texts, so verified rows are
        // unchanged)
        (stopCnt.cast(DoubleType) / nullif(nTok, lit(0))).as("stop_ratio"),
        (punctCnt.cast(DoubleType) / nullif(length(col("text")), lit(0)))
          .as("punct_ratio"),
        when(col("n_chars") < 200, "short")
          .when(col("n_chars") < 400, "medium")
          .otherwise("long").as("len_band"))
      .orderBy("doc_id")
  }

  /** q35 — tokenizer-style counting: BPE-ish pre-token pattern (letter
    * runs | digit runs | single non-space symbol), the standard
    * pre-tokenization regex family. */
  def q35TokenCount(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        size(regexp_extract_all(col("text"),
          lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).as("n_bpe_tokens"),
        size(tokens(col("text"))).as("n_ws_tokens"))
      .orderBy("doc_id")

  /** q36 — document fingerprinting: md5 + sha256 of the normalized text
    * (content-addressed identity for cross-corpus exact dedup). */
  def q36Fingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        md5(normText(col("text")).cast("binary")).as("fp_md5"),
        sha2(normText(col("text")).cast("binary"), 256).as("fp_sha256"))
      .orderBy("doc_id")

  // ------------------------------------------------- near-dup family

  /** (doc_id, norm) with the normalization MATERIALIZED behind a
    * repartition barrier. Without it, CollapseProject inlines the
    * lower/regexp_replace/trim chain into every per-element lambda of a
    * downstream shingle `transform`, re-normalizing the document once
    * per shingle (measured: 23 s instead of ~1 s for the sf0.1 shingle
    * explode). The tiny doc_id shuffle is also the parallelism-control
    * point an explode-heavy stage wants at scale. */
  private def normDocs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        normText(col("text")).as("norm"))
      .repartition(col("doc_id"))

  /** 5-char shingle set of the normalized text. */
  private def shingleArr(c: Column, k: Int = 5): Column =
    array_distinct(shingleArrRaw(c, k))

  /** Shingle MULTISET (no dedup): for consumers that are dedup-
    * invariant (min-aggregation, or a later distinct on the hashed
    * longs), skipping `array_distinct` here avoids a boxed-string
    * hash-set pass per document — measured ~2× on q37's signature
    * stage at sf0.1. */
  private def shingleArrRaw(c: Column, k: Int): Column =
    transform(
      sequence(lit(0), greatest(length(c) - k, lit(0))),
      i => substr(c, i + 1, lit(k)))

  /** q37 — MinHash-LSH near-duplicate pairs. 16 minhashes in 4 bands of
    * 4; docs sharing any band bucket become candidates (the ONLY join —
    * bucket-equi, never all-pairs); candidate pairs are then verified by
    * full-signature agreement ≥ 0.5. At 100 TB: the bucket join's key
    * cardinality grows with corpus size, so buckets stay small; a salt
    * cap on pathological buckets (boilerplate) is the standard guard.
    * Oracle-paired since r16: signatures come from the md5-basis
    * kernel (see [[minhashDocs]]), so DuckDB re-derives the full
    * pipeline — banding, cap, agreement — and the driver checks
    * rows+schema+hash.
    *
    * Signature stage: a native kernel expression computes all 16
    * minhashes per document in one
    * zero-allocation byte walk — no shingle explode, no 16-column
    * min-agg shuffle (the explode-aggregate form measured ~6 s of the
    * query at sf0.1; the expression ~1 s, bit-identical — equality
    * asserted in LlmOpsSpec). History: the per-hash all-array form —
    * 16 × array_min(transform(shingles,…)) — re-evaluates the shingle
    * construction per hash because higher-order functions defeat
    * Catalyst subexpression elimination: measured 43 s at sf0.01. */
  /** The (doc_id, band, bucket) banding frame q37 joins on — exposed
    * as a seam so the 10x stress spec can measure bucket-size
    * distributions and cap-hit counts on scaled corpora. */
  private val MinhashN = 16     // signature width (shared by the seam
  private val MinhashBands = 4  // and the query — must agree)

  private[queries] def minhashBanded(docs: DataFrame): DataFrame = {
    val bands = MinhashBands
    val rows = MinhashN / bands
    // bucket identity = the band's signature slice ITSELF (array<long>
    // — groupable and join-equatable in Spark), not a hash of it:
    // r16's oracle re-derives buckets in DuckDB, and "same 4 minhash
    // values" is the one spelling both engines agree on. Shuffle-key
    // width grows from 8 to 32 bytes — irrelevant next to the pair
    // payload, and the banding join stays bucket-equi either way.
    docs.select(col("doc_id"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          slice(col("sig"), b * rows + 1, rows).as("bucket"))): _*))
        .as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
  }

  /** Signature frame feeding [[minhashBanded]] (persisted — it is
    * consumed by banding AND both sides of the re-join; persist over
    * localCheckpoint per the round-11 A/B: ~6% faster on this exact
    * shape AND the lineage survives executor loss at scale).
    *
    * r16: signatures moved from the xxhash64 kernel to the md5-based
    * [[graft.functions.Md5MinHashSigs]] (same windowing, same one-pass
    * shape; base hash and Carter–Wegman constants all md5-derived) so
    * the DuckDB oracle can re-derive every signature — q37 graduates
    * from rows-only to a full rows+schema+hash correctness pass. */
  private[queries] def minhashDocs(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    normDocs(s, dir)
      .select(col("doc_id"),
        call_function("md5_minhash_sigs", col("norm"), lit(5), lit(MinhashN))
          .as("sig"))
      .persist()
  }

  def q37MinhashPairs(s: SparkSession, dir: String): DataFrame = {
    val numHashes = MinhashN
    // signatures materialized ONCE (persist): they feed the
    // banding stage AND both sides of the signature re-join below
    val docs = minhashDocs(s, dir)
    val banded = minhashBanded(docs)
    // boilerplate guard: buckets holding more than maxBucket docs are
    // degenerate (near-identical boilerplate at corpus scale) and would
    // blow the pair space quadratically — cap them out, as a production
    // LSH dedup does
    val maxBucket = 64
    val okBuckets = banded.groupBy("band", "bucket")
      .agg(count(lit(1)).as("bsz")).filter(col("bsz") <= maxBucket)
      .select("band", "bucket")
    val pruned = banded.join(okBuckets, Seq("band", "bucket"))
    val a = pruned.select(col("band"), col("bucket"), col("doc_id").as("id_a"))
    val b = pruned.select(col("band"), col("bucket"), col("doc_id").as("id_b"))
    // SHUFFLE_HASH, not broadcast: the quadratic pair generation must
    // run partitioned by bucket across the cluster — a broadcast join
    // would funnel every pair through the probe side's (few) partitions.
    // The pair shuffle carries ONLY (band, bucket, id, id) — signatures
    // are re-attached after dedup, so the quadratic stage moves 8-byte
    // ids, not 2×16-element arrays.
    val pairIds = a.join(b.hint("SHUFFLE_HASH"), Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      // a pair can collide in several bands — dedupe BEFORE the
      // signature-agreement estimate so it is computed once per pair
      .dropDuplicates("id_a", "id_b")
      .select("id_a", "id_b")
    // signature re-join: NO forced broadcast — the per-doc signature
    // table grows with the corpus (~n·136 bytes), so a hard broadcast()
    // is a driver/executor memory ceiling at 100× scale. AQE converts
    // the shuffle join to broadcast at runtime whenever the side is
    // actually small (it is at test SFs), same discipline as q87's
    // re-attach in simhashNearPairs.
    pairIds
      .join(docs.select(col("doc_id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(docs.select(col("doc_id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)), lit(0), (acc, m) => acc + m)
          .cast(DoubleType) / numHashes).as("est_jaccard"))
      .filter(col("est_jaccard") >= 0.5)
      .orderBy("id_a", "id_b")
  }

  /** Per-document 64-bit SimHash signature: sign of the per-bit sum of
    * ±1 votes from each token's xxhash64, computed by the native
    * one-pass [[graft.functions.SimHash64]] expression — a per-row
    * projection, no token explode, no 64-column vote-aggregate shuffle
    * (bit-equality with that explode-aggregate form is unit-tested).
    * Shared by q38 (signatures) and q87 (verified pairs). */
  private def simhashSigs(s: SparkSession, dir: String): DataFrame =
    simhashOf(Tables.documents(s, dir))

  /** SimHash signatures of ANY (doc_id, text) frame — reused by the
    * streaming near-dup ingest on its micro-batches. NULL text yields
    * a NULL signature (callers that must not lose rows keep them). */
  private[graft] def simhashOf(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // r16: md5-basis signature ([[graft.functions.Md5SimHash64]] —
    // same tokenization/votes/sign as simhash64, token hash = md5
    // head) so q38/q87 AND the streaming near-dup ingest share ONE
    // cross-engine-derivable signature; both queries graduate from
    // rows-only to full oracle passes.
    docs.select(col("doc_id"),
      call_function("md5_simhash64", normText(col("text"))).as("simhash"))
  }

  /** The `nBands` band keys of a 64-bit signature (contiguous bit
    * ranges, first `64 % nBands` bands one bit wider) — by pigeonhole,
    * two signatures within Hamming distance `nBands - 1` agree on at
    * least one band. nBands = 4 gives the classic 4×16-bit split. */
  private[graft] def simhashBands(sigs: DataFrame, nBands: Int = 4): DataFrame = {
    val base = 64 / nBands
    val rem = 64 % nBands
    val bandCols = (0 until nBands).map { b =>
      val width = base + (if (b < rem) 1 else 0)
      val start = b * base + math.min(b, rem)
      val mask = if (width == 64) -1L else (1L << width) - 1
      struct(lit(b).as("band"),
        shiftright(col("simhash"), start).bitwiseAND(mask).as("bucket"))
    }
    sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
  }

  /** Verified SimHash near-dup pairs between two (doc_id, simhash)
    * frames — the shared engine of q87 and the streaming
    * [[graft.streaming.NearDupIngest]]. Bands are sized from
    * `maxHamming` (nBands = maxHamming + 1), so band agreement is
    * GUARANTEED for every pair at or under the threshold — candidate
    * recall is 1.0 among un-capped buckets at any threshold, not just
    * 3. `maxBucket` carves out degenerate buckets (boilerplate at
    * corpus scale would blow the pair space quadratically); callers
    * that must not lose exact-duplicate clusters to the cap collapse
    * identical signatures FIRST (as NearDupIngest does) — after that,
    * bucket population is bounded by signature diversity. Same id-only
    * pair discipline as q37: the quadratic stage shuffles (band,
    * bucket, id, id); signatures re-attach broadcast-side. */
  private[graft] def simhashNearPairs(a: DataFrame, b: DataFrame,
      maxHamming: Int, selfJoin: Boolean,
      maxBucket: Option[Int] = Some(64)): DataFrame = {
    val nBands = maxHamming + 1
    val ab = simhashBands(a.select("doc_id", "simhash"), nBands)
      .withColumnRenamed("doc_id", "id_a")
    val bbAll = simhashBands(b.select("doc_id", "simhash"), nBands)
      .withColumnRenamed("doc_id", "id_b")
    val bb = maxBucket match {
      case Some(cap) =>
        val ok = bbAll.groupBy("band", "bucket")
          .agg(count(lit(1)).as("bsz")).filter(col("bsz") <= cap)
          .select("band", "bucket")
        bbAll.join(ok, Seq("band", "bucket"))
      case None => bbAll
    }
    val cands = ab.join(bb.hint("SHUFFLE_HASH"), Seq("band", "bucket"))
    // signature re-attach: NO forced broadcast — side b can be an
    // unbounded store (NearDupIngest's cross-batch path), so a hard
    // broadcast() is a memory ceiling; AQE converts the shuffle join
    // to broadcast at runtime whenever the side is actually small
    (if (selfJoin) cands.filter(col("id_a") < col("id_b")) else cands)
      .dropDuplicates("id_a", "id_b")
      .join(a.select(col("doc_id").as("id_a"),
        col("simhash").as("sig_a")), Seq("id_a"))
      .join(b.select(col("doc_id").as("id_b"),
        col("simhash").as("sig_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** q38 — SimHash signatures: per-doc 64-bit signature + its 4 band
    * keys. Oracle-paired since r16 (md5-basis signature — DuckDB
    * re-derives every bit; see [[simhashOf]]). */
  def q38Simhash(s: SparkSession, dir: String): DataFrame =
    simhashSigs(s, dir)
      .select(col("doc_id") +: col("simhash") +:
        (0 until 4).map(b =>
          shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL)
            .as(s"band$b")): _*)
      .orderBy("doc_id")

  /** q87 — SimHash near-duplicate PAIRS, end-to-end: band-bucketed
    * candidates (pigeonhole-sized bands, so every pair at Hamming ≤ 3
    * shares a band), exact `bit_count(xor)` verify — via
    * [[simhashNearPairs]]. The 64-doc bucket cap carves out degenerate
    * boilerplate buckets: pairs inside capped buckets are deliberately
    * NOT emitted (a production run collapses exact-duplicate clusters
    * first, as NearDupIngest does, so only genuinely pathological
    * boilerplate hits the cap). Oracle-paired since r16 (md5-basis
    * signature); planted-dup sanity lives in LlmOpsSpec. */
  def q87SimhashPairs(s: SparkSession, dir: String): DataFrame = {
    // signatures feed the banding stage AND both re-join sides —
    // materialize once (same three-consumer shape as q37's docs)
    val sigs = simhashSigs(s, dir).persist()
    simhashNearPairs(sigs, sigs, maxHamming = 3, selfJoin = true)
      .orderBy("id_a", "id_b")
  }

  /** q58 — stratified sampling: per-language keep fractions applied as
    * a deterministic content-hash Bernoulli (the q105/q138 discipline:
    * uniform = first 8 md5 hex chars of a salted doc_id as a BIGINT,
    * rate quantized to ppm) — how a curation pipeline rebalances a
    * language-skewed corpus. Chosen over `sampleBy`'s seeded RNG
    * because the hash keep-set is a pure function of the data: the
    * same documents survive on any cluster, any partitioning, any
    * engine — which is both what a reproducible data build needs and
    * what lets DuckDB verify the exact per-stratum counts (was
    * rows-only under the RNG form). Per-doc work is one md5 + one
    * comparison — embarrassingly parallel at any scale. Strata not in
    * the fraction map drop (rate 0), matching `sampleBy`. */
  def q58StratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val ratePpm = typedLit(Map("en" -> 500000L, "es" -> 200000L,
      "de" -> 200000L, "fr" -> 200000L, "zh" -> 200000L))
    Tables.documents(s, dir)
      .select(col("lang"),
        (CorpusOps.md5Hash32(concat(lit("strat:"),
          col("doc_id").cast("string"))) % 1000000L).as("h"),
        coalesce(element_at(ratePpm, col("lang")), lit(0L)).as("rate_ppm"))
      .filter(col("h") < col("rate_ppm"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_sampled"))
      .orderBy("lang")
  }

  /** q143 — sorted-neighborhood dedup (Hernández–Stolfo): sort the
    * corpus by a fuzzy blocking key (the first 24 chars of the
    * normalized text), compare each document ONLY with its w−1 = 2
    * predecessors in sort order, verify candidates with exact 3-gram
    * Jaccard. The window-over-sorted-data member of the dedup family:
    * where q45 blocks by equality buckets and q37/q87 by signature
    * bands, this catches near-dups whose shared PREFIX sorts them
    * adjacent — linear candidate count (≤ 2 per doc) by construction.
    * Scale shape: the sort window is PARTITIONED by an 8-char prefix
    * block (no global single-partition sort); neighbor gram arrays
    * ride the window as lag() payloads, so no pair re-join. Pairs
    * across block borders are missed — the documented trade-off of
    * every sorted-neighborhood pass (production runs multi-pass with
    * rotated keys). Grams are 64-bit hashes (Jaccard is
    * hash-invariant; the DuckDB twin uses the string sets). */
  def q143SortedNeighborhood(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val docs = Tables.documents(s, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), normText(col("text")).as("norm"))
      .filter(length(col("norm")) >= 3)
      // anti-CollapseProject barrier: norm feeds 3 consumers below
      .repartition(col("doc_id"))
      .select(col("doc_id"),
        substring(col("norm"), 1, 8).as("block"),
        substring(col("norm"), 1, 24).as("skey"),
        call_function("sorted_gram_hashes", col("norm"), lit(3)).as("g"))
    val w = Window.partitionBy("block").orderBy(col("skey"), col("doc_id"))
    val nb = docs
      .withColumn("sz", size(col("g")))
      .withColumn("p1_id", lag(col("doc_id"), 1).over(w))
      .withColumn("p1_g", lag(col("g"), 1).over(w))
      .withColumn("p2_id", lag(col("doc_id"), 2).over(w))
      .withColumn("p2_g", lag(col("g"), 2).over(w))
    def pairs(idCol: Column, gCol: Column): DataFrame = {
      val inter = call_function("sorted_intersect_count", col("g"), gCol)
      nb.filter(idCol.isNotNull)
        .select(least(col("doc_id"), idCol).as("id_a"),
          greatest(col("doc_id"), idCol).as("id_b"),
          (inter.cast(DoubleType) / (size(gCol) + col("sz") - inter))
            .as("jaccard"))
    }
    pairs(col("p1_id"), col("p1_g"))
      .unionAll(pairs(col("p2_id"), col("p2_g")))
      .filter(col("jaccard") >= 0.5)
      .orderBy("id_a", "id_b")
  }

  /** q149 — BPE merge training, 3 unrolled rounds: the tokenizer-
    * training core of an LLM data pipeline. Word-level vocabulary with
    * corpus counts → symbols start as characters (joined by the 0x1f
    * unit separator) → each round counts adjacent symbol pairs
    * weighted by word frequency, picks the argmax (count desc, then
    * pair bytes asc — a total order both engines share), and merges it
    * everywhere via a left-to-right fold over the SYMBOL LIST: append
    * the next symbol without a separator exactly when the
    * accumulator's last full symbol equals s1 and the next equals s2 —
    * the standard greedy non-overlapping merge ("aaa" + (a,a) →
    * ["aa","a"]). A string `replace` on the joined form would be
    * boundary-unsafe (s1 a suffix of an earlier multi-char merge could
    * glue three symbols), and a separator-padded replace mishandles
    * runs of identical symbols — the fold is exact.
    * The merged symbol participates in the NEXT round's pairs —
    * real multi-round dynamics, not three independent counts. Scale
    * shape: pair counting runs on the DISTINCT-word vocabulary (corpus
    * token explode happens once, then everything is vocab-sized), the
    * 1-row argmax broadcasts back — per round one vocab-keyed
    * aggregate, nothing corpus-sized after the first groupBy. */
  def q149BpeMerges(s: SparkSession, dir: String): DataFrame = {
    val (rounds, _) = bpeTrained(s, dir)
    rounds.map { case (r, b) =>
      b.select(lit(r).as("round"),
        element_at(split(col("pair"), BpeSep), 1).as("s1"),
        element_at(split(col("pair"), BpeSep), 2).as("s2"),
        col("pair_cnt"))
    }.reduce(_ unionAll _).orderBy("round")
  }

  private val BpeSep = "\u001f"

  /** Shared BPE training pipeline: 3 greedy merge rounds over the
    * word-count vocabulary. Returns the per-round best pairs (q149's
    * output) AND the post-merge vocabulary with the source word
    * carried (q209 applies it). Carrying `w` changes nothing for
    * q149: word <-> symbol-string stays bijective through every
    * round, so the pair counting sees identical rows. */
  private def bpeTrained(s: SparkSession,
      dir: String): (Seq[(Int, DataFrame)], DataFrame) = {
    val sep = BpeSep
    val vocab0 = Tables.documents(s, dir)
      .select(explode(split(normText(col("text")), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      // "abc" -> "a<sep>b<sep>c": separator after every char that has
      // a successor (lookahead), so no trailing one ever exists —
      // avoids split("")'s trailing-empty-symbol edge AND the
      // two-parameter rtrim signature Spark 4 deprecates
      .select(col("w"),
        regexp_replace(col("w"), "(.)(?=.)", "$1" + sep)
          .as("syms"), col("cnt"))
      // materialize ONCE: the corpus-scale token explode feeds all
      // three rounds (b1, v1->b2, v2->b3 would each recompute it)
      .localCheckpoint()
    def bestPair(vocab: DataFrame): DataFrame = {
      val syms = split(col("syms"), sep)
      vocab
        // single-symbol words have no pairs — and MUST be filtered
        // before the transform: Spark's sequence(1, 0) DESCENDS
        .filter(size(syms) >= 2)
        .select(col("cnt"), explode(transform(
          sequence(lit(1), size(syms) - 1),
          i => concat(element_at(syms, i), lit(sep),
            element_at(syms, i + 1)))).as("pair"))
        .groupBy("pair").agg(sum(col("cnt")).as("pair_cnt"))
        .orderBy(col("pair_cnt").desc, col("pair"))
        .limit(1)
    }
    // greedy merge as a fold over the symbol list: the accumulator is
    // the joined-so-far string; append WITHOUT a separator iff its
    // last full symbol == s1 and the incoming symbol == s2 (the sep
    // check makes "last symbol" exact — symbols never contain 0x1f,
    // and the freshly merged s1+s2 can never re-match s1, so matches
    // are non-overlapping left-to-right, i.e. textbook BPE). slice()
    // over a 1-symbol word folds zero elements and returns the seed.
    def merged(vocab: DataFrame, best: DataFrame): DataFrame =
      vocab.crossJoin(broadcast(best.select(
          element_at(split(col("pair"), sep), 1).as("s1"),
          element_at(split(col("pair"), sep), 2).as("s2"))))
        .select(expr(
          """aggregate(
            |  slice(split(syms, chr(31)), 2,
            |        greatest(size(split(syms, chr(31))) - 1, 0)),
            |  element_at(split(syms, chr(31)), 1),
            |  (acc, x) -> CASE
            |    WHEN (acc = s1
            |          OR right(acc, length(s1) + 1) = concat(chr(31), s1))
            |         AND x = s2
            |    THEN concat(acc, x)
            |    ELSE concat(acc, chr(31), x) END)""".stripMargin)
          .as("syms"), col("w"), col("cnt"))
    val b1 = bestPair(vocab0).localCheckpoint()
    val v1 = merged(vocab0, b1)
    val b2 = bestPair(v1).localCheckpoint()
    val v2 = merged(v1, b2)
    val b3 = bestPair(v2).localCheckpoint()
    val v3 = merged(v2, b3)
    (Seq(1 -> b1, 2 -> b2, 3 -> b3), v3)
  }

  /** q44 — array/higher-order scalar functions over token arrays:
    * element access, min, membership, sort+slice+join, distinct count.
    * Scalar outputs only, so the oracle compare stays list-free. */
  def q44ArrayFns(s: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        element_at(toks, 1).as("first_token"),
        element_at(toks, -1).as("last_token"),
        array_min(toks).as("min_token"),
        array_contains(toks, "data").as("has_data"),
        array_join(slice(sort_array(toks), 1, 3), ",").as("top3"),
        size(array_distinct(toks)).as("n_unique"))
      .orderBy("doc_id")
  }

  /** q45 — exact n-gram Jaccard near-dup: candidate pairs ONLY within
    * the same (lang, n_chars div 64) bucket — the blocking key keeps
    * the pair space linear-ish in corpus size — then exact 3-gram-set
    * Jaccard. Complements q37: MinHash estimates on a signature; this
    * computes the true set overlap for a blocked candidate set. */
  def q45NgramJaccard(s: SparkSession, dir: String): DataFrame =
    ngramJaccardPairs(s, dir, 0.5).orderBy("id_a", "id_b")

  /** The q45 pair stage with a caller-chosen threshold — reused by the
    * connected-components dedup clustering (ExtendedOps.q67). Returns
    * (id_a, id_b, jaccard) unordered.
    *
    * Grams are hashed to 64-bit longs before the pair stage: Jaccard
    * is invariant under an (effectively) injective hash, set ops on
    * longs are ~10× cheaper than on strings, and the shuffled pair
    * rows shrink accordingly. |A∪B| = |A|+|B|−|A∩B| keeps it to ONE
    * intersect per pair. (Measured 138 s → ~4 s at sf0.1.)
    * sorted + distinct ONCE per document, so the quadratic pair stage
    * can use the zero-allocation sorted-merge intersect expression. */
  private[queries] def ngramJaccardPairs(s: SparkSession, dir: String,
      threshold: Double): DataFrame =
    ngramJaccardPairsOf(
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          normText(col("text")).as("norm")),
      threshold)

  /** Pair stage over ANY (doc_id, lang, n_chars, norm) frame — reused
    * by the end-to-end curation pipeline on its dedup survivors. */
  private[graft] def ngramJaccardPairsOf(docsNorm: DataFrame,
      threshold: Double): DataFrame = {
    graft.functions.GraftFunctions.register(docsNorm.sparkSession)
    // native single-pass gram builder — bit-identical to
    // sort_array(array_distinct(transform(<windows>, xxhash64))) but
    // without per-element lambda frames (see SortedGramHashes)
    val grams = call_function("sorted_gram_hashes", col("norm"), lit(3))
    // persist()ed for the two join sides (round 12): the round-9 note
    // here said "measured slightly slower with a checkpoint" — true of
    // localCheckpoint's eager row-serialized barrier, but the lazy
    // columnar cache measured FASTER (sf0.1 alternating min-of-5:
    // 1.79 s vs 2.07 s un-cached), consistent with the round-11
    // persist-over-localCheckpoint finding; one text scan + one gram
    // pass instead of two of each, and lineage survives executor loss.
    // The repartition is the anti-CollapseProject barrier (see
    // normDocs) so the norm chain runs once per doc, not per shingle.
    val docs = docsNorm.repartition(col("doc_id"))
      .select(col("doc_id"), col("lang"),
        floor(col("n_chars") / 64).as("szbucket"), grams.as("g"))
      .withColumn("sz", size(col("g")))
      .persist()
    val a = docs.select(col("lang"), col("szbucket"),
      col("doc_id").as("id_a"), col("g").as("g_a"), col("sz").as("sz_a"))
    val b = docs.select(col("lang"), col("szbucket"),
      col("doc_id").as("id_b"), col("g").as("g_b"), col("sz").as("sz_b"))
    val inter = call_function("sorted_intersect_count", col("g_a"), col("g_b"))
    // SHUFFLE_HASH: partition the quadratic pair stage by block key
    // instead of funneling it through a broadcast probe (see q37)
    a.join(b.hint("SHUFFLE_HASH"), Seq("lang", "szbucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (inter.cast(DoubleType) / (col("sz_a") + col("sz_b") - inter))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** q48 — language identification by n-gram/marker heuristic: each
    * candidate language is scored by hits of a small built-in profile
    * (function words + script classes), argmax wins with deterministic
    * tie-break by score order. One codegen'd projection — the cheap
    * first-pass lang-ID a curation pipeline runs before routing text
    * to per-language pipelines. (The synthetic corpus's `lang` labels
    * are uncorrelated with its generated English-ish text, so this
    * checks the OPERATOR, not model accuracy.) */
  def q48LangId(s: SparkSession, dir: String): DataFrame = {
    def hits(pat: String) =
      size(regexp_extract_all(lower(col("text")), lit(pat), lit(0)))
    val enScore = hits("\\b(the|and|of|to|is|a|in|that)\\b")
    val esScore = hits("\\b(el|la|de|que|los|las|una|por)\\b")
    val deScore = hits("\\b(der|die|das|und|ist|nicht|ein|zu)\\b")
    val cjkScore = hits("[\\x{4e00}-\\x{9fff}]")
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang").as("labeled_lang"),
        enScore.as("score_en"), esScore.as("score_es"),
        deScore.as("score_de"), cjkScore.as("score_cjk"))
      .withColumn("predicted_lang",
        when(col("score_cjk") > 0, "zh")
          .when(col("score_es") > col("score_en") &&
            col("score_es") > col("score_de"), "es")
          .when(col("score_de") > col("score_en") &&
            col("score_de") >= col("score_es"), "de")
          .when(col("score_en") > 0, "en")
          .otherwise("unknown"))
      .orderBy("doc_id")
  }

  /** q52 — document chunking for context windows: 200-char chunks with
    * 50-char overlap (stride 150) via posexplode — the chunk table a
    * training pipeline feeds the tokenizer. Chunk text is emitted as
    * md5 so the verify output stays narrow. One narrow stage: chunking
    * never shuffles; downstream repartition controls task sizing. */
  def q52Chunking(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), chunkCols(col("text")))
      .select(col("doc_id"), col("pos").as("chunk_idx"),
        length(col("col")).as("chunk_len"),
        md5(col("col").cast("binary")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")

  /** Overlapping-window chunk generator (default 200-char windows,
    * 150-char stride): emits posexplode's (pos, col) — shared by q52
    * and the curation pipeline's final stage. */
  private[graft] def chunkCols(src: Column, sizeC: Int = 200,
      step: Int = 150): Column = {
    val lastIdx = floor((length(src) - 1) / step).cast(IntegerType)
    posexplode(transform(sequence(lit(0), lastIdx),
      i => src.substr(i * step + 1, lit(sizeC))))
  }

  /** q53 — text cleaning: control-char strip + whitespace collapse +
    * trim — the normalization pass ahead of dedup/tokenization. */
  def q53TextClean(s: SparkSession, dir: String): DataFrame = {
    val cleaned = trim(regexp_replace(
      regexp_replace(col("text"), "[\\x00-\\x1F\\x7F]", " "), "\\s+", " "))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        length(col("text")).as("raw_len"),
        length(cleaned).as("clean_len"),
        md5(cleaned.cast("binary")).as("clean_md5"))
      .orderBy("doc_id")
  }

  /** q72 — sequence packing: assign documents to fixed-capacity
    * context-window bins (512 tokens) per language stream, in doc_id
    * order — the batch-construction step ahead of tokenized training.
    * Fixed-boundary streaming pack (bin = floor(preceding-cumsum /
    * capacity)); the exact greedy-reset variant needs sequential
    * state — at scale that is a `flatMapGroupsWithState` per stream,
    * this approximation is what high-throughput packers actually run.
    *
    * Scale shape: the per-language running sum is the standard
    * TWO-PHASE prefix sum, not one `sum OVER (PARTITION BY lang)`
    * window — a ~5-value partition key would hash every document into
    * ~5 single-task sorts. Documents are bucketed by deterministic
    * equal-width doc_id ranges (buckets scale with the cluster:
    * 2×defaultParallelism), phase 1 computes per-(lang, bucket) token
    * totals (map-side combined, L×B rows), a tiny window over that
    * aggregated frame turns them into exclusive per-bucket offsets
    * (broadcast back), and phase 2 runs the running sum inside each
    * (lang, bucket) — L×B-way parallel, each task sorting 1/B of one
    * language. cum = offset + local cum is exactly the global prefix
    * sum, so the DuckDB window oracle is unchanged bit-for-bit. */
  def q72SequencePacking(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir)
      .select(col("lang"), col("doc_id"),
        size(tokens(col("text"))).cast("long").as("tok"))
    val nBuckets = s.sparkContext.defaultParallelism.max(16) * 2
    // doc_id-span stats ride IN-PLAN as a 1-row broadcast (the q153
    // shape): a deterministic max aggregate, so both consumers of the
    // bucket map compute it identically — no driver round-trip, and
    // empty input needs no special case (empty crossJoin is empty)
    val st = base.agg(max(col("doc_id")).as("mx"))
    val bucketed = base.crossJoin(broadcast(st))
      .withColumn("bkt",
        expr(s"doc_id div greatest((mx + 1) div $nBuckets, 1L)"))
      .select("lang", "doc_id", "tok", "bkt")
    val offs = bucketed.groupBy("lang", "bkt")
      .agg(sum(col("tok")).as("bsum"))
      .withColumn("off", coalesce(sum(col("bsum")).over(
        Window.partitionBy("lang").orderBy("bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("lang"), col("bkt"), col("off"))
    val wLocal = Window.partitionBy("lang", "bkt").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.join(broadcast(offs), Seq("lang", "bkt"))
      .withColumn("cum", col("off") + sum(col("tok")).over(wLocal))
      .select(col("lang"), col("doc_id"), col("tok"), col("cum"),
        floor((col("cum") - col("tok")) / 512).as("pack_id"))
      .orderBy("lang", "doc_id")
  }

  /** q73 — repetition detection: duplicate 4-gram fraction of the
    * normalized text (1 − distinct/total) — the self-repetition
    * quality signal curation pipelines threshold on.
    *
    * Third-generation shape: a single codegen'd projection using the
    * [[graft.functions.DistinctGramCount]] expression. Gen 1
    * (`size(array_distinct(...))` per row) hit CollapseProject
    * re-normalization, 24 s at sf0.1; gen 2 (explode → xxhash64 →
    * count-distinct aggregate) was ~6 s but shuffles ~n_chars rows per
    * document for what is a per-row scalar; gen 3 computes the
    * distinct count in place — no explode, no aggregate shuffle,
    * measured 0.3 s at sf0.1 and bit-identical to the oracle
    * (n_grams is closed-form: length − k + 1). The explode-aggregate
    * shape remains the right one when grams flow onward (q61/q62/q74). */
  def q73Repetition(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    normDocs(s, dir)
      // docs shorter than one gram have no repetition signal (and the
      // oracle's range() is empty for them) — keep the filter
      .filter(length(col("norm")) >= 4)
      .select(col("doc_id"),
        (length(col("norm")) - 3).cast(IntegerType).as("n_grams"),
        call_function("distinct_gram_count", col("norm"), lit(4))
          .as("n_distinct"))
      .select(col("doc_id"), col("n_grams"), col("n_distinct"),
        (lit(1.0) - col("n_distinct").cast(DoubleType) / col("n_grams"))
          .as("rep_ratio"))
      .orderBy("doc_id")
  }

  /** Distinct 8-char-gram hashes of any frame with a `text` column —
    * grams hashed to longs (count is hash-invariant; the broadcast set
    * is 8-byte longs, not boxed strings). */
  private def gramHashes(df: DataFrame, k: Int = 8): DataFrame =
    df.select(col("doc_id"), normText(col("text")).as("norm"))
      // anti-CollapseProject barrier: normalize once per doc, not per
      // shingle (see normDocs)
      .repartition(col("doc_id"))
      .select(col("doc_id"), explode(shingleArr(col("norm"), k)).as("g"))
      .select(col("doc_id"), xxhash64(col("g")).as("gh"))

  /** Benchmark decontamination against an EXTERNAL benchmark frame:
    * count, per corpus document, the distinct 8-char-grams it shares
    * with the benchmark texts — the n-gram-overlap contamination check
    * run before training. Both frames need (doc_id, text).
    *
    * Shape: the benchmark collapses to ONE sorted gram-hash array row
    * (benchmarks are small by definition — ~8 bytes/distinct gram;
    * collect_set is an aggregate, nothing touches the driver),
    * broadcast to every task; each corpus document builds its own
    * sorted distinct gram array in-place (native SortedGramHashes) and
    * counts the overlap with the zero-allocation sorted-merge
    * expression. No gram explode on the corpus side, no join, no count
    * shuffle — measured 4.7 s vs the explode + broadcast-join form's
    * 5.1 s at sf0.1 (the residue is scan + normalize, shared by both
    * forms), with identical rows and two fewer stages. For a benchmark
    * too large for one row (~100M+ grams) fall back to the join shape. */
  private[graft] def decontaminateAgainst(corpus: DataFrame,
      bench: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val benchArr = gramHashes(bench)
      .agg(sort_array(collect_set(col("gh"))).as("bench_g"))
    val grams = call_function("sorted_gram_hashes", col("norm"), lit(8))
    val shared = call_function("sorted_intersect_count", col("g"), col("bench_g"))
    corpus
      .select(col("doc_id"), normText(col("text")).as("norm"))
      .repartition(col("doc_id")) // anti-CollapseProject barrier (see normDocs)
      .select(col("doc_id"), grams.as("g"))
      .crossJoin(broadcast(benchArr))
      .select(col("doc_id"), shared.cast("long").as("n_shared"))
      .filter(col("n_shared") > 0) // join form only emitted overlapping docs
      .orderBy("doc_id")
  }

  /** q74 — decontamination as registered: docs 0-4 of the corpus stand
    * in for the eval set (the testdata ships no second corpus); any
    * external benchmark table plugs into [[decontaminateAgainst]]
    * without code changes (exercised in LlmOpsSpec). */
  def q74Decontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    decontaminateAgainst(
      docs.filter(col("doc_id") >= 5),
      docs.filter(col("doc_id") < 5))
  }

  /** q76 — bounded-state heavy hitters per language via the
    * Misra-Gries [[graft.functions.HeavyHitters]] UDAF: top tokens
    * with k-entry state per group however large the group — the
    * scalable alternative to q61's exact global top-k when per-group
    * vocabularies don't fit memory. Rows-only: MG counts are
    * merge-order dependent within the n/(k+1) bound (guarantees are
    * unit-tested instead). */
  def q76HeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val hh = udaf(graft.functions.HeavyHitters(8))
    Tables.documents(s, dir)
      .select(col("lang"), explode(tokens(lower(col("text")))).as("t"))
      .filter(col("t") =!= "")
      .groupBy("lang")
      .agg(hh(col("t")).as("top"))
      .select(col("lang"),
        posexplode(arrays_zip(col("top.items"), col("top.counts"))))
      .select(col("lang"), col("pos").as("rank"),
        col("col.items").as("token"), col("col.counts").as("cnt"))
      .orderBy("lang", "rank")
  }

  // ---------------------------------------------------------------- q210

  /** q210 — EXACT per-language heavy hitters: the oracle-verified
    * companion that bounds q76's Misra-Gries sketch. Same tokenization,
    * same grouping; top-8 tokens per language by exact count with a
    * deterministic (count desc, token asc) tie-break — one token
    * explode + one (lang, token) aggregate + a lang-partitioned top-k
    * window, all DuckDB-expressible. The MG theorem then pins q76
    * mechanically: every token with frequency > n/(k+1) MUST appear in
    * the sketch's output — the spec asserts exactly that containment
    * against THIS query's exact counts, so the rows-only sketch is
    * bounded by an oracle-green frame rather than by unit fixtures
    * alone. At 100 TB the exact form is one vocabulary-sized shuffle
    * (fine); MG remains the bounded-state fallback when per-group
    * vocabularies don't.
    *
    * Scale shape: the top-8 cut is the [[graft.functions.TopKByScoreKey]]
    * bounded-heap aggregate, NOT `row_number() OVER (PARTITION BY
    * lang ...)` — a ~5-value partition key would hash the entire
    * vocabulary-sized count frame (billions of rows at 100 TB) into
    * ~5 single-task sorts. The heap combines map-side (≤8 rows per
    * lang per task) and merges associatively; (cnt DESC, token ASC
    * in UTF-8 byte order) is a total order, so the result is
    * bit-identical to the window form the DuckDB oracle runs. */
  def q210HeavyHittersExact(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(s, dir)
      .select(col("lang"), explode(tokens(lower(col("text")))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("lang", "token")
      .agg(count(lit(1)).as("cnt"))
    val topk = udaf(graft.functions.TopKByScoreKey(8),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[graft.functions.ScoredKey]())
    counts
      .groupBy("lang")
      .agg(topk(col("cnt"), col("token")).as("top"))
      .select(col("lang"), posexplode(col("top")).as(Seq("pos0", "e")))
      .select(col("lang"), (col("pos0") + 1).cast(LongType).as("rank"),
        col("e.key").as("token"), col("e.score").as("cnt"))
      .orderBy("lang", "rank")
  }

  private val HeavyHittersExactSql: String =
    """SELECT lang, rank, token, cnt FROM (
      |  SELECT lang, t AS token, count(*) AS cnt,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY count(*) DESC, t) AS rank
      |  FROM (SELECT lang,
      |          unnest(string_split_regex(lower(text), '[ \t\n\x0B\f\r]+')) AS t
      |        FROM documents)
      |  WHERE t <> '' GROUP BY lang, t)
      |WHERE rank <= 8 ORDER BY lang, rank""".stripMargin

  // ---------------------------------------------------------------- q214

  private val CmsDepth = 4
  private val CmsWidth = 256

  /** The 4 CMS row buckets of `tok` from ONE md5: the 128-bit digest
    * splits into four independent 32-bit words (hex chars 1-8, 9-16,
    * 17-24, 25-32), one per depth — the canonical one-hash-per-key CMS
    * trick, and 4× fewer digests than hashing (tok, d) per row.
    * md5-derived so the DuckDB oracle computes the identical buckets
    * (xxhash64 isn't DuckDB-expressible — md5 is the shared-hash
    * currency, as in the sampling/fingerprint family); each 8-hex-char
    * word < 2³² parses exactly and non-negatively on both engines. */
  private def cmsBuckets(tok: Column): Column = {
    val h = md5(tok)
    array((0 until CmsDepth).map(d =>
      pmod(conv(substring(h, d * 8 + 1, 8), 16, 10).cast(LongType),
        lit(CmsWidth.toLong))): _*)
  }

  /** q214 — Count-Min sketch (Cormode & Muthukrishnan, 2005) as a
    * GROUPED TABLE, not opaque binary state: every (depth, bucket)
    * cell is one row of a d×w=4×256 aggregate, built map-side-combined
    * in a single pass over the token stream. Point queries then read
    * min over the key's d cells. The output audits the sketch against
    * exact truth for the global top-20 tokens: `overest` is the CMS
    * error, provably ≥ 0 (CMS never undercounts — the oracle verifies
    * the exact cell arithmetic, the spec pins the guarantee).
    *
    * Scale shape: the corpus is scanned once; the only full-volume
    * shuffle is the 1,024-group cell aggregation (partial aggregation
    * collapses each map task to ≤1,024 rows — the shuffle moves
    * O(tasks×1024) rows regardless of corpus size, which is the whole
    * point of sketching at 100 TB). The top-20 truth side uses the
    * distributed TakeOrderedAndProject top-k, never a global-window
    * sort over the vocabulary; the 20-row rank window and the
    * 80-row×1,024-row estimate join are broadcast-sized. */
  /** One micro-batch/corpus worth of CMS cells from a `token`-column
    * frame — ADDITIVE: summing cell frames over batches equals the
    * cells of the concatenated corpus, which is what lets
    * [[graft.streaming.CmsMaintenance]] delta-log per-batch cells and
    * fold on read. */
  private[graft] def cmsCells(toks: DataFrame): DataFrame =
    toks
      .select(posexplode(cmsBuckets(col("token"))).as(Seq("d", "bucket")))
      .groupBy("d", "bucket")
      .agg(count(lit(1)).as("cell"))

  /** Point-query a cell frame: min over the key's d cells. `keys` is
    * any frame with a `token` column; other columns ride along as
    * grouping keys. LEFT join + coalesce-to-0: a cell row absent from
    * the sketch means count 0 (cell frames only materialize touched
    * cells), so an unseen token must estimate 0 — with an inner join
    * its absent cells would silently drop out of the min (overstating
    * the estimate) and a token matching no cells at all would vanish
    * from the output entirely, which would make the public
    * [[graft.streaming.CmsMaintenance]].estimate API lie on unseen
    * keys. */
  private[graft] def cmsEstimate(sketch: DataFrame, keys: DataFrame): DataFrame =
    keys
      .select(keys.columns.toIndexedSeq.map(col) :+
        posexplode(cmsBuckets(col("token"))).as(Seq("d", "bucket")): _*)
      .join(sketch, Seq("d", "bucket"), "left")
      .withColumn("cell", coalesce(col("cell"), lit(0L)))
      .groupBy(keys.columns.map(col).toSeq: _*)
      .agg(min(col("cell")).as("est_cnt"))

  def q214CountMin(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(explode(tokens(lower(col("text")))).as("token"))
      .filter(col("token") =!= "")
    val sketch = cmsCells(toks)
    val top20 = toks.groupBy("token").agg(count(lit(1)).as("true_cnt"))
      .orderBy(col("true_cnt").desc, col("token")).limit(20)
    val ranked = top20.withColumn("rank",
      row_number().over(Window.orderBy(col("true_cnt").desc, col("token")))
        .cast(LongType))
    cmsEstimate(sketch, ranked)
      .select(col("rank"), col("token"), col("true_cnt"), col("est_cnt"),
        (col("est_cnt") - col("true_cnt")).as("overest"))
      .orderBy("rank")
  }

  private val CountMinSql: String =
    s"""WITH toks AS (
       |  SELECT t AS token FROM (
       |    SELECT unnest(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+')) AS t
       |    FROM documents) WHERE t <> ''),
       |depths AS (SELECT unnest(range(0, $CmsDepth)) AS d),
       |sketch AS (
       |  SELECT d, CAST(('0x' || substr(md5(token), CAST(d * 8 + 1 AS
       |      INTEGER), 8)) AS BIGINT) % $CmsWidth AS bucket,
       |    count(*) AS cell
       |  FROM toks, depths GROUP BY 1, 2),
       |topk AS (
       |  SELECT token, cnt AS true_cnt,
       |    row_number() OVER (ORDER BY cnt DESC, token) AS rank
       |  FROM (SELECT token, count(*) AS cnt FROM toks GROUP BY 1)),
       |est AS (
       |  SELECT k.rank, k.token, k.true_cnt, min(s.cell) AS est_cnt
       |  FROM (SELECT * FROM topk WHERE rank <= 20) k
       |  CROSS JOIN depths dd
       |  JOIN sketch s ON s.d = dd.d
       |    AND s.bucket = CAST(('0x' || substr(md5(k.token),
       |      CAST(dd.d * 8 + 1 AS INTEGER), 8)) AS BIGINT) % $CmsWidth
       |  GROUP BY 1, 2, 3)
       |SELECT rank, token, true_cnt, est_cnt, est_cnt - true_cnt AS overest
       |FROM est ORDER BY rank""".stripMargin

  // ---------------------------------------------------------------- q223

  private val HllB = 6                  // 2^6 = 64 registers
  private val HllM = 1 << HllB
  private val HllWBits = 32 - HllB      // 26-bit suffix feeds rho

  /** q223 — HyperLogLog (Flajolet et al., 2007) as an EXACT GROUPED
    * TABLE, the companion to q214's Count-Min: bucket = the top 6 bits
    * of the md5-derived 32-bit hash, register = max over the bucket's
    * hashes of rho (leading-zero count of the 26-bit suffix, +1), and
    * the estimate is α·m²·2³²/Σ2^(32−M_j) with the standard
    * linear-counting fallback. Every register value, the scaled
    * harmonic sum (an exact BIGINT — each 2^(32−M_j) term is an
    * integer), and the final estimate are DuckDB-oracle-verified
    * cell-by-cell; q124 keeps `approx_count_distinct` for the
    * engine-native path, this one proves the algorithm itself. rho
    * comes from a 26-arm integer CASE ladder — no float log anywhere
    * near the registers.
    *
    * Scale shape: one pass, map-side max-combined into ≤64 groups —
    * like the CMS, shuffle volume is O(tasks×64) whatever the corpus;
    * max() needs no pre-distinct (duplicates can't raise a max). The
    * output audits the estimate against the exact distinct count
    * (±30% is the spec gate; 1.04/√64 ≈ 13% is the paper's σ). */
  def q223HllTable(s: SparkSession, dir: String): DataFrame =
    hllTableOf(Tables.documents(s, dir)
      .select(explode(tokens(lower(col("text")))).as("token"))
      .filter(col("token") =!= ""))

  /** The sketch itself over any `token`-column frame — q223 runs it on
    * the corpus; the spec also drives a 20k-distinct synthetic stream
    * through it to exercise the raw-estimate regime (the corpus's
    * 31-token vocabulary lands in linear counting). */
  /** One token frame's NON-ZERO registers: (bucket, m_j) rows.
    * max-mergeable — the streaming twin ([[graft.streaming
    * .HllMaintenance]]) delta-logs these per batch and folds with a
    * per-bucket max. */
  private[graft] def hllRegistersOf(toks: DataFrame): DataFrame = {
    val h32 = conv(substring(md5(col("token")), 1, 8), 16, 10)
      .cast(LongType)
    val bucket = (h32 / lit(1L << HllWBits)).cast(LongType)
    val w = h32 % lit(1L << HllWBits)
    // rho = leading-zero count of the 26-bit suffix + 1, as a pure
    // integer CASE ladder evaluated smallest-rho-first: arm k fires
    // when w ≥ 2^(26-k), i.e. exactly k-1 leading zeros.
    val rhoLadder = {
      var c = when(w >= lit(1L << (HllWBits - 1)), lit(1))
      for (k <- 2 to HllWBits)
        c = c.when(w >= lit(1L << (HllWBits - k)), lit(k))
      c.otherwise(lit(HllWBits + 1))   // w = 0: all 26 bits zero
    }
    toks.select(bucket.as("bucket"), rhoLadder.as("rho"))
      .groupBy("bucket").agg(max(col("rho")).as("m_j"))
  }

  /** The estimate over a FULL register table (all m buckets, zeros
    * included): raw harmonic estimate + linear-counting fallback. */
  private[graft] def hllEstimateOf(registers: DataFrame): DataFrame =
    registers.agg(
      sum(expr("CAST(shiftleft(CAST(1 AS BIGINT), 32 - m_j) AS BIGINT)"))
        .as("s_scaled"),
      sum((col("m_j") === 0).cast("long")).as("v_zero"))
      .select(lit(HllM).as("m"), col("v_zero"), col("s_scaled"),
        (lit(0.709) * lit(HllM.toDouble * HllM) * lit(4294967296.0) /
          col("s_scaled").cast("double")).as("est_raw"))
      .withColumn("est",
        when(col("v_zero") > 0 &&
            col("est_raw") <= lit(2.5 * HllM),
          floor(lit(HllM.toDouble) *
            log(lit(HllM.toDouble) / col("v_zero").cast("double")) *
            lit(1e6)) / lit(1e6))
          .otherwise(col("est_raw")))

  private[graft] def hllTableOf(toks: DataFrame): DataFrame = {
    val s = toks.sparkSession
    val spine = s.range(0, HllM).select(col("id").as("bucket"))
    val registers = spine.join(hllRegistersOf(toks), Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("m_j"), lit(0)).as("m_j"))
    val nTrue = toks.agg(countDistinct(col("token")).as("n_true"))
    hllEstimateOf(registers).crossJoin(nTrue)
      .withColumn("err_ppm",
        when(col("n_true") > 0,
          floor((col("est") - col("n_true").cast("double")) /
            col("n_true").cast("double") * lit(1e6)).cast(LongType))
          .otherwise(lit(null).cast(LongType)))
      .select(col("m"), col("v_zero"), col("s_scaled"), col("n_true"),
        col("est_raw"), col("est"), col("err_ppm"))
  }

  private val HllTableSql: String = {
    val rhoArms = (1 to HllWBits).map(k =>
      s"WHEN w >= ${1L << (HllWBits - k)} THEN $k").mkString("\n      |      ")
    s"""WITH toks AS (
       |  SELECT t AS token FROM (
       |    SELECT unnest(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+')) AS t
       |    FROM documents) WHERE t <> ''),
       |hashed AS (
       |  SELECT CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT)
       |    AS h32 FROM toks),
       |rhod AS (
       |  SELECT h32 // ${1L << HllWBits} AS bucket,
       |    CASE ${rhoArms}
       |      ELSE ${HllWBits + 1} END AS rho
       |  FROM (SELECT h32, h32 % ${1L << HllWBits} AS w FROM hashed)),
       |regs AS (
       |  SELECT s.bucket, coalesce(max(r.rho), 0) AS m_j
       |  FROM (SELECT unnest(range(0, $HllM)) AS bucket) s
       |  LEFT JOIN rhod r ON r.bucket = s.bucket
       |  GROUP BY s.bucket),
       |folded AS (
       |  SELECT CAST(sum(CAST(1::BIGINT << (32 - m_j) AS BIGINT))
       |      AS BIGINT) AS s_scaled,
       |    CAST(sum(CASE WHEN m_j = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS v_zero
       |  FROM regs),
       |est0 AS (
       |  SELECT CAST($HllM AS INTEGER) AS m, v_zero, s_scaled,
       |    (SELECT count(DISTINCT token) FROM toks) AS n_true,
       |    7.09e-1 * ${HllM.toDouble * HllM}e0 * 4294967296e0 /
       |      CAST(s_scaled AS DOUBLE) AS est_raw
       |  FROM folded)
       |SELECT m, v_zero, s_scaled, n_true, est_raw,
       |  CASE WHEN v_zero > 0 AND est_raw <= ${2.5 * HllM}e0
       |    THEN floor(${HllM}e0 * ln(${HllM}e0 / CAST(v_zero AS DOUBLE))
       |      * 1e6) / 1e6
       |    ELSE est_raw END AS est,
       |  CAST(floor((CASE WHEN v_zero > 0 AND est_raw <= ${2.5 * HllM}e0
       |    THEN floor(${HllM}e0 * ln(${HllM}e0 / CAST(v_zero AS DOUBLE))
       |      * 1e6) / 1e6
       |    ELSE est_raw END - CAST(n_true AS DOUBLE))
       |    / CAST(n_true AS DOUBLE) * 1e6) AS BIGINT) AS err_ppm
       |FROM est0""".stripMargin
  }

  // ---------------------------------------------------------------- q227

  /** q227 — per-group top-k through the bounded-heap
    * [[graft.functions.TopKByScore]] aggregate (top-5 documents by
    * length per language) instead of the usual window + filter. Same
    * answer, different physics: `row_number() OVER (PARTITION BY lang
    * ORDER BY ...)` sorts every group's FULL row set through the
    * exchange; the aggregate ships at most k rows per group per map
    * task (partial aggregation) and merges associatively — the shape
    * that survives a 100 TB group. Exact, not sketched: the global
    * top-k is contained in the union of per-partition top-ks, so the
    * DuckDB window oracle matches bit-for-bit (ties broken score
    * DESC, id ASC on both sides). */
  def q227TopKPerGroup(s: SparkSession, dir: String): DataFrame = {
    val topk = udaf(graft.functions.TopKByScore(5),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[graft.functions.ScoredId]())
    Tables.documents(s, dir)
      .groupBy("lang")
      .agg(topk(col("n_chars").cast(LongType), col("doc_id")).as("top"))
      .select(col("lang"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("lang"), (col("pos") + 1).cast(LongType).as("rank"),
        col("e.id").as("doc_id"), col("e.score").as("n_chars"))
      .orderBy("lang", "rank")
  }

  private val TopKPerGroupSql: String =
    """SELECT lang, rank, doc_id, n_chars FROM (
      |  SELECT lang, doc_id, n_chars,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY n_chars DESC, doc_id) AS rank
      |  FROM documents)
      |WHERE rank <= 5 ORDER BY lang, rank""".stripMargin

  // ---------------------------------------------------------------- q197

  private val WinnowK = 5  // k-gram length (chars)
  private val WinnowW = 4  // window of consecutive k-gram hashes
  private val WinnowMinShared = 3
  // stop-fingerprint cap: a fingerprint selected by more than this many
  // docs is corpus boilerplate — joining on it costs df²/2 pairs while
  // carrying no discriminative signal (measured: the hottest fingerprint
  // at sf0.1 appears in 3889/5000 docs; uncapped pair multiplicity 296M,
  // capped 146k). The same move real shingle-dedup pipelines make.
  private val WinnowMaxDf = 100L

  /** q197 — winnowing document fingerprints (Schleimer/Wilkerson/
    * Aiken, SIGMOD'03 — the MOSS algorithm): hash every K-char gram,
    * slide a W-hash window, select each window's minimum (rightmost on
    * ties), and report document pairs sharing ≥ 3 distinct selected
    * fingerprints. Winnowing GUARANTEES any shared substring of length
    * ≥ K+W−1 yields a shared fingerprint while keeping density at
    * 2/(W+1) — the local-similarity detector (plagiarism, license-text
    * reuse, template boilerplate) that whole-set Jaccard (q45/q198)
    * and global signatures (q37/q38) can't provide.
    *
    * The rightmost-tie argmin rides ONE integer key:
    * h·2²¹ + (2²¹−1−pos) — min(key) picks the smallest hash and, among
    * ties, the largest pos; both engines compute the identical BIGINT
    * (bound: positions < 2²¹ ≈ 2M chars/doc — re-encode wider for
    * book-length docs). Shape: explode is per-doc-linear, the window
    * is doc-partitioned (parallel at any corpus size), fingerprints
    * per doc ≈ 2L/(W+1), and the pair stage joins on the fingerprint
    * hash AFTER dropping fingerprints with document frequency >
    * [[WinnowMaxDf]] (see its note — boilerplate hashes would cost
    * df²/2 join rows for zero signal), so the inverted-list shuffle is
    * bounded per bucket. The match guarantee is therefore: any shared
    * substring of length ≥ K+W−1 containing at least one NON-boilerplate
    * window yields a shared fingerprint. All counts exact integers. */
  def q197Winnowing(s: SparkSession, dir: String): DataFrame = {
    // The per-document selection runs entirely inside the native
    // single-pass kernel [[graft.functions.WinnowFingerprints]] (see
    // its doc for the exact value contract the DuckDB oracle mirrors):
    // no window shuffle exists at all — the first exchange in the
    // whole plan is the document-frequency aggregate over selected
    // fingerprints. (History: a doc-partitioned window over exploded
    // gram rows measured 8.7 s at sf0.1; the declarative array-
    // expression form still spent 11.5 s in interpreted higher-order
    // lambdas; the kernel is one char walk per doc.)
    graft.functions.GraftFunctions.register(s)
    val selected = Tables.documents(s, dir)
      .select(col("doc_id"), normText(col("text")).as("n"))
      .filter(length(col("n")) >= WinnowK)
      .select(col("doc_id"), explode(call_function("winnow_fingerprints",
        col("n"), lit(WinnowK), lit(WinnowW))).as("fh"))
      .persist() // df aggregate + both pair-join sides
    val rare = selected.join(
      selected.groupBy("fh").agg(count(lit(1)).as("df"))
        .filter(col("df") <= WinnowMaxDf).select("fh"),
      "fh")
    rare.as("a").join(rare.as("b"),
        col("a.fh") === col("b.fh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= WinnowMinShared)
      .orderBy(col("n_shared").desc, col("id_a"), col("id_b"))
  }

  private val WinnowingSql: String = {
    s"""WITH d AS (SELECT doc_id,
       |    trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')) AS n
       |  FROM documents
       |  WHERE length(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')))
       |    >= $WinnowK),
       |k AS (SELECT doc_id,
       |    list_transform(range(1, length(n) - ${WinnowK - 2}), i ->
       |      CAST(ascii(substr(n, i, 1)) * 923521
       |        + ascii(substr(n, i + 1, 1)) * 29791
       |        + ascii(substr(n, i + 2, 1)) * 961
       |        + ascii(substr(n, i + 3, 1)) * 31
       |        + ascii(substr(n, i + 4, 1)) AS BIGINT) * 2097152
       |      + (2097151 - i)) AS keys
       |  FROM d),
       |sel AS (SELECT doc_id,
       |    unnest(list_distinct(list_transform(
       |      range($WinnowW, len(keys) + 1), j ->
       |        list_min(keys[j - ${WinnowW - 1} : j]) // 2097152))) AS fh
       |  FROM k),
       |rare AS (SELECT doc_id, fh FROM sel
       |         WHERE fh IN (SELECT fh FROM sel GROUP BY fh
       |                      HAVING count(*) <= $WinnowMaxDf))
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(count(*) AS BIGINT) AS n_shared
       |FROM rare a JOIN rare b ON a.fh = b.fh AND a.doc_id < b.doc_id
       |GROUP BY 1, 2 HAVING count(*) >= $WinnowMinShared
       |ORDER BY n_shared DESC, id_a, id_b""".stripMargin
  }

  // ---------------------------------------------------------------- q198

  /** q198 — PPJoin-style prefix-filtered set-similarity join (Xiao/
    * Wang/Lin/Yu, WWW'08): EXACT within-language 5-gram-set Jaccard
    * ≥ 0.8 with no blocking recall loss. Each doc's gram set is
    * ordered by ascending GLOBAL frequency (rarest first, gram
    * tiebreak); only the first |x| − ⌈t·|x|⌉ + 1 grams — the prefix —
    * are exploded into the inverted index, because two sets meeting
    * the threshold MUST share a prefix gram (pigeonhole). Complements
    * the dedup family: q45/q143 block lossily (bucket/neighborhood
    * misses are accepted), q37 estimates; this is the exact join at
    * sub-quadratic candidate cost.
    *
    * Scale shape: the frequency table is vocabulary-sized; prefixes
    * put each doc in ≤ (1−t)·|x|+1 inverted lists, SHORT by
    * construction on any Zipf-vocabulary corpus (prefix grams are the
    * rare ones — the whole point of frequency ordering); language
    * equality rides the JOIN KEY (cross-language text can't near-dup —
    * the q45 discipline — and it spreads hot grams across partitions),
    * and the length filter 4·max ≤ 5·min plus PPJoin's positional
    * filter (1 + min(remaining suffixes) ≥ ⌈t·(la+lb)/(1+t)⌉) prune
    * candidates that cannot pass — output-lossless, the spec proves it
    * against filter-free brute force. On THIS synthetic corpus the
    * 5-gram universe is still small (~2k — a 31-word vocab), so
    * candidates degrade toward within-language all-pairs — the
    * data-dependent worst case, stated honestly; verification is
    * therefore the native zero-allocation sorted-hash merge
    * (`sorted_intersect_count`, the q45 kernel) rather than per-pair
    * hash sets. Exactness: ⌈t·|x|⌉ is the integer (4·len+4) div 5 —
    * no float touches the prefix length — the Jaccard gate compares
    * inter·5 ≥ 4·union in integers, and hashing grams before the
    * merge leaves set sizes unchanged (xxhash64 injective on a ~2k
    * universe in practice; the q45/q37 discipline, spec-checked
    * against brute force over strings). */
  /** q198's gram-hash doc frame (stage 0) — persisted; it is
    * consumed by the freq explode + the 2 verify joins. */
  private def prefixJoinDocs(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    // Hash-space from the first step: the native single-pass gram
    // kernel (q45's `sorted_gram_hashes`) replaces the interpreted
    // string-array build (array_distinct ∘ transform ∘ substring per
    // 950-gram doc), which measured 40 s of the query's 48 s at sf0.1.
    // The output is candidate-set-INDEPENDENT (any lossless filter
    // chain yields the same verified pairs), so ordering prefixes by
    // (freq, hash) instead of (freq, gram) changes nothing the oracle
    // can observe.
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), normText(col("text")).as("n"))
      .filter(length(col("n")) >= 5)
      .select(col("doc_id"), col("lang"),
        call_function("sorted_gram_hashes", col("n"), lit(5)).as("sh"))
      .withColumn("len", size(col("sh")).cast("long"))
      .persist()
  }

  /** q198's candidate groups BEFORE the count filter: one row per
    * colliding (id_a, id_b) with its prefix-hit count `ov` — the raw
    * inverted-index candidate multiplicity is sum(ov). */
  private def prefixJoinCandGroups(docs: DataFrame): DataFrame = {
    val ex = docs.select(col("doc_id"), col("lang"), col("len"),
      explode(col("sh")).as("h"))
    val freq = ex.groupBy("h").agg(count(lit(1)).as("cnt"))
    val prefixes = ex.join(freq, "h")
      .groupBy("doc_id")
      .agg(first(col("lang")).as("lang"), first(col("len")).as("len"),
        transform(sort_array(collect_list(struct(col("cnt"), col("h")))),
          x => x.getField("h")).as("oh"))
      // integer div — `/` on longs is DOUBLE division in Spark
      .select(col("doc_id"), col("lang"), col("len"),
        posexplode(expr(
          "slice(oh, 1, CAST(len - (4*len + 4) div 5 + 1 AS INT))")))
      .select(col("doc_id"), col("lang"), col("len"),
        (col("pos") + 1).as("i"), col("col").as("g"))
    prefixes.as("a").join(prefixes.as("b"), expr(
        """a.g = b.g AND a.lang = b.lang AND a.doc_id < b.doc_id
          |AND 4 * greatest(a.len, b.len) <= 5 * least(a.len, b.len)
          |AND 1 + least(a.len - a.i, b.len - b.i)
          |      >= (4 * (a.len + b.len) + 8) div 9""".stripMargin))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("ov"),
        first(col("a.len")).as("la0"), first(col("b.len")).as("lb0"))
  }

  /** PPJoin count filter (sound, Xiao et al. §3.2): prefixes of
    * lengths l − α + c must share ≥ c elements when |A∩B| ≥ α; with
    * our prefix length l − ⌈t·l⌉ + 1 that gives
    * ov ≥ α − max(⌈t·la⌉, ⌈t·lb⌉) + 1. Counting prefix hits per pair
    * REPLACES the candidate distinct (same shuffle), and the count
    * bound collapses the verify set before any gram array moves:
    * measured at sf0.1, 396,161 candidate pairs → 1,030 survivors →
    * 79 result pairs (== filter-free brute force, spec-proven). The
    * arrays-per-pair shuffle this avoids was 6 GB — the difference
    * between 48 s and interactive. */
  private def prefixJoinCountFilter(candGroups: DataFrame): DataFrame =
    candGroups.filter(expr(
        """ov >= (4 * (la0 + lb0) + 8) div 9
          |  - greatest((4*la0 + 4) div 5, (4*lb0 + 4) div 5) + 1""".stripMargin))
      .select(col("id_a"), col("id_b"))

  private def prefixJoinVerify(docs: DataFrame,
      cands: DataFrame): DataFrame = {
    val inter = call_function("sorted_intersect_count",
      col("sha"), col("shb")).cast("long")
    cands
      .join(docs.select(col("doc_id").as("id_a"), col("sh").as("sha"),
        col("len").as("la")), "id_a")
      .join(docs.select(col("doc_id").as("id_b"), col("sh").as("shb"),
        col("len").as("lb")), "id_b")
      .select(col("id_a"), col("id_b"), inter.as("inter_sz"),
        (col("la") + col("lb") - inter).as("union_sz"))
      .filter(col("inter_sz") * 5 >= col("union_sz") * 4)
      .select(col("id_a"), col("id_b"), col("inter_sz"), col("union_sz"),
        expr("inter_sz * 1000000 div union_sz").as("jac_ppm"))
      .orderBy("id_a", "id_b")
  }

  def q198PrefixJoin(s: SparkSession, dir: String): DataFrame = {
    val docs = prefixJoinDocs(s, dir)
    prefixJoinVerify(docs,
      prefixJoinCountFilter(prefixJoinCandGroups(docs)))
  }

  /** Candidate-collapse funnel for the 10x stress spec: (raw
    * inverted-index candidate multiplicity Σov, count-filter
    * survivors, verified result pairs). The collapse ratio
    * survivors/multiplicity is what keeps the verify stage's
    * array-shuffle bounded as the corpus scales. */
  private[queries] def prefixJoinFunnel(s: SparkSession,
      dir: String): (Long, Long, Long, Long) = {
    val docs = prefixJoinDocs(s, dir)
    val groups = prefixJoinCandGroups(docs).persist()
    val multiplicity = groups.agg(coalesce(sum(col("ov")), lit(0L)))
      .head().getLong(0)
    val survivors = prefixJoinCountFilter(groups).persist()
    val nSurvivors = survivors.count()
    val nResult = prefixJoinVerify(docs, survivors).count()
    (multiplicity, nSurvivors, nResult, docs.count())
  }

  /** Filter-free semantic twin: same-language pairs, exact 5-gram
    * Jaccard ≥ 0.8 — the Spark side's prefix/length/positional filters
    * must lose nothing against this. */
  private val PrefixJoinSql: String =
    """WITH d AS (SELECT doc_id, lang,
      |    trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g')) AS n
      |  FROM documents),
      |s AS (SELECT doc_id, lang, list_distinct(list_transform(
      |    range(1, length(n) - 3),
      |    i -> substring(n, i, 5))) AS gs FROM d
      |  WHERE length(n) >= 5),
      |o AS (SELECT doc_id, lang, gs, CAST(len(gs) AS BIGINT) AS len FROM s),
      |v AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |        CAST(len(list_intersect(a.gs, b.gs)) AS BIGINT) AS inter_sz,
      |        CAST(a.len + b.len - len(list_intersect(a.gs, b.gs))
      |          AS BIGINT) AS union_sz
      |      FROM o a JOIN o b
      |        ON a.lang = b.lang AND a.doc_id < b.doc_id)
      |SELECT id_a, id_b, inter_sz, union_sz,
      |  inter_sz * 1000000 // union_sz AS jac_ppm
      |FROM v WHERE inter_sz * 5 >= 4 * union_sz
      |ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------- q200

  /** Fixed query workload for the phrase-search operator — literal on
    * both engines. */
  private val PhraseQueries = Seq(
    "slow hash batch", "window fast query", "data merge group")

  /** q200 — positional inverted index + exact phrase query: build
    * (token, doc, position) postings from the corpus — THE structure
    * under every search engine — and answer 3-word phrase queries by
    * joining consecutive positions (w₁@p ∧ w₂@p+1 ∧ w₃@p+2). The
    * retrieval twin of q131's BM25 ranking: BM25 scores bags of
    * words, this answers the exact-adjacency queries bags can't.
    *
    * Scale shape: postings build is one explode (map-side); each
    * phrase probe joins the three term posting lists on (doc, pos±k) —
    * shuffles bounded by the SHORTEST term's postings, the classic
    * term-at-a-time intersection; the phrase table is literal-tiny and
    * broadcast. At 100 TB the postings frame is what you'd bucket by
    * term and persist — the probe plan is unchanged. Counts are exact
    * integers. */
  def q200PhraseSearch(s: SparkSession, dir: String): DataFrame = {
    // dictionary filter: only terms any query mentions enter the
    // postings frame — the "consult the term dictionary first" step of
    // every inverted-index probe (70% of this corpus's tokens never
    // match and are dropped before the checkpoint)
    val queryVocab = PhraseQueries.flatMap(_.split(" ")).distinct
    val postings = Tables.documents(s, dir)
      .select(col("doc_id"), normText(col("text")).as("n"))
      .select(col("doc_id"), posexplode(split(col("n"), " ")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("p"),
        col("col").as("tok"))
      .filter(col("tok").isin(queryVocab: _*))
      .persist() // three probe joins re-read the postings
    val phrases = s.range(1).select(explode(array(PhraseQueries.map { ph =>
      val Array(w1, w2, w3) = ph.split(" ")
      struct(lit(ph).as("phrase"), lit(w1).as("w1"), lit(w2).as("w2"),
        lit(w3).as("w3"))
    }: _*)).as("q")).select(col("q.*"))
    broadcast(phrases)
      .join(postings.as("t1"), col("t1.tok") === col("w1"))
      .join(postings.as("t2"), col("t2.doc_id") === col("t1.doc_id") &&
        col("t2.p") === col("t1.p") + 1 && col("t2.tok") === col("w2"))
      .join(postings.as("t3"), col("t3.doc_id") === col("t1.doc_id") &&
        col("t3.p") === col("t1.p") + 2 && col("t3.tok") === col("w3"))
      .groupBy(col("phrase"), col("t1.doc_id").as("doc_id"))
      .agg(count(lit(1)).as("n_matches"), min(col("t1.p")).as("first_pos"))
      .orderBy("phrase", "doc_id")
  }

  private val PhraseSearchSql: String = {
    val values = PhraseQueries.map { ph =>
      val Array(w1, w2, w3) = ph.split(" ")
      s"('$ph', '$w1', '$w2', '$w3')"
    }.mkString(", ")
    s"""WITH d AS (SELECT doc_id,
       |    string_split(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')),
       |      ' ') AS ts
       |  FROM documents),
       |po AS (SELECT doc_id, CAST(i AS BIGINT) AS p, ts[i] AS tok
       |       FROM d, LATERAL unnest(range(1, len(ts) + 1)) AS u(i)),
       |q(phrase, w1, w2, w3) AS (VALUES $values)
       |SELECT q.phrase, t1.doc_id AS doc_id,
       |  CAST(count(*) AS BIGINT) AS n_matches,
       |  CAST(min(t1.p) AS BIGINT) AS first_pos
       |FROM q
       |JOIN po t1 ON t1.tok = q.w1
       |JOIN po t2 ON t2.doc_id = t1.doc_id AND t2.p = t1.p + 1
       |  AND t2.tok = q.w2
       |JOIN po t3 ON t3.doc_id = t1.doc_id AND t3.p = t1.p + 2
       |  AND t3.tok = q.w3
       |GROUP BY 1, 2 ORDER BY phrase, doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q202

  private val HeapsBucket = 50L

  /** q202 — Heaps'-law vocabulary-growth fit over the 5-gram
    * vocabulary: V(N) ≈ k·N^β, estimated by OLS of ln V on ln N along
    * the corpus prefix curve. The sub-linearity exponent β is the
    * curation signal for corpus diversity (β → 0: the corpus is
    * recycling its vocabulary — more data adds no new content;
    * complements q104's Zipf exponent, the static view of the same
    * distribution). Token-level V saturates at this corpus's 31-word
    * vocabulary instantly, so the GRAM vocabulary (~2k, still growing
    * at sf0.1) is the fitted one.
    *
    * Scale shape: first-occurrence per gram is one keyed min
    * aggregate; the prefix curve is evaluated at BUCKET grain
    * (50 docs/bucket), so the ordered cumsum window runs over
    * n_docs/50 rows, and the documented 100 TB form swaps that window
    * for the standard two-phase distributed prefix sum without
    * touching the fit. Exactness: N and V are exact integer cumsums;
    * both are floor-quantized AFTER ln (the q107 discipline) and the
    * OLS sufficient statistics are exact BIGINTs; β/ln k/r² are the
    * identical final double expressions in both engines. */
  def q202HeapsFit(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), normText(col("text")).as("n"))
      .filter(length(col("n")) >= 5)
      // doc_id is consumed HERE (the bucket id) and deliberately not
      // cached: both consumers read only (bkt, gh, n_grams), and a
      // persist stores every column it is handed (width census,
      // plans/WidthGuard)
      .select(expr(s"doc_id div $HeapsBucket").as("bkt"),
        call_function("sorted_gram_hashes", col("n"), lit(5)).as("gh"),
        (length(col("n")) - 4).cast("long").as("n_grams"))
      .persist() // totals aggregate + first-occurrence explode
    val perBktTotals = docs.groupBy("bkt")
      .agg(sum(col("n_grams")).as("bkt_n"))
    val firstSeen = docs.select(col("bkt"), explode(col("gh")).as("h"))
      .groupBy("h").agg(min(col("bkt")).as("fb"))
      .groupBy(col("fb").as("bkt")).agg(count(lit(1)).as("bkt_v"))
    val ord = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, 0)
    val lnq = (c: Column) =>
      floor(log(c.cast(DoubleType)) * 1e6).cast(LongType)
    val curve = perBktTotals.join(firstSeen, Seq("bkt"), "left")
      .na.fill(0L, Seq("bkt_v"))
      .withColumn("cn", sum(col("bkt_n")).over(ord))
      .withColumn("cv", sum(col("bkt_v")).over(ord))
      .select(lnq(col("cn")).as("x"), lnq(col("cv")).as("y"))
    // the COMBINATION step casts every sufficient statistic to DOUBLE
    // BEFORE multiplying (the SqlOps q29-family `d()` pattern): the
    // BIGINT n·sxy overflowed at sf1 — 1000 ln-quantized curve points
    // push n·sxy to ~1.2e20 — in BOTH engines (Spark threw under
    // ANSI, DuckDB "Out of Range"; found by the r14 sf1 replay). The
    // sums themselves stay exact BIGINTs (headroom to ~sf100; the
    // documented 100 TB form bounds the curve to log-spaced points,
    // which also caps the sums), and both engines run the IDENTICAL
    // double tree, so the oracle compare stays bit-exact.
    val d = (c: Column) => c.cast(DoubleType)
    curve.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"))
      .select(col("n"),
        ((d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy")))
          / (d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))))
          .as("beta"),
        ((d(col("sy")) / d(col("n"))
          - (d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy")))
            / (d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx")))
            * d(col("sx")) / d(col("n"))) / lit(1e6)).as("ln_k"),
        (((d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy")))
          * (d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))))
          / ((d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx")))
            * (d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy")))))
          .as("r2"))
  }

  private val HeapsFitSql: String =
    s"""WITH d0 AS (SELECT doc_id,
       |    trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')) AS n
       |  FROM documents),
       |d AS (SELECT doc_id, doc_id // $HeapsBucket AS bkt, n,
       |        list_distinct(list_transform(range(1, length(n) - 3),
       |          i -> substring(n, i, 5))) AS gs,
       |        CAST(length(n) - 4 AS BIGINT) AS n_grams
       |      FROM d0 WHERE length(n) >= 5),
       |tot AS (SELECT bkt, CAST(sum(n_grams) AS BIGINT) AS bkt_n
       |        FROM d GROUP BY 1),
       |fs AS (SELECT fb AS bkt, CAST(count(*) AS BIGINT) AS bkt_v FROM (
       |         SELECT g, min(bkt) AS fb FROM (
       |           SELECT bkt, unnest(gs) AS g FROM d) GROUP BY g)
       |       GROUP BY 1),
       |curve AS (SELECT
       |    CAST(floor(ln(CAST(sum(bkt_n) OVER w AS DOUBLE)) * 1e6)
       |      AS BIGINT) AS x,
       |    CAST(floor(ln(CAST(sum(coalesce(bkt_v, 0)) OVER w AS DOUBLE))
       |      * 1e6) AS BIGINT) AS y
       |  FROM tot LEFT JOIN fs USING (bkt)
       |  WINDOW w AS (ORDER BY bkt
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |    CAST(sum(x * y) AS BIGINT) AS sxy,
       |    CAST(sum(x * x) AS BIGINT) AS sxx,
       |    CAST(sum(y * y) AS BIGINT) AS syy
       |  FROM curve)
       |SELECT n,
       |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
       |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS beta,
       |  (CAST(sy AS DOUBLE) / n
       |    - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
       |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       |      * CAST(sx AS DOUBLE) / n) / 1e6 AS ln_k,
       |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
       |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       |    * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
       |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       |    / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       |      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
       |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r2
       |FROM st""".stripMargin

  // ---------------------------------------------------------------- q209

  /** q209 — tokenizer fertility audit: apply q149's LEARNED 3-round
    * BPE merge table to the corpus and report tokens-per-word
    * (fertility) per language — the multilingual-equity metric behind
    * every tokenizer review (a language with 2× fertility pays 2× the
    * sequence length, context budget and compute for the same text).
    * Closes the train→apply loop: q149 only trains the merges; this is
    * the first consumer that tokenizes WITH them.
    *
    * Scale shape — the defining trick: merges are applied to the
    * VOCABULARY (distinct words — vocabulary-sized, tiny), and the
    * corpus only contributes (lang, word) COUNT aggregates that join
    * against the tokenized vocab; the fold over symbols never sees a
    * corpus-sized row. That is exactly how production fertility audits
    * run on trillion-token corpora. Every output is an exact integer;
    * fertility is an exact ppm division. */
  def q209BpeFertility(s: SparkSession, dir: String): DataFrame = {
    val (_, v3) = bpeTrained(s, dir)
    val nTok = v3.select(col("w"),
      size(split(col("syms"), BpeSep)).cast("long").as("n_tok"))
    Tables.documents(s, dir)
      .select(col("lang"),
        explode(split(normText(col("text")), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("lang", "w").agg(count(lit(1)).as("cnt"))
      .join(nTok, "w")
      .groupBy("lang")
      .agg(sum(col("cnt")).as("n_words"),
        sum(col("cnt") * col("n_tok")).as("n_tokens"),
        count(lit(1)).as("n_distinct_words"))
      .select(col("lang"), col("n_words"), col("n_tokens"),
        col("n_distinct_words"),
        expr("n_tokens * 1000000 div n_words").as("fertility_ppm"))
      .orderBy("lang")
  }

  private def BpeFertilitySql: String = s"""
    |WITH v0 AS (
    |  SELECT w, rtrim(regexp_replace(w, '(.)', '\\1' || chr(31), 'g'),
    |      chr(31)) AS syms,
    |    count(*) AS cnt
    |  FROM (
    |    SELECT unnest(string_split(
    |      trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), ' ')) AS w
    |    FROM documents)
    |  WHERE w <> '' GROUP BY 1, 2),
    |${bpeRoundSql("v0", "b1", "v1", carry = "w, ")},
    |${bpeRoundSql("v1", "b2", "v2", carry = "w, ")},
    |${bpeRoundSql("v2", "b3", "v3", carry = "w, ")},
    |nt AS (SELECT w, CAST(len(string_split(syms, chr(31))) AS BIGINT)
    |         AS n_tok FROM v3),
    |wl AS (SELECT lang, w, CAST(count(*) AS BIGINT) AS cnt FROM (
    |         SELECT lang, unnest(string_split(trim(regexp_replace(
    |           lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), ' ')) AS w
    |         FROM documents)
    |       WHERE w <> '' GROUP BY 1, 2)
    |SELECT lang, CAST(sum(cnt) AS BIGINT) AS n_words,
    |  CAST(sum(cnt * n_tok) AS BIGINT) AS n_tokens,
    |  CAST(count(*) AS BIGINT) AS n_distinct_words,
    |  CAST(sum(cnt * n_tok) AS BIGINT) * 1000000
    |    // CAST(sum(cnt) AS BIGINT) AS fertility_ppm
    |FROM wl JOIN nt USING (w)
    |GROUP BY 1 ORDER BY lang""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q197_winnowing" -> (q197Winnowing _),
    "q198_prefix_join" -> (q198PrefixJoin _),
    "q200_phrase_search" -> (q200PhraseSearch _),
    "q202_heaps_fit" -> (q202HeapsFit _),
    "q209_bpe_fertility" -> (q209BpeFertility _),
    "q76_heavy_hitters" -> (q76HeavyHitters _),
    "q210_heavy_hitters_exact" -> (q210HeavyHittersExact _),
    "q214_countmin" -> (q214CountMin _),
    "q223_hll_table" -> (q223HllTable _),
    "q227_topk_per_group" -> (q227TopKPerGroup _),
    "q72_sequence_packing" -> (q72SequencePacking _),
    "q73_repetition" -> (q73Repetition _),
    "q74_decontaminate" -> (q74Decontaminate _),
    "q44_array_fns" -> (q44ArrayFns _),
    "q45_ngram_jaccard" -> (q45NgramJaccard _),
    "q48_lang_id" -> (q48LangId _),
    "q52_chunking" -> (q52Chunking _),
    "q53_text_clean" -> (q53TextClean _),
    "q58_stratified_sample" -> (q58StratifiedSample _),
    "q143_sorted_neighborhood" -> (q143SortedNeighborhood _),
    "q149_bpe_merges" -> (q149BpeMerges _),
    "q30_exact_dedup" -> (q30ExactDedup _),
    "q31_dedup_stats" -> (q31DedupStats _),
    "q32_text_stats" -> (q32TextStats _),
    "q33_lang_profile" -> (q33LangProfile _),
    "q34_quality_score" -> (q34QualityScore _),
    "q35_token_count" -> (q35TokenCount _),
    "q36_fingerprint" -> (q36Fingerprint _),
    "q37_minhash_pairs" -> (q37MinhashPairs _),
    "q38_simhash" -> (q38Simhash _),
    "q87_simhash_pairs" -> (q87SimhashPairs _),
  )

  /** DuckDB rendering of the [[ngramJaccardPairs]] pair stage (no
    * threshold, no order) — shared by the q45 oracle and the
    * connected-components clustering oracle (ExtendedOps.q67). */
  private[queries] val JaccardPairsSql: String =
    """SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
      |      / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) AS jaccard
      |  FROM (SELECT doc_id, lang, CAST(floor(n_chars / 64) AS BIGINT) AS szbucket,
      |          list_distinct(list_transform(range(1, length(n) - 1),
      |            i -> substring(n, i, 3))) AS g
      |        FROM (SELECT doc_id, lang, n_chars,
      |                trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g')) AS n
      |              FROM documents)) a
      |  JOIN (SELECT doc_id, lang, CAST(floor(n_chars / 64) AS BIGINT) AS szbucket,
      |          list_distinct(list_transform(range(1, length(n) - 1),
      |            i -> substring(n, i, 3))) AS g
      |        FROM (SELECT doc_id, lang, n_chars,
      |                trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g')) AS n
      |              FROM documents)) b
      |    ON a.lang = b.lang AND a.szbucket = b.szbucket AND a.doc_id < b.doc_id""".stripMargin

  /** DuckDB md5-hex→BIGINT hash — shared with [[CorpusOps.hexPoly]]
    * so the q58/q105/q138 hash discipline has exactly one spelling. */
  private def hexPoly(h: String): String = CorpusOps.hexPoly(h)

  /** One BPE round in DuckDB: pair counting over `$v`, argmax, merge —
    * the recursion is unrolled exactly like the Spark side. The merge
    * is a `list_reduce` fold over the symbol LIST (not a string
    * `replace`, which could glue across symbol boundaries when s1 is a
    * suffix of an earlier multi-char merged symbol): append without a
    * separator exactly when the accumulator's LAST symbol equals s1
    * and the next symbol equals s2 — left-to-right non-overlapping,
    * i.e. the standard greedy BPE merge. `pair_cnt` is cast back to
    * BIGINT because DuckDB's sum(BIGINT) yields HUGEINT, which the
    * driver's type-tagged hash can never match against Spark's int64
    * (the r7 judge's root cause for the only 3 red rows). */
  private def bpeRoundSql(v: String, b: String, vNext: String,
      carry: String = ""): String =
    s"""$b AS (
       |  SELECT pair, CAST(sum(cnt) AS BIGINT) AS pair_cnt,
       |    string_split(pair, chr(31))[1] AS s1,
       |    string_split(pair, chr(31))[2] AS s2
       |  FROM (
       |    SELECT unnest(list_transform(range(1, len(l)), i ->
       |        l[i] || chr(31) || l[i + 1])) AS pair, cnt
       |    FROM (SELECT string_split(syms, chr(31)) AS l, cnt FROM $v))
       |  GROUP BY pair
       |  ORDER BY pair_cnt DESC, pair LIMIT 1),
       |$vNext AS (
       |  SELECT ${carry}list_reduce(string_split(syms, chr(31)), (acc, x) ->
       |      CASE WHEN (acc = $b.s1
       |            OR right(acc, length($b.s1) + 1) = chr(31) || $b.s1)
       |          AND x = $b.s2
       |        THEN acc || x ELSE acc || chr(31) || x END) AS syms, cnt
       |  FROM $v, $b)""".stripMargin

  /** DuckDB re-derivation of the md5 SimHash signature (q38/q87,
    * r16): per whitespace token of the normalized text, a 64-bit md5
    * head; per bit, a ±1 vote sum; signature bit = strictly-positive
    * vote — exactly [[graft.functions.Md5SimHash64]]. Emits the
    * signed two's-complement `simhash` (BIGINT, Spark's LongType). */
  private def Md5SimhashSigSql: String =
    """SELECT doc_id, CAST(CASE WHEN u >= 9223372036854775808::HUGEINT
      |    THEN u - 18446744073709551616::HUGEINT ELSE u END AS BIGINT) AS simhash
      |FROM (
      |  SELECT doc_id,
      |    sum(CASE WHEN v > 0 THEN (1::UBIGINT << b)::HUGEINT
      |        ELSE 0::HUGEINT END) AS u
      |  FROM (
      |    SELECT doc_id, b,
      |      sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
      |    FROM (
      |      SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h
      |      FROM (SELECT doc_id, unnest(string_split_regex(
      |              trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g')),
      |              '[ \t\n\x0B\f\r]+')) AS tok FROM documents)),
      |      generate_series(0, 63) t(b)
      |    GROUP BY doc_id, b)
      |  GROUP BY doc_id)""".stripMargin

  /** DuckDB re-derivation of the md5 MinHash signature list (q37,
    * r16) — shingle base hash, Carter–Wegman constants and all, per
    * [[graft.functions.Md5MinHashSigs]]'s scaladoc contract. */
  private def Md5MinhashSigsSql: String =
    """SELECT doc_id, list(m ORDER BY j) AS sig
      |FROM (
      |  SELECT doc_id, j, min((a * h + b) % 2147483647) AS m
      |  FROM (
      |    SELECT doc_id, ('0x' || substr(md5(g), 1, 8))::BIGINT AS h
      |    FROM (
      |      SELECT doc_id, substr(norm, p, 5) AS g
      |      FROM (SELECT doc_id,
      |              trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g')) AS norm
      |            FROM documents),
      |        LATERAL (SELECT unnest(generate_series(1,
      |              greatest(length(norm) - 4, 1))) AS p) t)),
      |    (SELECT j,
      |       (('0x' || substr(md5('mh_a:' || j), 1, 8))::BIGINT
      |          % 1073741823) + 1 AS a,
      |       ('0x' || substr(md5('mh_b:' || j), 1, 8))::BIGINT
      |          % 2147483648 AS b
      |     FROM generate_series(0, 15) t(j))
      |  GROUP BY doc_id, j)
      |GROUP BY doc_id""".stripMargin

  /** 16-term signature-agreement count (q37's est_jaccard numerator). */
  private def minhashAgree16: String =
    (1 to 16).map(i =>
      s"(CASE WHEN sa.sig[$i] = sb.sig[$i] THEN 1 ELSE 0 END)")
      .mkString(" + ")

  val oracles: Map[String, String] = Map(
    "q38_simhash" ->
      s"""SELECT doc_id, simhash,
         |  (simhash >> 0) & 65535 AS band0,
         |  (simhash >> 16) & 65535 AS band1,
         |  (simhash >> 32) & 65535 AS band2,
         |  (simhash >> 48) & 65535 AS band3
         |FROM ($Md5SimhashSigSql)
         |ORDER BY doc_id""".stripMargin,
    "q87_simhash_pairs" ->
      s"""WITH usig AS ($Md5SimhashSigSql),
         |banded AS (
         |  SELECT doc_id, b, (simhash >> (16 * b)) & 65535 AS bucket
         |  FROM usig, generate_series(0, 3) t(b)),
         |okb AS (
         |  SELECT b, bucket FROM banded
         |  GROUP BY b, bucket HAVING count(*) <= 64),
         |pr AS (
         |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |  FROM banded x JOIN okb USING (b, bucket)
         |  JOIN banded y ON x.b = y.b AND x.bucket = y.bucket
         |    AND x.doc_id < y.doc_id)
         |SELECT id_a, id_b,
         |  CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INTEGER) AS hamming
         |FROM pr JOIN usig sa ON sa.doc_id = id_a
         |  JOIN usig sb ON sb.doc_id = id_b
         |WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3
         |ORDER BY id_a, id_b""".stripMargin,
    "q37_minhash_pairs" ->
      s"""WITH sigs AS ($Md5MinhashSigsSql),
         |banded AS (
         |  SELECT doc_id, b, sig[4*b+1] AS m1, sig[4*b+2] AS m2,
         |         sig[4*b+3] AS m3, sig[4*b+4] AS m4
         |  FROM sigs, generate_series(0, 3) t(b)),
         |okb AS (
         |  SELECT b, m1, m2, m3, m4 FROM banded
         |  GROUP BY b, m1, m2, m3, m4 HAVING count(*) <= 64),
         |pr AS (
         |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |  FROM banded x JOIN okb USING (b, m1, m2, m3, m4)
         |  JOIN banded y ON x.b = y.b AND x.m1 = y.m1 AND x.m2 = y.m2
         |    AND x.m3 = y.m3 AND x.m4 = y.m4 AND x.doc_id < y.doc_id)
         |SELECT id_a, id_b, ($minhashAgree16) / 16 AS est_jaccard
         |FROM pr JOIN sigs sa ON sa.doc_id = id_a
         |  JOIN sigs sb ON sb.doc_id = id_b
         |WHERE ($minhashAgree16) / 16 >= 0.5
         |ORDER BY id_a, id_b""".stripMargin,
    "q210_heavy_hitters_exact" -> HeavyHittersExactSql,
    "q214_countmin" -> CountMinSql,
    "q223_hll_table" -> HllTableSql,
    "q227_topk_per_group" -> TopKPerGroupSql,
    "q197_winnowing" -> WinnowingSql,
    "q198_prefix_join" -> PrefixJoinSql,
    "q200_phrase_search" -> PhraseSearchSql,
    "q202_heaps_fit" -> HeapsFitSql,
    "q209_bpe_fertility" -> BpeFertilitySql,
    "q149_bpe_merges" -> s"""
      |WITH v0 AS (
      |  SELECT rtrim(regexp_replace(w, '(.)', '\\1' || chr(31), 'g'),
      |      chr(31)) AS syms,
      |    count(*) AS cnt
      |  FROM (
      |    SELECT unnest(string_split(
      |      trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), ' ')) AS w
      |    FROM documents)
      |  WHERE w <> '' GROUP BY 1),
      |${bpeRoundSql("v0", "b1", "v1")},
      |${bpeRoundSql("v1", "b2", "v2")},
      |${bpeRoundSql("v2", "b3", "v3")}
      |SELECT round, s1, s2, pair_cnt FROM (
      |  SELECT 1 AS round, string_split(pair, chr(31))[1] AS s1,
      |    string_split(pair, chr(31))[2] AS s2, pair_cnt FROM b1
      |  UNION ALL
      |  SELECT 2, string_split(pair, chr(31))[1],
      |    string_split(pair, chr(31))[2], pair_cnt FROM b2
      |  UNION ALL
      |  SELECT 3, string_split(pair, chr(31))[1],
      |    string_split(pair, chr(31))[2], pair_cnt FROM b3)
      |ORDER BY round""".stripMargin,
    "q143_sorted_neighborhood" ->
      """WITH d AS (
        |  SELECT doc_id, trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g')) AS n
        |  FROM documents WHERE text IS NOT NULL),
        |g AS (
        |  SELECT doc_id, substring(n, 1, 8) AS block,
        |    substring(n, 1, 24) AS skey,
        |    list_distinct(list_transform(range(1, length(n) - 1),
        |      i -> substring(n, i, 3))) AS g
        |  FROM d WHERE length(n) >= 3),
        |nb AS (
        |  SELECT doc_id, g, len(g) AS sz,
        |    lag(doc_id, 1) OVER w AS p1_id, lag(g, 1) OVER w AS p1_g,
        |    lag(doc_id, 2) OVER w AS p2_id, lag(g, 2) OVER w AS p2_g
        |  FROM g WINDOW w AS (PARTITION BY block ORDER BY skey, doc_id)),
        |p AS (
        |  SELECT least(doc_id, p1_id) AS id_a, greatest(doc_id, p1_id) AS id_b,
        |    CAST(len(list_intersect(g, p1_g)) AS DOUBLE)
        |      / (len(p1_g) + sz - len(list_intersect(g, p1_g))) AS jaccard
        |  FROM nb WHERE p1_id IS NOT NULL
        |  UNION ALL
        |  SELECT least(doc_id, p2_id), greatest(doc_id, p2_id),
        |    CAST(len(list_intersect(g, p2_g)) AS DOUBLE)
        |      / (len(p2_g) + sz - len(list_intersect(g, p2_g)))
        |  FROM nb WHERE p2_id IS NOT NULL)
        |SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,
    "q58_stratified_sample" -> s"""
      |SELECT lang, count(*) AS n_sampled
      |FROM (
      |  SELECT lang,
      |    ${hexPoly("md5('strat:' || CAST(doc_id AS VARCHAR))")} % 1000000
      |      AS h,
      |    CASE lang WHEN 'en' THEN 500000 WHEN 'es' THEN 200000
      |      WHEN 'de' THEN 200000 WHEN 'fr' THEN 200000
      |      WHEN 'zh' THEN 200000 ELSE 0 END AS rate_ppm
      |  FROM documents)
      |WHERE h < rate_ppm
      |GROUP BY lang ORDER BY lang""".stripMargin,
    "q72_sequence_packing" ->
      """SELECT lang, doc_id, tok, CAST(cum AS BIGINT) AS cum,
        |  CAST(floor(CAST(cum - tok AS DOUBLE) / 512) AS BIGINT) AS pack_id
        |FROM (
        |  SELECT lang, doc_id, tok,
        |    sum(tok) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM (SELECT lang, doc_id,
        |          CAST(len(string_split_regex(text, '[ \t\n\x0B\f\r]+')) AS BIGINT) AS tok
        |        FROM documents))
        |ORDER BY lang, doc_id""".stripMargin,
    "q73_repetition" ->
      """SELECT doc_id,
        |  CAST(len(g) AS INTEGER) AS n_grams,
        |  CAST(len(list_distinct(g)) AS INTEGER) AS n_distinct,
        |  1.0 - CAST(len(list_distinct(g)) AS DOUBLE) / len(g) AS rep_ratio
        |FROM (SELECT doc_id, list_transform(range(1, length(n) - 2),
        |        i -> substring(n, i, 4)) AS g
        |      FROM (SELECT doc_id,
        |              trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g')) AS n
        |            FROM documents))
        |WHERE len(g) > 0
        |ORDER BY doc_id""".stripMargin,
    "q74_decontaminate" ->
      """WITH grams AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, length(n) - 6),
        |           i -> substring(n, i, 8)))) AS g
        |  FROM (SELECT doc_id,
        |          trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g')) AS n
        |        FROM documents)),
        |bench AS (SELECT DISTINCT g FROM grams WHERE doc_id < 5)
        |SELECT doc_id, count(*) AS n_shared
        |FROM grams JOIN bench USING (g)
        |WHERE doc_id >= 5
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q52_chunking" ->
      """SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
        |  CAST(length(substring(text, CAST(i AS INTEGER) * 150 + 1, 200)) AS INTEGER) AS chunk_len,
        |  md5(substring(text, CAST(i AS INTEGER) * 150 + 1, 200)) AS chunk_md5
        |FROM (
        |  SELECT doc_id, text, unnest(range(0,
        |    CAST(1 + floor((length(text) - 1) / 150) AS BIGINT))) AS i
        |  FROM documents)
        |ORDER BY doc_id, chunk_idx""".stripMargin,
    "q53_text_clean" ->
      """SELECT doc_id,
        |  CAST(length(text) AS INTEGER) AS raw_len,
        |  CAST(length(trim(regexp_replace(regexp_replace(text,
        |    '[\x00-\x1F\x7F]', ' ', 'g'), '[ \t\n\x0B\f\r]+', ' ', 'g'))) AS INTEGER) AS clean_len,
        |  md5(trim(regexp_replace(regexp_replace(text,
        |    '[\x00-\x1F\x7F]', ' ', 'g'), '[ \t\n\x0B\f\r]+', ' ', 'g'))) AS clean_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q48_lang_id" ->
      """SELECT doc_id, labeled_lang, score_en, score_es, score_de, score_cjk,
        |  CASE WHEN score_cjk > 0 THEN 'zh'
        |    WHEN score_es > score_en AND score_es > score_de THEN 'es'
        |    WHEN score_de > score_en AND score_de >= score_es THEN 'de'
        |    WHEN score_en > 0 THEN 'en'
        |    ELSE 'unknown' END AS predicted_lang
        |FROM (
        |  SELECT doc_id, lang AS labeled_lang,
        |    CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|is|a|in|that)\b')) AS INTEGER) AS score_en,
        |    CAST(len(regexp_extract_all(lower(text), '\b(el|la|de|que|los|las|una|por)\b')) AS INTEGER) AS score_es,
        |    CAST(len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|nicht|ein|zu)\b')) AS INTEGER) AS score_de,
        |    CAST(len(regexp_extract_all(lower(text), '[\x{4e00}-\x{9fff}]')) AS INTEGER) AS score_cjk
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q44_array_fns" ->
      """SELECT doc_id, t[1] AS first_token, t[-1] AS last_token,
        |  list_min(t) AS min_token,
        |  list_contains(t, 'data') AS has_data,
        |  array_to_string(list_sort(t)[1:3], ',') AS top3,
        |  CAST(len(list_distinct(t)) AS INTEGER) AS n_unique
        |FROM (SELECT doc_id, string_split_regex(text, '[ \t\n\x0B\f\r]+') AS t FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q45_ngram_jaccard" ->
      s"""SELECT * FROM ($JaccardPairsSql)
        |WHERE jaccard >= 0.5 ORDER BY id_a, id_b""".stripMargin,
    "q30_exact_dedup" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS dup_cnt
        |FROM documents
        |GROUP BY trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g'))
        |ORDER BY keep_id""".stripMargin,
    "q31_dedup_stats" ->
      """SELECT lang, count(*) AS n_docs,
        |  count(DISTINCT trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g'))) AS n_distinct
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q32_text_stats" ->
      """SELECT doc_id, lang,
        |  CAST(length(text) AS INTEGER) AS text_len,
        |  CAST(len(string_split_regex(text, '[ \t\n\x0B\f\r]+')) AS INTEGER) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 \t\n\x0B\f\r]')) AS INTEGER) AS n_punct,
        |  CAST(length(regexp_replace(text, '[ \t\n\x0B\f\r]+', '', 'g')) AS DOUBLE)
        |    / len(string_split_regex(text, '[ \t\n\x0B\f\r]+')) AS mean_token_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q33_lang_profile" ->
      """SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    "q34_quality_score" ->
      """SELECT doc_id,
        |  CAST(len(string_split_regex(text, '[ \t\n\x0B\f\r]+')) AS INTEGER) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '\b(the|a|of|and|to|in|is)\b')) AS INTEGER) AS n_stop,
        |  CAST(len(regexp_extract_all(text, '\b(the|a|of|and|to|in|is)\b')) AS DOUBLE)
        |    / len(string_split_regex(text, '[ \t\n\x0B\f\r]+')) AS stop_ratio,
        |  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 \t\n\x0B\f\r]')) AS DOUBLE)
        |    / length(text) AS punct_ratio,
        |  CASE WHEN n_chars < 200 THEN 'short'
        |    WHEN n_chars < 400 THEN 'medium' ELSE 'long' END AS len_band
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q35_token_count" ->
      """SELECT doc_id, lang,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r]')) AS INTEGER) AS n_bpe_tokens,
        |  CAST(len(string_split_regex(text, '[ \t\n\x0B\f\r]+')) AS INTEGER) AS n_ws_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q36_fingerprint" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g'))) AS fp_md5,
        |  sha256(trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g'))) AS fp_sha256
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
