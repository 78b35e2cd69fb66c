package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.Tables

/** Similarity search over the `embeddings` table
  * (`embedding: array<float>`, 64 dims).
  *
  * Two paths:
  *   - q40 brute-force cosine top-k — the correctness baseline; a
  *     broadcast of the (small) query set against the full candidate
  *     side, so the big side is scanned once with no shuffle;
  *   - q41 LSH-bucketed ANN — the 100 TB path: random-hyperplane
  *     signatures bucket the corpus, candidates are generated only
  *     within buckets (candidate volume O(n·probes), not O(n·q)).
  *
  * Float discipline for the oracle: the dot product and norms are
  * strict left-to-right folds over the 64 elements with each float
  * cast to double BEFORE multiplying — the exact expression the DuckDB
  * oracle spells out as a left-associated 64-term sum, so the doubles
  * are bit-identical on both sides (no rounding needed).
  */
object VectorOps extends org.apache.spark.internal.Logging {

  val Dims = 64

  /** Left-fold dot product of two float arrays as double. */
  private def dotD(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, p) => acc + p)

  private def normSqD(a: Column): Column =
    aggregate(transform(a, x => x.cast(DoubleType) * x.cast(DoubleType)),
      lit(0.0), (acc, p) => acc + p)

  /** Declarative cosine — higher-order functions only. */
  def cosine(a: Column, b: Column): Column =
    dotD(a, b) / (sqrt(normSqD(a)) * sqrt(normSqD(b)))

  /** Native codegen'd cosine ([[graft.functions.CosineSimilarity]]) —
    * bit-identical to [[cosine]], primitive fused loop in the hot path. */
  def cosineNative(s: SparkSession, a: Column, b: Column): Column = {
    graft.functions.GraftFunctions.register(s)
    call_function("cosine_sim", a, b)
  }

  /** Per-query exact top-k by (`scoreCol` DESC, `idCol` ASC) through
    * the [[graft.functions.TopKByScoreRow]] bounded heap — the
    * window-free ANN re-rank idiom (round-11 census follow-through).
    * `row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, id)`
    * with a handful of queries hash-partitions EVERY scored candidate
    * into one single-task sort per query; the heap ships ≤k rows per
    * query per map task and merges associatively — bit-identical to
    * the window under the total order (ids unique per query). Emits
    * (groupCol, rk, id, score, payload); callers rename/drop. */
  private[queries] def topKPerGroup(scored: DataFrame, k: Int,
      groupCol: String, scoreCol: String, idCol: String,
      payload: Column): DataFrame = {
    val heap = udaf(graft.functions.TopKByScoreRow(k),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[graft.functions.ScoredRow]())
    scored.groupBy(groupCol)
      .agg(heap(col(scoreCol).cast(DoubleType), col(idCol).cast(LongType),
        payload.cast(LongType)).as("topk"))
      .select(col(groupCol), posexplode(col("topk")).as(Seq("pos0", "e")))
      .select(col(groupCol), (col("pos0") + 1).as("rk"),
        col("e.id").as(idCol), col("e.score").as(scoreCol),
        col("e.payload").as("exq_payload"))
  }

  /** Ascending sibling of [[topKPerGroup]] (distance metrics:
    * Hamming, L2) through [[graft.functions.BottomKByScore]]. */
  private[queries] def bottomKPerGroup(scored: DataFrame, k: Int,
      groupCol: String, scoreCol: String, idCol: String,
      payload: Column): DataFrame = {
    val heap = udaf(graft.functions.BottomKByScore(k),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[graft.functions.ScoredRow]())
    scored.groupBy(groupCol)
      .agg(heap(col(scoreCol).cast(DoubleType), col(idCol).cast(LongType),
        payload.cast(LongType)).as("botk"))
      .select(col(groupCol), posexplode(col("botk")).as(Seq("pos0", "e")))
      .select(col(groupCol), (col("pos0") + 1).as("rk"),
        col("e.id").as(idCol), col("e.score").as(scoreCol),
        col("e.payload").as("exq_payload"))
  }

  /** q40 — brute-force cosine top-k: queries = vec_id < 5, candidates =
    * the rest; top-10 per query by similarity (tie-broken on cand_id).
    * The query side is broadcast, so the candidate scan is one narrow
    * pass however large the corpus; the per-query top-k rides the
    * [[graft.functions.TopKByScoreRow]] bounded heap (label as the
    * payload), NOT a window — a 5-value partition key would sort every
    * scored candidate in 5 single-task frames at 100 TB. */
  def q40CosineTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val cands = emb.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("cand_id"), col("label"), col("embedding").as("c_emb"))
    val scored = cands.crossJoin(broadcast(queries))
      .select(col("query_id"), col("cand_id"), col("label"),
        cosineNative(s, col("q_emb"), col("c_emb")).as("sim"))
    topKPerGroup(scored, 10, "query_id", "sim", "cand_id", col("label"))
      .select(col("query_id"), col("rk"), col("cand_id"),
        col("exq_payload").cast("int").as("label"), col("sim"))
      .orderBy("query_id", "rk")
  }

  /** Random-hyperplane signature: bit j = sign(dot(v, h_{base+j}))
    * where hyperplane h_m's element i is ±1 from the parity of
    * xxhash64(m, i) — deterministic, seedable, no stored model.
    * `base` selects a disjoint hyperplane block per LSH table
    * (table t passes base = t·bits), so multi-table signatures are
    * independent draws from the same family; base = 0 is the original
    * single-table signature (q47's form, unchanged). */
  private[queries] def rhpSignature(v: Column, bits: Int,
      base: Int = 0): Column =
    (0 until bits).map { j =>
      val dot = aggregate(
        zip_with(v, sequence(lit(0), lit(Dims - 1)), (x, i) =>
          x.cast(DoubleType) *
            when(xxhash64(lit(base + j), i).bitwiseAND(1) === 1, 1.0)
              .otherwise(-1.0)),
        lit(0.0), (acc, p) => acc + p)
      when(dot > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** XOR masks for every signature within Hamming distance
    * `maxHamming` of a bucket — generated statically in Scala (the bit
    * width is a plan-time constant), so multi-probe is just an
    * `explode` of `bucket ^ mask` literals on the tiny query side. */
  private def probeMasks(bits: Int, maxHamming: Int): Seq[Long] =
    // enumerate per Hamming size — O(C(bits, maxHamming)) masks
    // generated, never the full 2^bits powerset (at the 24+-bit widths
    // a 100 TB corpus wants, the powerset is plan-time-infeasible)
    (0 to maxHamming).iterator
      .flatMap(h => (0 until bits).toSet.subsets(h))
      .map(_.foldLeft(0L)((acc, j) => acc | (1L << j)))
      .toSeq.sorted

  /** LSH-bucketed approximate nearest neighbors, parameterized:
    * `bits`-bit random-hyperplane signatures bucket the corpus; each
    * query probes every bucket within Hamming distance `maxHamming` of
    * its own signature (multi-probe) and re-ranks candidates exactly by
    * cosine. Probe buckets are generated by exploding plan-time XOR
    * masks on the (tiny, broadcast) query side — the corpus side is
    * never widened. `maxHamming == bits` probes all 2^bits buckets and
    * is therefore EXACT (the recall-gate identity LlmOpsSpec asserts).
    * At 100 TB: more bits (buckets scale 2^bits) and Hamming-1/2
    * probing trade candidate volume O(n·probes/2^bits) against recall. */
  def annLsh(s: SparkSession, dir: String, bits: Int, maxHamming: Int,
             k: Int): DataFrame = {
    val emb = Tables.embeddings(s, dir)
      .withColumn("bucket", rhpSignature(col("embedding"), bits))
    val masks = probeMasks(bits, maxHamming)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        explode(array(masks.map(m => col("bucket").bitwiseXOR(lit(m))): _*))
          .as("bucket"))
    val cands = emb.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("cand_id"), col("embedding").as("c_emb"),
        col("bucket"))
    val scored = cands.join(broadcast(queries), Seq("bucket"))
      .select(col("query_id"), col("cand_id"),
        cosineNative(s, col("q_emb"), col("c_emb")).as("sim"))
    // bounded-heap top-k, not a per-query window: the probed candidate
    // volume grows with the corpus (O(n·probes/2^bits)) while query_id
    // has a handful of values — the round-11 census collapse
    topKPerGroup(scored, k, "query_id", "sim", "cand_id", lit(0L))
      .select("query_id", "rk", "cand_id", "sim")
      .orderBy("query_id", "rk")
  }

  /** Multi-TABLE LSH ANN: `tables` independent random-hyperplane
    * signatures per vector (disjoint hyperplane blocks — see
    * [[rhpSignature]]'s `base`), each probed with Hamming-`maxHamming`
    * multi-probe; candidates are the UNION across tables, deduplicated
    * AFTER exact scoring by a map-side-combinable `max(sim)` (sims for
    * a duplicate pair are identical, so max = first; deduplicating
    * before scoring would have to drag both embeddings through the
    * shuffle — narrower to score in-branch and combine 8-byte rows).
    * Multi-table union dominates deeper single-table probing at equal
    * candidate volume (measured at sf0.1: 8 tables × Hamming-1 probe
    * 26% of the pair space for recall 0.70; one table needs Hamming-4
    * = 64% probed for 0.76 — the h-ball's marginal bucket is ever
    * farther from the query, a union member's is a fresh draw).
    *
    * Scale shape: the signature frame (vec_id, embedding, L sigs) is
    * built in ONE corpus pass and persisted; each table's branch is a
    * cache scan joined against its own broadcast probe set; per-table
    * expected bucket stays ≤ 64 via the adaptive width, so candidate
    * volume is O(tables · probes · 64) per query. */
  private[queries] def annLshMulti(s: SparkSession, dir: String,
      bits: Int, tables: Int, maxHamming: Int, k: Int): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    // ALL signatures in one fused kernel pass — r16: the md5-parity
    // kernel ([[graft.functions.Md5RhpSignatures]]) replaces the
    // xxhash-parity one so DuckDB re-derives every bucket and q41
    // graduates from rows-only to a full oracle pass. Same fused
    // shape as the r13 kernel (the declarative form is tables×bits
    // interpreted HOF folds per row — measured 8× slower). The array
    // is materialized THROUGH the cache before the per-table getItem
    // projections: a same-projection getItem would let
    // CollapseProject re-inline the kernel once per reference
    // (the q73 lesson); the cache boundary pins one evaluation.
    val sigsK = org.apache.spark.sql.graft.Bridge.column(
      graft.functions.Md5RhpSignatures(
        org.apache.spark.sql.graft.Bridge.expr(col("embedding")),
        bits, tables, Dims))
    val sigs0 = emb
      .select(col("vec_id"), col("embedding"), sigsK.as("sigs"))
      .persist()
    // NULL embedding → NULL array; the declarative twin collapses a
    // null fold to signature 0 per table — coalesce matches it
    val sigsNz = transform(col("sigs"), x => coalesce(x, lit(0L)))
    val masks = probeMasks(bits, maxHamming)
    // ONE (table, bucket)-keyed join instead of `tables` unioned
    // per-table joins (r17, guide §2.4 "remove shuffles outright" /
    // §3.1): the old shape scanned the signature cache 2·tables times
    // and planned tables broadcast joins + a tables-way Union; this
    // shape posexplodes the signature ARRAY once per side — the table
    // index rides along as a join key, so per-(t, bucket) matches are
    // exactly the per-table joins' matches and the max-sim dedup below
    // is unchanged. Plan: 30 exchanges / 24 IMR scans / 12 bcast joins
    // → 4 exchanges / 2 scans / 1 join; measured 2.13 → 0.91 s at
    // sf0.1 (min-of-3 A/B). Candidate-side row growth (tables·n map-
    // side generated, never shuffled wider than the old union's total)
    // is identical mass to the old 12 branches' combined output.
    val queries = sigs0.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        posexplode(sigsNz).as(Seq("t", "sig")))
      .select(col("query_id"), col("q_emb"), col("t"),
        explode(array(masks.map(m =>
          col("sig").bitwiseXOR(lit(m))): _*)).as("bucket"))
    val dedup = sigs0.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("cand_id"), col("embedding").as("c_emb"),
        posexplode(sigsNz).as(Seq("t", "bucket")))
      .join(broadcast(queries), Seq("t", "bucket"))
      .select(col("query_id"), col("cand_id"),
        cosineNative(s, col("q_emb"), col("c_emb")).as("sim"))
      .groupBy("query_id", "cand_id").agg(max(col("sim")).as("sim"))
    topKPerGroup(dedup, k, "query_id", "sim", "cand_id", lit(0L))
      .select("query_id", "rk", "cand_id", "sim")
      .orderBy("query_id", "rk")
  }

  /** q41 — LSH ANN as registered: MULTI-TABLE random-hyperplane LSH
    * with corpus-derived dials (the q162/q47 precedent — the
    * registered query carries the scale-holding configuration, not a
    * demo dial):
    *   - signature width bits = max(8, ⌈log₂(n/64)⌉) bounds the
    *     expected bucket to 64 vectors (q47's derivation);
    *   - table count L = max(12, bits − 4) — 12 at the width floor
    *     (re-dialed r16 on RecallProbe measurement after the
    *     md5-parity re-draw: 8→0.64, 12→0.80 recall at sf0.1),
    *     growing with log n to offset the per-table catch probability
    *     p^bits as widths widen (for corpora with real near-neighbor
    *     structure p → 1 and the growth is more than enough; the iid-
    *     random synthetic corpus is the worst case and is what the
    *     sf0.1 floor below is measured on);
    *   - Hamming-1 multi-probe per table (deeper balls lose to more
    *     tables at equal volume — measured, see [[annLshMulti]]).
    * Both dials derive from a 1-row count (bounded model state).
    * Oracle-paired since r16 ([[AnnLshSql]] — md5-parity signatures
    * DuckDB re-derives; the multi-probe is checked via its
    * candidate-set identity); LlmOpsSpec additionally gates recall@10
    * against q40's exact ground truth at the gate SF and
    * RecallAtScaleSpec pins the sf0.1 floor. */
  def q41AnnLsh(s: SparkSession, dir: String): DataFrame = {
    val n = Tables.embeddings(s, dir).filter(col("embedding").isNotNull)
      .agg(count(lit(1))).head().getLong(0)
    val bits = math.max(8,
      math.ceil(math.log(math.max(1.0, n / 64.0)) / math.log(2.0)).toInt)
    // table floor 12 (r16): the md5-parity re-draw measured 0.64 at
    // the r13 floor of 8 tables (a draw effect — same algorithm, new
    // hyperplanes); rather than lowering the recall floor, the table
    // count was re-dialed on measurement (graft.queries.RecallProbe:
    // 8→0.64, 10→0.72, 12→0.80, 16→0.88 at sf0.1) — 12 tables buys
    // 0.80 recall at ~4.5k bucket candidates, still under half the
    // 9,975-cosine brute force
    val tables = math.max(12, bits - 4)
    annLshMulti(s, dir, bits = bits, tables = tables, maxHamming = 1, k = 10)
  }

  /** q47 — embedding-cosine near-duplicate detection: pairs whose
    * cosine exceeds a threshold, candidates generated ONLY within equal
    * random-hyperplane buckets (high-cosine pairs land in the same
    * bucket with high probability; multi-probe neighboring signatures
    * raises recall at scale). The full-corpus variant of q41's
    * query-probe shape — the embedding-space dedup a training pipeline
    * runs before training. Oracle-paired since r16: hyperplane signs
    * are md5 parities ([[graft.functions.Md5RhpBucket]]), so DuckDB
    * re-derives buckets, cap and cosine end-to-end
    * ([[EmbeddingNeardupSql]]).
    *
    * Skew/scale shape (round-12 skew census): a FIXED signature width
    * makes the expected bucket n/2^bits, so the bucket self-join's pair
    * mass is n²/2^bits — quadratic at any fixed width. Two bounds fix
    * the mass:
    *   - ADAPTIVE width: bits = max(8, ⌈log₂(n/64)⌉) keeps the
    *     expected bucket ≤ 64 vectors, so expected pair mass is
    *     O(n·64) — linear at any corpus size (bits is derived from a
    *     1-row count, the bounded-model-state precedent; at the test
    *     SFs n ≤ 2000 so the max(8, ·) floor binds and results are
    *     byte-identical to the fixed-8-bit form). The recall cost of
    *     narrower buckets is the standard LSH tradeoff the dochead
    *     notes — production multi-probes neighboring signatures, as
    *     q41's probe-mask machinery already demonstrates.
    *   - a DEGENERATE-BUCKET cap (the q37/q87/q197 guard): real
    *     embedding corpora are clustered, not uniform — a dense
    *     near-identical cluster shares one signature regardless of
    *     width, and joining inside it costs |cluster|² for pairs
    *     SemDeDup-style clustering (q211) already handles. Buckets
    *     above [[NeardupMaxBucket]] are carved out in-plan, bounding
    *     worst-case per-key mass ≤ cap² even on adversarial data
    *     (never binds at the test SFs: max bucket ≈ 20).
    * The signature frame is persisted: the 8×64-term signature
    * arithmetic is expensive per row and feeds the bucket stats AND
    * both join sides (the round-12 persist-boundary rule). */
  private val NeardupMaxBucket = 1024L

  def q47EmbeddingNeardup(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(s, dir)
    // adaptive-width base: NON-NULL embeddings only, the same
    // population q162's shortlist derives from (r12 ADVICE — the two
    // bounded-model-state dials must share one base; NULL embeddings
    // produce no signature and join nothing)
    val nVec = base.filter(col("embedding").isNotNull)
      .agg(count(lit(1))).head().getLong(0)
    val bits = math.max(8,
      math.ceil(math.log(math.max(1.0, nVec / 64.0)) / math.log(2.0)).toInt)
    // signature via the md5-parity kernel (r16 — the oracle-pairable
    // sibling of the r13 RhpSignatures fold: hyperplane signs are md5
    // parities DuckDB re-derives, so q47 graduates from rows-only to
    // a full oracle pass); one fused per-row pass, same dot-fold shape
    val sigK = org.apache.spark.sql.graft.Bridge.column(
      graft.functions.Md5RhpBucket(
        org.apache.spark.sql.graft.Bridge.expr(col("embedding")),
        bits, Dims))
    val emb = base
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding"), sigK.as("bucket"))
      .persist()
    val bsizes = emb.groupBy("bucket").agg(count(lit(1)).as("bsz"))
    // Carve-out observability (r12 ADVICE): the degenerate-bucket cap
    // silently changes the output contract when it binds — on clustered
    // real data near-dup pairs inside a carved bucket vanish. Count the
    // carved mass eagerly (one tiny job over the already-persisted
    // signature frame — it doubles as the cache materialization the
    // main join reuses) and log it loudly; zero rows at the test SFs.
    val carved = bsizes.filter(col("bsz") > NeardupMaxBucket)
      .agg(coalesce(count(lit(1)), lit(0L)).as("nb"),
        coalesce(sum(col("bsz")), lit(0L)).as("nrows")).head()
    if (carved.getLong(0) > 0) {
      logWarning(s"q47EmbeddingNeardup: carved ${carved.getLong(0)} " +
        s"degenerate bucket(s) holding ${carved.getLong(1)} vectors " +
        s"(> $NeardupMaxBucket per bucket); near-duplicates inside them " +
        "are NOT reported — route dense clusters through SemDeDup (q211)")
    }
    val okBuckets = bsizes.filter(col("bsz") <= NeardupMaxBucket)
      .select("bucket")
    val pruned = emb.join(okBuckets, Seq("bucket"))
    val a = pruned.select(col("bucket"), col("vec_id").as("id_a"),
      col("embedding").as("e_a"))
    val b = pruned.select(col("bucket"), col("vec_id").as("id_b"),
      col("embedding").as("e_b"))
    a.join(b.hint("SHUFFLE_HASH"), Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosineNative(s, col("e_a"), col("e_b")).as("sim"))
      // 0.35 ~ the 99.9th percentile of pair cosine in this synthetic
      // corpus (random embeddings, no true dups); real corpora use ~0.9
      .filter(col("sim") >= 0.35)
      .orderBy("id_a", "id_b")
  }

  /** IVF-style ANN, parameterized: a coarse quantizer partitions the
    * corpus into inverted lists; queries probe the `nprobe` nearest
    * lists and re-rank the union exactly. The quantizer here is a
    * deterministic sample of corpus vectors (`vec_id % 127 == 7`,
    * K ≈ n/127 — production trains k-means centroids, but the index
    * structure, assignment and probe path are identical). With
    * `nprobe >= K` every list is probed, so the result is EXACTLY the
    * brute-force top-k (the identity LlmOpsSpec asserts). At 100 TB:
    * lists are written partitioned by `cent_id`, so a query touches
    * `nprobe` partitions instead of the corpus — partition pruning
    * does the candidate cut. */
  def annIvf(s: SparkSession, dir: String, nprobe: Int, k: Int): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    // the quantizer is MODEL state and must stay broadcastable at any
    // corpus size, so the deterministic sample is CAPPED: %127 alone
    // grows K linearly with n, and broadcasting a data-sized centroid
    // frame is the round-11 broadcast-census collapse (a trained IVF
    // sizes K by model capacity, not corpus size — q139's k-means
    // path). orderBy+limit executes as TakeOrderedAndProject (a
    // per-partition heap + driver merge of 64 rows, never a global
    // sort), and the Limit is what proves the frame bounded to
    // BroadcastGuard. At the test SFs (≤ 2000 vectors → ≤ 16
    // candidates) the cap never binds, so results are unchanged.
    val centroids = emb.filter(col("vec_id") % 127 === 7)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_vec"))
      .orderBy("cent_id").limit(64)
    // corpus assignment is argmax-by-aggregation (max_by), NOT a window
    // rank: a window would shuffle all n×K scored rows to rank them; the
    // aggregate combines map-side, so only one row per vector survives
    val lists = emb.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("cand_id"), col("embedding").as("c_emb"))
      .crossJoin(broadcast(centroids))
      .select(col("cand_id"), col("c_emb"), col("cent_id"),
        cosineNative(s, col("c_emb"), col("cent_vec")).as("csim"))
      .groupBy("cand_id")
      .agg(max_by(col("cent_id"), struct(col("csim"), col("cent_id") * -1)).as("cent_id"),
        first(col("c_emb")).as("c_emb"))
    // the (tiny) query side probes its nprobe nearest lists through
    // the bounded heap — the centroid frame grows ~n/127 with the
    // corpus while query_id has a handful of values, so a crk window
    // here is the same census collapse as the re-rank's
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val probeScores = queries.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("cent_id"),
        cosineNative(s, col("q_emb"), col("cent_vec")).as("csim"))
    val probed = topKPerGroup(probeScores, nprobe, "query_id", "csim",
      "cent_id", lit(0L))
      .select(col("query_id"), col("cent_id"))
      .join(broadcast(queries), Seq("query_id"))
    val scored = lists.join(broadcast(probed), Seq("cent_id"))
      .select(col("query_id"), col("cand_id"),
        cosineNative(s, col("q_emb"), col("c_emb")).as("sim"))
    topKPerGroup(scored, k, "query_id", "sim", "cand_id", lit(0L))
      .select("query_id", "rk", "cand_id", "sim")
      .orderBy("query_id", "rk")
  }

  /** q51 — IVF ANN as registered: nprobe = max(2, ⌈K/2⌉) of the
    * K = min(64, ≈n/127) sampled lists, top-10 — the corpus-derived
    * dial (q162/q47 precedent; the r12 verdict measured the old fixed
    * nprobe=2 at recall 0.28 on sf0.1). An UNTRAINED quantizer is a
    * random vector sample, so its lists carry no cluster alignment
    * and a query's true neighbors spread across them near-uniformly —
    * holding recall needs a constant FRACTION of lists probed (half:
    * measured 0.76 at sf0.1, floor 0.7 in RecallAtScaleSpec), which is
    * the honest price of skipping training; the trained tier (q139)
    * holds 0.98 at nprobe=2 and is the production path. K comes from
    * one count of the bounded centroid frame (model state).
    * Oracle-paired since r16 ([[AnnIvfSql]] — the whole index path is
    * deterministic arithmetic); recall@10 also gated in LlmOpsSpec. */
  def q51AnnIvf(s: SparkSession, dir: String): DataFrame = {
    val k = Tables.embeddings(s, dir).filter(col("vec_id") % 127 === 7)
      .agg(count(lit(1))).head().getLong(0).min(64L)
    annIvf(s, dir, nprobe = math.max(2, math.ceil(k / 2.0).toInt), k = 10)
  }

  /** q68 — vector norms / normalization: L2 norm via the same
    * left-fold double discipline as cosine, plus max element and the
    * first normalized coordinate. The per-vector normalize step every
    * embedding pipeline runs before cosine/IP search (norm-1 vectors
    * turn cosine into a plain dot product). One narrow codegen'd
    * projection — scales with the scan. */
  def q68VectorNorms(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .filter(col("vec_id") < 200)
      .select(col("vec_id"), col("label"),
        size(col("embedding")).as("dims"),
        sqrt(normSqD(col("embedding"))).as("l2_norm"),
        array_max(col("embedding")).cast(DoubleType).as("max_elem"),
        // nullif guards the all-zero embedding: Spark double division
        // by zero throws under ANSI while DuckDB yields NaN — NULL on
        // both sides is the one agreeing answer (oracle mirrors NULLIF)
        (element_at(col("embedding"), 1).cast(DoubleType) /
          nullif(sqrt(normSqD(col("embedding"))), lit(0.0))).as("e1_normalized"))
      .orderBy("vec_id")

  /** q69 — per-label centroids (the k-means update step / IVF training
    * primitive) in long form: posexplode over the leading dims →
    * per-(label, dim) fixed-point mean. The explode shuffles once on
    * (label, dim) with map-side combine — the scalable layout for
    * centroid updates (never collect vectors to the driver). */
  def q69LabelCentroids(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("label"), posexplode(slice(col("embedding"), 1, 8)))
      .groupBy(col("label"), col("pos").as("dim"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("col").cast(DoubleType) * 1e6)).cast(DoubleType)
          / 1e6 / count(lit(1))).as("centroid"))
      .orderBy("label", "dim")

  /** q108 — distributed covariance matrix over the embedding corpus,
    * the PCA/dim-reduction building block (project onto top principal
    * components → cheaper ANN, whitened distances). Two passes:
    *
    *   1. exact per-dimension means — posexplode + the scaled-BIGINT
    *      sum idiom (64 keys, map-side combined);
    *   2. ONE bounded-state [[graft.functions.CovarianceUpper]]
    *      aggregation: each vector folds its centered outer-product
    *      upper triangle into a d(d+1)/2-long buffer; partials merge
    *      map-side, so the shuffle moves one 2080-cell array per
    *      partition — never 2080 rows per VECTOR like the
    *      explode+groupBy twin would.
    *
    * The 64-scalar mean collect is model-parameter plumbing (same
    * class as q74's broadcast benchmark set), not a data collect.
    * Every cell is an exact BIGINT (per-row floor quantization), so
    * the oracle's unnest self-join formulation matches bit-for-bit. */
  def q108Covariance(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val mRows = emb
      .select(posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy("i")
      .agg(sum(floor(col("x").cast(DoubleType) * 1e9).cast("long")).as("ms"),
        count(lit(1)).as("n"))
      .collect()
    // empty corpus: no mean rows, and the n=0 guard below constant-
    // folds the plan to an empty relation (the ANSI division by n
    // never evaluates) — found by the EmptyInputSpec sweep
    val n = if (mRows.isEmpty) 0L else mRows.head.getLong(2)
    val means = Array.ofDim[Double](Dims)
    mRows.foreach(r => means(r.getInt(0)) = r.getLong(1).toDouble / 1e9 / n)
    val covAgg = udaf(graft.functions.CovarianceUpper(Dims, means),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]())
    emb.agg(covAgg(col("embedding")).as("cells"))
      .select(inline(col("cells")))
      .select(col("i"), col("j"), col("cs").as("cov_scaled"),
        (col("cs") / (lit(1e9) * lit(n))).as("cov"))
      .where(lit(n > 0))
      .orderBy("i", "j")
  }

  /** Top principal component via driver-side power iteration on the
    * (tiny, d×d) covariance matrix q108 materializes — the eigenvector
    * step is O(d²·iters) scalar work, so it belongs on the driver; the
    * DATA passes are q108's distributed aggregations. Deterministic:
    * fixed start vector, fixed iteration count. Returns (v, λ). */
  def topPrincipalComponent(s: SparkSession, dir: String,
      iters: Int = 50): (Array[Double], Double) = {
    val cells = q108Covariance(s, dir).collect()
    val c = Array.ofDim[Double](Dims, Dims)
    cells.foreach { r =>
      val (i, j, v) = (r.getInt(0), r.getInt(1), r.getDouble(3))
      c(i)(j) = v; c(j)(i) = v
    }
    var v = Array.fill(Dims)(1.0 / math.sqrt(Dims))
    var lambda = 0.0
    (0 until iters).foreach { _ =>
      val w = Array.tabulate(Dims)(i =>
        (0 until Dims).map(j => c(i)(j) * v(j)).sum)
      lambda = math.sqrt(w.map(x => x * x).sum)
      if (lambda > 0) v = w.map(_ / lambda)
    }
    (v, lambda)
  }

  /** Top-k principal components via subspace (orthogonal) iteration on
    * q108's covariance matrix: V ← orthonormalize(C·V), deterministic
    * init (the first k axis vectors), fixed iteration count. Driver
    * math on a d×d matrix; the data passes are q108's. */
  def topPrincipalComponents(s: SparkSession, dir: String, k: Int,
      iters: Int = 100): Array[Array[Double]] = {
    val c = Array.ofDim[Double](Dims, Dims)
    q108Covariance(s, dir).collect().foreach { r =>
      val (i, j, v) = (r.getInt(0), r.getInt(1), r.getDouble(3))
      c(i)(j) = v; c(j)(i) = v
    }
    var v = Array.tabulate(k)(j =>
      Array.tabulate(Dims)(i => if (i == j) 1.0 else 0.0))
    (0 until iters).foreach { _ =>
      val w = v.map(vec => Array.tabulate(Dims)(i =>
        (0 until Dims).map(j => c(i)(j) * vec(j)).sum))
      // modified Gram-Schmidt, deterministic order
      (0 until k).foreach { j =>
        (0 until j).foreach { l =>
          val d = (0 until Dims).map(i => w(j)(i) * w(l)(i)).sum
          (0 until Dims).foreach(i => w(j)(i) -= d * w(l)(i))
        }
        val n = math.sqrt(w(j).map(x => x * x).sum)
        if (n > 0) (0 until Dims).foreach(i => w(j)(i) /= n)
      }
      v = w
    }
    v
  }

  /** PCA-projected ANN — the dimensionality-reduction search path the
    * covariance operator (q108) exists for: project corpus + queries
    * onto the top `nPcs` principal components (a per-row codegen'd
    * 64×nPcs multiply-add, model coefficients inlined as literals),
    * generate `nCand` candidates per query by cosine in the REDUCED
    * space (nPcs-dim arithmetic instead of 64-dim — the 100 TB win:
    * the scan-side scoring work drops ~8×, or equivalently the
    * projected corpus fits a memory tier the raw one doesn't), then
    * exact-re-rank only the candidates with full-precision cosine.
    * Exact at nCand ≥ corpus (re-ranks everything); recall-gated in
    * tests like the LSH/IVF paths. */
  def annPca(s: SparkSession, dir: String, nPcs: Int, nCand: Int,
      k: Int): DataFrame = {
    val pcs = topPrincipalComponents(s, dir, nPcs)
    // one fused kernel per row ([[graft.functions.PcaProject]]) — the
    // declarative 512-node array(Σ getItem·lit) tree costs 1.8 s of
    // plan ANALYSIS alone (bit-equality with it is unit-tested)
    def proj(e: Column) = org.apache.spark.sql.graft.Bridge.column(
      graft.functions.PcaProject(
        org.apache.spark.sql.graft.Bridge.expr(e), pcs))
    val emb = Tables.embeddings(s, dir)
    val cands = emb.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("cand_id"), col("embedding").as("c_emb"),
        proj(col("embedding")).as("cp"))
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        proj(col("embedding")).as("qp"))
    // both rankings ride the bounded heap (round-11 census): the old
    // per-query windows carried BOTH full embeddings for every scored
    // candidate into 5 single-task sorts; the heap ships ≤nCand ids,
    // and the full-precision re-rank re-reads only the shortlist rows
    // from one more narrow scan (a second columnar scan beats hauling
    // 256-byte embeddings through a corpus-sized shuffle at any scale)
    val reduced = cands.select(col("cand_id"), col("cp"))
      .join(broadcast(queries.select(col("query_id"), col("qp"))), lit(true))
      .select(col("query_id"), col("cand_id"),
        cosineNative(s, col("qp"), col("cp")).as("simp"))
    val shortlist = topKPerGroup(reduced, nCand, "query_id", "simp",
      "cand_id", lit(0L))
      .select(col("query_id"), col("cand_id"))
    val scored = cands.select(col("cand_id"), col("c_emb"))
      .join(broadcast(shortlist), Seq("cand_id"))
      .join(broadcast(queries.select(col("query_id"), col("q_emb"))),
        Seq("query_id"))
      .select(col("query_id"), col("cand_id"),
        cosineNative(s, col("q_emb"), col("c_emb")).as("sim"))
    topKPerGroup(scored, k, "query_id", "sim", "cand_id", lit(0L))
      .select("query_id", "rk", "cand_id", "sim")
      .orderBy("query_id", "rk")
  }

  /** q110 as registered: 16 PCs, shortlist = max(50, ⌈n/5⌉) — both
    * corpus-honest dials (the r12 verdict measured the old fixed
    * nPcs=8/nCand=50 at recall 0.20 on sf0.1). The shortlist follows
    * q162's corpus-scaled derivation exactly (n from a 1-row count of
    * the non-null-embedding population); 16 PCs over the iid-random
    * synthetic corpus keep only 25% of variance, so the reduced-space
    * ranking needs the generous shortlist (measured sf0.1 recall 0.78,
    * floor 0.7 in RecallAtScaleSpec) — on real corpora the top PCs
    * concentrate variance and the same config only gets better. */
  def q110AnnPca(s: SparkSession, dir: String): DataFrame = {
    val n = Tables.embeddings(s, dir).filter(col("embedding").isNotNull)
      .agg(count(lit(1))).head().getLong(0)
    annPca(s, dir, nPcs = 16,
      nCand = math.max(50, math.ceil(n / 5.0).toInt), k = 10)
  }

  /** q148 — binary sign-quantized embeddings, exact-Hamming SHORTLIST,
    * full-precision cosine re-rank: each 64-dim vector compresses
    * 256 bytes → 8 (bit i = sign of dim i, carried as two 32-bit
    * halves so neither engine's integer semantics touch the BIGINT
    * sign bit), candidates rank by popcount(xor) — the 1-bit
    * quantization tier below q103's int8 and the
    * memory-bandwidth-optimal first pass a billion-vector index runs
    * — and the top max(50, ⌈n/5⌉) per query re-rank by exact cosine
    * (the r12 verdict: the shortlist-free form's Hamming-only top-10
    * decayed to recall 0.16 at sf0.1; the composed form measures 0.92,
    * floor 0.85 in RecallAtScaleSpec; the shortlist width is q162's
    * corpus-scaled derivation from a 1-row count). Unlike the
    * rows-only LSH paths, the sign signature has NO engine-specific
    * hash parameters, so the WHOLE pipeline — quantize → Hamming
    * shortlist → cosine re-rank → top-10 — is oracle-verified
    * end-to-end (the cosine is the same left-fold the q40 oracle
    * spells term-for-term).
    *
    * Scale shape: the narrow signature frame (vec_id, lo, hi — 24 B)
    * is persisted from one corpus pass; Hamming scoring is a
    * broadcast-queries scan. The shortlist is a per-query top-nCand
    * where nCand GROWS with n, so neither a bounded heap (O(nCand)
    * aggregator state) nor a rank window (5 single-task sorts of all
    * scored rows) holds at 100 TB — it rides the round-11 two-phase
    * recipe on the composite sort key (hamming, cand_id): the
    * 129-value Hamming domain leads the order, equal-width cand_id
    * range buckets split each hamming value's tie mass across
    * O(cluster) tasks, per-(query, hamming, bkt) counts feed the
    * exclusive prefix offsets via a window over that AGGREGATED frame,
    * and a row_number inside (query, hamming, bkt) completes the
    * global rank. Re-rank fetches shortlist embeddings by id (a
    * narrow shuffle join — never a data-sized broadcast) and the
    * final top-10 rides the bounded heap. */
  def q148HammingTopK(s: SparkSession, dir: String): DataFrame = {
    def half(lo: Int): Column =
      (0 until 32).map(i =>
        when(element_at(col("embedding"), lo + i + 1) >= 0f,
          lit(1L << i)).otherwise(lit(0L)))
        .reduce((a, b) => a.bitwiseOR(b))
    val emb = Tables.embeddings(s, dir)
    val n = emb.filter(col("embedding").isNotNull)
      .agg(count(lit(1))).head().getLong(0)
    val nCand = math.max(50L, math.ceil(n / 5.0).toLong)
    val sigs = emb
      .select(col("vec_id"), half(0).as("lo"), half(32).as("hi"))
      .persist()
    val queries = sigs.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"),
        col("lo").as("q_lo"), col("hi").as("q_hi"))
    val cands = sigs.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("cand_id"), col("lo"), col("hi"))
    // the hamming domain alone would leave one task per (query,
    // hamming) tie mass (a single value can hold ~n·pmf rows), so the
    // composite sort key (hamming, cand_id) buckets on BOTH: hamming
    // gives the leading order, equal-width cand_id ranges (order-
    // preserving, from a 1-row min/max — the q195/q47 bounded-model-
    // state precedent) split each hamming value across O(cluster)
    // tasks
    val nB = s.sparkContext.defaultParallelism.max(16) * 2
    val idStats = cands.agg(min(col("cand_id")).as("lo_id"),
      max(col("cand_id")).as("hi_id")).head()
    val (loId, hiId) =
      if (idStats.isNullAt(0)) (0L, 1L) // empty corpus: bucket map unused
      else (idStats.getLong(0), idStats.getLong(1))
    val span = math.max(1L, hiId - loId + 1L)
    val scored = cands.crossJoin(broadcast(queries))
      .select(col("query_id"), col("cand_id"),
        (bit_count(col("q_lo").bitwiseXOR(col("lo")))
          + bit_count(col("q_hi").bitwiseXOR(col("hi")))).as("hamming"),
        // floor() is load-bearing: Spark's `/` on integral operands
        // returns DOUBLE, so without it bkt is a near-unique double per
        // candidate — the offsets frame degenerates to ~one row per
        // scored candidate (a data-sized broadcast) and the per-bucket
        // window to a per-row one, exactly the collapse the two-phase
        // recipe exists to avoid (r13 ADVICE; same idiom as
        // ExactQuantiles' bucket map).
        least(greatest(floor((col("cand_id") - lit(loId)) * nB / lit(span)),
          lit(0)), lit(nB - 1)).cast("long").as("bkt"))
    // two-phase global rank by (hamming, cand_id) within each query:
    // per-(query, hamming, bkt) counts → exclusive prefix offsets via
    // a window over that AGGREGATED frame (≤ queries·129·nB rows) →
    // row_number within (query, hamming, bkt)
    val offs = scored.groupBy(col("query_id"), col("hamming"), col("bkt"))
      .agg(count(lit(1)).as("hc"))
      .withColumn("hoff", coalesce(sum(col("hc")).over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("hamming"), col("bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("query_id"), col("hamming"), col("bkt"), col("hoff"))
    val wLocal = Window
      .partitionBy(col("query_id"), col("hamming"), col("bkt"))
      .orderBy(col("cand_id"))
    val shortlist = scored
      .join(broadcast(offs), Seq("query_id", "hamming", "bkt"))
      .withColumn("hrk", col("hoff") + row_number().over(wLocal))
      .filter(col("hrk") <= nCand)
      .select(col("query_id"), col("cand_id"), col("hamming"))
    val rer = shortlist
      .join(emb.select(col("vec_id").as("cand_id"),
        col("embedding").as("c_emb")), Seq("cand_id"))
      .join(broadcast(emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("q_emb"))), Seq("query_id"))
      .select(col("query_id"), col("cand_id"), col("hamming"),
        cosineNative(s, col("q_emb"), col("c_emb")).as("sim"))
    topKPerGroup(rer, 10, "query_id", "sim", "cand_id", col("hamming"))
      .select(col("query_id"), col("rk"), col("cand_id"),
        col("exq_payload").cast("int").as("hamming"), col("sim"))
      .orderBy("query_id", "rk")
  }

  /** q150 — product-quantization ANN (ADC scan): embeddings compress
    * 64 dims → 8 one-byte codes (M = 8 subspaces × 8 dims, K = 16
    * codes each), queries score candidates through an
    * asymmetric-distance lookup table — the billion-scale index layout
    * (IVF-PQ's second stage; q51/q139 built the first). The codebook
    * here is SAMPLED (the 16 seed vectors' sub-vectors per subspace —
    * the random-sample codebook variant), so unlike a k-means-trained
    * one it is closed-form in BOTH engines and the ENTIRE pipeline —
    * train → encode → ADC scan → top-k — is hash-exact
    * oracle-verified: all distances are integer sums over
    * microunit-quantized components (the q135 discipline). Scale
    * shape: the codebook is model-sized (128 rows, broadcast); encode
    * is a per-(vector, subspace) argmin against 16 codes — one narrow
    * broadcast join, no all-pairs; the ADC table is queries × 128. */
  /** PQ building blocks shared by q150 (sampled-codebook ADC) and
    * q162 (the composed IVF→PQ→re-rank pipeline in [[MlOps]]):
    * microunit quantization, per-subspace sub-vectors, the 16-code
    * sampled codebook (seed vectors 5..20), and the exact-integer
    * squared distance between a `sub` and a `code` column. `extra`
    * columns ride along the explode (e.g. the coarse list id). */
  private[queries] def pqBySub(emb: DataFrame,
      extra: Seq[String] = Nil): DataFrame = {
    // microunit quantization: every later distance is exact BIGINT math
    val qArr = transform(col("embedding"),
      x => floor(x.cast(DoubleType) * 1e6).cast("long"))
    val quant = emb.select(col("vec_id") +: qArr.as("q") +:
      extra.map(col): _*)
    // (m, sub) rows: the 8-dim sub-vector of each vector per subspace
    quant.select(col("vec_id") +:
      explode(transform(sequence(lit(0), lit(7)),
        m => struct(m.as("m"), slice(col("q"), m * 8 + 1, lit(8)).as("sub"))))
        .as("ms") +: extra.map(col): _*)
      .select(col("vec_id") +: col("ms.m").as("m") +:
        col("ms.sub").as("sub") +: extra.map(col): _*)
  }

  /** Sampled codebook: seed vectors 5..20 → code k = vec_id - 5. */
  private[queries] def pqCodebook(bySub: DataFrame): DataFrame =
    bySub.filter(col("vec_id") >= 5 && col("vec_id") < 21)
      .select(col("m"), (col("vec_id") - 5).cast("int").as("k"),
        col("sub").as("code"))

  /** Exact BIGINT squared distance between `sub` and `code`. */
  private[queries] def pqSqDist: Column = aggregate(
    zip_with(col("sub"), col("code"), (a, b) => (a - b) * (a - b)),
    lit(0L), (acc, x) => acc + x)

  def q150PqAnn(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val bySub = pqBySub(emb)
    val codebook = pqCodebook(bySub)
    val sqDist = pqSqDist
    // encode: per (candidate, subspace), the nearest code (ties -> min k)
    val wEnc = Window.partitionBy("cand_id", "m")
      .orderBy(col("d"), col("k"))
    val codes = bySub.filter(col("vec_id") >= 5)
      .join(broadcast(codebook), Seq("m"))
      .select(col("vec_id").as("cand_id"), col("m"), col("k"),
        sqDist.as("d"))
      .withColumn("rn", row_number().over(wEnc))
      .filter(col("rn") === 1)
      .select("cand_id", "m", "k")
    // ADC lookup table: exact query-to-code distances
    val dtable = bySub.filter(col("vec_id") < 5)
      .join(broadcast(codebook), Seq("m"))
      .select(col("vec_id").as("query_id"), col("m"), col("k"),
        sqDist.as("d"))
    val scored = codes.join(dtable, Seq("m", "k"))
      .groupBy("query_id", "cand_id")
      .agg(sum(col("d")).as("adc_dist"))
    // the ADC frame is one row per (query, candidate) — corpus-sized,
    // so the top-10 rides the ascending bounded heap, not a per-query
    // window (ADC distances < 2^53, exact in the heap's double)
    bottomKPerGroup(scored, 10, "query_id", "adc_dist", "cand_id", lit(0L))
      .select(col("query_id"), col("rk"), col("cand_id"),
        col("adc_dist").cast(LongType).as("adc_dist"))
      .orderBy("query_id", "rk")
  }

  /** q153 — quantile (rank) normalization of embedding features: each
    * dimension's values are replaced by their rank within that
    * dimension — the distribution-free feature normalization that
    * makes heterogeneous features comparable (and the batch form of
    * what a feature store recomputes per snapshot). Determinism: ranks
    * use (value, vec_id) ordering so ties break identically in both
    * engines, and the per-vector summary aggregates INTEGER ranks
    * (exact, order-independent) before one double division.
    *
    * Shape: one posexplode (64 × n rows), then TWO-PHASE per-dim
    * ranking (the q195/q155 recipe — a `PARTITION BY i` window would
    * sort every dimension's full value column in one task each, 64
    * tasks however many vectors exist): per-dim min/max (a 64-row
    * broadcast aggregate, deterministic so both its consumers compute
    * identical bucket maps in-plan — no driver round-trip needed)
    * defines equal-width score buckets scaling with the cluster,
    * per-(i, bucket) counts become broadcast exclusive offsets via a
    * window over that aggregated frame, and the rank window runs
    * inside (i, bucket) — 64×buckets-way parallel. (value, vec_id) is
    * unique, equal values share a bucket, so offset + local rank IS
    * the per-dim rank and the DuckDB one-window oracle is unchanged
    * bit-for-bit. */
  def q153QuantileNorm(s: SparkSession, dir: String): DataFrame = {
    val n = Tables.embeddings(s, dir).count()
    val el = Tables.embeddings(s, dir)
      .select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("i", "x")))
    val nBuckets = s.sparkContext.defaultParallelism.max(16) * 2
    val stats = el.groupBy("i")
      .agg(min(col("x")).as("xlo"), max(col("x")).as("xhi"))
    val width = (col("xhi") - col("xlo")) / nBuckets
    val bucketed = el.join(broadcast(stats), "i")
      .withColumn("bkt", when(col("xhi") > col("xlo"),
        least(floor((col("x") - col("xlo")) / width),
          lit(nBuckets - 1L))).otherwise(lit(0L)).cast("long"))
      .select(col("vec_id"), col("i"), col("x"), col("bkt"))
    val offs = bucketed.groupBy("i", "bkt").agg(count(lit(1)).as("bn"))
      .withColumn("off", coalesce(sum(col("bn")).over(
        Window.partitionBy("i").orderBy("bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("i"), col("bkt"), col("off"))
    val w = Window.partitionBy("i", "bkt").orderBy(col("x"), col("vec_id"))
    bucketed.join(broadcast(offs), Seq("i", "bkt"))
      .select(col("vec_id"),
        (col("off") + rank().over(w) - 1).cast("long").as("rk"))
      .groupBy("vec_id")
      .agg(sum(col("rk")).as("sum_rank"),
        min(col("rk")).as("min_rank"), max(col("rk")).as("max_rank"))
      .select(col("vec_id"), col("sum_rank"), col("min_rank"),
        col("max_rank"),
        (col("sum_rank").cast(DoubleType) / lit(Dims.toDouble)
          / lit((n - 1).toDouble)).as("mean_quantile"))
      .orderBy("vec_id")
  }

  /** q154 — calibration table (the reliability-diagram data): vectors
    * score by feature dim 0, the score is cut into DECILE bins at the
    * EXACT percentile boundaries (bit-identical to the built-in
    * `percentile`, whose DuckDB `quantile_cont` equivalence is already
    * hash-proven), and each bin reports its empirical outcome rate
    * (outcome = label ≥ 5) — how an eval pipeline checks that scores
    * mean what they claim. Scale shape: the 9 boundaries come from
    * [[graft.operators.ExactQuantiles]] — a GLOBAL built-in
    * `percentile` would buffer every distinct score in one aggregation
    * buffer; the two-phase form ranks the score histogram in parallel
    * — then ride back as one broadcast row (9 doubles — never a global
    * rank window); binning is a per-row comparison fold; the table is
    * 10 rows. Exact: bin counts are integers, pos_rate one int/int
    * division. */
  def q154Calibration(s: SparkSession, dir: String): DataFrame = {
    val scored = Tables.embeddings(s, dir)
      .select(col("vec_id"),
        element_at(col("embedding"), 1).cast(DoubleType).as("x"),
        (col("label").cast("int") >= 5).cast("int").as("y"))
    val decs = (1 to 9).map(i => s"exq_b$i" -> i / 10.0)
    // released lifecycle: the decile pass drops its input-sized
    // histogram cache before q154 returns; only the 1-row boundary
    // snapshot stays cached (ExactQuantiles "Cache lifecycle")
    val bounds = graft.operators.ExactQuantiles
      .quantilesReleased(scored, Nil, "x", decs, keep = decs.map(_._1))
      .select(array(decs.map(d => col(d._1)): _*).as("bs"))
    scored.crossJoin(broadcast(bounds))
      .select(col("y"),
        aggregate(col("bs"), lit(0),
          (acc, b) => acc + when(col("x") > b, 1).otherwise(0)).as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("y")).cast("long").as("n_pos"))
      .select(col("bin"), col("n"), col("n_pos"),
        (col("n_pos").cast(DoubleType) / col("n")).as("pos_rate"))
      .orderBy("bin")
  }

  // ---------------------------------------------------------------- q207

  private val MatryoshkaDims = 16

  /** q207 — Matryoshka truncation-recall audit (Kusupati et al.,
    * NeurIPS'22): re-rank every query with only the FIRST 16 of 64
    * embedding dimensions and measure, per query, how much of the
    * full-precision top-10 survives (set overlap + whether the true
    * top-1 is retained). This is the measurement behind the
    * "store a prefix, rerank with the tail" memory/latency trade every
    * large vector store now offers — run it before shipping truncated
    * vectors, not after.
    *
    * Shape: two broadcast-query scans (the q40 machinery at 64 and 16
    * dims — candidate-side one pass each) + a top-10-sized join and a
    * query-grain aggregate. Exactness: both rankings come from the
    * same left-associated native cosine fold as q40 (bit-exact vs the
    * oracle's unrolled sums), and the overlap/retention outputs are
    * pure integer/boolean aggregates over those exact rankings. */
  def q207MatryoshkaRecall(s: SparkSession, dir: String): DataFrame = {
    val full = q40CosineTopK(s, dir)
      .select(col("query_id"), col("rk").as("rk_full"), col("cand_id"))
    val emb = Tables.embeddings(s, dir)
    val queries16 = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"),
        slice(col("embedding"), 1, MatryoshkaDims).as("q_emb"))
    val cands16 = emb.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("cand_id"),
        slice(col("embedding"), 1, MatryoshkaDims).as("c_emb"))
    val scored16 = cands16.crossJoin(broadcast(queries16))
      .select(col("query_id"), col("cand_id"),
        cosineNative(s, col("q_emb"), col("c_emb")).as("sim"))
    // the truncated ranking rides the same bounded heap as q40's
    val trunc = topKPerGroup(scored16, 10, "query_id", "sim", "cand_id",
      lit(0L))
      .select(col("query_id"), col("cand_id"), col("rk").as("rk_trunc"))
    full.join(trunc, Seq("query_id", "cand_id"), "left")
      .groupBy("query_id")
      .agg(count(when(col("rk_trunc").isNotNull, 1)).as("n_overlap"),
        max(when(col("rk_full") === 1, col("rk_trunc").isNotNull))
          .as("top1_kept"))
      .orderBy("query_id")
  }

  // ---------------------------------------------------------------- q211

  private val SemDedupTau = 0.35

  /** q211 — SemDeDup-shaped semantic dedup (Abbas et al., 2023): the
    * pairwise cosine pass runs ONLY within a cluster, never across the
    * corpus. Here `label` stands in for the k-means cluster id (the
    * paper partitions into ~√n clusters first — q135/q139 hold that
    * machinery); each vector with a higher-priority (lower vec_id)
    * same-cluster neighbor at cosine ≥ τ is reported with the neighbor
    * it would be deduplicated against.
    *
    * Scale shape: one shuffle of the embedding table on the cluster
    * key, then cluster-local pairwise — candidate volume is
    * Σ |cluster|², which the upstream clustering step is sized to keep
    * near-linear (√n clusters of √n vectors ⇒ O(n^1.5) worst case,
    * O(n·c̄) in practice). No corpus-wide cross join exists in the
    * plan at any scale. Exactness: the same left-fold native cosine as
    * q40, so τ-threshold comparisons are bit-identical vs the oracle's
    * unrolled 64-term sums.
    *
    * Output: one row per DROPPED vector — its cluster, the lowest-id
    * duplicate target, how many same-cluster neighbors exceeded τ, and
    * the strongest similarity seen (max over doubles: order-free). */
  def q211SemDedup(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val a = emb.select(col("label"), col("vec_id"), col("embedding").as("a_emb"))
    val b = emb.select(col("label"), col("vec_id").as("b_id"),
      col("embedding").as("b_emb"))
    a.join(b, Seq("label"))
      .filter(col("b_id") < col("vec_id"))
      .select(col("label"), col("vec_id"), col("b_id"),
        cosineNative(s, col("a_emb"), col("b_emb")).as("sim"))
      .filter(col("sim") >= SemDedupTau)
      .groupBy("label", "vec_id")
      .agg(min(col("b_id")).as("dup_of"),
        count(lit(1)).as("n_dups"),
        max(col("sim")).as("best_sim"))
      .orderBy("vec_id")
  }

  private def SemDedupSql: String =
    s"""SELECT a.label, a.vec_id, min(b.vec_id) AS dup_of,
       |  count(*) AS n_dups,
       |  max((0.0 + ${dotSql("a", "b")}) /
       |    (sqrt(0.0 + ${normSqSql("a")}) * sqrt(0.0 + ${normSqSql("b")})))
       |    AS best_sim
       |FROM embeddings a, embeddings b
       |WHERE a.label = b.label AND b.vec_id < a.vec_id
       |  AND (0.0 + ${dotSql("a", "b")}) /
       |    (sqrt(0.0 + ${normSqSql("a")}) * sqrt(0.0 + ${normSqSql("b")}))
       |    >= $SemDedupTau
       |GROUP BY a.label, a.vec_id ORDER BY a.vec_id""".stripMargin

  // ---------------------------------------------------------------- q212

  /** q212 — late-interaction MaxSim retrieval (ColBERT, Khattab &
    * Zaharia, SIGIR'20): a query is a BAG of token vectors (vec_id<8
    * here), a document is the bag of vectors sharing a `label`, and
    * score(doc) = Σ_q max_d cos(q, d) — each query token finds its best
    * match in the document independently.
    *
    * Scale shape: the 8 query-token vectors broadcast; the corpus is
    * scanned ONCE producing (doc, token, sim) with map-side partial
    * max, then two tiny aggregations (docs × 8, then docs). No shuffle
    * touches raw embeddings. The Σ-of-max is summed as floor(·×1e9)
    * BIGINTs so the total is addition-order-free and hash-comparable —
    * the trick that makes a float scoring function oracle-verifiable.
    *
    * Output: per document-label its token count, MaxSim score, and
    * dense retrieval rank. */
  def q212MaxSim(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val qtok = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("tok_id"), col("embedding").as("q_emb"))
    val cands = emb.filter(col("vec_id") >= 8)
      .select(col("label"), col("embedding").as("c_emb"))
    val perTok = cands.crossJoin(broadcast(qtok))
      .select(col("label"), col("tok_id"),
        cosineNative(s, col("q_emb"), col("c_emb")).as("sim"))
      .groupBy("label", "tok_id")
      .agg(max(col("sim")).as("tok_max"))
    val scored = perTok.groupBy("label")
      .agg(sum(floor(col("tok_max") * lit(1e9))).as("score_s"),
        count(lit(1)).as("n_toks"))
      .select(col("label"), col("n_toks"),
        (col("score_s") / lit(1e9)).as("maxsim"))
    scored
      .withColumn("rk", row_number().over(
        Window.orderBy(col("maxsim").desc, col("label"))).cast("int"))
      .orderBy("rk")
  }

  private def MaxSimSql: String =
    s"""WITH pt AS (
       |  SELECT c.label, q.vec_id AS tok_id,
       |    max((0.0 + ${dotSql("q", "c")}) /
       |      (sqrt(0.0 + ${normSqSql("q")}) * sqrt(0.0 + ${normSqSql("c")})))
       |      AS tok_max
       |  FROM embeddings c, embeddings q
       |  WHERE q.vec_id < 8 AND c.vec_id >= 8
       |  GROUP BY c.label, q.vec_id),
       |scored AS (
       |  SELECT label, count(*) AS n_toks,
       |    CAST(CAST(sum(CAST(floor(tok_max * 1e9) AS BIGINT)) AS BIGINT)
       |      AS DOUBLE) / 1e9 AS maxsim
       |  FROM pt GROUP BY label)
       |SELECT label, n_toks, maxsim,
       |  CAST(row_number() OVER (ORDER BY maxsim DESC, label) AS INTEGER)
       |    AS rk
       |FROM scored ORDER BY rk""".stripMargin

  // ---------------------------------------------------------------- q213

  /** q213 — nDCG@10 retrieval-quality audit over q40's exact top-10:
    * a candidate is relevant iff it shares the query vector's `label`;
    * DCG = Σ rel/log₂(rk+1), IDCG re-ranks the same hits into the top
    * positions, nDCG = DCG/IDCG. The eval every retrieval change ships
    * against — run ON the engine rather than exporting rankings.
    *
    * Exactness: ranks are integers from the bit-exact q40 ranking, so
    * every 1/log₂(rk+1) term is the same IEEE double on both sides;
    * terms are summed as floor(·×1e9) BIGINTs (order-free), and nDCG
    * is a single BIGINT/BIGINT division at the end. The IDCG spine is
    * a broadcast 10-row table joined on i ≤ hits — no correlated
    * subquery, no per-row recursion. */
  def q213Ndcg(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val qlab = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("label").as("q_label"))
    val perQ = q40CosineTopK(s, dir)
      .join(broadcast(qlab), Seq("query_id"))
      .withColumn("rel", (col("label") === col("q_label")).cast("int"))
      .withColumn("gain",
        when(col("rel") === 1,
          floor(lit(1e9) / log2(col("rk") + lit(1)))).otherwise(lit(0L)))
      .groupBy("query_id")
      .agg(sum(col("gain")).as("dcg_s"), sum(col("rel")).as("hits"))
    val spine = s.range(1, 11)
      .select(col("id").as("i"),
        floor(lit(1e9) / log2(col("id") + lit(1))).as("g"))
    perQ.join(broadcast(spine), col("i") <= col("hits"), "left")
      .groupBy("query_id", "dcg_s", "hits")
      .agg(coalesce(sum(col("g")), lit(0L)).as("idcg_s"))
      .select(col("query_id"), col("hits"),
        (col("dcg_s") / lit(1e9)).as("dcg"),
        when(col("idcg_s") > 0,
          col("dcg_s").cast(DoubleType) / col("idcg_s").cast(DoubleType))
          .otherwise(lit(0.0)).as("ndcg"))
      .orderBy("query_id")
  }

  private def NdcgSql: String =
    s"""WITH top AS (
       |  SELECT query_id, rk, cand_id, label FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS cand_id, c.label,
       |      CAST(row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY (0.0 + ${dotSql("q", "c")}) /
       |          (sqrt(0.0 + ${normSqSql("q")}) * sqrt(0.0 + ${normSqSql("c")}))
       |          DESC, c.vec_id) AS INTEGER) AS rk
       |    FROM embeddings q, embeddings c
       |    WHERE q.vec_id < 5 AND c.vec_id >= 5) t
       |  WHERE rk <= 10),
       |perq AS (
       |  SELECT t.query_id,
       |    CAST(sum(CASE WHEN t.label = ql.label
       |      THEN CAST(floor(1e9 / log2(t.rk + 1)) AS BIGINT)
       |      ELSE 0 END) AS BIGINT) AS dcg_s,
       |    CAST(sum(CASE WHEN t.label = ql.label THEN 1 ELSE 0 END)
       |      AS BIGINT) AS hits
       |  FROM top t JOIN embeddings ql ON ql.vec_id = t.query_id
       |  GROUP BY t.query_id),
       |spine AS (
       |  SELECT unnest(range(1, 11)) AS i),
       |idcg AS (
       |  SELECT p.query_id, p.dcg_s, p.hits,
       |    coalesce(CAST(sum(CAST(floor(1e9 / log2(s.i + 1)) AS BIGINT))
       |      AS BIGINT), 0) AS idcg_s
       |  FROM perq p LEFT JOIN spine s ON s.i <= p.hits
       |  GROUP BY p.query_id, p.dcg_s, p.hits)
       |SELECT query_id, hits, CAST(dcg_s AS DOUBLE) / 1e9 AS dcg,
       |  CASE WHEN idcg_s > 0
       |    THEN CAST(dcg_s AS DOUBLE) / CAST(idcg_s AS DOUBLE)
       |    ELSE 0.0 END AS ndcg
       |FROM idcg ORDER BY query_id""".stripMargin

  // ---------------------------------------------------------------- q217

  /** q217 — linear-kernel MMD² drift matrix between label populations
    * (Gretton et al., JMLR'12): MMD²_lin(A,B) = ‖μ_A − μ_B‖², the
    * embedding-space two-sample statistic behind "did this source's
    * distribution move" checks on training corpora — the multivariate
    * complement of q145's univariate PSI.
    *
    * Scale shape: ONE pass over the corpus — posexplode to
    * (label, dim, value), then a (labels×64)-group partial-aggregated
    * sum; the pairwise stage joins two copies of that tiny per-dim
    * mean frame (bounded by label count, not corpus size). Exactness:
    * per-dim sums are floor(v·1e6) BIGINTs (order-free), means are a
    * deterministic BIGINT/DOUBLE division, and the 64-term ‖·‖² is
    * summed as floor(·×1e12) BIGINTs — the whole statistic is integer
    * arithmetic plus two exact divisions, so it hash-matches. */
  def q217MmdMatrix(s: SparkSession, dir: String): DataFrame = {
    val perDim = Tables.embeddings(s, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("label", "dim")
      .agg(sum(floor(col("v").cast(DoubleType) * lit(1e6))).as("sv"),
        count(lit(1)).as("n"))
      .select(col("label"), col("dim"),
        (col("sv") / (col("n") * lit(1e6))).as("m"))
    val a = perDim.select(col("label").as("label_a"), col("dim"),
      col("m").as("ma"))
    val b = perDim.select(col("label").as("label_b"), col("dim"),
      col("m").as("mb"))
    a.join(b, Seq("dim"))
      .filter(col("label_a") < col("label_b"))
      .select(col("label_a"), col("label_b"),
        floor((col("ma") - col("mb")) * (col("ma") - col("mb")) * lit(1e12))
          .as("term"))
      .groupBy("label_a", "label_b")
      .agg((sum(col("term")) / lit(1e12)).as("mmd2"))
      .orderBy("label_a", "label_b")
  }

  private val MmdSql: String =
    """WITH perdim AS (
      |  SELECT label, dim,
      |    CAST(sum(CAST(floor(CAST(embedding[dim + 1] AS DOUBLE) * 1e6)
      |      AS BIGINT)) AS BIGINT) /
      |      (count(*) * 1e6) AS m
      |  FROM (SELECT label, embedding,
      |          CAST(unnest(range(0, 64)) AS INTEGER) AS dim
      |        FROM embeddings)
      |  GROUP BY label, dim)
      |SELECT a.label AS label_a, b.label AS label_b,
      |  CAST(sum(CAST(floor((a.m - b.m) * (a.m - b.m) * 1e12) AS BIGINT))
      |    AS BIGINT) / 1e12 AS mmd2
      |FROM perdim a JOIN perdim b
      |  ON a.dim = b.dim AND a.label < b.label
      |GROUP BY 1, 2 ORDER BY label_a, label_b""".stripMargin

  // ---------------------------------------------------------------- q224

  private val JlK = 16          // projected dimensions
  private val JlSample = 50     // vectors audited (1225 pairs)

  /** The ±1 sign matrix s(j)(i), fixed at PLAN BUILD time from md5 of
    * "jl:j:i" — both the Spark plan and the oracle SQL embed the same
    * literals from this one generator, so no cross-engine hash
    * agreement is needed at all. */
  private lazy val JlSigns: IndexedSeq[IndexedSeq[Int]] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    (0 until JlK).map(j => (0 until Dims).map { i =>
      val h = d.digest(s"jl:$j:$i".getBytes("UTF-8"))
      if ((h(0) & 1) == 0) 1 else -1
    })
  }

  /** q224 — Johnson–Lindenstrauss distance-preservation audit
    * (Achlioptas, 2003 ±1 projections): project the 64-dim embeddings
    * to 16 dims with a fixed sign matrix and measure, over all pairs
    * of a 50-vector sample, the squared-distance ratio
    * (‖p_a−p_b‖²/K) / ‖v_a−v_b‖² — expectation exactly 1, variance
    * 2/K. The audit to run before trusting any random-projection
    * shortcut (LSH bucketing, q41's hyperplanes, cheap pre-filters).
    * Output: distortion histogram (0.1-wide buckets) + each bucket's
    * min/max ratio.
    *
    * Exactness: coordinates are floor(v·1e6) BIGINTs, projections and
    * distances are integer folds (BIGINT arithmetic is order-free, so
    * compact zip_with/aggregate folds match the oracle's unrolled
    * left-assoc sums exactly — and at ~51k total lambda evals over
    * the 50-row sample the r8 anti-HOF rule doesn't bite; the
    * previous fully-unrolled select cost 3× more in codegen alone),
    * and each pair contributes ONE double division. Scale: the sample is broadcast-sized by
    * construction — at 100 TB you audit a sample, never the corpus;
    * the corpus-wide application of the projection is the 16-term
    * store write, not this audit. */
  def q224JlAudit(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(s, dir)
      .filter(col("vec_id") < JlSample)
      .select(col("vec_id"),
        transform(col("embedding"), x =>
          floor(x.cast(DoubleType) * lit(1e6)).cast(LongType)).as("vq"))
    // projections as compact zip_with/aggregate folds rather than
    // 16×64 unrolled terms: the unrolled select blew past the JVM
    // method-size codegen limit (measured 4.4 s — almost all plan
    // compile), while 50 rows × 16×64 interpreted lambda evals are
    // ~51k ops, far below the r8 HOF threshold. Safe for exactness:
    // everything is BIGINT arithmetic, so summation order is
    // irrelevant and the oracle's unrolled left-fold matches.
    val proj = base.select(
      (col("vec_id") +: (0 until JlK).map { j =>
        val signs = array(JlSigns(j).map(v => lit(v.toLong)): _*)
        aggregate(zip_with(col("vq"), signs, (x, s) => x * s),
          lit(0L), (acc, t) => acc + t).as(s"p$j")
      }): _*)
    val a = proj.columns.foldLeft(proj)((df, c) =>
      df.withColumnRenamed(c, s"a_$c"))
    val b = proj.columns.foldLeft(proj)((df, c) =>
      df.withColumnRenamed(c, s"b_$c"))
    val va = base.select(col("vec_id").as("a_vec_id"), col("vq").as("a_vq"))
    val vb = base.select(col("vec_id").as("b_vec_id"), col("vq").as("b_vq"))
    val d16 = (0 until JlK).map { j =>
      val diff = col(s"a_p$j") - col(s"b_p$j")
      diff * diff
    }.reduce(_ + _)
    val d64 = aggregate(
      zip_with(col("a_vq"), col("b_vq"), (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, t) => acc + t)
    a.join(b, col("a_vec_id") < col("b_vec_id"))
      .join(va, Seq("a_vec_id")).join(vb, Seq("b_vec_id"))
      .select(((d16.cast(DoubleType) / lit(JlK.toDouble)) /
        d64.cast(DoubleType)).as("ratio"))
      .withColumn("bucket", floor(col("ratio") * lit(10)))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_pairs"),
        min(col("ratio")).as("min_ratio"),
        max(col("ratio")).as("max_ratio"))
      .orderBy("bucket")
  }

  private def JlAuditSql: String = {
    // one projected CTE: 64 quantized coords + 16 projections, the
    // latter referencing the former via DuckDB's lateral column
    // aliases — keeps the statement ~20 KB instead of an unrolled
    // megabyte (each p_j would otherwise inline 64 floor-casts twice)
    val vqDefs = (0 until Dims).map(i =>
      s"CAST(floor(CAST(embedding[${i + 1}] AS DOUBLE) * 1e6) AS BIGINT)" +
        s" AS vq$i").mkString(",\n      |    ")
    val pDefs = (0 until JlK).map(j =>
      (0 until Dims).map(i => s"vq$i * (${JlSigns(j)(i)})")
        .mkString(" + ") + s" AS p$j").mkString(",\n      |    ")
    val d16 = (0 until JlK).map(j =>
      s"(a.p$j - b.p$j) * (a.p$j - b.p$j)").mkString(" + ")
    val d64 = (0 until Dims).map(i =>
      s"(a.vq$i - b.vq$i) * (a.vq$i - b.vq$i)").mkString(" + ")
    s"""WITH pp AS (
       |  SELECT vec_id,
       |    $vqDefs,
       |    $pDefs
       |  FROM embeddings WHERE vec_id < $JlSample),
       |ratios AS (
       |  SELECT (CAST($d16 AS DOUBLE) / ${JlK}e0)
       |    / CAST($d64 AS DOUBLE) AS ratio
       |  FROM pp a, pp b WHERE a.vec_id < b.vec_id)
       |SELECT CAST(floor(ratio * 10) AS BIGINT) AS bucket,
       |  count(*) AS n_pairs, min(ratio) AS min_ratio,
       |  max(ratio) AS max_ratio
       |FROM ratios GROUP BY 1 ORDER BY bucket""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q224_jl_audit" -> (q224JlAudit _),
    "q217_mmd_matrix" -> (q217MmdMatrix _),
    "q211_semdedup" -> (q211SemDedup _),
    "q212_maxsim" -> (q212MaxSim _),
    "q213_ndcg" -> (q213Ndcg _),
    "q207_matryoshka_recall" -> (q207MatryoshkaRecall _),
    "q154_calibration" -> (q154Calibration _),
    "q153_quantile_norm" -> (q153QuantileNorm _),
    "q150_pq_ann" -> (q150PqAnn _),
    "q148_hamming_topk" -> (q148HammingTopK _),
    "q40_cosine_topk" -> (q40CosineTopK _),
    "q41_ann_lsh" -> (q41AnnLsh _),
    "q47_embedding_neardup" -> (q47EmbeddingNeardup _),
    "q51_ann_ivf" -> (q51AnnIvf _),
    "q68_vector_norms" -> (q68VectorNorms _),
    "q69_label_centroids" -> (q69LabelCentroids _),
    "q108_covariance" -> (q108Covariance _),
    "q110_ann_pca" -> (q110AnnPca _),
  )

  /** The DuckDB oracle spells the same left-associated folds out as
    * explicit 64-term sums — bit-identical IEEE double arithmetic. */
  private def dotSqlDim(a: String, b: String, n: Int): String =
    (1 to n).map(i =>
      s"CAST($a.embedding[$i] AS DOUBLE) * CAST($b.embedding[$i] AS DOUBLE)")
      .mkString(" + ")

  private def normSqSqlDim(a: String, n: Int): String =
    (1 to n).map(i =>
      s"CAST($a.embedding[$i] AS DOUBLE) * CAST($a.embedding[$i] AS DOUBLE)")
      .mkString(" + ")

  private def dotSql(a: String, b: String): String = dotSqlDim(a, b, Dims)

  private def normSqSql(a: String): String = normSqSqlDim(a, Dims)

  private def MatryoshkaSql: String = {
    def rank(dims: Int) =
      s"""SELECT query_id, cand_id, rk FROM (
         |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |    CAST(row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY (0.0 + ${dotSqlDim("q", "c", dims)}) /
         |        (sqrt(0.0 + ${normSqSqlDim("q", dims)})
         |          * sqrt(0.0 + ${normSqSqlDim("c", dims)})) DESC,
         |        c.vec_id) AS INTEGER) AS rk
         |  FROM embeddings q, embeddings c
         |  WHERE q.vec_id < 5 AND c.vec_id >= 5) t
         |WHERE rk <= 10""".stripMargin
    s"""WITH full_rk AS (${rank(Dims)}),
       |trunc_rk AS (${rank(MatryoshkaDims)})
       |SELECT f.query_id,
       |  CAST(count(*) FILTER (WHERE t.rk IS NOT NULL) AS BIGINT)
       |    AS n_overlap,
       |  max(CASE WHEN f.rk = 1 THEN t.rk IS NOT NULL END) AS top1_kept
       |FROM full_rk f LEFT JOIN trunc_rk t
       |  ON t.query_id = f.query_id AND t.cand_id = f.cand_id
       |GROUP BY 1 ORDER BY f.query_id""".stripMargin
  }

  /** Unrolled 64-term dot/norm over ARBITRARY column expressions
    * (r16) — [[dotSqlDim]]'s discipline lifted from `alias.embedding`
    * to any array-valued SQL expression, for oracles whose vectors
    * live in CTE columns (q51's q_emb/c_emb/cent_vec). */
  private def dotSqlExpr(a: String, b: String): String =
    (1 to Dims).map(i =>
      s"CAST($a[$i] AS DOUBLE) * CAST($b[$i] AS DOUBLE)").mkString(" + ")

  private def cosSqlExpr(a: String, b: String): String =
    s"(0.0 + ${dotSqlExpr(a, b)}) / (sqrt(0.0 + ${dotSqlExpr(a, a)}) " +
      s"* sqrt(0.0 + ${dotSqlExpr(b, b)}))"

  /** q51 end-to-end in DuckDB (r16): the sampled quantizer, cosine
    * argmax assignment (ties → smaller cent_id, = the Spark side's
    * `max_by(cent_id, struct(csim, -cent_id))`), nprobe =
    * max(2, ⌈K/2⌉) probe, and the exact top-10 re-rank are ALL
    * deterministic arithmetic — no hash anywhere — so the oracle
    * re-derives the whole index path. The heap's (score DESC, id ASC)
    * order is `row_number()` under unique ids. */
  private def AnnIvfSql: String =
    s"""WITH cents AS (
       |  SELECT vec_id AS cent_id, embedding AS cent_vec FROM embeddings
       |  WHERE vec_id % 127 = 7 ORDER BY vec_id LIMIT 64),
       |np AS (SELECT greatest(2, CAST(ceil(count(*) / 2.0) AS INT)) AS nprobe
       |       FROM cents),
       |asn AS (
       |  SELECT cand_id, c_emb, cent_id FROM (
       |    SELECT cand_id, c_emb, cent_id,
       |      row_number() OVER (PARTITION BY cand_id
       |        ORDER BY csim DESC, cent_id) AS rn
       |    FROM (SELECT c.vec_id AS cand_id, c.embedding AS c_emb, k.cent_id,
       |            ${cosSqlExpr("c.embedding", "k.cent_vec")} AS csim
       |          FROM embeddings c, cents k WHERE c.vec_id >= 5))
       |  WHERE rn = 1),
       |probed AS (
       |  SELECT query_id, q_emb, cent_id FROM (
       |    SELECT query_id, q_emb, cent_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY csim DESC, cent_id) AS rn
       |    FROM (SELECT q.vec_id AS query_id, q.embedding AS q_emb, k.cent_id,
       |            ${cosSqlExpr("q.embedding", "k.cent_vec")} AS csim
       |          FROM embeddings q, cents k WHERE q.vec_id < 5)), np
       |  WHERE rn <= nprobe),
       |scored AS (
       |  SELECT p.query_id, a.cand_id,
       |    ${cosSqlExpr("p.q_emb", "a.c_emb")} AS sim
       |  FROM probed p JOIN asn a USING (cent_id))
       |SELECT query_id, rk, cand_id, sim FROM (
       |  SELECT query_id, cand_id, sim,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY sim DESC, cand_id) AS INTEGER) AS rk
       |  FROM scored) t
       |WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin

  /** q47's md5-parity hyperplane dot (r16): 64 ascending terms — the
    * same left-associated double fold as [[graft.functions
    * .Md5RhpBucket]] — with each term's ±1 sign RE-DERIVED by DuckDB
    * from the md5 parity of "rhp:<j>:<i>" (j is the hyperplane column
    * of the surrounding query; ±1 is exact in IEEE, so sign-as-
    * multiplier equals the kernel's conditional negate bit-for-bit). */
  private def md5RhpDotSqlOver(planeCol: String): String =
    (0 until Dims).map(i =>
      s"CAST(e.embedding[${i + 1}] AS DOUBLE) * (CASE WHEN " +
        s"(('0x' || substr(md5('rhp:' || $planeCol || ':' || $i), 1, 2))::INT & 1) = 1 " +
        "THEN 1 ELSE -1 END)").mkString(" + ")

  private def md5RhpDotSql: String = md5RhpDotSqlOver("j")

  /** q41 end-to-end in DuckDB (r16): corpus-derived bits/tables, the
    * md5-parity per-table signatures of [[graft.functions
    * .Md5RhpSignatures]] (hyperplane m = t·bits + j, key "rhp:m:i"),
    * Hamming-1 multi-probe expressed as its candidate-set identity
    * (∃ table t: hamming(sig_q[t], sig_c[t]) ≤ 1 — the XOR-mask probe
    * explosion is a Spark execution tactic, not a semantic), exact
    * cosine re-rank top-10. */
  private def AnnLshSql: String =
    s"""WITH geo AS (
       |  SELECT bits, greatest(12, bits - 4) AS tables FROM (
       |    SELECT greatest(8, CAST(ceil(ln(greatest(CAST(1 AS DOUBLE),
       |        CAST(count(*) AS DOUBLE) / 64)) / ln(CAST(2 AS DOUBLE)))
       |      AS INT)) AS bits
       |    FROM embeddings WHERE embedding IS NOT NULL)),
       |dots AS (
       |  SELECT e.vec_id, js.m,
       |    CASE WHEN len(e.embedding) = $Dims
       |      THEN (${md5RhpDotSqlOver("m")}) ELSE 0 END AS dot
       |  FROM embeddings e,
       |    (SELECT m FROM generate_series(0, 4095) t(m), geo
       |     WHERE m < bits * tables) js),
       |sigt AS (
       |  SELECT vec_id, m // bits AS tb,
       |    CAST(sum(CASE WHEN dot > 0 THEN (1::BIGINT << (m % bits))
       |        ELSE 0 END) AS BIGINT) AS sig
       |  FROM dots, geo GROUP BY vec_id, m // bits),
       |cand0 AS (
       |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS cand_id
       |  FROM sigt q JOIN sigt c ON q.tb = c.tb
       |    AND bit_count(xor(q.sig, c.sig)) <= 1
       |  WHERE q.vec_id < 5 AND c.vec_id >= 5),
       |scored AS (
       |  SELECT query_id, cand_id,
       |    ${cosSqlExpr("qe.embedding", "ce.embedding")} AS sim
       |  FROM cand0 JOIN embeddings qe ON qe.vec_id = query_id
       |    JOIN embeddings ce ON ce.vec_id = cand_id)
       |SELECT query_id, rk, cand_id, sim FROM (
       |  SELECT query_id, cand_id, sim,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY sim DESC, cand_id) AS INTEGER) AS rk
       |  FROM scored) t
       |WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin

  /** q47 end-to-end in DuckDB: adaptive bits from the same
    * ceil(ln(n/64)/ln 2) the Spark side computes, md5-parity bucket,
    * 1024-cap, in-bucket pairs, exact unrolled cosine ≥ 0.35. */
  private def EmbeddingNeardupSql: String =
    s"""WITH bitsq AS (
       |  SELECT greatest(8, CAST(ceil(ln(greatest(CAST(1 AS DOUBLE),
       |      CAST(count(*) AS DOUBLE) / 64)) / ln(CAST(2 AS DOUBLE)))
       |    AS INT)) AS bits
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |dots AS (
       |  SELECT e.vec_id, js.j,
       |    CASE WHEN len(e.embedding) = $Dims
       |      THEN ($md5RhpDotSql) ELSE 0 END AS dot
       |  FROM embeddings e,
       |    (SELECT j FROM generate_series(0, 62) t(j), bitsq
       |     WHERE j < bits) js
       |  WHERE e.embedding IS NOT NULL),
       |sig AS (
       |  SELECT vec_id, CAST(sum(CASE WHEN dot > 0
       |      THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM dots GROUP BY vec_id),
       |cap AS (SELECT bucket FROM sig GROUP BY bucket
       |        HAVING count(*) <= 1024),
       |pr AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM sig a JOIN cap USING (bucket)
       |  JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
       |SELECT id_a, id_b, sim FROM (
       |  SELECT id_a, id_b,
       |    (0.0 + ${dotSql("q", "c")}) /
       |      (sqrt(0.0 + ${normSqSql("q")}) * sqrt(0.0 + ${normSqSql("c")}))
       |      AS sim
       |  FROM pr JOIN embeddings q ON q.vec_id = id_a
       |    JOIN embeddings c ON c.vec_id = id_b) t
       |WHERE sim >= 0.35 ORDER BY id_a, id_b""".stripMargin

  val oracles: Map[String, String] = Map(
    "q47_embedding_neardup" -> EmbeddingNeardupSql,
    "q51_ann_ivf" -> AnnIvfSql,
    "q41_ann_lsh" -> AnnLshSql,
    "q224_jl_audit" -> JlAuditSql,
    "q217_mmd_matrix" -> MmdSql,
    "q211_semdedup" -> SemDedupSql,
    "q212_maxsim" -> MaxSimSql,
    "q213_ndcg" -> NdcgSql,
    "q207_matryoshka_recall" -> MatryoshkaSql,
    "q154_calibration" -> """
      |WITH scored AS (
      |  SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x,
      |    CASE WHEN CAST(label AS INTEGER) >= 5 THEN 1 ELSE 0 END AS y
      |  FROM embeddings),
      |b AS (
      |  SELECT quantile_cont(x,
      |    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs
      |  FROM scored),
      |binned AS (
      |  SELECT y, list_sum(list_transform(b.bs,
      |    v -> CASE WHEN x > v THEN 1 ELSE 0 END)) AS bin
      |  FROM scored, b)
      |SELECT CAST(bin AS INTEGER) AS bin, count(*) AS n,
      |  CAST(sum(y) AS BIGINT) AS n_pos,
      |  CAST(sum(y) AS DOUBLE) / count(*) AS pos_rate
      |FROM binned GROUP BY 1 ORDER BY bin""".stripMargin,
    "q153_quantile_norm" -> """
      |WITH el AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
      |    unnest(embedding) AS x
      |  FROM embeddings),
      |r AS (
      |  SELECT vec_id,
      |    rank() OVER (PARTITION BY i ORDER BY x, vec_id) - 1 AS rk
      |  FROM el),
      |g AS (
      |  SELECT vec_id, CAST(sum(rk) AS BIGINT) AS sum_rank,
      |    CAST(min(rk) AS BIGINT) AS min_rank,
      |    CAST(max(rk) AS BIGINT) AS max_rank
      |  FROM r GROUP BY vec_id),
      |nn AS (SELECT count(*) AS c FROM embeddings)
      |SELECT vec_id, sum_rank, min_rank, max_rank,
      |  CAST(sum_rank AS DOUBLE) / 64e0 / CAST(nn.c - 1 AS DOUBLE)
      |    AS mean_quantile
      |FROM g, nn ORDER BY vec_id""".stripMargin,
    "q150_pq_ann" -> """
      |WITH quant AS (
      |  SELECT vec_id, list_transform(embedding, x ->
      |    CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS q
      |  FROM embeddings),
      |bysub AS (
      |  SELECT vec_id, m, q[m*8+1 : m*8+8] AS sub
      |  FROM quant, (SELECT CAST(unnest(range(0, 8)) AS INTEGER) AS m)),
      |codebook AS (
      |  SELECT m, CAST(vec_id - 5 AS INTEGER) AS k, sub AS code
      |  FROM bysub WHERE vec_id >= 5 AND vec_id < 21),
      |enc0 AS (
      |  SELECT b.vec_id AS cand_id, b.m, c.k,
      |    list_sum(list_transform(range(1, 9), i ->
      |      (b.sub[i] - c.code[i]) * (b.sub[i] - c.code[i]))) AS d
      |  FROM bysub b JOIN codebook c ON b.m = c.m
      |  WHERE b.vec_id >= 5),
      |codes AS (
      |  SELECT cand_id, m, k FROM (
      |    SELECT cand_id, m, k, row_number() OVER (
      |      PARTITION BY cand_id, m ORDER BY d, k) AS rn FROM enc0)
      |  WHERE rn = 1),
      |dt AS (
      |  SELECT b.vec_id AS query_id, b.m, c.k,
      |    list_sum(list_transform(range(1, 9), i ->
      |      (b.sub[i] - c.code[i]) * (b.sub[i] - c.code[i]))) AS d
      |  FROM bysub b JOIN codebook c ON b.m = c.m
      |  WHERE b.vec_id < 5),
      |agg AS (
      |  SELECT query_id, cand_id, CAST(sum(d) AS BIGINT) AS adc_dist
      |  FROM codes JOIN dt USING (m, k)
      |  GROUP BY 1, 2),
      |r AS (
      |  SELECT query_id, cand_id, adc_dist, row_number() OVER (
      |    PARTITION BY query_id ORDER BY adc_dist, cand_id) AS rk
      |  FROM agg)
      |SELECT query_id, CAST(rk AS INTEGER) AS rk, cand_id, adc_dist
      |FROM r WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin,
    // two 32-bit halves keep every shifted bit positive, so DuckDB's
    // HUGEINT-summing list_sum casts back to BIGINT losslessly; the
    // shortlist width is the same max(50, ceil(n/5)) the Spark side
    // derives from its 1-row count, computed here inline; the re-rank
    // cosine is the q40 left-fold, term for term
    "q148_hamming_topk" -> s"""
      |WITH sigs AS (
      |  SELECT vec_id,
      |    CAST(list_sum(list_transform(range(1, 33), i ->
      |      CASE WHEN embedding[i] >= 0 THEN (1::BIGINT << (i - 1))
      |        ELSE 0::BIGINT END)) AS BIGINT) AS lo,
      |    CAST(list_sum(list_transform(range(33, 65), i ->
      |      CASE WHEN embedding[i] >= 0 THEN (1::BIGINT << (i - 33))
      |        ELSE 0::BIGINT END)) AS BIGINT) AS hi
      |  FROM embeddings),
      |nn AS (SELECT greatest(50, CAST(ceil(count(*) / 5e0) AS BIGINT))
      |         AS ncand
      |       FROM embeddings WHERE embedding IS NOT NULL),
      |q AS (SELECT vec_id AS query_id, lo AS q_lo, hi AS q_hi
      |      FROM sigs WHERE vec_id < 5),
      |c AS (SELECT vec_id AS cand_id, lo, hi FROM sigs WHERE vec_id >= 5),
      |d AS (
      |  SELECT query_id, cand_id,
      |    CAST(bit_count(xor(q_lo, lo)) + bit_count(xor(q_hi, hi))
      |      AS INTEGER) AS hamming
      |  FROM c CROSS JOIN q),
      |sh AS (
      |  SELECT query_id, cand_id, hamming,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY hamming, cand_id) AS hrk
      |  FROM d),
      |rer AS (
      |  SELECT s.query_id, s.cand_id, s.hamming,
      |    (0.0 + ${dotSql("qe", "ce")})
      |      / (sqrt(0.0 + ${normSqSql("qe")})
      |        * sqrt(0.0 + ${normSqSql("ce")})) AS sim
      |  FROM sh s CROSS JOIN nn
      |  JOIN embeddings qe ON qe.vec_id = s.query_id
      |  JOIN embeddings ce ON ce.vec_id = s.cand_id
      |  WHERE s.hrk <= nn.ncand),
      |r AS (
      |  SELECT query_id, cand_id, hamming, sim,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY sim DESC, cand_id) AS rk
      |  FROM rer)
      |SELECT query_id, CAST(rk AS INTEGER) AS rk, cand_id, hamming, sim
      |FROM r WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin,
    "q108_covariance" ->
      """WITH el AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
        |         CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings),
        |m AS (SELECT i, CAST(sum(CAST(floor(x * 1e9) AS BIGINT)) AS BIGINT) AS ms,
        |             count(*) AS n FROM el GROUP BY i),
        |c AS (SELECT a.i AS i, b.i AS j,
        |        CAST(sum(CAST(floor((a.x - CAST(ma.ms AS DOUBLE) / 1e9 / ma.n)
        |             * (b.x - CAST(mb.ms AS DOUBLE) / 1e9 / mb.n) * 1e9) AS BIGINT))
        |          AS BIGINT) AS cov_scaled,
        |        any_value(ma.n) AS n
        |      FROM el a JOIN el b ON a.vec_id = b.vec_id AND a.i <= b.i
        |      JOIN m ma ON ma.i = a.i JOIN m mb ON mb.i = b.i
        |      GROUP BY a.i, b.i)
        |SELECT CAST(i AS INTEGER) AS i, CAST(j AS INTEGER) AS j,
        |  cov_scaled, cov_scaled / (1e9 * n) AS cov
        |FROM c ORDER BY i, j""".stripMargin,
    "q68_vector_norms" ->
      s"""SELECT vec_id, label,
         |  CAST(len(embedding) AS INTEGER) AS dims,
         |  sqrt(0.0 + ${normSqSql("e")}) AS l2_norm,
         |  CAST(list_max(embedding) AS DOUBLE) AS max_elem,
         |  CAST(embedding[1] AS DOUBLE) / NULLIF(sqrt(0.0 + ${normSqSql("e")}), 0.0) AS e1_normalized
         |FROM embeddings e WHERE vec_id < 200 ORDER BY vec_id""".stripMargin,
    "q69_label_centroids" ->
      """SELECT label, CAST(dim AS INTEGER) AS dim, count(*) AS n,
        |  CAST(sum(CAST(floor(CAST(embedding[CAST(dim AS INTEGER) + 1] AS DOUBLE) * 1e6)
        |    AS BIGINT)) AS DOUBLE) / 1e6 / count(*) AS centroid
        |FROM (SELECT label, embedding, unnest(range(0, 8)) AS dim FROM embeddings)
        |GROUP BY label, dim ORDER BY label, dim""".stripMargin,
    "q40_cosine_topk" ->
      s"""SELECT query_id, rk, cand_id, label, sim FROM (
         |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id, c.label,
         |    (0.0 + ${dotSql("q", "c")}) /
         |      (sqrt(0.0 + ${normSqSql("q")}) * sqrt(0.0 + ${normSqSql("c")})) AS sim,
         |    CAST(row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY (0.0 + ${dotSql("q", "c")}) /
         |        (sqrt(0.0 + ${normSqSql("q")}) * sqrt(0.0 + ${normSqSql("c")})) DESC,
         |        c.vec_id) AS INTEGER) AS rk
         |  FROM embeddings q, embeddings c
         |  WHERE q.vec_id < 5 AND c.vec_id >= 5) t
         |WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin,
  )
}
