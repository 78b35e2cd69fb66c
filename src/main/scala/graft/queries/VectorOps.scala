package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

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
object VectorOps {

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

  /** q40 — brute-force cosine top-k: queries = vec_id < 5, candidates =
    * the rest; top-10 per query by similarity (tie-broken on cand_id).
    * The query side is broadcast, so the candidate scan is one narrow
    * pass however large the corpus; the per-query top-k window shuffles
    * only (n_queries × n_candidates-surviving) rows. */
  def q40CosineTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val cands = emb.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("cand_id"), col("label"), col("embedding").as("c_emb"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("cand_id"))
    cands.crossJoin(broadcast(queries))
      .select(col("query_id"), col("cand_id"), col("label"),
        cosineNative(s, col("q_emb"), col("c_emb")).as("sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .select("query_id", "rk", "cand_id", "label", "sim")
      .orderBy("query_id", "rk")
  }

  /** Random-hyperplane signature: bit j = sign(dot(v, h_j)) where
    * hyperplane h_j's element i is ±1 from the parity of
    * xxhash64(j, i) — deterministic, seedable, no stored model. */
  private def rhpSignature(v: Column, bits: Int): Column =
    (0 until bits).map { j =>
      val dot = aggregate(
        zip_with(v, sequence(lit(0), lit(Dims - 1)), (x, i) =>
          x.cast(DoubleType) *
            when(xxhash64(lit(j), i).bitwiseAND(1) === 1, 1.0).otherwise(-1.0)),
        lit(0.0), (acc, p) => acc + p)
      when(dot > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** q41 — LSH-bucketed approximate nearest neighbors: 8-bit
    * random-hyperplane signature buckets the corpus (~256 buckets);
    * per query we probe only its own bucket and re-rank exactly by
    * cosine. Bucket sizes stay O(n/256) — at 100 TB use more bits
    * (buckets scale 2^bits) + multi-probe on neighboring signatures.
    * No oracle: ANN recall is engine/param-specific; rows-only check. */
  def q41AnnLsh(s: SparkSession, dir: String): DataFrame = {
    val bits = 8
    val emb = Tables.embeddings(s, dir)
      .withColumn("bucket", rhpSignature(col("embedding"), bits))
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("bucket"))
    val cands = emb.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("cand_id"), col("embedding").as("c_emb"),
        col("bucket"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("cand_id"))
    cands.join(broadcast(queries), Seq("bucket"))
      .select(col("query_id"), col("cand_id"),
        cosineNative(s, col("q_emb"), col("c_emb")).as("sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select("query_id", "rk", "cand_id", "sim")
      .orderBy("query_id", "rk")
  }

  /** q47 — embedding-cosine near-duplicate detection: pairs whose
    * cosine exceeds a threshold, candidates generated ONLY within equal
    * 8-bit random-hyperplane buckets (high-cosine pairs land in the
    * same bucket with high probability; multi-probe neighboring
    * signatures raises recall at scale). The full-corpus variant of
    * q41's query-probe shape — the embedding-space dedup a training
    * pipeline runs before training. Rows-only (hash-parameterized). */
  def q47EmbeddingNeardup(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
      .withColumn("bucket", rhpSignature(col("embedding"), 8))
    val a = emb.select(col("bucket"), col("vec_id").as("id_a"),
      col("embedding").as("e_a"))
    val b = emb.select(col("bucket"), col("vec_id").as("id_b"),
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

  /** q51 — IVF-style ANN: a coarse quantizer partitions the corpus into
    * inverted lists; queries probe the `nprobe` nearest lists and
    * re-rank exactly. The quantizer here is a deterministic sample of
    * corpus vectors (`vec_id % 31 == 7`, K ≈ n/31 — production trains
    * k-means centroids, but the index structure, assignment and probe
    * path are identical). At 100 TB: lists are written partitioned by
    * `cent_id`, so a query touches `nprobe` partitions instead of the
    * corpus — partition pruning does the candidate cut. Rows-only. */
  def q51AnnIvf(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    // K ≈ n/127 ~ √n at these corpus sizes — real IVF sizes K ~ √n
    val centroids = emb.filter(col("vec_id") % 127 === 7)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_vec"))
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
    // the (tiny) query side probes its nprobe nearest lists via a window
    val probed = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .crossJoin(broadcast(centroids))
      .select(col("query_id"), col("q_emb"), col("cent_id"),
        cosineNative(s, col("q_emb"), col("cent_vec")).as("csim"))
      .withColumn("crk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("csim").desc, col("cent_id"))))
      .filter(col("crk") <= 2)
      .drop("csim", "crk")
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("cand_id"))
    lists.join(broadcast(probed), Seq("cent_id"))
      .select(col("query_id"), col("cand_id"),
        cosineNative(s, col("q_emb"), col("c_emb")).as("sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select("query_id", "rk", "cand_id", "sim")
      .orderBy("query_id", "rk")
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
        (element_at(col("embedding"), 1).cast(DoubleType) /
          sqrt(normSqD(col("embedding")))).as("e1_normalized"))
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_cosine_topk" -> (q40CosineTopK _),
    "q41_ann_lsh" -> (q41AnnLsh _),
    "q47_embedding_neardup" -> (q47EmbeddingNeardup _),
    "q51_ann_ivf" -> (q51AnnIvf _),
    "q68_vector_norms" -> (q68VectorNorms _),
    "q69_label_centroids" -> (q69LabelCentroids _),
  )

  /** The DuckDB oracle spells the same left-associated folds out as
    * explicit 64-term sums — bit-identical IEEE double arithmetic. */
  private def dotSql(a: String, b: String): String =
    (1 to Dims).map(i =>
      s"CAST($a.embedding[$i] AS DOUBLE) * CAST($b.embedding[$i] AS DOUBLE)")
      .mkString(" + ")

  private def normSqSql(a: String): String =
    (1 to Dims).map(i =>
      s"CAST($a.embedding[$i] AS DOUBLE) * CAST($a.embedding[$i] AS DOUBLE)")
      .mkString(" + ")

  val oracles: Map[String, String] = Map(
    "q68_vector_norms" ->
      s"""SELECT vec_id, label,
         |  CAST(len(embedding) AS INTEGER) AS dims,
         |  sqrt(0.0 + ${normSqSql("e")}) AS l2_norm,
         |  CAST(list_max(embedding) AS DOUBLE) AS max_elem,
         |  CAST(embedding[1] AS DOUBLE) / sqrt(0.0 + ${normSqSql("e")}) AS e1_normalized
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
