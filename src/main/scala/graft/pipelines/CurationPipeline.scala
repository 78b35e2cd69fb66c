package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.{ExtendedOps, TextOps}

/** The end-to-end training-data curation pipeline, composed from the
  * oracle-verified operator registry — the product use case the
  * individual operators exist for:
  *
  *   1. normalize text (lowercase, collapse whitespace — q53's pass);
  *   2. quality filter: ≥ 20 whitespace tokens (q34's signal family);
  *   3. exact dedup: keep the min doc_id per normalized text (q30);
  *   4. near-dup clustering: n-gram Jaccard pairs ≥ 0.5 (q45) →
  *      connected components (q67) → keep each cluster's min-id
  *      representative, pass unclustered docs through;
  *   5. chunk the surviving docs' normalized text into 200-char
  *      windows with 50-char overlap (q52's chunker).
  *
  * Every stage is deterministic, so the WHOLE pipeline is
  * DuckDB-oracle-checkable (q80) — the composition itself is under
  * the correctness gate, not just its pieces.
  *
  * Scale posture is inherited from the pieces: one shuffle per
  * aggregate stage, the pair stage is blocked (never all-pairs), the
  * cluster loop is O(log diameter) rounds, and chunking is a narrow
  * explode.
  */
object CurationPipeline {

  /** Docs surviving normalize → quality → exact dedup → near-dup
    * representative selection. Returns (doc_id, lang, norm). */
  def survivors(s: SparkSession, dir: String): DataFrame = {
    val quality = Tables.documents(s, dir)
      .withColumn("norm", TextOps.normText(col("text")))
      .filter(size(split(col("text"), "\\s+")) >= 20)
    // exact dedup: min doc_id per normalized text
    val keepIds = quality.groupBy("norm").agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    // materialized once: the exact-dedup survivor set feeds the pair
    // stage, the component-label join AND the final chunking pass —
    // without the barrier each consumer re-runs scan+filter+dedup.
    // Pruned to the union of the consumers' columns BEFORE the
    // persist: a cache stores every column it is handed (the width
    // census, plans/WidthGuard), and the raw join would drag the full
    // `text` body plus `source` into the cache for nobody — at corpus
    // scale that cache is ~2× the survivors' text for zero reads
    val exact = quality.join(keepIds, Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("n_chars"), col("norm"))
      .persist()
    // near-dup clusters over the exact-dedup survivors: same pair
    // stage as q45 but restricted to survivors, then q67's component
    // labels; a doc survives iff it is its cluster's min-id rep (or
    // appears in no pair at all)
    val pairs = TextOps.ngramJaccardPairsOf(
      exact.select(col("doc_id"), col("lang"), col("n_chars"), col("norm")), 0.5)
      .select("id_a", "id_b")
    val labels = ExtendedOps.connectedComponents(pairs)
    exact.join(labels, exact("doc_id") === labels("id"), "left")
      .filter(col("id").isNull || col("cluster_id") === col("doc_id"))
      .select(exact("doc_id"), col("lang"), col("norm"))
  }

  /** Full pipeline: survivors chunked for context windows (q52's
    * shared chunk generator over the NORMALIZED text). */
  def run(s: SparkSession, dir: String): DataFrame =
    survivors(s, dir)
      .select(col("doc_id"), col("lang"), TextOps.chunkCols(col("norm")))
      .select(col("doc_id"), col("lang"), col("pos").as("chunk_idx"),
        length(col("col")).as("chunk_len"),
        md5(col("col").cast("binary")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q80_curation_pipeline" -> (run _),
  )

  /** The composed oracle: the whole five-stage pipeline spelled as one
    * DuckDB query (quality filter → exact dedup → blocked Jaccard
    * pairs → recursive-CTE components → representative chunking). */
  val oracles: Map[String, String] = Map(
    "q80_curation_pipeline" ->
      """WITH RECURSIVE
        |norm0 AS (
        |  SELECT doc_id, lang, n_chars,
        |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS n
        |  FROM documents
        |  WHERE len(string_split_regex(text, '\s+')) >= 20),
        |keep AS (SELECT min(doc_id) AS doc_id FROM norm0 GROUP BY n),
        |surv AS (SELECT norm0.* FROM norm0 JOIN keep USING (doc_id)),
        |grams AS (
        |  SELECT doc_id, lang, CAST(floor(n_chars / 64) AS BIGINT) AS szbucket,
        |    list_distinct(list_transform(range(1, length(n) - 1),
        |      i -> substring(n, i, 3))) AS g
        |  FROM surv),
        |pr AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM grams a JOIN grams b
        |    ON a.lang = b.lang AND a.szbucket = b.szbucket AND a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
        |        / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) >= 0.5),
        |edges AS (SELECT id_a AS s, id_b AS d FROM pr
        |          UNION SELECT id_b, id_a FROM pr),
        |reach AS (SELECT s AS id, d AS r FROM edges
        |          UNION
        |          SELECT e.s, r.r FROM edges e JOIN reach r ON e.d = r.id),
        |comp AS (SELECT id, least(id, min(r)) AS rep FROM reach GROUP BY id),
        |reps AS (
        |  SELECT surv.doc_id, surv.lang, surv.n
        |  FROM surv LEFT JOIN comp ON surv.doc_id = comp.id
        |  WHERE comp.id IS NULL OR comp.rep = surv.doc_id)
        |SELECT doc_id, lang, CAST(i AS INTEGER) AS chunk_idx,
        |  CAST(length(substring(n, CAST(i AS INTEGER) * 150 + 1, 200)) AS INTEGER) AS chunk_len,
        |  md5(substring(n, CAST(i AS INTEGER) * 150 + 1, 200)) AS chunk_md5
        |FROM (SELECT doc_id, lang, n, unnest(range(0,
        |        CAST(1 + floor((length(n) - 1) / 150) AS BIGINT))) AS i
        |      FROM reps)
        |ORDER BY doc_id, chunk_idx""".stripMargin,
  )
}
