package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.functions.{ScoredId, TopKByScore}

/** Streaming per-group top-k maintenance — the incremental twin of the
  * q227 bounded-heap aggregate, closing the bounded-state summary
  * family (CMS cells SUM, HLL registers MAX, top-k entries MERGE):
  * each micro-batch of documents reduces to at most k rows per
  * language (its batch-local top-k), delta-logged under `_batch_id`;
  * the maintained leaderboard re-runs the same exact aggregate over
  * the accumulated ≤ k·batches rows per group. Top-k by a total order
  * is exactly mergeable — the global top-k lives inside the union of
  * per-batch top-ks — so the fold equals the batch aggregate over the
  * concatenated corpus (spec-asserted) and is idempotent under
  * replayed deltas on top of the overwrite discipline.
  *
  * Scale: a batch's delta is ≤ k rows per group however large the
  * batch; the read-side fold aggregates a k·batches-bounded frame.
  * Compaction (the usual DeltaLog deal) collapses history back to one
  * k-row partial per group. */
object TopKMaintenance {

  private val K = 5

  private def topkAgg =
    udaf(TopKByScore(K), ExpressionEncoder[ScoredId]())

  /** Batch-local per-language top-K of documents by length, exploded
    * back to (lang, score, id) rows — both the per-batch derivation
    * and the read-side fold, which is what makes the maintenance
    * exactly mergeable. */
  private def partial(docs: DataFrame): DataFrame =
    docs.groupBy("lang")
      .agg(topkAgg(col("score"), col("id")).as("top"))
      .select(col("lang"), explode(col("top")).as("e"))
      .select(col("lang"), col("e.score").as("score"), col("e.id").as("id"))

  private def docsShape(batch: DataFrame): DataFrame =
    batch.select(col("lang"), length(col("text")).cast("long").as("score"),
      col("doc_id").as("id"))

  /** Start with `.start()`: maintains the leaderboard delta log. */
  def maintain(docStream: DataFrame, storeDir: String,
      checkpointDir: String): DataStreamWriter[Row] =
    DeltaLog.sink(docStream, storeDir, checkpointDir, singleFile = true) {
      (batch, _) => partial(docsShape(batch))
    }

  /** The maintained per-language leaderboard: the SAME aggregate over
    * the accumulated partials, ranked. */
  def leaderboard(s: SparkSession, storeDir: String): DataFrame =
    partial(DeltaLog.read(s, storeDir).select("lang", "score", "id"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("lang")
          .orderBy(col("score").desc, col("id"))).cast("long"))
      .select(col("lang"), col("rank"), col("id"), col("score"))
      .orderBy("lang", "rank")
}
