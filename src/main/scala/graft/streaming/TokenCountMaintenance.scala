package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.functions.{ScoredKey, TopKByScoreKey}
import graft.queries.TextOps

/** Streaming EXACT per-language heavy hitters — the incremental twin
  * of the oracle-verified batch leaderboard (`TextOps.q210`), and the
  * exact companion of [[CmsMaintenance]] on the same seam: each
  * micro-batch tokenizes through the SAME expression as the batch
  * path and reduces to its (lang, token, batch-count) partial cells.
  * Counts are pure sums, so Σ per-batch cells ≡ the counts of the
  * concatenated corpus, and the top-8 read comes from the SAME
  * [[TopKByScoreKey]] bounded heap q210 uses — fold ≡ batch is
  * spec-asserted row-for-row against q210's own aggregate shape.
  *
  * Why the delta is count cells, not per-batch top-ks: token counts
  * are ADDITIVE across batches — a token outside every batch's local
  * top-k can still lead the global leaderboard once its counts sum —
  * so (unlike [[TopKMaintenance]]'s static scores, where top-k
  * partials merge losslessly) the exact form must keep the
  * vocabulary-grain cells. That is the honest cost of exactness at
  * streaming time, the same trade q210 documents for batch; the
  * bounded-state alternative under memory pressure is the
  * Misra-Gries sketch (q76 / `HeavyHitters`), whose n/(k+1)
  * guarantee the exact leaderboard anchors. A batch's delta is
  * bounded by the batch's OWN distinct (lang, token) pairs —
  * map-side combined, never the corpus vocabulary; compaction folds
  * history back to one cell per surviving (lang, token).
  *
  * The [[DeltaLog]] discipline carries exactly-once: a replayed batch
  * overwrites its own `_batch_id` partition instead of double-adding. */
object TokenCountMaintenance {

  private val K = 8

  private def cells(docs: DataFrame): DataFrame =
    docs.select(col("lang"),
        explode(TextOps.tokens(lower(col("text")))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("lang", "token")
      .agg(count(lit(1)).as("cnt"))

  /** Start with `.start()`: maintains the (lang, token, cnt) delta
    * log under `storeDir`. Deltas are batch-vocabulary-sized (data,
    * not model) — keep their parallel file layout. */
  def maintain(docStream: DataFrame, storeDir: String,
      checkpointDir: String): DataStreamWriter[Row] =
    DeltaLog.sink(docStream, storeDir, checkpointDir) {
      (batch, _) => cells(batch)
    }

  private def foldCells(deltas: DataFrame): DataFrame =
    deltas.groupBy("lang", "token").agg(sum(col("cnt")).as("cnt"))

  /** The maintained exact counts, folded back to one row per
    * (lang, token). */
  def counts(s: SparkSession, storeDir: String): DataFrame =
    foldCells(DeltaLog.read(s, storeDir)
      .select("lang", "token", "cnt"))

  /** The maintained top-8 leaderboard — same heap, same total order
    * (cnt DESC, token ASC in UTF-8 bytes), same output shape as
    * `q210_heavy_hitters_exact`. */
  def leaderboard(s: SparkSession, storeDir: String): DataFrame = {
    val topk = udaf(TopKByScoreKey(K), ExpressionEncoder[ScoredKey]())
    counts(s, storeDir)
      .groupBy("lang")
      .agg(topk(col("cnt"), col("token")).as("top"))
      .select(col("lang"), posexplode(col("top")).as(Seq("pos0", "e")))
      .select(col("lang"), (col("pos0") + 1).cast("long").as("rank"),
        col("e.key").as("token"), col("e.score").as("cnt"))
      .orderBy("lang", "rank")
  }

  /** Compact the log through `upTo` with the additive fold (the
    * vocabulary table is data-sized — keep the parallel layout). */
  def compactThrough(s: SparkSession, storeDir: String,
      upTo: Long): Unit =
    DeltaLog.compact(s, storeDir, upTo, singleFile = false)(foldCells)
}
