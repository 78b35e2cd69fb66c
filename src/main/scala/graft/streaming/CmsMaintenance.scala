package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.queries.TextOps

/** Streaming Count-Min maintenance: the incremental twin of the
  * oracle-verified batch sketch (`TextOps.q214CountMin`). Each
  * micro-batch of documents is tokenized through the SAME expression
  * as the batch path and reduced to its (depth, bucket, cell) partial
  * cells — CMS cells are pure sums, so Σ per-batch cells ≡ the cells
  * of the concatenated corpus (asserted against the batch twin in the
  * spec). The [[DeltaLog]] discipline carries exactly-once: a replayed
  * batch overwrites its own `_batch_id` partition instead of
  * double-adding.
  *
  * Scale shape: a batch's delta is AT MOST d×w = 4×256 rows no matter
  * how many documents the batch held — the whole point of maintaining
  * a sketch instead of a vocabulary-sized count table on the hot path.
  * Readers fold the log with a 1,024-group sum; point queries reuse
  * `TextOps.cmsEstimate` against the folded cells. */
object CmsMaintenance {

  private def tokensOf(docs: DataFrame): DataFrame =
    docs.select(explode(TextOps.tokens(lower(col("text")))).as("token"))
      .filter(col("token") =!= "")

  /** Start with `.start()`: maintains the CMS delta log under
    * `storeDir`. Deltas are model-sized (≤1,024 rows) — collapse each
    * to a single file. */
  def maintain(docStream: DataFrame, storeDir: String,
      checkpointDir: String): DataStreamWriter[Row] =
    DeltaLog.sink(docStream, storeDir, checkpointDir, singleFile = true) {
      (batch, _) => TextOps.cmsCells(tokensOf(batch))
    }

  /** The maintained sketch: fold the delta log back to d×w cells. */
  def sketch(s: SparkSession, storeDir: String): DataFrame =
    foldCells(DeltaLog.read(s, storeDir))

  /** Time travel: the sketch as of `batchId` (partition-pruned). */
  def sketchAsOf(s: SparkSession, storeDir: String,
      batchId: Long): DataFrame =
    foldCells(DeltaLog.readAsOf(s, storeDir, batchId))

  private def foldCells(deltas: DataFrame): DataFrame =
    deltas.groupBy("d", "bucket").agg(sum(col("cell")).as("cell"))

  /** Estimate counts for a `token`-column key frame against the
    * maintained sketch (min over depths, never an undercount). */
  def estimate(s: SparkSession, storeDir: String,
      keys: DataFrame): DataFrame =
    TextOps.cmsEstimate(sketch(s, storeDir), keys)
}
