package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.queries.TextOps

/** Streaming HyperLogLog maintenance — the incremental twin of the
  * oracle-verified q223 register table, completing the sketch-family
  * symmetry (CMS cells sum, HLL registers MAX): each micro-batch of
  * documents reduces to its own ≤64-row register partial, delta-logged
  * under `_batch_id`; the maintained sketch is the per-bucket max over
  * all deltas. max is idempotent AND commutative, so the fold equals
  * the batch sketch over the concatenated corpus (spec-asserted) and
  * replayed batches cannot corrupt it even before the overwrite
  * discipline kicks in — belt and braces.
  *
  * Scale: a batch's delta is ≤64 rows no matter the batch size; the
  * fold is a 64-group max. Distinct-count monitoring over unbounded
  * streams for the price of a parquet directory. */
object HllMaintenance {

  private def tokensOf(docs: DataFrame): DataFrame =
    docs.select(explode(TextOps.tokens(lower(col("text")))).as("token"))
      .filter(col("token") =!= "")

  /** Start with `.start()`: maintains the register delta log (one
    * batch's delta = its non-zero (bucket, m_j) rows, ≤64 of them). */
  def maintain(docStream: DataFrame, storeDir: String,
      checkpointDir: String): DataStreamWriter[Row] =
    DeltaLog.sink(docStream, storeDir, checkpointDir, singleFile = true) {
      (batch, _) => TextOps.hllRegistersOf(tokensOf(batch))
    }

  /** The maintained register table: per-bucket max over all deltas,
    * absent buckets restored as 0. */
  def registers(s: SparkSession, storeDir: String): DataFrame = {
    val folded = DeltaLog.read(s, storeDir)
      .groupBy("bucket").agg(max(col("m_j")).as("m_j"))
    s.range(0, 64).select(col("id").as("bucket"))
      .join(folded, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("m_j"), lit(0)).as("m_j"))
  }

  /** The distinct-count estimate from the maintained registers —
    * identical arithmetic to the q223 batch estimate. */
  def estimate(s: SparkSession, storeDir: String): DataFrame =
    TextOps.hllEstimateOf(registers(s, storeDir))
}
