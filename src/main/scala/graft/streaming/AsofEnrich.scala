package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.AsofJoinOp

/** Streaming AS-OF enrichment: each micro-batch of fact events is
  * as-of joined (via the custom sorted-merge plan,
  * [[graft.plans.AsofJoin]]) against a reference-data store — the
  * "enrich each reading with the latest calibration/config/quote at
  * or before its timestamp" pattern, with the dimension reloaded per
  * batch so slowly-changing reference data takes effect without a
  * restart.
  *
  * Scale/semantics notes:
  *   - the dimension is re-read every batch — at 100 TB dimension
  *     scale, partition/bucket the store by the join key so the
  *     per-batch read prunes; the exec co-partitions both sides, so
  *     batch size and dimension size scale independently;
  *   - stream-side rows never wait: a batch joins against the
  *     reference versions present AT BATCH TIME (the same contract a
  *     broadcast-refresh dimension join has); late reference rows
  *     apply to later batches only;
  *   - exactly-once: output is partitioned by `_batch_id` and written
  *     with DYNAMIC partition overwrite, so a checkpoint-replayed
  *     batch overwrites its own partition instead of appending
  *     duplicates (the test replays a batch and asserts no dupes).
  */
object AsofEnrich {

  /** facts: streaming (key, ts, …); refDir: parquet dir of
    * (ref_key, ref_ts, …) reference versions. Appends enriched rows to
    * outDir. */
  def enrich(facts: DataFrame, refDir: String, outDir: String,
      checkpointDir: String, keys: Seq[(String, String)],
      time: (String, String)): DataStreamWriter[Row] =
    facts.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        val s = batch.sparkSession
        val ref = s.read.parquet(refDir)
        AsofJoinOp.asof(batch.toDF(), ref, keys, time)
          .withColumn("_batch_id", org.apache.spark.sql.functions.lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("_batch_id")
          .parquet(outDir)
      }
      .option("checkpointLocation", checkpointDir)
}
