package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** The delta-log discipline shared by every fold-on-read streaming
  * monitor in this package ([[AggMaintenance]], [[DriftMonitor]],
  * [[SprtMonitor]]): each micro-batch writes its derived rows into its
  * OWN `_batch_id` partition with dynamic-partition overwrite, and
  * readers fold the accumulated log.
  *
  * Why this one seam carries exactly-once on plain parquet: a replayed
  * batch (restart between sink write and checkpoint commit) re-writes
  * the SAME `_batch_id` partition, overwriting its half-write instead
  * of appending a duplicate — idempotence without a transactional
  * table format. State lives in the log, not the streaming state
  * store, so restarts need no state recovery; the trade is that reads
  * fold the log, so production compacts old deltas periodically
  * ([[graft.operators.Compaction]]).
  *
  * The DOMAIN folds stay with their monitors — this seam owns only the
  * mechanics every monitor was re-implementing: the batch-id stamp,
  * the overwrite mode, the partition layout, and the read-side type
  * restoration. */
object DeltaLog {

  /** Write one batch's delta rows into their `_batch_id` partition.
    * `singleFile` collapses model-sized deltas (one audit row, K arms)
    * to one file; leave it false for data-sized partials. */
  def writeBatch(delta: DataFrame, batchId: Long, storeDir: String,
      singleFile: Boolean = false): Unit = {
    val stamped = delta.withColumn("_batch_id", lit(batchId))
    (if (singleFile) stamped.coalesce(1) else stamped)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_batch_id")
      .parquet(storeDir)
  }

  /** foreachBatch sink: apply the monitor's per-batch derivation, then
    * [[writeBatch]] it. The derivation sees the raw micro-batch and the
    * batch id (some monitors fold the id into their rows). Start the
    * returned writer with `.start()`. */
  def sink(stream: DataFrame, storeDir: String, checkpointDir: String,
      singleFile: Boolean = false)(
      derive: (DataFrame, Long) => DataFrame): DataStreamWriter[Row] =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(derive(batch, batchId), batchId, storeDir, singleFile)
      }
      .option("checkpointLocation", checkpointDir)

  /** Read the accumulated log with `_batch_id` restored to LONG
    * (partition-column inference reads the directory value back as
    * INT, which would silently change fold/window types). */
  def read(s: SparkSession, storeDir: String): DataFrame =
    s.read.parquet(storeDir)
      .withColumn("_batch_id", col("_batch_id").cast("long"))

  /** Compact: collapse every delta with `_batch_id` ≤ `upTo` into ONE
    * folded delta stored at partition `upTo`, using the monitor's own
    * fold (counts sum, registers max, top-ks merge — compaction MUST
    * go through the same fold the reader uses, which is why it lives
    * on this seam and takes the fold as an argument). Read-side
    * results are unchanged: fold(folded prefix ∪ suffix) ≡ fold(all
    * deltas) for any associative fold. The trade is retention —
    * [[readAsOf]] below `upTo` now returns the compacted state, not
    * finer history (the usual table-format deal). Only compact
    * batches the checkpoint has committed: a replay of an uncommitted
    * batch would overwrite its partition with a raw delta again.
    *
    * The folded frame is materialized (localCheckpoint) BEFORE the
    * overwrite — partition `upTo` is both input and output. */
  def compact(s: SparkSession, storeDir: String, upTo: Long)(
      fold: DataFrame => DataFrame): Unit = {
    val folded = fold(readAsOf(s, storeDir, upTo))
      .localCheckpoint(eager = true)
    writeBatch(folded, upTo, storeDir, singleFile = true)
    val root = new java.io.File(storeDir)
    root.listFiles().filter(_.getName.startsWith("_batch_id="))
      .filter(_.getName.stripPrefix("_batch_id=").toLong < upTo)
      .foreach { dir =>
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
  }

  /** Time travel: the log as it stood after batch `batchId` committed.
    * Because every batch owns exactly its `_batch_id` partition and
    * partition pruning turns the predicate into a directory skip, any
    * monitor's fold over [[readAsOf]] IS its historical state — no
    * snapshot files, no extra bookkeeping; the log's layout already
    * encodes its own history. (A compaction that collapses old deltas
    * trades this retention away below its high-water mark — the usual
    * table-format deal.) */
  def readAsOf(s: SparkSession, storeDir: String, batchId: Long): DataFrame =
    read(s, storeDir).filter(col("_batch_id") <= batchId)
}
