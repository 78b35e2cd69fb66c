package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.queries.TextOps

/** Continuous corpus ingest with CROSS-BATCH exact dedup: documents
  * stream in, each micro-batch drops (a) in-batch duplicates and
  * (b) any doc whose normalized-text fingerprint already exists in
  * the corpus store, then appends the survivors — the
  * continuously-growing training-corpus pattern.
  *
  * The parquet store itself is the dedup state (`foreachBatch`
  * re-reads its fingerprint column per batch), so no in-memory
  * streaming state needs bounding and a restart resumes from the
  * store + checkpoint as-is. At 100 TB the per-batch anti-join reads
  * ONLY the `fp` column (columnar pruning); the standard scale-out is
  * a fingerprint-bucketed store (join pruned to matching buckets) or
  * a bloom-filter pre-filter in front of the anti-join — the batch
  * logic here is unchanged by either.
  *
  * Exactly-once: the checkpoint replays a failed batch; replay is
  * idempotent because replayed docs' fingerprints are then already in
  * the store and anti-join away — new files from later batches are
  * never dropped (fingerprints differ) and never duplicated.
  */
object CorpusIngest {

  /** Fingerprint used for identity: md5 of the normalized text (same
    * normalization the dedup queries verify — TextOps.normText). */
  private def fingerprint(text: org.apache.spark.sql.Column) =
    md5(TextOps.normText(text).cast("binary"))

  /** Streaming writer: docs (doc_id, text, …) → dedup'd parquet store. */
  def dedupIngest(docs: DataFrame, storeDir: String,
      checkpointDir: String): DataStreamWriter[Row] =
    docs.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        val s = batch.sparkSession
        val withFp = batch.withColumn("fp", fingerprint(col("text")))
          .dropDuplicates("fp")
        val fresh =
          if (storeExists(s, storeDir))
            withFp.join(s.read.parquet(storeDir).select("fp"), Seq("fp"), "left_anti")
          else withFp
        fresh.withColumn("_batch_id", lit(batchId))
          .write.mode("append").parquet(storeDir)
      }
      .option("checkpointLocation", checkpointDir)

  private[streaming] def storeExists(s: org.apache.spark.sql.SparkSession,
      dir: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    // flat stores have top-level part files; partitioned stores
    // (NearDupIngest's `_batch_id=N/`) have key=value directories
    fs.exists(path) && fs.listStatus(path).exists(f =>
      f.getPath.getName.endsWith(".parquet") ||
        (f.isDirectory && f.getPath.getName.contains("=")))
  }
}
