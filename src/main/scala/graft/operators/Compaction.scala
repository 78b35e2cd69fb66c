package graft.operators

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction for parquet directories.
  *
  * Streaming ingest (per-trigger files) and fine-grained partitioned
  * writes accumulate files far smaller than a scan-efficient size; at
  * 100 TB the file count itself becomes the bottleneck (driver-side
  * listing, task-per-file scheduling, row-group overhead). Compaction
  * rewrites a directory to ~`targetBytes` files, sized from the
  * optimizer's size estimate — no `count()` or listing pass.
  *
  * The rewrite goes to a NEW directory (swap is the caller's move —
  * rename/retarget atomically); compacting in place while reading the
  * same path is not safe on a plain filesystem.
  */
object Compaction {

  /** Rewrite `inDir` as ~`targetBytes`-sized files under `outDir`.
    * Returns the partition (≈ file) count chosen. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    val df = spark.read.parquet(inDir)
    val estimated = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val n = (estimated / targetBytes).toLong.max(1L)
      .min(Int.MaxValue.toLong).toInt
    df.repartition(n).write.mode(SaveMode.Overwrite).parquet(outDir)
    n
  }
}
