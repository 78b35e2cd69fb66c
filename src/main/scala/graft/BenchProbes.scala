package graft

import org.apache.spark.sql.SparkSession

/** The bench contention probes, shared verbatim between [[Bench]]
  * (which interleaves them with the timed run) and [[BenchCalibrate]]
  * (which records their idle-box distribution). Sharing the CODE is
  * the calibration contract: the recorded constants are only valid
  * for the exact probe that produced them, so the probe must not be
  * duplicated where it could drift.
  *
  * Decision logic stays in [[BenchCanary]] (SparkSession-free so its
  * spec can drive synthetic series); the probes live here because
  * they need a session.
  */
object BenchProbes {

  /** Scalar probe: a 1-task nation groupBy — detects whole-host
    * saturation (the r7/r8 100×-inflation mode). Reads the sf dir so
    * it exercises the same IO path as the queries. */
  def scalarOnce(spark: SparkSession, sfDir: String): Double = {
    val t0 = System.nanoTime()
    spark.read.parquet(s"$sfDir/nation.parquet")
      .groupBy("n_regionkey").count()
      .write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  /** Wide probe: fixed work spread across 32 input partitions with a
    * real shuffle behind it, independent of SPARK_GRAFT_CPUS and of
    * the data directory — sized to ~0.3 s at local[32] so steal in the
    * 1.2–1.5× band is measurable above run noise (the r12
    * scalar-canary-blind mode). */
  def wideOnce(spark: SparkSession): Double = {
    import org.apache.spark.sql.functions._
    val t0 = System.nanoTime()
    spark.range(0L, 8000000L, 1L, 32)
      .select(((col("id") * 2654435761L) % 1000003L).as("k"),
        col("id").as("v"))
      .groupBy("k").agg(count(lit(1)).as("c"), sum(col("v")).as("s"))
      .write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }
}
