package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (one JVM — sbt forks once). */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.session
  val Sf: String = "/root/testdata/sf0.001"
}

object SparkTestBase {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // dual events.ts layout support (see Tables.events / Verify)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // AQE partition sizing for CACHED plans (r17, guide §2.2/§5):
      // by default Spark pins a cached plan's output partitioning
      // (canChangeCachedPlanOutputPartitioning=false), so every
      // persist() materializes and every cache scan re-reads the full
      // pre-AQE shuffle partition count however small the frame.
      // Enabling it gives cached plans the SAME adaptive coalescing
      // as uncached ones — partition count follows data size at every
      // scale (advisory-size-driven), not a fixed constant. Measured
      // on the persist-heavy quantile family at sf0.1: q160 7.6→4.3 s,
      // q50 2.4→2.0 s (min-of-4 paired A/B); results identical (full
      // oracle gate green under the flag).
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
