package graft.tools

import org.apache.spark.sql.SparkSession

/** Run ONE registered query by name and print its row count — the
  * plain-launcher smoke harness. Unlike sbt-forked runs, invoking this
  * via a bare `java -cp` over target classes + the Spark jars dir
  * carries NO `--add-opens` flags, which is exactly the deployment
  * shape that exposed q76's Kryo buffer encoder in r13 (Kryo reflects
  * into `java.nio.HeapByteBuffer` internals and dies with
  * EXPRESSION_ENCODING_FAILED without `--add-opens java.base/java.nio`;
  * the aggregator now rides a native ExpressionEncoder instead).
  *
  * Usage: java -cp <classes>:<spark-jars> graft.tools.RunOne
  *          <query_name> [sfDir]
  * Exit 0 + `{"query":…,"rows":N}` on success; nonzero on any throw.
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: RunOne <query_name> [sfDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query: $name"))
    val rows = fn(spark, sfDir).count()
    println(s"""{"query":"$name","rows":$rows}""")
    spark.stop()
  }
}
