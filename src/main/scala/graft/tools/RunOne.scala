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
