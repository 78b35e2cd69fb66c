package graft.iot

import graft.SparkTestBase

/** S3 config bootstrap + K2 JDBC sink guard semantics. */
class ConfigSessionSpec extends SparkTestBase {

  val sample: String =
    """# pipeline config (reference config.yaml shape)
      |data:
      |  input_path: "/data/input"
      |  output_path: '/data/output'
      |spark:
      |  app_name: IoTDataProcessing
      |  master: local[*]
      |  driver_memory: 4g
      |  adaptive_enabled: "true"
      |  sql.shuffle.partitions: "64"
      |  driver_class_path: /jars/ch.jar
      |  jars: /jars/ch.jar
      |clickhouse:
      |  host: localhost
      |  port: "9000"
      |""".stripMargin

  test("flat-YAML parse flattens sections and strips quotes/comments") {
    val cfg = ConfigSession.parse(sample)
    assert(cfg("spark.app_name") == "IoTDataProcessing")
    assert(cfg("data.input_path") == "/data/input")
    assert(cfg("data.output_path") == "/data/output")
    assert(cfg("clickhouse.port") == "9000")
  }

  test("named keys map to spark confs, rest of spark.* passes through") {
    val confs = ConfigSession.sparkConfs(ConfigSession.parse(sample)).toMap
    assert(confs("spark.driver.memory") == "4g")
    assert(confs("spark.sql.adaptive.enabled") == "true")
    // reference passthrough re-prefixes: `sql.shuffle.partitions` under
    // `spark:` becomes conf `spark.sql.shuffle.partitions`
    assert(confs("spark.sql.shuffle.partitions") == "64")
    // handled keys are NOT passed through raw
    assert(!confs.contains("spark.app_name"))
    assert(!confs.contains("spark.master"))
    // spark-submit-level keys excluded from session conf passthrough
    assert(!confs.keys.exists(_.contains("driver_class_path")))
    assert(!confs.keys.exists(_.endsWith(".jars")))
  }

  test("runWithMetrics reports data-quality counters from the write job") {
    val out = java.nio.file.Files.createTempDirectory("graft_metrics").toString
    val m = IotPipeline.runWithMetrics(spark,
      "/root/repo/fixtures/iot_conn.csv", out)
    assert(m("rows") == 8L)
    assert(m("null_durations") == 2L)  // '-' and malformed-days rows
    assert(m("malicious_rows") == 3L)
  }

  test("JDBC sink no-ops on incomplete config (reference guard)") {
    val df = graft.Tables.nation(spark, Sf)
    assert(!IotPipeline.writeJdbc(df, Map("clickhouse.host" -> "x")))
    assert(!IotPipeline.writeJdbc(df, Map(
      "clickhouse.jdbc_url" -> "jdbc:ch://x", "clickhouse.driver" -> "d")))
  }
}
