package graft.iot

import java.nio.file.Files

import graft.SparkTestBase

/** Malformed-input semantics of the S1 CSV scan — the contract a 39 GB
  * (or 100 TB) crawl of real Zeek logs depends on: one corrupt cell
  * must never fail the job NOR silently drop the whole row.
  * (PERMISSIVE is Spark's default; these tests pin it against
  * regression, since a stray `mode` option would change ingest
  * semantics silently.) */
class IotPipelineSpec extends SparkTestBase {

  private def writeCsv(lines: String*): String = {
    val dir = Files.createTempDirectory("graft_csv").toString
    Files.write(java.nio.file.Paths.get(dir, "conn.log.labeled.csv"),
      lines.mkString("\n").getBytes)
    dir
  }

  private val header = IotSchema.raw.fields.map(_.name).mkString(",")
  // a fully well-formed row (22 cols, matching types)
  private val good =
    "C1,192.168.1.1,1024,10.0.0.1,80,tcp,http,1.5,100,200,SF,T,F,0,Dd,2,140,2,240,-,Benign,-"

  test("an unparseable numeric cell nulls the CELL, not the row") {
    // orig_bytes (col 9, LongType) = "garbage"
    val bad =
      "C2,192.168.1.2,1024,10.0.0.1,80,tcp,http,1.5,garbage,200,SF,T,F,0,Dd,2,140,2,240,-,Benign,-"
    val df = IotPipeline.readCsv(spark, writeCsv(header, good, bad))
    val rows = df.collect().map(r => r.getAs[String]("uid") ->
      Option(r.getAs[java.lang.Long]("orig_bytes"))).toMap
    assert(rows("C1") === Some(100L))
    assert(rows("C2") === None) // cell nulled, row kept
  }

  test("a short row fills missing trailing columns with NULL") {
    val short = "C3,192.168.1.3,1024,10.0.0.1,80,tcp" // 6 of 22 cols
    val df = IotPipeline.readCsv(spark, writeCsv(header, good, short))
    val r = df.filter(df("uid") === "C3").collect().head
    assert(r.getAs[String]("proto") === "tcp")
    assert(r.getAs[String]("label") == null)
    assert(Option(r.getAs[java.lang.Long]("orig_bytes")).isEmpty)
  }

  test("the Zeek '-' unset marker maps to NULL in every column type") {
    val dashes =
      "C4,-,-,-,-,-,-,-,-,-,-,-,-,-,-,-,-,-,-,-,-,-"
    val df = IotPipeline.readCsv(spark, writeCsv(header, dashes))
    val r = df.collect().head
    assert(r.getAs[String]("uid") === "C4")
    IotSchema.raw.fields.drop(1).foreach { f =>
      assert(r.isNullAt(df.schema.fieldIndex(f.name)), s"${f.name} not null")
    }
  }

  // ---- K2 JDBC sink: round-trip against a REAL JDBC endpoint --------
  // The reference's JDBC path (`process_iot_data.py:190-232`) is dead
  // code guarded on config completeness; r8 tested only the guard. The
  // sandbox has no ClickHouse, but Apache Derby's embedded engine ships
  // in /opt/spark/jars (and Spark carries a DerbyDialect), so the full
  // batched write path — driver load, batched inserts, append mode,
  // env-var password sourcing fallback — is exercised against a live
  // in-memory database here, not mocked.
  private def derbyCfg(table: String) = {
    // keep Derby's derby.log out of the repo root
    System.setProperty("derby.system.home",
      Files.createTempDirectory("graft_derby").toString)
    Map(
      "clickhouse.jdbc_url" -> "jdbc:derby:memory:graftjdbc;create=true",
      "clickhouse.driver" -> "org.apache.derby.jdbc.EmbeddedDriver",
      "clickhouse.table" -> table,
      // batchsize below the row count forces MULTIPLE insert batches
      // through the same executeBatch path a 100k-row ClickHouse load
      // would take
      "clickhouse.batchsize" -> "2")
  }

  private def readBack(table: String) =
    spark.read.format("jdbc")
      .option("url", "jdbc:derby:memory:graftjdbc;create=true")
      // same user as the writer: Derby resolves unqualified tables in
      // the schema named after the connection user
      .option("user", "default")
      .option("dbtable", table)
      .load()

  test("writeJdbc round-trips rows through an embedded JDBC database") {
    val dir = writeCsv(header, good,
      good.replace("C1", "C9"), good.replace("C1", "C8"))
    val out = Transforms.transform(IotPipeline.readCsv(spark, dir))
    // CLICKHOUSE_PASSWORD is unset in this environment: the env-var
    // sourcing falls back to "" (the reference's os.environ.get default,
    // `process_iot_data.py:201`) and Derby, like a default-auth
    // ClickHouse, accepts the connection — proving the fallback path.
    assert(sys.env.get("CLICKHOUSE_PASSWORD").isEmpty)
    assert(IotPipeline.writeJdbc(out, derbyCfg("IOT_JDBC_RT")))
    val back = readBack("IOT_JDBC_RT")
    assert(back.count() === 3)
    // schema survives: 22 columns, same names, same order (Spark quotes
    // identifiers at CREATE so Derby preserves the case)
    assert(back.columns.toSeq === out.columns.toSeq)
    // no predicate pushdown here: Derby types Spark strings as CLOB,
    // which its SQL can't compare to a CHAR literal — filter client-side
    val r = back.collect().find(_.getAs[String]("uid") == "C9").get
    assert(r.getAs[Float]("duration_sec") === 1.5f)
    assert(r.getAs[Boolean]("local_orig_bool") === true)
  }

  test("writeJdbc append mode accumulates instead of overwriting") {
    val dir = writeCsv(header, good)
    val out = Transforms.transform(IotPipeline.readCsv(spark, dir))
    val cfg = derbyCfg("IOT_JDBC_APP")
    assert(IotPipeline.writeJdbc(out, cfg))
    assert(IotPipeline.writeJdbc(out, cfg)) // second write must APPEND
    assert(readBack("IOT_JDBC_APP").count() === 2)
  }

  // ---- serving-store refresh: the DAG's TRUNCATE + positional load --
  // `dags/iot_processing_dag.py:55-75` refreshes ClickHouse by
  // truncating and re-inserting positionally from file(); these pin the
  // same cycle against the managed-table path.
  test("refreshServing is an idempotent full refresh (TRUNCATE + reload)") {
    val dir = writeCsv(header, good, good.replace("C1", "C9"))
    val out = Transforms.transform(IotPipeline.readCsv(spark, dir))
    try {
      IotPipeline.refreshServing(spark, out, "iot_serving_rt")
      val once = spark.table("iot_serving_rt").collect()
        .map(_.toString).sorted.toSeq
      assert(once.length === 2)
      // rerun (the DAG retry case): NOT append — table content is
      // exactly the source frame again
      IotPipeline.refreshServing(spark, out, "iot_serving_rt")
      val twice = spark.table("iot_serving_rt").collect()
        .map(_.toString).sorted.toSeq
      assert(twice === once, "refresh must replace, never accumulate")
      // refresh with a SHRUNK source: stale rows must vanish
      IotPipeline.refreshServing(spark,
        out.filter(out("uid") === "C9"), "iot_serving_rt")
      assert(spark.table("iot_serving_rt").count() === 1)
    } finally spark.sql("DROP TABLE IF EXISTS iot_serving_rt")
  }

  test("refreshServing binds columns by POSITION, the file() semantic") {
    val dir = writeCsv(header, good)
    val out = Transforms.transform(IotPipeline.readCsv(spark, dir))
    try {
      IotPipeline.refreshServing(spark, out, "iot_serving_pos")
      // same shape, scrambled NAMES: positional insert must still load
      // (ClickHouse file() loads have no names at all)
      val renamed = out.toDF(out.columns.map("x_" + _).toIndexedSeq: _*)
      IotPipeline.refreshServing(spark, renamed, "iot_serving_pos")
      val r = spark.table("iot_serving_pos").collect()
      assert(r.length === 1)
      assert(r.head.getAs[String]("uid") === "C1",
        "position 0 must land in the table's first column")
    } finally spark.sql("DROP TABLE IF EXISTS iot_serving_pos")
  }

  test("malformed rows still flow through the full transform program") {
    val bad =
      "C5,192.168.1.5,notaport,10.0.0.1,80,tcp,http,bogus,100,200,SF,T,F,0,Dd,2,140,2,240,-,Benign,-"
    val dir = writeCsv(header, good, bad)
    val out = Transforms.transform(IotPipeline.readCsv(spark, dir))
    assert(out.count() === 2) // neither row dropped
    val r = out.filter(out("uid") === "C5").collect().head
    assert(r.isNullAt(out.schema.fieldIndex("id_orig_p")))
    // the 5-regex duration parser's fallback: unparseable -> NULL
    assert(r.isNullAt(out.schema.fieldIndex("duration_sec")))
  }
}
