package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import graft.iot.IotSchema

/** End-to-end streaming IoT ingest: fixture CSVs appear in a watched
  * dir → reference transform → Parquet, with exactly-once file
  * semantics across restarts (checkpoint ledger). */
class IotStreamSpec extends SparkTestBase {

  test("streaming ingest transforms newly arriving conn.log CSVs") {
    val in = Files.createTempDirectory("graft_iot_in")
    val out = Files.createTempDirectory("graft_iot_out").toString
    val ckpt = Files.createTempDirectory("graft_iot_ckpt").toString
    Files.copy(Paths.get("/root/repo/fixtures/iot_conn.csv"),
      in.resolve("conn_part1.csv"))

    val q1 = IotStream.run(spark, in.toString, out, ckpt)
    q1.awaitTermination()
    val first = spark.read.parquet(out)
    assert(first.count() == 8)
    assert(first.columns.toSeq == IotSchema.outputColumns)

    // a second file lands; a restarted query must process ONLY it
    // (the checkpoint remembers conn_part1.csv)
    Files.copy(Paths.get("/root/repo/fixtures/iot_conn.csv"),
      in.resolve("conn_part2.csv"))
    val q2 = IotStream.run(spark, in.toString, out, ckpt)
    q2.awaitTermination()
    assert(spark.read.parquet(out).count() == 16)

    // transformed values survive the streaming path bit-identically
    val row = spark.read.parquet(out)
      .where("uid = 'C4d5e6'").select("duration_sec").head()
    assert(row.getDouble(0) == 3.139211f.toDouble)
  }

  test("kafka-envelope JSON conn records parse into the raw schema (source seam)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    val mem = MemoryStream[String](spark)
    val parsed = IotStream.parseConnJson(mem.toDF())
    // the parse stage restores the EXACT raw 22-column schema, so the
    // reference transform program runs unchanged on bus-delivered rows
    assert(parsed.schema == IotSchema.raw)
    val q = graft.iot.Transforms.transform(parsed)
      .writeStream.format("memory").queryName("connjson_test")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        """{"uid":"CJ1","id.orig_h":"192.168.1.10","id.orig_p":1234,""" +
          """"proto":"tcp","service":"","duration":"0 days 00:00:03.139211",""" +
          """"local_orig":"T"}""")
      q.processAllAvailable()
      val row = spark.table("connjson_test").head()
      assert(row.getAs[String]("uid") == "CJ1")
      assert(row.getAs[String]("id_orig_h") == "192.168.1.10")
      // timedelta-form parse: float32 components summed in double
      // (3.0f + 139211.0f/1e6), unlike the plain-numeric branch's
      // whole-value float32 cast — reference-faithful either way
      assert(row.getAs[Double]("duration_sec") == 3.0 + 139211.0 / 1e6)
      assert(row.getAs[Boolean]("local_orig_bool"))
      assert(row.isNullAt(row.fieldIndex("service"))) // "" => NULL
    } finally q.stop()
  }
}
