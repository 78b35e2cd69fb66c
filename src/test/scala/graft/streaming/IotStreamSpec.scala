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
}
