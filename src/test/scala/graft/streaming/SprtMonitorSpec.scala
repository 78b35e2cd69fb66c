package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase

/** Streaming SPRT monitor: per-batch deltas, sticky first-crossing
  * decision identical to the batch q194 fold, idempotent replay. */
class SprtMonitorSpec extends SparkTestBase {

  private def ev(id: Long, user: Long, tpe: String): Ev =
    Ev(id, Timestamp.valueOf("2024-01-01 00:00:00"), user, tpe, 1.0, "{}")

  test("deltas accumulate and the decision matches the q194 fold") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_sprt_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sprt_ck").toString
    val mem = MemoryStream[Ev](spark)
    val q = SprtMonitor.deltas(mem.toDF(), out, ckpt).start()
    try {
      // batch 0: arm 0 (even users) all views -> LLR goes negative
      mem.addData((1L to 40L).map(i => ev(i, 2, "view")): _*)
      q.processAllAvailable()
      // batch 1: more views for arm 0, a few clicks for arm 1
      mem.addData(((41L to 60L).map(i => ev(i, 2, "view")) ++
        (61L to 70L).map(i => ev(i, 3, "click"))): _*)
      q.processAllAvailable()
    } finally { q.stop(); q.awaitTermination() }
    val rows = SprtMonitor.decisions(spark, out).collect()
    val byKey = rows.map(r => (r.getAs[Long]("arm"),
      r.getAs[Long]("_batch_id")) -> r).toMap
    // arm 0: 40 views then 20 more — cumulative LLR is n * lnQ
    assert(byKey((0L, 0L)).getAs[Long]("cum_llr") ==
      40L * graft.queries.EventOps.SprtLnQ)
    assert(byKey((0L, 1L)).getAs[Long]("cum_llr") ==
      60L * graft.queries.EventOps.SprtLnQ)
    // 40 * ln(0.9) = -4.21 < -ln 19 -> accept H0 already in batch 0,
    // and the decision is sticky in batch 1
    assert(byKey((0L, 0L)).getAs[String]("decision") == "accept_h0")
    assert(byKey((0L, 1L)).getAs[String]("decision") == "accept_h0")
    // arm 1: 10 clicks -> +10 * lnP, far inside the bounds
    assert(byKey((1L, 1L)).getAs[Long]("cum_llr") ==
      10L * graft.queries.EventOps.SprtLnP)
    assert(byKey((1L, 1L)).getAs[String]("decision") == "continue")
  }

  test("replaying a batch overwrites its own delta rows (idempotent)") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_sprt_src").toString
    val out = java.nio.file.Files.createTempDirectory("graft_sprt_out2").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sprt_ck2").toString
    (1L to 30L).map(i => ev(i, i % 4, if (i % 3 == 0) "click" else "view"))
      .toDF().write.mode("overwrite").parquet(src)
    def stream = spark.readStream
      .schema(Seq.empty[Ev].toDF().schema).parquet(src)
    val q1 = SprtMonitor.deltas(stream, out, ckpt).start()
    try q1.processAllAvailable() finally { q1.stop(); q1.awaitTermination() }
    val before = SprtMonitor.decisions(spark, out).collect()
      .map(_.toString).sorted.toSeq
    assert(before.nonEmpty)
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.matches("\\d+")).sortBy(_.getName.toLong)
    val last = commits.last
    new java.io.File(last.getParentFile, s".${last.getName}.crc").delete()
    last.delete()
    val q2 = SprtMonitor.deltas(stream, out, ckpt).start()
    try q2.processAllAvailable() finally { q2.stop(); q2.awaitTermination() }
    val after = SprtMonitor.decisions(spark, out).collect()
      .map(_.toString).sorted.toSeq
    assert(after == before, s"replay double-counted trials")
  }
}
