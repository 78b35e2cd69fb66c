package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Streaming PSI drift monitor: per-batch audit rows, zero on an
  * identical distribution, alarm on a shifted one, idempotent replay. */
class DriftMonitorSpec extends SparkTestBase {

  private def refDocs = graft.Tables.documents(spark, Sf)

  test("PSI of a distribution against itself is exactly zero") {
    val ref = DriftMonitor.binCounts(refDocs)
    assert(ref.values.sum > 0)
    assert(DriftMonitor.psiScaled(ref, ref) == 0L)
  }

  test("shifted batches score strictly higher than same-shaped batches") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_drift_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_drift_ck").toString
    val mem = MemoryStream[Doc](spark)
    val q = DriftMonitor.monitor(mem.toDF(), refDocs, out, ckpt).start()
    try {
      // batch 0: a same-shaped sample of the reference corpus itself
      val sample = refDocs.filter(col("doc_id") % 3 === 0)
        .select("doc_id", "text", "lang").as[Doc].collect()
      mem.addData(sample.toIndexedSeq: _*)
      q.processAllAvailable()
      // batch 1: wildly shifted — every text collapses into bin 0
      mem.addData((0L until 50L).map(i => Doc(10000 + i, "tiny", "en")): _*)
      q.processAllAvailable()
      val audit = spark.read.parquet(out).collect()
        .map(r => r.getAs[Long]("_batch_id") ->
          (r.getAs[Long]("n_docs"), r.getAs[Long]("psi_scaled"))).toMap
      assert(audit.keySet == Set(0L, 1L))
      assert(audit(1L)._1 == 50L)
      val (psiSame, psiShifted) = (audit(0L)._2, audit(1L)._2)
      assert(psiShifted > psiSame,
        s"shifted batch psi $psiShifted must exceed same-shape psi $psiSame")
      assert(psiShifted > 1000000L, // PSI > 1.0: unambiguous alarm zone
        s"all-bin-0 batch must alarm loudly, got scaled $psiShifted")
    } finally q.stop()
  }

  test("replaying a batch overwrites its own audit row (idempotent)") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_drift_src").toString
    val out = java.nio.file.Files.createTempDirectory("graft_drift_out2").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_drift_ck2").toString
    Seq(Doc(1, "short", "en"), Doc(2, "x" * 600, "en"))
      .toDF().write.mode("overwrite").parquet(src)
    def stream = spark.readStream
      .schema(Seq.empty[Doc].toDF().schema).parquet(src)
    val q1 = DriftMonitor.monitor(stream, refDocs, out, ckpt).start()
    try q1.processAllAvailable() finally { q1.stop(); q1.awaitTermination() }
    val before = spark.read.parquet(out).collect()
      .map(_.toString).sorted.toSeq
    assert(before.nonEmpty)
    // wipe the last commit marker so restart REPLAYS the batch
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.matches("\\d+")).sortBy(_.getName.toLong)
    val last = commits.last
    new java.io.File(last.getParentFile, s".${last.getName}.crc").delete()
    last.delete()
    val q2 = DriftMonitor.monitor(stream, refDocs, out, ckpt).start()
    try q2.processAllAvailable() finally { q2.stop(); q2.awaitTermination() }
    val after = spark.read.parquet(out).collect()
      .map(_.toString).sorted.toSeq
    assert(after == before, s"replay duplicated audit rows: $after vs $before")
  }
}
