package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

case class Fact(key: String, ts: Long, v: Int)
case class RefRow(ref_key: String, ref_ts: Long, cal: Double)

/** Streaming as-of enrichment through the custom sorted-merge plan:
  * per-batch correctness, dimension refresh between batches, and
  * idempotent batch replay. */
class AsofEnrichSpec extends SparkTestBase {
  import spark.implicits._

  private def matches(outDir: String): Map[(String, Long), Option[Double]] =
    spark.read.parquet(outDir).collect()
      .map(r => (r.getAs[String]("key"), r.getAs[Long]("ts")) ->
        Option(r.getAs[Any]("cal")).map(_.asInstanceOf[Double]))
      .toMap

  test("batches enrich with latest ref ≤ ts and see refreshed reference data") {
    val refDir = java.nio.file.Files.createTempDirectory("graft_ref").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_enr").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_enr_ck").toString
    Seq(RefRow("a", 10L, 1.0), RefRow("a", 20L, 2.0), RefRow("b", 5L, 7.0))
      .toDF().write.mode("overwrite").parquet(refDir)
    val mem = MemoryStream[Fact](spark)
    val q = AsofEnrich.enrich(mem.toDF(), refDir, outDir, ckpt,
      Seq("key" -> "ref_key"), "ts" -> "ref_ts").start()
    try {
      mem.addData(Fact("a", 15L, 1), Fact("a", 25L, 2), Fact("b", 4L, 3),
        Fact("c", 9L, 4))
      q.processAllAvailable()
      val m1 = matches(outDir)
      assert(m1(("a", 15L)) == Some(1.0)) // latest ref ≤ 15 is ts=10
      assert(m1(("a", 25L)) == Some(2.0)) // ts=20 version
      assert(m1(("b", 4L)) == None)       // ref is ahead (ts=5 > 4)
      assert(m1(("c", 9L)) == None)       // unknown key

      // reference store gains a newer version; next batch must see it
      Seq(RefRow("a", 30L, 3.0)).toDF().write.mode("append").parquet(refDir)
      mem.addData(Fact("a", 31L, 5), Fact("a", 15L, 6))
      q.processAllAvailable()
      val m2 = matches(outDir)
      assert(m2(("a", 31L)) == Some(3.0)) // the refreshed version
      assert(m2(("a", 15L)) == Some(1.0)) // history still correct
    } finally q.stop()
  }

  test("replaying a batch overwrites its partition — no duplicates") {
    val factDir = java.nio.file.Files.createTempDirectory("graft_facts").toString
    val refDir = java.nio.file.Files.createTempDirectory("graft_ref2").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_enr2").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_enr_ck2").toString
    Seq(RefRow("a", 1L, 1.0)).toDF().write.mode("overwrite").parquet(refDir)
    Seq(Fact("a", 2L, 1), Fact("a", 3L, 2)).toDF()
      .write.mode("overwrite").parquet(factDir)
    // file source (unlike MemoryStream) supports checkpoint recovery —
    // the shape a restart-replay test needs
    def stream = spark.readStream
      .schema(Seq.empty[Fact].toDF().schema).parquet(factDir)
    val q1 = AsofEnrich.enrich(stream, refDir, outDir, ckpt,
      Seq("key" -> "ref_key"), "ts" -> "ref_ts").start()
    try q1.processAllAvailable() finally { q1.stop(); q1.awaitTermination() }
    val before = spark.read.parquet(outDir).collect()
      .map(_.toString).sorted.toSeq
    assert(before.nonEmpty)
    // wipe the commit marker for the last batch so restart REPLAYS it
    // against the same output — dynamic partition overwrite must keep
    // the result identical, not doubled
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.matches("\\d+")).sortBy(_.getName.toLong)
    assert(commits.nonEmpty)
    val last = commits.last
    // delete the hidden Hadoop checksum sidecar too, or the replayed
    // commit's rename fails on the stale .crc
    new java.io.File(last.getParentFile, s".${last.getName}.crc").delete()
    last.delete()
    val q2 = AsofEnrich.enrich(stream, refDir, outDir, ckpt,
      Seq("key" -> "ref_key"), "ts" -> "ref_ts").start()
    try q2.processAllAvailable() finally { q2.stop(); q2.awaitTermination() }
    val after = spark.read.parquet(outDir).collect()
      .map(_.toString).sorted.toSeq
    assert(after == before)
  }
}
