package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.queries.TextOps

/** Streaming CMS maintenance: the folded incremental sketch must be
  * CELL-IDENTICAL to the batch sketch over the concatenated corpus
  * (additivity), estimates must never undercount, and a replayed
  * batch must overwrite its own delta. */
class CmsMaintenanceSpec extends SparkTestBase {

  private val b1 = Seq(
    Doc(1, "the quick brown fox jumps", "en"),
    Doc(2, "the lazy dog sleeps", "en"),
    Doc(3, "quick quick brown", "en"))
  private val b2 = Seq(
    Doc(4, "the fox and the dog", "en"),
    Doc(5, "entirely new words appear", "en"))

  private def toks(docs: Seq[Doc]) = {
    import spark.implicits._
    docs.toDF().select(explode(TextOps.tokens(lower(col("text"))))
      .as("token")).filter(col("token") =!= "")
  }

  test("folded incremental cells equal the batch sketch over all batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("graft_cms_store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cms_ck").toString
    val mem = MemoryStream[Doc](spark)
    val q = CmsMaintenance.maintain(mem.toDF(), store, ckpt).start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val got = CmsMaintenance.sketch(spark, store).collect()
      .map(r => (r.getAs[Int]("d"), r.getAs[Long]("bucket")) ->
        r.getAs[Long]("cell")).toMap
    val want = TextOps.cmsCells(toks(b1 ++ b2)).collect()
      .map(r => (r.getAs[Int]("d"), r.getAs[Long]("bucket")) ->
        r.getAs[Long]("cell")).toMap
    assert(got === want)
    // point queries through the maintained sketch: never an undercount
    import spark.implicits._
    val keys = Seq("the", "quick", "dog").toDF("token")
    val est = CmsMaintenance.estimate(spark, store, keys).collect()
      .map(r => r.getAs[String]("token") -> r.getAs[Long]("est_cnt")).toMap
    val truth = toks(b1 ++ b2).groupBy("token").count().collect()
      .map(r => r.getAs[String]("token") -> r.getAs[Long]("count")).toMap
    Seq("the", "quick", "dog").foreach { t =>
      assert(est(t) >= truth(t), s"undercounted $t")
    }
    // an UNSEEN token must still yield a row, and its estimate is 0
    // unless every one of its d cells collides with stored tokens —
    // absent cell rows count as zero (left join), they don't silently
    // drop out of the min or erase the key from the output
    val unseen = Seq("zzz_never_ingested_zzz").toDF("token")
    val unseenEst = CmsMaintenance.estimate(spark, store, unseen).collect()
    assert(unseenEst.length === 1,
      "unseen key vanished from the estimate output")
    assert(unseenEst(0).getAs[Long]("est_cnt") === 0L,
      s"tiny corpus cannot fill all 4 cells of an unseen key: " +
        s"${unseenEst(0)}")
    // time travel: the sketch as of batch 0 equals the batch-built
    // sketch over b1 alone
    val asOf0 = CmsMaintenance.sketchAsOf(spark, store, 0L).collect()
      .map(r => (r.getAs[Int]("d"), r.getAs[Long]("bucket")) ->
        r.getAs[Long]("cell")).toMap
    val b1Cells = TextOps.cmsCells(toks(b1)).collect()
      .map(r => (r.getAs[Int]("d"), r.getAs[Long]("bucket")) ->
        r.getAs[Long]("cell")).toMap
    assert(asOf0 === b1Cells)
  }

  test("a replayed batch overwrites its own delta (no double add)") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_cms_src").toString
    val store = java.nio.file.Files.createTempDirectory("graft_cms_store2").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cms_ck2").toString
    b1.toDF().write.mode("overwrite").parquet(src)
    def stream = spark.readStream
      .schema(Seq.empty[Doc].toDF().schema).parquet(src)
    val q1 = CmsMaintenance.maintain(stream, store, ckpt).start()
    try q1.processAllAvailable() finally { q1.stop(); q1.awaitTermination() }
    val before = CmsMaintenance.sketch(spark, store).collect()
      .map(_.toString).sorted.toSeq
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.matches("\\d+")).sortBy(_.getName.toLong)
    val last = commits.last
    new java.io.File(last.getParentFile, s".${last.getName}.crc").delete()
    last.delete()
    val q2 = CmsMaintenance.maintain(stream, store, ckpt).start()
    try q2.processAllAvailable() finally { q2.stop(); q2.awaitTermination() }
    val after = CmsMaintenance.sketch(spark, store).collect()
      .map(_.toString).sorted.toSeq
    assert(after === before, "replay double-added CMS cells")
  }
}
