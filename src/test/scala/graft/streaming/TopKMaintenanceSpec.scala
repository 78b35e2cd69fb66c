package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Streaming top-k maintenance: the folded leaderboard must equal the
  * one-shot per-group top-k over all batches (exact mergeability), and
  * replay must not change it. */
class TopKMaintenanceSpec extends SparkTestBase {

  private val b1 = Seq(
    Doc(1, "a" * 50, "en"), Doc(2, "b" * 90, "en"),
    Doc(3, "c" * 10, "en"), Doc(4, "d" * 70, "de"),
    Doc(5, "e" * 30, "de"), Doc(6, "f" * 90, "en"))
  private val b2 = Seq(
    Doc(7, "g" * 95, "en"), Doc(8, "h" * 20, "en"),
    Doc(9, "i" * 80, "de"), Doc(10, "j" * 60, "en"),
    Doc(11, "k" * 40, "en"), Doc(12, "l" * 90, "en"))

  test("folded leaderboard equals the one-shot top-5 over all batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("graft_tk").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_tk_ck").toString
    val mem = MemoryStream[Doc](spark)
    val q = TopKMaintenance.maintain(mem.toDF(), store, ckpt).start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val got = TopKMaintenance.leaderboard(spark, store).collect()
      .map(_.toString).toSeq
    // one-shot window twin over the concatenated corpus
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("score").desc, col("doc_id"))
    val want = (b1 ++ b2).toDF()
      .select(col("lang"), length(col("text")).cast("long").as("score"),
        col("doc_id"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("lang"), col("rank"), col("doc_id").as("id"),
        col("score"))
      .orderBy("lang", "rank").collect().map(_.toString).toSeq
    assert(got === want,
      s"leaderboard\n${got.mkString("\n")}\n!= batch twin\n${want.mkString("\n")}")
    // ranks 1..5 for en (6 docs fed), 1..3 for de
    val byLang = TopKMaintenance.leaderboard(spark, store).collect()
      .groupBy(_.getAs[String]("lang"))
    assert(byLang("en").length === 5)
    assert(byLang("de").length === 3)
  }

  test("a replayed batch leaves the leaderboard unchanged") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_tk_src").toString
    val store = java.nio.file.Files.createTempDirectory("graft_tk2").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_tk2_ck").toString
    b1.toDF().write.mode("overwrite").parquet(src)
    def stream = spark.readStream
      .schema(Seq.empty[Doc].toDF().schema).parquet(src)
    val q1 = TopKMaintenance.maintain(stream, store, ckpt).start()
    try q1.processAllAvailable() finally { q1.stop(); q1.awaitTermination() }
    val before = TopKMaintenance.leaderboard(spark, store).collect()
      .map(_.toString).toSeq
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.matches("\\d+")).sortBy(_.getName.toLong)
    val last = commits.last
    new java.io.File(last.getParentFile, s".${last.getName}.crc").delete()
    last.delete()
    val q2 = TopKMaintenance.maintain(stream, store, ckpt).start()
    try q2.processAllAvailable() finally { q2.stop(); q2.awaitTermination() }
    val after = TopKMaintenance.leaderboard(spark, store).collect()
      .map(_.toString).toSeq
    assert(after === before, "replay changed the leaderboard")
  }
}
