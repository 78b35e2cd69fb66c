package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase

case class Doc(doc_id: Long, text: String, lang: String)

/** Cross-batch dedup ingest: the store accumulates only first-seen
  * content, across batches and in the face of re-delivery. */
class CorpusIngestSpec extends SparkTestBase {

  test("dedup ingest drops in-batch and cross-batch duplicate content") {
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("graft_corpus").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_corpus_ck").toString
    val mem = MemoryStream[Doc](spark)
    val q = CorpusIngest.dedupIngest(mem.toDF(), store, ckpt).start()
    try {
      // batch 1: two distinct docs plus an in-batch duplicate (same
      // text modulo whitespace/case — the normalization must catch it)
      mem.addData(
        Doc(1, "The quick brown fox", "en"),
        Doc(2, "the  QUICK   brown fox", "en"),
        Doc(3, "an entirely different document", "en"))
      q.processAllAvailable()
      assert(spark.read.parquet(store).count() == 2)

      // batch 2: one re-delivered dup (vs batch 1) and one new doc
      mem.addData(
        Doc(4, "THE QUICK BROWN FOX", "en"),
        Doc(5, "fresh new content here", "en"))
      q.processAllAvailable()
      val landed = spark.read.parquet(store)
      assert(landed.count() == 3)
      // first-seen wins: the surviving fox doc is from batch 1
      val foxIds = landed.filter(org.apache.spark.sql.functions.lower(
        org.apache.spark.sql.functions.col("text")).contains("fox"))
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      assert(foxIds.length == 1 && (foxIds.head == 1L || foxIds.head == 2L))
      // fingerprints are unique across the whole store
      assert(landed.select("fp").distinct().count() == 3)
    } finally q.stop()
  }
}
