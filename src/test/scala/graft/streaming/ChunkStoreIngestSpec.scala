package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.queries.CorpusOps

/** Content-addressed chunk-store ingest: the store must hold exactly
  * the distinct chunk set of everything ingested (re-sent text costs
  * zero bytes), and a replayed batch must re-derive an identical
  * delta. */
class ChunkStoreIngestSpec extends SparkTestBase {

  private val b1 = Seq(
    Doc(1, "the quick brown fox jumps over the lazy dog again", "en"),
    Doc(2, "completely different content lives in this one here", "en"))
  // b2 re-sends doc 1's text verbatim (a re-crawl) + one new doc
  private val b2 = Seq(
    Doc(3, "the quick brown fox jumps over the lazy dog again", "en"),
    Doc(4, "fresh bytes that the store has never seen before now", "en"))

  private def expectedChunks(docs: Seq[Doc]) = {
    import spark.implicits._
    CorpusOps.cdcChunkFrame(
      docs.toDF().select(col("doc_id"), col("lang").as("source"),
        col("text")))
      .select(md5(col("chunk")).as("h"), length(col("chunk")).as("clen"))
      .distinct()
  }

  test("store holds exactly the distinct chunk set; re-sent text " +
    "stores zero new bytes") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("graft_cs").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cs_ck").toString
    val mem = MemoryStream[Doc](spark)
    val q = ChunkStoreIngest.ingest(mem.toDF(), store, ckpt).start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      val afterB1 = ChunkStoreIngest.bytesStored(spark, store)
      mem.addData(b2: _*); q.processAllAvailable()
      val afterB2 = ChunkStoreIngest.bytesStored(spark, store)
      // doc 3 is byte-identical to doc 1: only doc 4's chunks are new
      val doc4Bytes = expectedChunks(Seq(b2(1)))
        .join(expectedChunks(b1), Seq("h"), "left_anti")
        .agg(coalesce(sum("clen"), lit(0L))).head().getLong(0)
      assert(afterB2 - afterB1 === doc4Bytes,
        "re-sent text must add zero bytes beyond the genuinely new doc")
    } finally q.stop()
    val got = ChunkStoreIngest.chunks(spark, store).collect()
      .map(r => r.getAs[String]("h") -> r.getAs[Int]("clen")).toMap
    val want = expectedChunks(b1 ++ b2).collect()
      .map(r => r.getAs[String]("h") -> r.getAs[Int]("clen")).toMap
    assert(got === want, "store != distinct chunk set of the union")
  }

  test("compaction folds the store without changing it, and later " +
    "batches dedup against the compacted base") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_cs_csrc").toString
    val store = java.nio.file.Files.createTempDirectory("graft_cs3").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cs3_ck").toString
    b1.toDF().write.mode("overwrite").parquet(src)
    def stream = spark.readStream
      .schema(Seq.empty[Doc].toDF().schema).parquet(src)
    val q1 = ChunkStoreIngest.ingest(stream, store, ckpt).start()
    try q1.processAllAvailable() finally { q1.stop(); q1.awaitTermination() }
    val before = ChunkStoreIngest.chunks(spark, store).collect()
      .map(_.toString).sorted.toSeq
    // compact batch 0 into the folded base (data-sized fold — the
    // base keeps a parallel layout, no coalesce(1))
    ChunkStoreIngest.compactThrough(spark, store, 0L)
    val afterCompact = ChunkStoreIngest.chunks(spark, store).collect()
      .map(_.toString).sorted.toSeq
    assert(afterCompact === before, "compaction changed the chunk set")
    val bytesBefore = ChunkStoreIngest.bytesStored(spark, store)
    // next batch re-sends doc 1's text + one genuinely new doc: the
    // novelty anti-join must see the COMPACTED base as prior chunks
    b2.toDF().write.mode("append").parquet(src)
    val q2 = ChunkStoreIngest.ingest(stream, store, ckpt).start()
    try q2.processAllAvailable() finally { q2.stop(); q2.awaitTermination() }
    val doc4Bytes = expectedChunks(Seq(b2(1)))
      .join(expectedChunks(b1), Seq("h"), "left_anti")
      .agg(coalesce(sum("clen"), lit(0L))).head().getLong(0)
    assert(ChunkStoreIngest.bytesStored(spark, store) - bytesBefore
      === doc4Bytes,
      "post-compaction ingest must dedup against the folded base")
    val got = ChunkStoreIngest.chunks(spark, store).collect()
      .map(r => r.getAs[String]("h") -> r.getAs[Int]("clen")).toMap
    val want = expectedChunks(b1 ++ b2).collect()
      .map(r => r.getAs[String]("h") -> r.getAs[Int]("clen")).toMap
    assert(got === want)
  }

  test("a replayed batch re-derives an identical delta (store unchanged)") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_cs_src").toString
    val store = java.nio.file.Files.createTempDirectory("graft_cs2").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cs2_ck").toString
    b1.toDF().write.mode("overwrite").parquet(src)
    def stream = spark.readStream
      .schema(Seq.empty[Doc].toDF().schema).parquet(src)
    val q1 = ChunkStoreIngest.ingest(stream, store, ckpt).start()
    try q1.processAllAvailable() finally { q1.stop(); q1.awaitTermination() }
    val before = ChunkStoreIngest.chunks(spark, store).collect()
      .map(_.toString).sorted.toSeq
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.matches("\\d+")).sortBy(_.getName.toLong)
    val last = commits.last
    new java.io.File(last.getParentFile, s".${last.getName}.crc").delete()
    last.delete()
    val q2 = ChunkStoreIngest.ingest(stream, store, ckpt).start()
    try q2.processAllAvailable() finally { q2.stop(); q2.awaitTermination() }
    val after = ChunkStoreIngest.chunks(spark, store).collect()
      .map(_.toString).sorted.toSeq
    assert(after === before, "replay changed the chunk store")
  }
}
