package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Cross-batch NEAR-dup ingest: the store accumulates one
  * representative per near-dup cluster, across batches. */
class NearDupIngestSpec extends SparkTestBase {

  // 100-token text and a 1-token perturbation: most bit-vote sums are
  // far from zero, so the signatures differ in only a few bits
  private val base =
    Iterator.fill(10)("alpha beta gamma delta epsilon zeta eta theta iota kappa")
      .mkString(" ")
  private val nearVariant = base.dropRight("kappa".length) + "lambda"
  private val distinct1 = "an entirely different document about spark engines"
  private val distinct2 = "fresh new content with no overlap whatsoever today"

  private def hamming(a: String, b: String): Int = {
    import spark.implicits._
    val sigs = graft.queries.TextOps.simhashOf(
      Seq((0L, a), (1L, b)).toDF("doc_id", "text"))
      .orderBy("doc_id").collect().map(_.getAs[Long]("simhash"))
    java.lang.Long.bitCount(sigs(0) ^ sigs(1))
  }

  // the ingest's Hamming threshold is configurable; the fixture pair
  // sits at a deterministic distance of 5 (10×10 tokens put ~25% of
  // bit-vote sums at zero, so a one-token edit flips a handful), and
  // the genuinely distinct docs are far beyond the threshold
  private val MaxH = 6

  test("fixture property: the variant is a genuine near-dup (0 < hamming <= MaxH)") {
    val h = hamming(base, nearVariant)
    assert(h > 0 && h <= MaxH, s"fixture hamming $h outside (0, $MaxH]")
    assert(hamming(base, distinct1) > MaxH)
    assert(hamming(nearVariant, distinct2) > MaxH)
  }

  test("near-dup ingest drops in-batch and cross-batch near-duplicates") {
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("graft_near").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_near_ck").toString
    val mem = MemoryStream[Doc](spark)
    val q = NearDupIngest.ingest(mem.toDF(), store, ckpt, maxHamming = MaxH).start()
    try {
      // batch 1: base + its near-variant (in-batch near-dup cluster →
      // min-id rep survives) + one distinct doc
      mem.addData(Doc(1, base, "en"), Doc(2, nearVariant, "en"),
        Doc(3, distinct1, "en"))
      q.processAllAvailable()
      val after1 = spark.read.parquet(store)
      assert(after1.count() == 2)
      assert(after1.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 3L))

      // batch 2: the variant again (cross-batch near-dup vs stored doc
      // 1 → dropped) + one genuinely new doc
      mem.addData(Doc(4, nearVariant, "en"), Doc(5, distinct2, "en"))
      q.processAllAvailable()
      val after2 = spark.read.parquet(store)
      assert(after2.select("doc_id").collect().map(_.getLong(0)).toSet ==
        Set(1L, 3L, 5L))
      // the store carries signatures for future batches
      assert(after2.columns.contains("simhash"))

      // batch 3: a null-text doc must be RETAINED (no signature, no
      // dedup — but never silently dropped), and a 70-doc boilerplate
      // burst (beyond the 64 bucket cap) must still collapse to ONE
      // survivor because exact signatures are deduped before banding
      val boilerplate = "standard license header text appears verbatim at " +
        "the top of every generated source file in this repository"
      mem.addData(Doc(6, null, "en") +:
        (100L until 170L).map(i => Doc(i, boilerplate, "en")): _*)
      q.processAllAvailable()
      val after3 = spark.read.parquet(store)
      val ids = after3.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids.contains(6L), "null-text doc was dropped")
      assert(ids.intersect((100L until 170L).toSet) == Set(100L),
        s"boilerplate burst not collapsed: ${ids.filter(_ >= 100L)}")
      assert(after3.filter(col("doc_id") === 6).select("simhash")
        .collect().head.isNullAt(0))
    } finally q.stop()
  }

  test("replaying a batch is idempotent — null-text docs included") {
    import spark.implicits._
    val srcDir = java.nio.file.Files.createTempDirectory("graft_near_src").toString
    val store = java.nio.file.Files.createTempDirectory("graft_near_st").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_near_ck2").toString
    // signed docs (one near-dup pair) AND an unsigned null-text doc —
    // the unsigned row never matches anything in the dedup stages, so
    // only partition overwrite keeps its replay idempotent
    Seq(Doc(1, base, "en"), Doc(2, nearVariant, "en"), Doc(3, null, "en"))
      .toDF().write.mode("overwrite").parquet(srcDir)
    // file source (unlike MemoryStream) supports checkpoint recovery
    def stream = spark.readStream
      .schema(Seq.empty[Doc].toDF().schema).parquet(srcDir)
    val q1 = NearDupIngest.ingest(stream, store, ckpt, maxHamming = MaxH).start()
    try q1.processAllAvailable() finally { q1.stop(); q1.awaitTermination() }
    val before = spark.read.parquet(store).collect()
      .map(_.toString).sorted.toSeq
    assert(before.length == 2) // rep of the near-dup pair + the null doc
    // wipe the last commit marker so restart REPLAYS the batch
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.matches("\\d+")).sortBy(_.getName.toLong)
    assert(commits.nonEmpty)
    val last = commits.last
    new java.io.File(last.getParentFile, s".${last.getName}.crc").delete()
    last.delete()
    val q2 = NearDupIngest.ingest(stream, store, ckpt, maxHamming = MaxH).start()
    try q2.processAllAvailable() finally { q2.stop(); q2.awaitTermination() }
    val after = spark.read.parquet(store).collect()
      .map(_.toString).sorted.toSeq
    assert(after == before)
  }

  test("a store with a foreign or missing signature basis fails LOUDLY " +
    "(r16 ADVICE: the xxhash→md5 basis switch must not silently mix " +
    "Hamming-incomparable signatures)") {
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("graft_near_b").toString
    val ckpt1 = java.nio.file.Files.createTempDirectory("graft_near_bck1").toString
    val mem = MemoryStream[Doc](spark)
    val q = NearDupIngest.ingest(mem.toDF(), store, ckpt1, maxHamming = MaxH).start()
    try {
      mem.addData(Doc(1, base, "en"))
      q.processAllAvailable()
    } finally { q.stop(); q.awaitTermination() }
    // a healthy store is stamped with the code's basis
    assert(NearDupIngest.storedBasis(spark, store).contains(NearDupIngest.SigBasis))
    // simulate a pre-r16 (xxhash-era) store: strip the marker
    val marker = new java.io.File(store, "_sig_basis")
    new java.io.File(store, "._sig_basis.crc").delete()
    assert(marker.delete())
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft_near_bck2").toString
    val mem2 = MemoryStream[Doc](spark)
    val q2 = NearDupIngest.ingest(mem2.toDF(), store, ckpt2,
      maxHamming = MaxH).start()
    val thrown = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      mem2.addData(Doc(9, distinct1, "en"))
      q2.processAllAvailable()
    }
    // the failed query rethrows from awaitTermination too — drain it
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.awaitTermination()
    }
    def rootMessages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ rootMessages(e.getCause))
    assert(rootMessages(thrown).exists(_.contains("signature basis mismatch")),
      s"expected the basis guard, got: ${rootMessages(thrown)}")
    // the store is untouched by the refused batch
    assert(spark.read.parquet(store).count() == 1)
  }
}
