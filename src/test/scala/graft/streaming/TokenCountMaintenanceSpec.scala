package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.queries.TextOps

/** Streaming exact heavy-hitter maintenance: the folded counts must
  * equal the batch counts over the concatenated corpus, the
  * leaderboard must match the q210-shaped batch aggregate
  * row-for-row (including a token that leads GLOBALLY while never
  * leading any single batch — the case per-batch top-k partials
  * would get wrong), a replayed batch must overwrite its own delta,
  * and compaction must change nothing. */
class TokenCountMaintenanceSpec extends SparkTestBase {

  // "drip" never dominates a single batch but leads the total —
  // the additivity case that forces vocabulary-grain deltas
  private val b1 = Seq(
    Doc(1, "alpha alpha alpha drip drip", "en"),
    Doc(2, "beta beta beta beta", "en"))
  private val b2 = Seq(
    Doc(3, "gamma gamma gamma drip drip", "en"),
    Doc(4, "delta delta delta delta drip", "en"),
    Doc(5, "uno dos drip drip", "es"))

  private def all = b1 ++ b2

  private def batchCounts(docs: Seq[Doc]) = {
    import spark.implicits._
    docs.toDF()
      .select(col("lang"),
        explode(TextOps.tokens(lower(col("text")))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("lang", "token").agg(count(lit(1)).as("cnt"))
  }

  test("folded counts and leaderboard equal the batch twin over all " +
    "batches; cross-batch accumulation wins; replay and compaction " +
    "are no-ops") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("graft_tok_store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_tok_ck").toString
    val mem = MemoryStream[Doc](spark)
    val q = TokenCountMaintenance.maintain(mem.toDF(), store, ckpt).start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    def cmap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("token")) ->
        r.getAs[Long]("cnt")).toMap
    assert(cmap(TokenCountMaintenance.counts(spark, store)) ===
      cmap(batchCounts(all)))
    def lrows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).toSeq
    val board = lrows(TokenCountMaintenance.leaderboard(spark, store))
    // q210-shaped batch twin over the concatenated corpus
    val topk = udaf(graft.functions.TopKByScoreKey(8),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[graft.functions.ScoredKey]())
    val want = lrows(batchCounts(all).groupBy("lang")
      .agg(topk(col("cnt"), col("token")).as("top"))
      .select(col("lang"), posexplode(col("top")).as(Seq("pos0", "e")))
      .select(col("lang"), (col("pos0") + 1).cast("long").as("rank"),
        col("e.key").as("token"), col("e.score").as("cnt"))
      .orderBy("lang", "rank"))
    assert(board === want)
    // the additivity case: "drip" never tops one en batch (beta=4 >
    // drip=2 in b1; delta=4 > drip=3 in b2) but leads the en total
    // with 5 — per-batch top-k partials would have lost it
    val en1 = TokenCountMaintenance.leaderboard(spark, store)
      .filter(col("lang") === "en" && col("rank") === 1).head()
    assert(en1.getAs[String]("token") === "drip" &&
      en1.getAs[Long]("cnt") === 5L,
      s"cross-batch accumulation lost: $en1")
    // replayed batch (restart between sink write and checkpoint
    // commit) overwrites its own partition — no double count
    DeltaLog.writeBatch(batchCounts(b2), 1L, store)
    assert(lrows(TokenCountMaintenance.leaderboard(spark, store)) === board)
    // compaction folds history, results unchanged
    TokenCountMaintenance.compactThrough(spark, store, 1L)
    assert(cmap(TokenCountMaintenance.counts(spark, store)) ===
      cmap(batchCounts(all)))
    assert(lrows(TokenCountMaintenance.leaderboard(spark, store)) === board)
  }
}
