package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

/** The broadcast-census detector ([[BroadcastGuard]] +
  * [[BroadcastGuardRule]]) at unit grain: the recursive boundedness
  * test's individual escapes, each pinned from both sides (what
  * clears, what must NOT clear), plus the rule's modes. The
  * registry-wide sweep and the pre-fix-q03/q62 regression controls
  * live in `WindowCensusSpec`; these tests pin the detector pieces
  * those shapes compose. */
class BroadcastGuardSpec extends SparkTestBase {

  private def docs: DataFrame = Tables.documents(spark, Sf)
  private def emb: DataFrame = Tables.embeddings(spark, Sf)

  private def audit(df: DataFrame,
      bounded: Set[String] = Set.empty,
      probe: Set[String] = Set.empty) =
    BroadcastGuard.audit(df.queryExecution.optimizedPlan,
      BroadcastGuard.FixedCardTables, bounded, probe)

  test("probe-set filters clear only when declared and only through " +
    "positive literal bounds") {
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"))
    val joined = emb.crossJoin(broadcast(queries))
    // undeclared: the filter is just a filter — embeddings leaf flags
    val undeclared = audit(joined)
    assert(undeclared.size == 1 && undeclared.head.leaves == Seq("embeddings"),
      undeclared.toString)
    // declared probe key: the literal range bound clears the subtree
    assert(audit(joined, probe = Set("vec_id")).isEmpty)
    // a NEGATION on the probe key must not clear (the pre-fix q62
    // trap: td carries `term != ''` — that bounds nothing)
    val neg = docs
      .select(col("doc_id"), explode(split(lower(col("text")), "\\s+")).as("term"))
      .filter(col("term") =!= "")
    val negJoin = docs.crossJoin(broadcast(neg))
    assert(audit(negJoin, probe = Set("term")).nonEmpty,
      "term != '' must not count as a probe bound")
    // but a positive IN on the same key does
    val in = neg.filter(col("term").isin("alpha", "beta"))
    assert(audit(docs.crossJoin(broadcast(in)), probe = Set("term")).isEmpty)
  }

  test("aggregates bound by grouping-key cardinality, not by existence") {
    // global aggregate: bounded with NO domain knowledge
    val n = docs.agg(count(lit(1)).as("n"))
    assert(audit(docs.crossJoin(broadcast(n))).isEmpty)
    // keyed aggregate: unbounded until the caller vouches for the key
    val byLang = docs.groupBy("lang").agg(count(lit(1)).as("n"))
    val j = docs.join(broadcast(byLang), "lang")
    assert(audit(j).nonEmpty,
      "a keyed aggregate must not clear on existence alone")
    assert(audit(j, bounded = Set("lang")).isEmpty)
  }

  test("limits and fixed-card tables bound; scaling scans do not") {
    assert(audit(docs.crossJoin(broadcast(docs.limit(10)))).isEmpty)
    val nat = Tables.nation(spark, Sf)
    assert(audit(docs.crossJoin(broadcast(nat))).isEmpty)
    val bad = audit(docs.as("a").join(broadcast(docs.as("b")),
      col("a.doc_id") === col("b.doc_id")))
    assert(bad.size == 1 && bad.head.leaves == Seq("documents"),
      bad.toString)
  }

  test("cartesian census: flags a cross of two unbounded frames, " +
    "stays quiet when one side is bounded (the spine/stats idiom)") {
    def cart(df: DataFrame) = BroadcastGuard.auditCartesian(
      df.queryExecution.optimizedPlan)
    // two data-sized frames with no condition: the O(n*m) detonation
    val bad = cart(docs.select(col("doc_id").as("a"))
      .crossJoin(docs.select(col("doc_id").as("b"))))
    assert(bad.size == 1 && bad.head.leaves == Seq("documents") &&
      bad.head.side == "cartesian", bad.toString)
    // 1-row stats attach: linear, the legitimate idiom
    assert(cart(docs.crossJoin(docs.agg(count(lit(1)).as("n")))).isEmpty)
    // fixed-card x fixed-card (q08's shape)
    assert(cart(Tables.region(spark, Sf)
      .crossJoin(Tables.nation(spark, Sf))).isEmpty)
    // small-spine fan-out (epoch/offset idiom)
    assert(cart(docs.crossJoin(
      spark.range(9).select(col("id").as("off")))).isEmpty)
  }

  test("rule modes: default OFF (the warn-vs-off asymmetry with the " +
    "window rule), warn passes through, fail throws") {
    val rule = BroadcastGuardRule
    val bad = docs.as("a").join(broadcast(docs.as("b")),
      col("a.doc_id") === col("b.doc_id")).queryExecution.optimizedPlan
    val key = "spark.graft.broadcastGuard"
    try {
      assert(rule(bad) eq bad, "default must be off — a hard hint on " +
        "a non-fixed table is often justified by caller knowledge")
      spark.conf.set(key, "warn")
      assert(rule(bad) eq bad, "warn mode must not rewrite the plan")
      spark.conf.set(key, "fail")
      val e = intercept[IllegalStateException](rule(bad))
      assert(e.getMessage.contains("hard broadcast()"))
      val clean = docs.crossJoin(broadcast(Tables.nation(spark, Sf)))
        .queryExecution.optimizedPlan
      assert(rule(clean) eq clean, "fail mode must pass clean plans")
    } finally spark.conf.unset(key)
  }
}
