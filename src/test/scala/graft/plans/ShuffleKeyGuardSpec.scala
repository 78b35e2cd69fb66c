package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[ShuffleKeyGuardRule]] conf plumbing at unit grain — the audit
  * semantics (bounded-side clearing, entity-key clearing, the typed
  * group-op rule, positive/negative fixtures) live in
  * `WindowCensusSpec`'s shuffle-key census controls; this pins the
  * rule's mode contract and its two-config surface (mode + declared
  * key set). */
class ShuffleKeyGuardSpec extends SparkTestBase {

  test("rule modes: default OFF, warn passes through, fail throws on " +
    "a declared-key join; the typed-group half runs with NO keys " +
    "declared (domain-free); clean plans pass in fail mode") {
    val rule = ShuffleKeyGuardRule
    val modeKey = "spark.graft.shuffleKeyGuard"
    val keysKey = "spark.graft.shuffleKeyGuard.keys"
    val d = graft.Tables.documents(spark, Sf)
    val langJoin = d.select(col("doc_id"), col("lang"))
      .join(d.select(col("doc_id").as("d2"), col("lang")), Seq("lang"))
      .queryExecution.optimizedPlan
    import spark.implicits._
    val typedGroup = d.select(col("lang"), col("n_chars"))
      .as[(String, Long)].groupByKey(_._1)
      .mapGroups((k, it) => (k, it.size)).toDF()
      .queryExecution.optimizedPlan
    try {
      assert(rule(langJoin) eq langJoin,
        "default must be off — the low-card key set is domain " +
          "knowledge a session rule cannot assume")
      spark.conf.set(modeKey, "warn")
      spark.conf.set(keysKey, "lang, event_type")
      assert(rule(langJoin) eq langJoin, "warn mode must not rewrite")
      spark.conf.set(modeKey, "fail")
      val e1 = intercept[IllegalStateException](rule(langJoin))
      assert(e1.getMessage.contains("keyed only on O(1)-cardinality"))
      // no keys declared: the join half is silent (no domain
      // knowledge), the typed-group half still convicts
      spark.conf.unset(keysKey)
      assert(rule(langJoin) eq langJoin,
        "without declared keys the join audit must stay silent")
      val e2 = intercept[IllegalStateException](rule(typedGroup))
      assert(e2.getMessage.contains("typed mapGroups"))
      // entity-keyed join is clean even with keys declared
      spark.conf.set(keysKey, "lang")
      val entity = d.select(col("doc_id"), col("lang"))
        .join(d.select(col("doc_id"), col("lang").as("l2")), Seq("doc_id"))
        .queryExecution.optimizedPlan
      assert(rule(entity) eq entity, "fail mode must pass clean plans")
    } finally {
      spark.conf.unset(modeKey)
      spark.conf.unset(keysKey)
    }
  }
}
