package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[SkewGuardRule]] conf plumbing at unit grain — the audit
  * semantics (entity tracing, grain clearing, broadcast/semi
  * exemptions, positive/negative fixtures) live in
  * `WindowCensusSpec`'s skew census controls; this pins the rule's
  * mode contract and its three-config surface (mode + entity keys +
  * bounded keys). */
class SkewGuardSpec extends SparkTestBase {

  test("rule modes: default OFF, warn passes through, fail throws on " +
    "a raw×raw content join; declared entity keys clear their joins; " +
    "declared bounded keys clear a finer-grained aggregate side") {
    val rule = SkewGuardRule
    val modeKey = "spark.graft.skewGuard"
    val entKey = "spark.graft.skewGuard.entityKeys"
    val bndKey = "spark.graft.skewGuard.boundedKeys"
    val toks = graft.Tables.documents(spark, Sf)
      .select(col("doc_id"), explode(split(lower(col("text")), "\\s+"))
        .as("token")).filter(col("token") =!= "")
    val rawPair = toks.select(col("token"), col("doc_id").as("d_a"))
      .join(toks.select(col("token"), col("doc_id").as("d_b")),
        Seq("token")).queryExecution.optimizedPlan
    val entityJoin = toks.join(
      toks.select(col("doc_id"), col("token").as("t2")), Seq("doc_id"))
      .queryExecution.optimizedPlan
    // token join onto a (token, lang)-grained count frame: bounded
    // only when lang is DECLARED bounded
    val perLang = toks
      .join(graft.Tables.documents(spark, Sf).select("doc_id", "lang"),
        Seq("doc_id"))
      .groupBy("token", "lang").agg(count(lit(1)).as("c"))
    val enrich = toks.join(perLang, Seq("token"))
      .queryExecution.optimizedPlan
    try {
      assert(rule(rawPair) eq rawPair,
        "default must be off — entity/bounded key names are domain " +
          "knowledge a session rule cannot assume")
      spark.conf.set(modeKey, "warn")
      assert(rule(rawPair) eq rawPair, "warn mode must not rewrite")
      spark.conf.set(modeKey, "fail")
      val e = intercept[IllegalStateException](rule(rawPair))
      assert(e.getMessage.contains("BOTH sides raw"))
      // domain-free mode still flags the finer-grained-aggregate side
      // (lang not declared bounded -> grain untrusted)
      intercept[IllegalStateException](rule(enrich))
      // declared knowledge clears both
      spark.conf.set(entKey, "doc_id, vec_id")
      assert(rule(entityJoin) eq entityJoin,
        "declared entity key must clear its join in fail mode")
      spark.conf.set(bndKey, "lang")
      assert(rule(enrich) eq enrich,
        "declared bounded key must clear the key-grain aggregate side")
    } finally {
      spark.conf.unset(modeKey)
      spark.conf.unset(entKey)
      spark.conf.unset(bndKey)
    }
  }
}
