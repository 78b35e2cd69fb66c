package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[WidthGuardRule]] conf plumbing at unit grain — the audit
  * semantics themselves (positional usage union across self-join
  * branches, constant-fold behavior of the Generate control, the
  * positive/negative fixtures) live in `WindowCensusSpec`'s width
  * census controls; this pins the rule trio's mode contract for the
  * materialization member. */
class WidthGuardSpec extends SparkTestBase {

  test("rule modes: default OFF (a session rule cannot see cross-query " +
    "cache consumers), warn passes through, fail throws on both audit " +
    "families") {
    val rule = WidthGuardRule
    val key = "spark.graft.widthGuard"
    val base = spark.range(8).selectExpr("id", "id*2 AS a", "id*3 AS b")
    val overWide = base.localCheckpoint().select("id")
      .queryExecution.optimizedPlan
    val carried = spark.range(4)
      .selectExpr("id", "transform(sequence(1, 9), " +
        "x -> concat('t', x, '_', id)) AS toks")
      .select(col("id"), col("toks"),
        explode(expr("sequence(1, size(toks) - 7)")).as("i"))
      .select(col("id"), expr("concat_ws(' ', slice(toks, i, 8))").as("s"))
      .queryExecution.optimizedPlan
    try {
      assert(rule(overWide) eq overWide,
        "default must be off — a cached frame may serve other queries " +
          "this plan cannot show")
      spark.conf.set(key, "warn")
      assert(rule(overWide) eq overWide, "warn mode must not rewrite")
      spark.conf.set(key, "fail")
      val e1 = intercept[IllegalStateException](rule(overWide))
      assert(e1.getMessage.contains("materializes column(s)"))
      val e2 = intercept[IllegalStateException](rule(carried))
      assert(e2.getMessage.contains("carries container column(s)"))
      val clean = base.localCheckpoint()
        .selectExpr("id + a + b AS s").queryExecution.optimizedPlan
      assert(rule(clean) eq clean, "fail mode must pass clean plans")
    } finally spark.conf.unset(key)
  }
}
