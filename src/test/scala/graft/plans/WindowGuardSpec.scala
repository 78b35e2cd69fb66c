package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

/** The runtime window-collapse guard ([[WindowGuard]] +
  * [[WindowGuardRule]]): the same detector `WindowCensusSpec` sweeps
  * the 235 registered queries with, promoted to library surface so a
  * USER's query gets the lint too. These tests pin the detector's
  * boundary exactly — what must flag, what must stay quiet — and the
  * rule's three modes. The rule is exercised by direct invocation
  * (its registration seam, `GraftExtensions`, is the same
  * extensions path `AsofJoinPushdown` already covers in
  * `AsofJoinSpec`; the rule itself rides `injectPreCBORule`, a
  * once-per-query batch); the conf key is scoped to this suite and
  * read by nothing else. */
class WindowGuardSpec extends SparkTestBase {

  private def docs: DataFrame = Tables.documents(spark, Sf)

  /** The convicted shape: a partition-less row_number over the raw
    * corpus — "moving all data to a single partition". */
  private def collapsed: DataFrame =
    docs.withColumn("rn", row_number().over(Window.orderBy("doc_id")))

  test("audit flags a partition-less window over a raw frame") {
    val fs = WindowGuard.audit(collapsed)
    assert(fs.size == 1 && fs.head.kind == "partition-less" &&
      fs.head.partitionKeys.isEmpty, fs.toString)
    assert(fs.head.describe.contains("ONE partition"))
  }

  test("audit stays quiet on the offset-window idiom (partition-less " +
    "over an AGGREGATED frame) — the two-phase recipe's phase 2") {
    val offs = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .withColumn("off", sum(col("n")).over(
        Window.orderBy("lang").rowsBetween(Window.unboundedPreceding, -1)))
    assert(WindowGuard.audit(offs).isEmpty)
  }

  test("audit stays quiet on entity-keyed windows and flags " +
    "low-cardinality keys only when the caller names them") {
    val perDoc = docs.withColumn("rn",
      row_number().over(Window.partitionBy("doc_id").orderBy("lang")))
    // domain-knowledge-free: any partition key counts as O(data)
    assert(WindowGuard.audit(perDoc).isEmpty)
    val perLang = docs.withColumn("rn",
      row_number().over(Window.partitionBy("lang").orderBy("doc_id")))
    assert(WindowGuard.audit(perLang).isEmpty,
      "without the key set, a keyed window must not be flagged")
    val fs = WindowGuard.audit(perLang, Set("lang"))
    assert(fs.size == 1 && fs.head.kind == "low-cardinality" &&
      fs.head.partitionKeys == Seq("lang"), fs.toString)
    // a compound key with one O(data) component splits fine
    val mixed = docs.withColumn("rn", row_number().over(
      Window.partitionBy("lang", "doc_id").orderBy("n_chars")))
    assert(WindowGuard.audit(mixed, Set("lang")).isEmpty)
  }

  test("rule modes: warn passes the plan through, fail throws on the " +
    "collapse and stays quiet on clean plans, off disables") {
    val rule = WindowGuardRule
    val bad = collapsed.queryExecution.optimizedPlan
    val clean = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .queryExecution.optimizedPlan
    val key = "spark.graft.windowGuard"
    try {
      assert(rule(bad) eq bad, "warn mode must not rewrite the plan")
      spark.conf.set(key, "fail")
      val e = intercept[IllegalStateException](rule(bad))
      assert(e.getMessage.contains("partition-less window"))
      assert(rule(clean) eq clean, "fail mode must pass clean plans")
      spark.conf.set(key, "off")
      assert(rule(bad) eq bad, "off mode must disable the audit")
    } finally spark.conf.unset(key)
  }

  test("every registered query is quiet under the rule's " +
    "domain-free audit (what an extensions-enabled session would lint)") {
    val noisy = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) => WindowGuard.audit(fn(spark, Sf))
        .map(f => s"$name: ${f.describe}")
    }
    assert(noisy.isEmpty, noisy.mkString("\n"))
  }
}
