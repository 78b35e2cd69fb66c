package graft.queries

import graft.SparkTestBase
import graft.plans.SortGuard

/** Census #10 — ORDER-BY totality over every oracle-paired query
  * (r16 verdict item 1; the wholesale form of the six retail sf10
  * tie-order fixes). Structural half: the analyzed plan ends in a
  * global Sort whose keys are output columns. Data half: at sf0.001,
  * every sort-key group holds exactly one distinct row. The same data
  * check runs at gate scale through Verify's sort_totality.json
  * (sf0.01 driver gate / sf0.1 deep gate / sf1+ replays) — this spec
  * keeps the law from regressing between gates. */
class SortTotalitySpec extends SparkTestBase {

  private lazy val oraclePaired =
    graft.SparkEntry.queries.filter(kv =>
      graft.SparkEntry.oracleSql.contains(kv._1)).toSeq.sortBy(_._1)

  private lazy val structural: Seq[(String, SortGuard.TopSort)] =
    oraclePaired.map { case (name, fn) =>
      name -> SortGuard.topSortKeys(fn(spark, Sf).queryExecution.analyzed)
    }

  test("sort-totality census (structural): every oracle-paired query " +
    "ends in a global Sort over its own output columns, or carries a " +
    "reviewed pin") {
    val breaches = structural.collect {
      case (name, SortGuard.Breach(d)) if !SortGuard.Pinned.contains(name) =>
        s"$name: $d"
    }
    assert(breaches.isEmpty,
      "ORDER-BY totality law (structural half) breached — end the " +
        "query in .orderBy over output columns (and mirror it in the " +
        "oracle SQL), or review + pin in SortGuard.Pinned:\n" +
        breaches.mkString("\n"))
  }

  test("sort-totality census (stale pins): every Pinned entry names a " +
    "query that still exists and still breaches") {
    val byName = structural.toMap
    val stale = SortGuard.Pinned.keys.filter { n =>
      byName.get(n) match {
        case Some(SortGuard.Breach(_)) => false // pin still earned
        case _ => true // resolves cleanly now, or query gone/unpaired
      }
    }
    assert(stale.isEmpty, s"stale SortGuard pins: ${stale.mkString(", ")}")
  }

  test("sort-totality census (single-row proofs): every SingleRow " +
    "verdict is true at sf0.001 — the plan-shape proof and the data " +
    "agree") {
    val liars = structural.collect {
      case (name, SortGuard.SingleRow) =>
        name -> graft.SparkEntry.queries(name)(spark, Sf).count()
    }.filter(_._2 > 1)
    assert(liars.isEmpty, s"plans proven <=1-row emitted more: $liars")
  }

  test("sort-totality census (data): at sf0.001 every sort-key group " +
    "holds exactly one distinct row — ties are allowed only between " +
    "identical rows") {
    val offenders = structural.collect {
      case (name, SortGuard.Keys(keys)) =>
        val fn = graft.SparkEntry.queries(name)
        val v = SortGuard.violations(fn(spark, Sf), keys)
        (name, keys, v)
    }.filter(_._3 > 0)
    assert(offenders.isEmpty,
      "non-total ORDER BY (data half) — rows tie on the sort keys but " +
        "differ in other columns; extend the ORDER BY to a key of the " +
        "output in BOTH engines (the sf10 q02 precedent):\n" +
        offenders.map { case (n, k, v) =>
          s"$n: $v tied group(s) under ORDER BY ${k.mkString(", ")}"
        }.mkString("\n"))
  }
}
