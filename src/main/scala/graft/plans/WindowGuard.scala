package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Range => LRange, Window => LWindow}
import org.apache.spark.sql.catalyst.rules.Rule

/** Plan-time guard against the low-parallelism window collapse — the
  * scale failure this repo's round-10 census convicted six queries of
  * and round 11 reworked (see PERF.md "Round-11 notes"): a window
  * partitioned by nothing moves ALL data to one partition (Spark only
  * warns at EXECUTION time, after the plan is committed), and a window
  * partitioned only by a handful-of-values key hash-partitions the
  * whole frame into that many single-task sorts. Both are invisible at
  * test scale — the collapsed frame fits one task and is often FASTER
  * there — and catastrophic at 100 TB, which is exactly the kind of
  * bug a plan lint should catch instead of a production incident.
  *
  * [[WindowGuard.audit]] is the structural census: it flags a logical
  * `Window` node unless (a) some partition key is outside the caller's
  * known low-cardinality set (the frame then splits O(data) ways), or
  * (b) an `Aggregate` — or a bounded `Range`/`LocalRelation` — sits
  * below the window, making the frame aggregated/report-sized (the
  * same class as a distributed sort's phase-2 boundary metadata, the
  * legitimate home of partition-less windows). The aggregate-below
  * check is a may-find heuristic, not a proof — it keeps the guard
  * quiet on the offset-window idiom while still catching every shape
  * the r10 census convicted; pin exact plans in per-query specs where
  * it matters (`WindowCensusSpec`). Known false-negative class: an
  * Aggregate grouped by a HIGH-cardinality key (per-candidate argmax,
  * per-(query, candidate) ADC sums) emits a data-sized frame that
  * this escape wrongly clears — the round-11 ANN audit caught
  * q139/q150/q162 that way by manual sweep; when auditing by hand,
  * check what the Aggregate below actually groups by.
  *
  * [[WindowGuardRule]] runs the partition-less half of the audit
  * inside the optimizer for EVERY query of an extensions-enabled
  * session (`GraftExtensions`), controlled by
  * `spark.graft.windowGuard` = `warn` (default) | `fail` | `off`.
  * It never rewrites the plan — fixing a collapse means choosing
  * between a bounded-heap top-k, a two-phase prefix/rank, or an
  * aggregate-first identity (the three rework shapes PERF.md
  * documents), which is a semantic decision the author must make, not
  * an optimizer substitution. Low-cardinality KEYED collapses need
  * domain knowledge (key names), so they stay in [[WindowGuard.audit]]
  * for census-style use rather than in the session-wide rule. */
object WindowGuard {

  /** One flagged window: the partition-key names (empty = partition-
    * less) and the collapse class. */
  case class Finding(partitionKeys: Seq[String], kind: String) {
    def describe: String =
      (if (partitionKeys.isEmpty) "partition-less window"
       else s"window partitioned only by low-cardinality " +
         s"[${partitionKeys.mkString(", ")}]") +
        " over a non-aggregated frame: " +
        (if (partitionKeys.isEmpty) "all rows move to ONE partition"
         else "the frame collapses to one task per key value") +
        " — rework as a bounded-heap top-k, a two-phase prefix/rank, " +
        "or an aggregate-first identity (PERF.md round-11 notes)"
  }

  /** Census of `plan`: every low-parallelism window shape, given the
    * caller's set of known O(1)-cardinality column names. With the
    * default empty set every partitioned window counts as splitting
    * O(data) ways, so only partition-less windows can be flagged —
    * the domain-knowledge-free subset [[WindowGuardRule]] runs. */
  def audit(plan: LogicalPlan,
      lowCardKeys: Set[String] = Set.empty): Seq[Finding] =
    plan.collect {
      case w: LWindow =>
        val parts = w.partitionSpec.flatMap(_.references.toSeq.map(_.name))
        val splitsWithData = parts.exists(p => !lowCardKeys.contains(p))
        val aggBelow =
          w.child.collectFirst { case a: Aggregate => a }.isDefined
        val boundedBelow = w.child.collectFirst {
          case r: LRange if r.numElements.isValidLong &&
            r.numElements.longValue <= 100000 => r
          case l: LocalRelation => l
        }.isDefined
        if (splitsWithData || aggBelow || boundedBelow) None
        else Some(Finding(parts,
          if (parts.isEmpty) "partition-less" else "low-cardinality"))
    }.flatten

  /** Census of a DataFrame's OPTIMIZED plan (post-pushdown, so the
    * frame the window actually rides is what gets judged). */
  def audit(df: DataFrame, lowCardKeys: Set[String]): Seq[Finding] =
    audit(df.queryExecution.optimizedPlan, lowCardKeys)

  def audit(df: DataFrame): Seq[Finding] =
    audit(df, Set.empty[String])
}

/** The in-optimizer guard: audits (never rewrites) each plan for
  * partition-less windows over non-aggregated frames and reports per
  * `spark.graft.windowGuard` — `warn` logs one line per finding,
  * `fail` throws (CI strict mode: the collapse becomes a build error
  * the way `WindowCensusSpec` makes it one for registered queries),
  * `off` disables. Registered via `injectPreCBORule` — a Once batch
  * that runs after the operator-optimization fixed point — so the
  * audit sees the post-pushdown frame and runs exactly once per
  * query; inside a fixed-point batch a never-rewriting rule would be
  * re-invoked (and re-log) on every iteration the OTHER rules force. */
object WindowGuardRule extends Rule[LogicalPlan] {

  // Rule.conf is the ACTIVE session's SQLConf, so the mode is
  // per-session even though the rule itself is stateless
  private def mode: String =
    conf.getConfString("spark.graft.windowGuard", "warn")

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val m = mode
    if (m != "off") {
      val findings = WindowGuard.audit(plan)
      if (findings.nonEmpty && m == "fail")
        throw new IllegalStateException(
          "WindowGuard: " + findings.map(_.describe).mkString("; "))
      findings.foreach(f => logWarning(s"WindowGuard: ${f.describe}"))
    }
    plan
  }
}
