package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Range => LRange}

/** Plan-time census of the aggregation-BUFFER collapse — the sibling
  * of [[WindowGuard]]'s low-parallelism window census.
  *
  * Some built-in aggregates keep state proportional to the VALUES of
  * their group, not O(1): exact `percentile`/`median`/
  * `percentile_disc` buffer every distinct input value (plus count)
  * in one in-memory map per group; `mode` the same;
  * `collect_list`/`collect_set`/`listagg` the collected group itself.
  * Partial (map-side) aggregation does not help — partial buffers hold
  * the same map and the final merge concentrates the UNION of them on
  * the group's one reducer. When the grouping key has a handful of
  * values (or the aggregate is global), that buffer is
  * O(all distinct values in the data) on ONE task: invisible at test
  * scale, an executor OOM at 100 TB. Exactly the window-collapse
  * failure mode (see PERF.md round-11 notes) relocated from the sort
  * to the hash-aggregate buffer.
  *
  * The census flags an `Aggregate` whose grouping keys are ALL in the
  * caller's known low-cardinality set (a global aggregate trivially
  * qualifies) and whose aggregate list contains a value-sized-state
  * function — unless the frame below is itself aggregated or bounded
  * (`Aggregate`/small `Range`/`LocalRelation` below), in which case
  * the buffered values are report-sized (the same may-find escape the
  * window census uses). Remaining hits are either reworked — exact
  * quantiles via [[graft.operators.ExactQuantiles]]'s two-phase
  * histogram ranks — or pinned with a bounded-VALUE-DOMAIN review
  * (e.g. `collect_set` of a 3-value status enum) in
  * `WindowCensusSpec`'s agg-state census, which runs this audit over
  * every registered query's optimized plan. */
object AggStateGuard {

  /** Built-in aggregate functions whose buffer grows with the group's
    * (distinct) values, by `prettyName` as it appears post-optimization
    * (`median`/`percentile_cont` rewrite to `percentile` before the
    * optimized plan, but are listed for direct-audit callers). */
  val ValueSizedState: Set[String] = Set(
    "percentile", "median", "percentile_cont", "percentile_disc",
    "mode", "collect_list", "collect_set", "array_agg", "listagg",
    "string_agg")

  /** One flagged aggregate: the value-sized-state function names and
    * the grouping-key names (empty = global aggregate). */
  case class Finding(fns: Seq[String], groupKeys: Seq[String]) {
    def describe: String =
      s"[${fns.mkString(", ")}] grouped by " +
        (if (groupKeys.isEmpty) "NOTHING (global)"
         else s"low-cardinality [${groupKeys.mkString(", ")}]") +
        " buffers O(group values) on one task per group — rework " +
        "exact quantiles as ExactQuantiles.quantiles (two-phase " +
        "histogram ranks), or pin with a bounded-value-domain review"
  }

  /** Census of `plan`, given the caller's set of known
    * O(1)-cardinality column names (the same set the window census
    * uses). With the default empty set only GLOBAL aggregates can be
    * flagged — the domain-knowledge-free subset. */
  def audit(plan: LogicalPlan,
      lowCardKeys: Set[String] = Set.empty): Seq[Finding] =
    plan.collect {
      case a: Aggregate =>
        val gks = a.groupingExpressions.flatMap(_.references.toSeq.map(_.name))
        val collapses = gks.forall(lowCardKeys.contains)
        val aggBelow =
          a.child.collectFirst { case c: Aggregate => c }.isDefined
        val boundedBelow = a.child.collectFirst {
          case r: LRange if r.numElements.isValidLong &&
            r.numElements.longValue <= 100000 => r
          case l: LocalRelation => l
        }.isDefined
        if (!collapses || aggBelow || boundedBelow) None
        else {
          val fns = a.aggregateExpressions.flatMap(_.collect {
            case ae: AggregateExpression
                if ValueSizedState.contains(ae.aggregateFunction.prettyName) =>
              ae.aggregateFunction.prettyName
          }).distinct
          if (fns.isEmpty) None else Some(Finding(fns, gks))
        }
    }.flatten

  /** Census of a DataFrame's OPTIMIZED plan (post-pushdown and
    * post-`RuntimeReplaceable` rewrite, so `median` shows as
    * `percentile` and the frame is what the buffer actually sees). */
  def audit(df: DataFrame, lowCardKeys: Set[String]): Seq[Finding] =
    audit(df.queryExecution.optimizedPlan, lowCardKeys)

  def audit(df: DataFrame): Seq[Finding] =
    audit(df, Set.empty[String])
}
