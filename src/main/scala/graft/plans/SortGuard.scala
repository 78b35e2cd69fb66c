package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, EqualTo, ExprId, IntegerLiteral, Literal, RowNumber, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Distinct, Filter, GlobalLimit, Join, LocalLimit, LogicalPlan, Project, Sort, SubqueryAlias, WithCTE, Window => LWindow}
import org.apache.spark.sql.functions.{array_sort, col, map_entries}
import org.apache.spark.sql.types.MapType

/** Census #10 — ORDER-BY TOTALITY (r16 verdict item 1).
  *
  * The law: every oracle-paired query's output order must be TOTALLY
  * determined by its ORDER BY, because the correctness compare hashes
  * rows IN ORDER on both engines. A sort whose key tuple is not a key
  * of the output leaves tie order engine-dependent — and the sf10 gate
  * proved that class is invisible at every smaller scale (the
  * generator emits ~118k duplicate (l_orderkey, l_linenumber) pairs at
  * sf0.1 that no query tripped over until q02 diverged on 5,400 of
  * 1.11M rows at sf10). Round 16 fixed the six convicted queries
  * retail; this guard makes the law wholesale:
  *
  *   1. STRUCTURAL half ([[topSortKeys]]): the analyzed plan must end
  *      in a GLOBAL Sort (above it only order-preserving wrappers:
  *      Project / Limit / SubqueryAlias / WithCTE), and every sort
  *      expression must be an output column of the query — the output
  *      must CARRY its own ordering key, or no downstream consumer
  *      (the oracle compare included) can re-derive the order.
  *   2. DATA half ([[violations]]): on the materialized output, every
  *      sort-key group holds exactly ONE distinct row. Two rows may
  *      tie on the keys only if they are identical in every column
  *      (identical rows hash the same in any order). Checked at
  *      sf0.001 in `SortTotalitySpec` on every test run, and by
  *      `Verify` at whatever scale the gate runs (sf0.01 driver gate,
  *      sf0.1 deep gate, sf1/sf10 replays) via `sort_totality.json`.
  *
  * Exceptions are PINS, not silence: a query that legitimately cannot
  * satisfy the structural half carries a reviewed entry in
  * [[Pinned]], and the data half still runs where possible.
  */
object SortGuard {

  /** Structural outcome for one query plan. */
  sealed trait TopSort
  /** Global top sort, all keys mapped to output column names. */
  final case class Keys(names: Seq[String]) extends TopSort
  /** Output provably has at most ONE row (global aggregate, joins of
    * such, limit(1)) — any order of ≤1 row is total. */
  case object SingleRow extends TopSort
  /** Law breach: what was found instead, for the census message. */
  final case class Breach(detail: String) extends TopSort

  /** Reviewed exceptions to the STRUCTURAL law, with reasons. A pin
    * does not exempt the query from correctness — it records WHY the
    * top-sort-over-output-columns shape cannot hold and what makes
    * the order (or the compare) deterministic anyway. Currently empty:
    * the r17 census found every registered query either ends in a
    * total sort or is provably single-row (the 7 global-metric
    * queries: chi-square, Heaps fit, bootstrap CI, HLL table, the
    * geo-grid summary, delta-method, rater agreement). */
  val Pinned: Map[String, String] = Map.empty

  /** Conservative ≤1-row proof over an analyzed plan: global
    * aggregates (no grouping expressions) emit exactly one row; any
    * join/filter/project/limit composition of ≤1-row frames stays
    * ≤1-row. `false` means "not proven", not "is multi-row". */
  def atMostOneRow(plan: LogicalPlan): Boolean = plan match {
    case a: Aggregate => a.groupingExpressions.isEmpty
    case j: Join => atMostOneRow(j.left) && atMostOneRow(j.right)
    case Project(_, child) => atMostOneRow(child)
    // rn = <literal> over a GLOBALLY-unique row_number picks <=1 row
    // (the bootstrap CI's order-statistic legs: filter(rn === 3))
    case Filter(EqualTo(ar: AttributeReference, _: Literal), child)
      if globallyUniqueRowNumber(child, ar.exprId) => true
    case Filter(EqualTo(_: Literal, ar: AttributeReference), child)
      if globallyUniqueRowNumber(child, ar.exprId) => true
    case f: Filter => atMostOneRow(f.child)
    case SubqueryAlias(_, child) => atMostOneRow(child)
    case w: WithCTE => atMostOneRow(w.plan)
    case GlobalLimit(IntegerLiteral(n), _) if n <= 1 => true
    case GlobalLimit(_, child) => atMostOneRow(child)
    case LocalLimit(_, child) => atMostOneRow(child)
    case s: Sort => atMostOneRow(s.child)
    case _ => false
  }

  /** True iff `id` is the output of a row_number() over a window with
    * an EMPTY partition spec (globally unique values) in `plan`,
    * reachable through projections that preserve the attribute. */
  private def globallyUniqueRowNumber(plan: LogicalPlan, id: ExprId): Boolean =
    plan match {
      case w: LWindow => w.windowExpressions.exists {
        case a @ Alias(WindowExpression(_: RowNumber,
            WindowSpecDefinition(partitionSpec, _, _)), _) =>
          a.exprId == id && partitionSpec.isEmpty
        case _ => false
      }
      case Project(list, child) =>
        list.exists { case ar: AttributeReference => ar.exprId == id
                      case _ => false } &&
          globallyUniqueRowNumber(child, id)
      case SubqueryAlias(_, child) => globallyUniqueRowNumber(child, id)
      case _ => false
    }

  /** Extract the top global sort's key names from an analyzed plan,
    * mapped through any Project/Limit/alias wrappers above it onto
    * the FINAL output column names. */
  def topSortKeys(plan: LogicalPlan): TopSort = {
    def walk(p: LogicalPlan, m: Map[ExprId, String]): TopSort = p match {
      case Project(list, child) =>
        // rebase: child attr -> final name, through this projection
        val m2: Map[ExprId, String] = list.flatMap {
          case a @ Alias(ar: AttributeReference, _) =>
            m.get(a.exprId).map(ar.exprId -> _)
          case ar: AttributeReference => m.get(ar.exprId).map(ar.exprId -> _)
          case _ => None
        }.toMap
        walk(child, m2)
      case GlobalLimit(_, child) => walk(child, m)
      case LocalLimit(_, child) => walk(child, m)
      case SubqueryAlias(_, child) => walk(child, m)
      case w: WithCTE => walk(w.plan, m)
      case s: Sort if s.global =>
        val mapped = s.order.map(_.child match {
          case ar: AttributeReference =>
            m.get(ar.exprId).toRight(
              s"sort key `${ar.name}` is not an output column")
          case e => Left(s"sort expression `${e.sql}` is not a bare " +
            "output column — alias it into the projection")
        })
        mapped.collectFirst { case Left(err) => err } match {
          case Some(err) => Breach(err)
          case None => Keys(mapped.map(_.toOption.get))
        }
      case d: Distinct => Breach(
        s"Distinct above any sort destroys order (top node ${d.nodeName})")
      case other if atMostOneRow(other) => SingleRow
      case other => Breach(
        s"no global Sort at the top of the plan (found ${other.nodeName})")
    }
    walk(plan, plan.output.map(a => a.exprId -> a.name).toMap)
  }

  /** Data half: number of sort-key groups of `out` holding MORE than
    * one distinct row — 0 iff the order is total over the output.
    * Map-typed columns are normalized to sorted entry arrays first
    * (maps are not comparable/groupable as-is). */
  def violations(out: DataFrame, keys: Seq[String]): Long = {
    val norm = out.columns.toSeq.map { c =>
      out.schema(c).dataType match {
        case _: MapType => array_sort(map_entries(col(c))).as(c)
        case _ => col(c)
      }
    }
    out.select(norm: _*).distinct()
      .groupBy(keys.map(col): _*).count()
      .filter(col("count") > 1L).count()
  }
}
