package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** SQL-surface extensions: subquery forms (correlated scalar, EXISTS,
  * LATERAL), window value functions, and the boolean/bitwise aggregate
  * + string tier the q21/q22/q65 families don't cover.
  *
  * q89/q90/q92 run ONE SQL text through BOTH engines (the q29
  * pattern): Spark executes it via `spark.sql` over registered views —
  * exercising Catalyst's subquery decorrelation (correlated scalar →
  * aggregate+join, EXISTS → semi join, LATERAL+LIMIT → per-group
  * top-k) — and the driver runs the identical string in DuckDB. No
  * reference counterpart (the reference has no subqueries at all,
  * SURVEY §2.4 absence list); capability rows come from the driver
  * contract.
  */
object SqlOps {

  private def withViews(s: SparkSession, dir: String): SparkSession = {
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    Tables.customer(s, dir).createOrReplaceTempView("customer")
    Tables.part(s, dir).createOrReplaceTempView("part")
    Tables.supplier(s, dir).createOrReplaceTempView("supplier")
    Tables.events(s, dir).createOrReplaceTempView("events")
    s
  }

  /** q151 — double correlated EXISTS / NOT EXISTS self-joins (the
    * TPC-H Q21 "waiting supplier" shape, on this schema: suppliers who
    * were the ONLY supplier with a returned item in a finished
    * multi-supplier order). The optimizer stress: BOTH subqueries
    * correlate to the outer lineitem on the SAME key with inequality
    * side-conditions — Catalyst must decorrelate each into a
    * co-partitioned semi/anti join on l_orderkey (three lineitem scans
    * sharing one shuffle key, never a per-row re-execution), exactly
    * how the operator survives a 100 TB fact table. One SQL text
    * through both engines. */
  val MultiExistsSql: String =
    """SELECT s.s_name, count(*) AS numwait
      |FROM supplier s, lineitem l1, orders o
      |WHERE s.s_suppkey = l1.l_suppkey
      |  AND o.o_orderkey = l1.l_orderkey
      |  AND o.o_orderstatus = 'F'
      |  AND l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_returnflag = 'R')
      |GROUP BY s.s_name
      |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin

  def q151MultiExists(s: SparkSession, dir: String): DataFrame =
    withViews(s, dir).sql(MultiExistsSql)

  /** q89 — correlated SCALAR subquery (TPC-H Q17 shape): lineitems
    * below half their part's average quantity, revenue per brand.
    * Catalyst decorrelates to a per-part aggregate + join — one extra
    * shuffle on l_partkey, never a per-row subquery execution (the
    * plan-shape test asserts no per-row loop survives). avg(l_quantity)
    * is exact: quantities are integer-valued doubles, so the sum is
    * below 2^53 and order-independent — safe to compare against.
    * 5e-1 not 0.5: DuckDB parses bare decimals as DECIMAL. */
  val CorrelatedScalarSql: String =
    """SELECT p_brand, count(*) AS n_small,
      |  CAST(sum(CAST(floor(l_extendedprice * 1e2) AS BIGINT)) AS DOUBLE) / 1e2
      |    AS small_revenue
      |FROM lineitem l JOIN part p ON l_partkey = p_partkey
      |WHERE l_quantity < (SELECT 5e-1 * avg(l_quantity)
      |                    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  def q89CorrelatedScalar(s: SparkSession, dir: String): DataFrame =
    withViews(s, dir).sql(CorrelatedScalarSql)

  /** q90 — EXISTS subquery (TPC-H Q4 shape): orders with at least one
    * returned lineitem, counted per priority. Catalyst plans a LEFT
    * SEMI join on the (pushed-down-filtered) lineitem side. */
  val ExistsSql: String =
    """SELECT o_orderpriority, count(*) AS n_orders
      |FROM orders o
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND l.l_returnflag = 'R')
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  def q90Exists(s: SparkSession, dir: String): DataFrame =
    withViews(s, dir).sql(ExistsSql)

  /** q92 — LATERAL join with per-row ORDER BY + LIMIT: each customer's
    * two most expensive orders. Catalyst decorrelates the LIMIT into a
    * rank-filtered window over a single join — the per-group top-k
    * shape — rather than re-running the inner query per customer.
    * Output doubles are raw parquet values (no re-aggregation), so
    * bit-equality holds trivially. */
  val LateralSql: String =
    """SELECT c_custkey, o_orderkey, o_totalprice
      |FROM customer c, LATERAL (
      |  SELECT o_orderkey, o_totalprice FROM orders
      |  WHERE o_custkey = c.c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      |ORDER BY c_custkey, o_orderkey""".stripMargin

  def q92LateralTopk(s: SparkSession, dir: String): DataFrame =
    withViews(s, dir).sql(LateralSql)

  /** q91 — window VALUE functions: first/last/nth over the full
    * partition frame (default frames stop at CURRENT ROW — last_value
    * without the explicit frame is a classic silent bug, asserted in
    * SqlOpsSpec). Deterministic order keys throughout. */
  def q91WindowValues(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, dir)
      .filter(col("o_custkey") < 300)
      .select(col("o_orderkey"), col("o_custkey"),
        first(col("o_totalprice")).over(w).as("first_price"),
        last(col("o_totalprice")).over(w).as("last_price"),
        nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
      .orderBy("o_orderkey")
  }

  /** q93 — boolean + bitwise aggregates: bit_and/bit_or/bit_xor fold
    * the key space, bool_and/bool_or fold predicates — all five are
    * order-independent (bitwise/boolean ops commute), so cross-engine
    * equality is exact. Partial aggregation map-side as usual. */
  def q93BoolBitAgg(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .agg(expr("bit_and(o_orderkey)").as("key_and"),
        expr("bit_or(o_orderkey)").as("key_or"),
        expr("bit_xor(o_orderkey)").as("key_xor"),
        expr("bool_and(o_totalprice > 0)").as("all_positive"),
        expr("bool_or(o_orderstatus = 'P')").as("any_pending"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")

  /** q94 — string functions tier 2 (beyond q21's case/substr/concat/
    * regexp family): translate, split_part, ascii/chr, strpos, repeat,
    * reverse, left/right, rpad. One codegen'd projection. */
  def q94StringFns2(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .filter(col("c_custkey") < 200)
      .select(col("c_custkey"),
        expr("translate(c_name, '#0', '_O')").as("translated"),
        expr("split_part(c_name, '#', 2)").as("name_num"),
        ascii(substring(col("c_mktsegment"), 1, 1)).as("seg_ascii"),
        expr("chr(65 + c_custkey % 26)").as("bucket_chr"),
        instr(col("c_name"), "#").as("hash_pos"),
        expr("repeat(c_mktsegment, 2)").as("seg_twice"),
        reverse(col("c_name")).as("name_rev"),
        expr("left(c_name, 4)").as("name_left"),
        expr("right(c_name, 3)").as("name_right"),
        rpad(col("c_mktsegment"), 12, ".").as("seg_pad"))
      .orderBy("c_custkey")

  /** q95 — UNCORRELATED scalar subquery in HAVING (TPC-H Q11 shape):
    * customers whose spend exceeds 2× the per-customer average. The
    * subquery runs ONCE (a scalar broadcast into the having filter),
    * never per group; both engines evaluate the same fixed-point sums
    * so the threshold comparison is exact. */
  val HavingScalarSql: String = {
    val fs = "CAST(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT)) AS DOUBLE) / 1e2"
    s"""SELECT o_custkey, count(*) AS n_orders, $fs AS spend
      |FROM orders GROUP BY o_custkey
      |HAVING $fs > (SELECT 2e0 * ($fs) / count(DISTINCT o_custkey) FROM orders)
      |ORDER BY o_custkey""".stripMargin
  }

  def q95HavingScalar(s: SparkSession, dir: String): DataFrame =
    withViews(s, dir).sql(HavingScalarSql)

  /** q96 — NOT IN subquery: Spark plans the null-aware anti join
    * (BroadcastHashJoin LeftAnti with the NAAJ flag) — the
    * three-valued-logic-correct anti join, distinct from q07's plain
    * anti. The subquery column is non-null here so results equal a
    * plain anti join, but the PLAN is the null-aware operator
    * (asserted in SqlOpsSpec). */
  val NotInSql: String =
    """SELECT c_custkey, c_mktsegment FROM customer
      |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
      |                        WHERE o_totalprice > 300000)
      |ORDER BY c_custkey""".stripMargin

  def q96NotIn(s: SparkSession, dir: String): DataFrame =
    withViews(s, dir).sql(NotInSql)

  /** q97 — least-squares regression (regr_slope/intercept/r2 shape)
    * from EXACT integer sufficient statistics: x = quantity (integer-
    * valued), y = floor(price) — all five sums are exact BIGINTs
    * (order-independent), cast to double once, then combined with the
    * closed-form formulas in identical expression trees on both
    * engines → bit-identical doubles. The built-in regr_* aggregates
    * sum doubles in partition order and are NOT cross-engine
    * deterministic — same discipline as q60's corr. Magnitude check:
    * y² ≤ 1.2e10, so syy stays exact past sf10. */
  def q97RegressionStats(s: SparkSession, dir: String): DataFrame = {
    val x = col("l_quantity").cast("long")
    val y = floor(col("l_extendedprice")).cast("long")
    val d = (c: Column) => c.cast("double")
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(y).as("sy"),
        sum(x * x).as("sxx"), sum(x * y).as("sxy"), sum(y * y).as("syy"))
      .select(col("l_returnflag"), col("n"),
        ((d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
          nullif(d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx")),
            lit(0.0))).as("slope"),
        ((d(col("sy")) - ((d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
          nullif(d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx")),
            lit(0.0))) * d(col("sx"))) / d(col("n"))).as("intercept"),
        (((d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))) *
          (d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy")))) /
          nullif((d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))) *
            (d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy"))),
            lit(0.0))).as("r2"))
      .orderBy("l_returnflag")
  }

  /** q98 — column PROFILING (the Deequ/data-quality shape): per column
    * of `orders`, null count, exact distinct count, and min/max
    * rendered to hand-matched string forms (DECIMAL cast for doubles,
    * date_format for timestamps — double→string shortest-rendering
    * diverges between engines and is never used).
    *
    * Shape: a UNION of six single-column aggregates, NOT one aggregate
    * with six count-distincts — the multi-distinct form plans a ×7
    * Expand of the full-width rows and shuffles the multiplied set
    * (measured 4.3 s at sf0.1), while each union branch scans ONE
    * parquet column (pruned) and shuffles only that column's partial
    * distincts (0.17 s — 25×). At 100 TB swap exact distinct for HLL
    * per branch and the shape is unchanged. */
  def q98ColumnProfile(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    def stanza(c: String, minS: Column, maxS: Column): DataFrame =
      o.agg(count(lit(1)).as("n_rows"),
          count_if(col(c).isNull).as("n_nulls"),
          countDistinct(col(c)).as("n_distinct"),
          minS.as("min_val"), maxS.as("max_val"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_val"), col("max_val"))
    val dec = (c: Column) => c.cast("decimal(18,2)").cast("string")
    val ts = (c: Column) => date_format(c, "yyyy-MM-dd HH:mm:ss")
    Seq(
      stanza("o_custkey", min(col("o_custkey")).cast("string"),
        max(col("o_custkey")).cast("string")),
      stanza("o_orderdate", ts(min(col("o_orderdate"))),
        ts(max(col("o_orderdate")))),
      stanza("o_orderkey", min(col("o_orderkey")).cast("string"),
        max(col("o_orderkey")).cast("string")),
      stanza("o_orderpriority", min(col("o_orderpriority")),
        max(col("o_orderpriority"))),
      stanza("o_orderstatus", min(col("o_orderstatus")),
        max(col("o_orderstatus"))),
      stanza("o_totalprice", dec(min(col("o_totalprice"))),
        dec(max(col("o_totalprice")))),
    ).reduce(_ unionAll _).orderBy("col_name")
  }

  /** q99 — array SET operations (beyond q44's element access/sort):
    * intersect/union/except/overlap between the token sets of a
    * document's head and tail. Sizes + a boolean only — set-op output
    * ORDER is implementation-defined, cardinalities are not. */
  def q99ArraySetOps(s: SparkSession, dir: String): DataFrame = {
    // greatest(…, 1): sub-100-char docs would otherwise hand Spark a
    // negative start (counts from the end) and DuckDB a different
    // clamping — clamp identically on both engines
    val headToks = array_distinct(split(substring(col("text"), 1, 100), "\\s+"))
    val tailToks = array_distinct(split(
      col("text").substr(greatest(length(col("text")) - 99, lit(1)), lit(100)),
      "\\s+"))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        size(array_intersect(headToks, tailToks)).as("n_common"),
        size(array_union(headToks, tailToks)).as("n_union"),
        size(array_except(headToks, tailToks)).as("n_head_only"),
        arrays_overlap(headToks, tailToks).as("overlaps"))
      .orderBy("doc_id")
  }

  /** q109 — data-quality audit (the Deequ/dbt-tests shape): a fixed
    * suite of constraint checks — composite-key uniqueness, referential
    * integrity (anti-join counts via NOT EXISTS), value ranges, domain
    * membership, positivity — emitted as one report row per check with
    * the violation count and a pass flag. ONE SQL text through both
    * engines (the q29/q89 pattern). Each check is a single scan-shaped
    * aggregate or a semi/anti join; nothing is row-by-row — the audit
    * of a 100 TB table costs the same passes a count(*) family does,
    * and checks over the same table share scans under codegen. This is
    * the verification layer the reference pipeline runs implicitly
    * (its malformed-row drops) made explicit and reportable. */
  val DataQualitySql: String =
    """SELECT checks.*, n_violations = 0 AS pass FROM (
      |  SELECT 'lineitem_pk_unique' AS check_name,
      |    (SELECT count(*) FROM lineitem) AS n_checked,
      |    (SELECT count(*) FROM lineitem)
      |      - (SELECT count(*) FROM
      |          (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem) d)
      |      AS n_violations
      |  UNION ALL
      |  SELECT 'orders_custkey_fk',
      |    (SELECT count(*) FROM orders),
      |    (SELECT count(*) FROM orders o WHERE NOT EXISTS
      |       (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
      |  UNION ALL
      |  SELECT 'lineitem_orderkey_fk',
      |    (SELECT count(*) FROM lineitem),
      |    (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
      |       (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
      |  UNION ALL
      |  SELECT 'lineitem_qty_range',
      |    (SELECT count(*) FROM lineitem),
      |    (SELECT count(*) FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50)
      |  UNION ALL
      |  SELECT 'orders_status_domain',
      |    (SELECT count(*) FROM orders),
      |    (SELECT count(*) FROM orders
      |     WHERE o_orderstatus NOT IN ('F', 'O', 'P'))
      |  UNION ALL
      |  SELECT 'orders_price_positive',
      |    (SELECT count(*) FROM orders),
      |    (SELECT count(*) FROM orders WHERE o_totalprice <= 0)
      |) AS checks ORDER BY check_name""".stripMargin

  def q109DataQuality(s: SparkSession, dir: String): DataFrame =
    withViews(s, dir).sql(DataQualitySql)

  /** q111 — listagg / string_agg: ordered string concatenation per
    * group (Spark 4's `listagg … WITHIN GROUP`), the classic
    * "order history as one line" reporting aggregate. The ORDER BY key
    * (o_orderdate, o_orderkey) is unique per group, so the
    * concatenation order — and therefore the string — is deterministic
    * cross-engine; DuckDB spells it `string_agg(x, sep ORDER BY …)`.
    * Groups are customer-sized (≤ ~30 orders), so result strings stay
    * small however large the table — listagg over an UNBOUNDED group
    * is the anti-pattern (a single giant row), not this. */
  val ListaggSql: String =
    """SELECT o_custkey,
      |  listagg(o_orderpriority, '|')
      |    WITHIN GROUP (ORDER BY o_orderdate, o_orderkey) AS prio_seq,
      |  count(*) AS n_orders
      |FROM orders WHERE o_custkey < 100
      |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  def q111Listagg(s: SparkSession, dir: String): DataFrame =
    withViews(s, dir).sql(ListaggSql)

  /** q112 — ordered-set / inverse-distribution aggregates: mode and
    * percentile_disc. `mode(x, true)` is Spark's DETERMINISTIC mode
    * (lowest value wins ties) — the plain `mode(x)` tie-break is
    * partition-order-dependent and can never be oracle-checked; the
    * DuckDB oracle replicates min-of-tied-argmax explicitly.
    * percentile_disc picks an actual data value (no interpolation), so
    * cross-engine equality is exact — unlike percentile_cont, whose
    * interpolated doubles diverge in the last bit. */
  val ModePdiscSql: String =
    """SELECT o_orderpriority,
      |  mode(o_orderstatus, true) AS status_mode,
      |  percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS p25,
      |  percentile_disc(0.5)  WITHIN GROUP (ORDER BY o_totalprice) AS p50,
      |  percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice) AS p75,
      |  count(*) AS n
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  def q112ModePdisc(s: SparkSession, dir: String): DataFrame =
    withViews(s, dir).sql(ModePdiscSql)

  /** q113 — RECURSIVE CTE (Spark 4 `WITH RECURSIVE`): a month spine
    * generated by recursion from the table's own date bounds, LEFT
    * JOINed to orders — the calendar-completeness report that shows
    * empty months, with ONE SQL text through both engines. Recursion
    * depth = month count (~80), far under Spark's recursion limit;
    * the spine is driver-side tiny however large the fact table, and
    * the join is a broadcast of the spine. `CAST(date_trunc(…) AS
    * TIMESTAMP)` everywhere: DuckDB's date_trunc returns DATE, Spark's
    * TIMESTAMP — the cast pins both to one type.
    *
    * The recursion CARRIES `hi` as state instead of re-joining
    * `bounds` each step: a `FROM months, bounds` recursive term
    * re-evaluates the bounds aggregate — a full fact-table scan — once
    * PER STEP (measured 14 s vs 2.5 s at sf0.1; the residue is
    * Spark's per-step driver iteration, inherent to WITH RECURSIVE —
    * recursion is for ~100-step spines, never data-sized loops). */
  val RecursiveSpineSql: String =
    """WITH RECURSIVE bounds AS (
      |  SELECT CAST(date_trunc('month', min(o_orderdate)) AS TIMESTAMP) AS lo,
      |         CAST(date_trunc('month', max(o_orderdate)) AS TIMESTAMP) AS hi
      |  FROM orders),
      |months(m, hi) AS (
      |  SELECT lo, hi FROM bounds
      |  UNION ALL
      |  SELECT m + INTERVAL '1' MONTH, hi FROM months WHERE m < hi)
      |SELECT m, count(o_orderkey) AS n_orders,
      |  CAST(coalesce(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT)), 0)
      |    AS DOUBLE) / 1e2 AS month_rev
      |FROM months LEFT JOIN orders
      |  ON CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) = m
      |GROUP BY m ORDER BY m""".stripMargin

  /** The Spark-side spine since r17: the SAME month set generated by
    * RECURSIVE DOUBLING — each step doubles the offset stride, so the
    * working set reaches n months in ⌈log₂ n⌉ rounds instead of n.
    * WITH RECURSIVE executes one driver-scheduled job per round
    * (guide §1/§7.3: q113's cost was ~80 micro-jobs of pure
    * scheduling, measured 3.9 s at sf0.1 with every job < 0.05 s of
    * task time), so round count IS the cost at every scale: 8 rounds
    * for this spine, 2 more per century of data. Offsets are
    * integers; k appears once per surviving level, hence the DISTINCT
    * (≤ 2n rows, spine-sized). The ORACLE keeps the linear-recursion
    * text below — DuckDB re-derives the spine independently, so the
    * cross-engine check also proves the doubling rewrite equivalent
    * (verified: identical results at sf0.01 and sf0.1). */
  val RecursiveSpineDoublingSql: String =
    """WITH RECURSIVE bounds AS (
      |  SELECT CAST(date_trunc('month', min(o_orderdate)) AS TIMESTAMP) AS lo,
      |         CAST(months_between(date_trunc('month', max(o_orderdate)),
      |                             date_trunc('month', min(o_orderdate)))
      |           AS INT) AS n
      |  FROM orders),
      |offs(k, step, n, lo) AS (
      |  SELECT 0, 1, n, lo FROM bounds
      |  UNION ALL
      |  SELECT k + step * i, step + step, n, lo
      |  FROM offs CROSS JOIN (SELECT * FROM VALUES (0), (1) AS t(i))
      |  WHERE k + step * i <= n AND step <= n),
      |months AS (
      |  SELECT DISTINCT lo + k * INTERVAL '1' MONTH AS m FROM offs)
      |SELECT m, count(o_orderkey) AS n_orders,
      |  CAST(coalesce(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT)), 0)
      |    AS DOUBLE) / 1e2 AS month_rev
      |FROM months LEFT JOIN orders
      |  ON CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) = m
      |GROUP BY m ORDER BY m""".stripMargin

  def q113RecursiveSpine(s: SparkSession, dir: String): DataFrame =
    withViews(s, dir).sql(RecursiveSpineDoublingSql)

  /** q132 — winsorization: clamp each event's value to its type's
    * [p05, p95] and report clamp counts + the winsorized mean — the
    * outlier-robust preprocessing a feature pipeline runs before
    * normalization. percentile_disc picks ACTUAL data values (q112's
    * discipline), so the clamped column contains only original
    * doubles and the fixed-point mean is bit-exact cross-engine.
    * The oracle keeps the original SQL text; the Spark side computes
    * the two cut points via
    * [[graft.operators.ExactQuantiles.quantilesDisc]] — the built-in
    * `percentile_disc` buffers every distinct value per
    * handful-of-values event_type group in one aggregation buffer
    * (the agg-state collapse, see `plans/AggStateGuard`); the
    * two-phase form is bit-identical (`TwoPhaseTwinSpec`). Shape: a
    * per-type cut-point frame joined back (broadcast), then one
    * aggregate — two passes over the narrow (type, value) projection. */
  val WinsorizeSql: String =
    """WITH f AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
      |p AS (SELECT event_type,
      |        percentile_disc(0.05) WITHIN GROUP (ORDER BY value) AS p05,
      |        percentile_disc(0.95) WITHIN GROUP (ORDER BY value) AS p95
      |      FROM f GROUP BY event_type),
      |w AS (SELECT f.event_type,
      |        CASE WHEN value < p05 THEN p05
      |             WHEN value > p95 THEN p95 ELSE value END AS wv,
      |        CASE WHEN value < p05 THEN 1 ELSE 0 END AS lo,
      |        CASE WHEN value > p95 THEN 1 ELSE 0 END AS hi
      |      FROM f JOIN p ON f.event_type = p.event_type)
      |SELECT event_type, count(*) AS n,
      |  CAST(sum(lo) AS BIGINT) AS n_lo, CAST(sum(hi) AS BIGINT) AS n_hi,
      |  CAST(sum(CAST(floor(wv * 1e6) AS BIGINT)) AS BIGINT) AS wsum_fp,
      |  CAST(CAST(sum(CAST(floor(wv * 1e6) AS BIGINT)) AS BIGINT) AS DOUBLE)
      |    / 1e6 / count(*) AS w_mean
      |FROM w GROUP BY event_type ORDER BY event_type""".stripMargin

  /** The superseded single-SQL-text spelling (the oracle's exact
    * text, run by Spark) — the A/B twin seam for `TwoPhaseTwinSpec`,
    * NOT registered: its percentile_disc is the value-sized
    * aggregation buffer q132 reworked away. */
  private[graft] def q132WinsorizeSqlForm(s: SparkSession,
      dir: String): DataFrame =
    withViews(s, dir).sql(WinsorizeSql)

  def q132Winsorize(s: SparkSession, dir: String): DataFrame = {
    val f = Tables.events(s, dir).filter(col("value").isNotNull)
      .select(col("event_type"), col("value"))
    // released lifecycle: the cut-point pass drops its input-sized
    // histogram cache before q132 returns; only the group-sized
    // snapshot stays cached (ExactQuantiles "Cache lifecycle")
    val p = graft.operators.ExactQuantiles.quantilesReleased(
      f, Seq("event_type"), "value",
      Seq("p05" -> 0.05, "p95" -> 0.95), discrete = true,
      keep = Seq("event_type", "p05", "p95"))
      .select(col("event_type"), col("p05"), col("p95"))
    val fp = floor(col("wv") * lit(1e6)).cast("long")
    f.join(broadcast(p), "event_type")
      .select(col("event_type"),
        when(col("value") < col("p05"), col("p05"))
          .when(col("value") > col("p95"), col("p95"))
          .otherwise(col("value")).as("wv"),
        when(col("value") < col("p05"), 1).otherwise(0).as("lo"),
        when(col("value") > col("p95"), 1).otherwise(0).as("hi"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("lo")).as("n_lo"), sum(col("hi")).as("n_hi"),
        sum(fp).as("wsum_fp"),
        (sum(fp).cast("double") / lit(1e6) / count(lit(1))).as("w_mean"))
      .orderBy("event_type")
  }

  /** q133 — χ² independence test between event type and 6-hour
    * time-of-day bucket (the drift/association check a data-quality
    * stack runs between a feature and a label). Observed counts are
    * exact BIGINTs; each cell's (O−E)²/E term is evaluated in an
    * identical double expression tree and floor-quantized BEFORE the
    * sum, so the statistic is order-independent and bit-exact. ONE
    * SQL text through both engines; the contingency table is
    * cells-sized (20 rows) from one narrow aggregate. */
  val ChiSquareSql: String =
    """WITH f AS (SELECT event_type,
      |             CAST(floor(extract(hour FROM CAST(ts AS TIMESTAMP)) / 6)
      |               AS INTEGER) AS hb
      |           FROM events),
      |o AS (SELECT event_type, hb, count(*) AS obs FROM f GROUP BY event_type, hb),
      |t AS (SELECT event_type, hb, obs,
      |        sum(obs) OVER (PARTITION BY event_type) AS rt,
      |        sum(obs) OVER (PARTITION BY hb) AS ct,
      |        sum(obs) OVER () AS n
      |      FROM o)
      |SELECT count(*) AS n_cells,
      |  CAST(sum(CAST(floor(
      |    (CAST(obs AS DOUBLE)
      |       - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
      |    * (CAST(obs AS DOUBLE)
      |       - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
      |    / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
      |    * 1e6) AS BIGINT)) AS BIGINT) AS chi2_fp,
      |  CAST(CAST(sum(CAST(floor(
      |    (CAST(obs AS DOUBLE)
      |       - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
      |    * (CAST(obs AS DOUBLE)
      |       - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
      |    / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
      |    * 1e6) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e6 AS chi2,
      |  (count(DISTINCT event_type) - 1) * (count(DISTINCT hb) - 1) AS dof
      |FROM t""".stripMargin

  def q133ChiSquare(s: SparkSession, dir: String): DataFrame =
    withViews(s, dir).sql(ChiSquareSql)

  // ---------------------------------------------------------------- q181

  /** Day after the dataset's last order date — the "as of" anchor every
    * recency metric needs; part of the query definition, shared with
    * the oracle. */
  private val RfmAnchor = "2001-08-02"

  /** q181 — RFM segmentation: classic recency / frequency / monetary
    * quintile scoring of purchasing customers, the workhorse customer-
    * value segmentation of every CRM warehouse. Scores are ntile(5)
    * WITHIN the customer's market segment (partitioned windows — never
    * a global single-partition sort) with the conventional polarity
    * (5 = most recent / most frequent / highest spend) and custkey
    * tie-breaks, so the quintiles are deterministic in both engines.
    * Monetary quantizes to integer cents (q125's idiom); the one join
    * is customer-dim-sized. */
  def q181Rfm(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.orders(s, dir)
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("frequency"),
        sum(floor(col("o_totalprice") * 100).cast("long")).as("monetary_c"))
    val seg = Tables.customer(s, dir).select(col("c_custkey"),
      col("c_mktsegment"))
    val base = per.join(seg, "c_custkey")
      .withColumn("recency_days",
        datediff(to_date(lit(RfmAnchor)), col("last_order")).cast("long"))
    def score(metric: Column, asc: Boolean) = ntile(5).over {
      val w = Window.partitionBy("c_mktsegment")
      if (asc) w.orderBy(metric.asc, col("c_custkey"))
      else w.orderBy(metric.desc, col("c_custkey"))
    }
    base
      .withColumn("r_score", score(col("recency_days"), asc = false))
      .withColumn("f_score", score(col("frequency"), asc = true))
      .withColumn("m_score", score(col("monetary_c"), asc = true))
      .select(col("c_custkey"), col("c_mktsegment"), col("recency_days"),
        col("frequency"), col("monetary_c"),
        col("r_score"), col("f_score"), col("m_score"),
        (col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
          .as("rfm_code"))
      .orderBy("c_custkey")
  }

  private val RfmSql: String = s"""
    |WITH per AS (
    |  SELECT o_custkey AS c_custkey, max(o_orderdate) AS last_order,
    |    count(*) AS frequency,
    |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
    |      AS monetary_c
    |  FROM orders GROUP BY 1),
    |base AS (
    |  SELECT per.*, c.c_mktsegment,
    |    CAST(date_diff('day', CAST(last_order AS DATE),
    |      DATE '$RfmAnchor') AS BIGINT) AS recency_days
    |  FROM per JOIN customer c USING (c_custkey))
    |SELECT c_custkey, c_mktsegment, recency_days, frequency, monetary_c,
    |  r_score, f_score, m_score,
    |  r_score * 100 + f_score * 10 + m_score AS rfm_code
    |FROM (
    |  SELECT *,
    |    CAST(ntile(5) OVER (PARTITION BY c_mktsegment
    |      ORDER BY recency_days DESC, c_custkey) AS INTEGER) AS r_score,
    |    CAST(ntile(5) OVER (PARTITION BY c_mktsegment
    |      ORDER BY frequency, c_custkey) AS INTEGER) AS f_score,
    |    CAST(ntile(5) OVER (PARTITION BY c_mktsegment
    |      ORDER BY monetary_c, c_custkey) AS INTEGER) AS m_score
    |  FROM base)
    |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q182

  /** q182 — weighted median: per return flag, the smallest quantity at
    * which cumulative revenue weight reaches half the flag's total —
    * the revenue-weighted "typical order size" (a plain median treats
    * a $10 and a $10k line identically). Exact, not sketched: one
    * (flag, qty)-grain pre-aggregate collapses the fact table, then a
    * flag-partitioned cumulative window over the ≤ |distinct qty|
    * frame finds the crossing — the two-phase shape that keeps the
    * window input tiny at any fact-table size. All integer (cents,
    * floored quantities) → bit-exact. */
  def q182WeightedMedian(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag").as("flag"),
        floor(col("l_quantity")).cast("long").as("q"))
      .agg(sum(floor(col("l_extendedprice") * 100).cast("long")).as("w"))
    val wc = Window.partitionBy("flag").orderBy("q")
    val wt = Window.partitionBy("flag")
    g.withColumn("cw", sum(col("w")).over(wc))
      .withColumn("tw", sum(col("w")).over(wt))
      .filter(col("cw") * 2 >= col("tw"))
      .groupBy("flag")
      .agg(min(col("q")).as("wmedian_qty"), min(col("tw")).as("total_cents"))
      .orderBy("flag")
  }

  private val WeightedMedianSql: String =
    """WITH g AS (
      |  SELECT l_returnflag AS flag, CAST(floor(l_quantity) AS BIGINT) AS q,
      |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |      AS w
      |  FROM lineitem GROUP BY 1, 2),
      |c AS (SELECT flag, q, w,
      |    CAST(sum(w) OVER (PARTITION BY flag ORDER BY q) AS BIGINT) AS cw,
      |    CAST(sum(w) OVER (PARTITION BY flag) AS BIGINT) AS tw
      |  FROM g)
      |SELECT flag, min(q) AS wmedian_qty, CAST(min(tw) AS BIGINT)
      |  AS total_cents
      |FROM c WHERE cw * 2 >= tw GROUP BY flag ORDER BY flag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q181_rfm" -> (q181Rfm _),
    "q182_weighted_median" -> (q182WeightedMedian _),
    "q132_winsorize" -> (q132Winsorize _),
    "q133_chi_square" -> (q133ChiSquare _),
    "q89_correlated_scalar" -> (q89CorrelatedScalar _),
    "q90_exists" -> (q90Exists _),
    "q151_multi_exists" -> (q151MultiExists _),
    "q91_window_values" -> (q91WindowValues _),
    "q92_lateral_topk" -> (q92LateralTopk _),
    "q93_bool_bit_agg" -> (q93BoolBitAgg _),
    "q94_string_fns2" -> (q94StringFns2 _),
    "q95_having_scalar" -> (q95HavingScalar _),
    "q96_not_in" -> (q96NotIn _),
    "q97_regression_stats" -> (q97RegressionStats _),
    "q98_column_profile" -> (q98ColumnProfile _),
    "q99_array_setops" -> (q99ArraySetOps _),
    "q109_data_quality" -> (q109DataQuality _),
    "q111_listagg" -> (q111Listagg _),
    "q112_mode_pdisc" -> (q112ModePdisc _),
    "q113_recursive_spine" -> (q113RecursiveSpine _),
  )

  val oracles: Map[String, String] = Map(
    "q181_rfm" -> RfmSql,
    "q182_weighted_median" -> WeightedMedianSql,
    "q132_winsorize" -> WinsorizeSql,
    "q133_chi_square" -> ChiSquareSql,
    // q89/q90/q92: the SAME SQL text Spark executed
    "q89_correlated_scalar" -> CorrelatedScalarSql,
    "q90_exists" -> ExistsSql,
    "q151_multi_exists" -> MultiExistsSql,
    "q92_lateral_topk" -> LateralSql,
    "q95_having_scalar" -> HavingScalarSql,
    "q96_not_in" -> NotInSql,
    "q109_data_quality" -> DataQualitySql,
    // q113: the LINEAR recursion as the independent reference — Spark
    // runs the doubling form (r17), so the oracle also proves the
    // rewrite's equivalence
    "q113_recursive_spine" -> RecursiveSpineSql,
    "q111_listagg" ->
      """SELECT o_custkey,
        |  string_agg(o_orderpriority, '|' ORDER BY o_orderdate, o_orderkey)
        |    AS prio_seq,
        |  count(*) AS n_orders
        |FROM orders WHERE o_custkey < 100
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    // min-of-tied-argmax replicates Spark's deterministic mode exactly
    "q112_mode_pdisc" ->
      """SELECT p.o_orderpriority, m.status_mode, p.p25, p.p50, p.p75, p.n
        |FROM (
        |  SELECT o_orderpriority,
        |    percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS p25,
        |    percentile_disc(0.5)  WITHIN GROUP (ORDER BY o_totalprice) AS p50,
        |    percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice) AS p75,
        |    count(*) AS n
        |  FROM orders GROUP BY o_orderpriority) p
        |JOIN (
        |  SELECT o_orderpriority,
        |    min(o_orderstatus) FILTER (WHERE rk = 1) AS status_mode
        |  FROM (SELECT o_orderpriority, o_orderstatus,
        |          rank() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY cnt DESC) AS rk
        |        FROM (SELECT o_orderpriority, o_orderstatus, count(*) AS cnt
        |              FROM orders GROUP BY 1, 2))
        |  GROUP BY o_orderpriority) m
        |ON p.o_orderpriority = m.o_orderpriority
        |ORDER BY p.o_orderpriority""".stripMargin,
    "q97_regression_stats" -> {
      val num = "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
      val den = "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
      val denY = "(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"
      s"""SELECT l_returnflag, n,
        |  $num / NULLIF($den, 0e0) AS slope,
        |  (CAST(sy AS DOUBLE) - ($num / NULLIF($den, 0e0)) * CAST(sx AS DOUBLE))
        |    / CAST(n AS DOUBLE) AS intercept,
        |  ($num * $num) / NULLIF($den * $denY, 0e0) AS r2
        |FROM (
        |  SELECT l_returnflag, count(*) AS n,
        |    sum(CAST(l_quantity AS BIGINT)) AS sx,
        |    sum(CAST(floor(l_extendedprice) AS BIGINT)) AS sy,
        |    sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx,
        |    sum(CAST(l_quantity AS BIGINT) * CAST(floor(l_extendedprice) AS BIGINT)) AS sxy,
        |    sum(CAST(floor(l_extendedprice) AS BIGINT) * CAST(floor(l_extendedprice) AS BIGINT)) AS syy
        |  FROM lineitem GROUP BY l_returnflag)
        |ORDER BY l_returnflag""".stripMargin
    },
    "q91_window_values" ->
      """SELECT o_orderkey, o_custkey,
        |  first_value(o_totalprice) OVER w AS first_price,
        |  last_value(o_totalprice) OVER w AS last_price,
        |  nth_value(o_totalprice, 2) OVER w AS second_price
        |FROM orders WHERE o_custkey < 300
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin,
    "q93_bool_bit_agg" ->
      """SELECT o_orderpriority,
        |  bit_and(o_orderkey) AS key_and,
        |  bit_or(o_orderkey) AS key_or,
        |  bit_xor(o_orderkey) AS key_xor,
        |  bool_and(o_totalprice > 0) AS all_positive,
        |  bool_or(o_orderstatus = 'P') AS any_pending,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q98_column_profile" -> {
      def stanza(name: String, nd: String, minV: String, maxV: String) =
        s"""SELECT '$name' AS col_name, count(*) AS n_rows,
           |  count(*) FILTER (WHERE $name IS NULL) AS n_nulls,
           |  count(DISTINCT $name) AS n_distinct,
           |  $minV AS min_val, $maxV AS max_val FROM orders""".stripMargin
      Seq(
        stanza("o_custkey", "o_custkey",
          "CAST(min(o_custkey) AS VARCHAR)", "CAST(max(o_custkey) AS VARCHAR)"),
        stanza("o_orderdate", "o_orderdate",
          "strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S')",
          "strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S')"),
        stanza("o_orderkey", "o_orderkey",
          "CAST(min(o_orderkey) AS VARCHAR)", "CAST(max(o_orderkey) AS VARCHAR)"),
        stanza("o_orderpriority", "o_orderpriority",
          "min(o_orderpriority)", "max(o_orderpriority)"),
        stanza("o_orderstatus", "o_orderstatus",
          "min(o_orderstatus)", "max(o_orderstatus)"),
        stanza("o_totalprice", "o_totalprice",
          "CAST(CAST(min(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)",
          "CAST(CAST(max(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)"),
      ).mkString("SELECT col_name, n_rows, n_nulls, n_distinct, min_val, max_val FROM (\n",
        "\nUNION ALL\n", "\n) ORDER BY col_name")
    },
    "q99_array_setops" ->
      """SELECT doc_id,
        |  CAST(len(list_intersect(h, t)) AS INTEGER) AS n_common,
        |  CAST(len(list_distinct(list_concat(h, t))) AS INTEGER) AS n_union,
        |  CAST(len(list_filter(h, x -> NOT list_contains(t, x))) AS INTEGER) AS n_head_only,
        |  len(list_intersect(h, t)) > 0 AS overlaps
        |FROM (SELECT doc_id,
        |    list_distinct(string_split_regex(substring(text, 1, 100), '[ \t\n\x0B\f\r]+')) AS h,
        |    list_distinct(string_split_regex(substring(text,
        |      greatest(length(text) - 99, 1), 100), '[ \t\n\x0B\f\r]+')) AS t
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q94_string_fns2" ->
      """SELECT c_custkey,
        |  translate(c_name, '#0', '_O') AS translated,
        |  split_part(c_name, '#', 2) AS name_num,
        |  ascii(substring(c_mktsegment, 1, 1)) AS seg_ascii,
        |  chr(CAST(65 + c_custkey % 26 AS INTEGER)) AS bucket_chr,
        |  CAST(strpos(c_name, '#') AS INTEGER) AS hash_pos,
        |  repeat(c_mktsegment, 2) AS seg_twice,
        |  reverse(c_name) AS name_rev,
        |  left(c_name, 4) AS name_left,
        |  right(c_name, 3) AS name_right,
        |  rpad(c_mktsegment, 12, '.') AS seg_pad
        |FROM customer WHERE c_custkey < 200 ORDER BY c_custkey""".stripMargin,
  )
}
