package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.Tables

/** The relational capability surface (SURVEY.md §2.4): one registered,
  * DuckDB-oracle-verified query per operator family, over the driver
  * testdata star schema.
  *
  * Determinism rules (SURVEY.md §7.4.1) applied throughout so results
  * hash-match the oracle bit-exactly:
  *   - every query ends in a keyed ORDER BY over a unique column set;
  *   - double aggregates go through `dsum`: per-row fixed-point floor
  *     (exact IEEE op) summed as BIGINT (order-independent), one double
  *     division at the end. Plain `sum(double)` would drift by
  *     summation order between Spark's parallel partial aggregates and
  *     DuckDB's scan order;
  *   - averages are `(fixed-point sum) / count` — a single double
  *     division of identical operands on both sides;
  *   - raw double columns pass through untouched (no re-arithmetic).
  *
  * Scale posture (100 TB): every query is a declarative DataFrame plan —
  * filters/projections reach the parquet scan (PushedFilters verified in
  * RelationalSpec), fact-fact joins shuffle on their join key only, and
  * aggregates use partial (map-side) combine automatically. Broadcast
  * hints follow the round-11 census rule (`plans/BroadcastGuard`): only
  * FIXED-cardinality frames (nation 25 / region 5 rows at every SF, and
  * aggregated/report-sized frames) carry a hard `broadcast()`; dims
  * that scale with SF (customer/part/supplier — billions of rows at the
  * 100 TB target despite being "small" next to lineitem) are unhinted,
  * so AQE makes the broadcast-vs-shuffle call from runtime sizes.
  * AQE (on by default in Spark 4) handles skew and partition coalescing.
  */
object Relational {

  /** Order-independent exact fixed-point sum of a double column:
    * per-row `floor(x · 10^scale)` — floor is an exact IEEE operation,
    * so unlike a double→DECIMAL cast (where Spark rounds the *shortest
    * decimal rendering* while DuckDB rounds the exact binary value,
    * which diverges on rendering-boundary doubles) both engines produce
    * identical integers — summed exactly as BIGINT (order-independent),
    * then one double division. Bit-stable at any parallelism. */
  private[queries] def dsum(c: Column, scale: Int = 2): Column = {
    val f = math.pow(10, scale)
    sum(floor(c * f)).cast(DoubleType) / f
  }

  private def davg(c: Column, scale: Int = 2): Column =
    dsum(c, scale) / count(lit(1))

  // ---------------------------------------------------------------- scans

  /** q01 — flagship: TPC-H Q1-style pricing summary. scan → pushed
    * filter → hash agg (partial+final) → sort. */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), 4).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** q02 — filter + projection: predicates push to the parquet scan,
    * ReadSchema prunes to the 4 projected + 3 filtered columns. */
  def q02FilterProject(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_quantity") > 45 && col("l_discount") >= 0.05 &&
        col("l_returnflag") === "R")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      // TOTAL order over the projection: the synthetic generator does
      // NOT enforce the TPC-H (orderkey, linenumber) PK (~118k
      // duplicate key pairs at sf0.1), so a key-only sort leaves the
      // tie order engine-dependent — it held by scan-order luck
      // through the sf1 gate and finally diverged at sf10 (r16).
      // Sorting the remaining projected columns makes any residual
      // tie a full-row duplicate, where order is unobservable.
      .orderBy("l_orderkey", "l_linenumber", "l_quantity",
        "l_extendedprice")

  // ---------------------------------------------------------------- joins

  /** q03 — star join with the broadcast decision split by how each dim
    * SCALES, not how it compares to the fact: nation is
    * FIXED-cardinality (25 rows at every SF) so it carries a hard
    * `broadcast()` — that hint is a fact about the schema. customer is
    * small RELATIVE to orders but grows WITH SF (SF x 150k rows — at
    * the 100 TB target it is billions of rows), so a hard hint there
    * is a forced driver/executor OOM; it gets NO hint and the
    * customer join is AQE's runtime size call — broadcast at bench
    * scale (where it is kilobytes), shuffle hash/merge on o_custkey at
    * cluster scale. Either way the only other shuffle is the final
    * 25-row aggregate. (Round-11 broadcast census; the same rule fixed
    * q85/q86/q62/q134 — see `plans/BroadcastGuard`.) */
  def q03JoinBroadcast(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("order_cnt"), dsum(col("o_totalprice")).as("revenue"))
      .orderBy("n_name")

  /** q04 — fact-fact shuffle join (lineitem ⋈ orders on orderkey): both
    * sides hash-partition on the key; AQE picks SMJ/SHJ and handles skew. */
  def q04JoinShuffle(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderstatus") === "F")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("line_cnt"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
      .orderBy("o_orderpriority")

  /** q05 — left outer join preserving unmatched left rows; count(col)
    * counts only non-null matches. */
  def q05LeftJoin(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey", "c_name")
      .agg(count(col("o_orderkey")).as("order_cnt"),
        dsum(col("o_totalprice")).as("spend"))
      .orderBy("c_custkey")

  /** q06 — left-semi join (EXISTS): customers with at least one order
    * above 400k. Semi join never duplicates or widens the left side. */
  def q06SemiJoin(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).filter(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")

  /** q07 — left-anti join (NOT EXISTS): customers with no order above
    * 300k (threshold chosen so the result is non-empty at sf0.01). */
  def q07AntiJoin(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).filter(col("o_totalprice") > 300000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_mktsegment")
      .orderBy("c_custkey")

  /** q08 — cross join of the two tiny dims (125 rows); BNLJ is fine when
    * both sides are broadcast-size — never cross-join two facts. */
  def q08CrossJoin(s: SparkSession, dir: String): DataFrame =
    Tables.region(s, dir)
      .crossJoin(Tables.nation(s, dir))
      .select(col("r_name"), col("n_name"),
        concat_ws("/", col("r_name"), col("n_name")).as("pair"))
      .orderBy("r_name", "n_name")

  /** q09 — range join: equi key + interval band predicate. The equi half
    * drives the shuffle partitioning; the band is evaluated post-match,
    * so this stays a hash/merge join, not a nested loop. */
  def q09RangeJoin(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("lines_in_window"))
      .orderBy("o_orderpriority")

  // ----------------------------------------------------------- aggregates

  /** q10 — multi-aggregate groupBy incl. exact count-distinct (expands to
    * a two-phase aggregate) and min/max over timestamps. */
  def q10GroupAgg(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_custs"),
        min(col("o_orderdate")).as("first_date"),
        max(col("o_orderdate")).as("last_date"),
        dsum(col("o_totalprice")).as("total"))
      .orderBy("o_orderstatus")

  /** q11 — distinct (planned as an aggregate on all columns). */
  def q11Distinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select("l_returnflag", "l_linestatus")
      .distinct()
      .orderBy("l_returnflag", "l_linestatus")

  /** q12 — approx_count_distinct (HLL++): the 100 TB answer to exact
    * count-distinct's full shuffle. No oracle — approximate by design;
    * driver records a rows-only check.
    *
    * rsd 0.02 (p=12, 4096 registers ≈ 410 longs of aggregation buffer
    * per group), not 0.01: p=14 would quadruple the buffer to ~1.6k
    * longs per group — a codegen-width and per-group-memory cliff that
    * at high group cardinality dominates the aggregation hash map —
    * for one decimal of error nobody reads off a dashboard. */
  def q12ApproxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** q13 — rollup: hierarchical subtotals + grand total in one pass
    * (Expand operator feeds a single aggregate). NULL group markers are
    * coalesced to 'ALL' so ordering is engine-neutral. */
  def q13Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("cnt"), col("sum_qty"))
      .orderBy("returnflag", "linestatus")

  /** q14 — cube: all grouping-set combinations. */
  def q14Cube(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("cnt"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("cnt"))
      .orderBy("status", "priority")

  // -------------------------------------------------------------- windows

  /** q15 — ranking window: top-3 orders per customer. Partition-local
    * sort after one hash partition on the window key; the `rn <= 3`
    * filter is the scalable top-k-per-group idiom (no global sort). */
  def q15WindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rn")
  }

  /** q16 — analytic window: lag/lead over each customer's order history.
    * Bounded to custkey < 50 to keep the verify result small. */
  def q16WindowLag(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, dir)
      .filter(col("o_custkey") < 50)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** q17 — frame window: running spend per customer (rows between
    * unbounded preceding and current). Decimal sum keeps the running
    * total exact and order-stable. */
  def q17WindowFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .filter(col("o_custkey") < 50)
      .select(col("o_custkey"), col("o_orderkey"),
        (sum(floor(col("o_totalprice") * 1e2)).over(w)
          .cast(DoubleType) / 1e2).as("running_spend"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** q118 — RANGE frame with a time-interval bound: trailing-90-day
    * spend per customer. The frame is VALUE-based (all orders within
    * 90 days, however many rows), the complement of q17's ROWS frame —
    * Spark expresses the interval as epoch-second offsets over a
    * numeric sort key, DuckDB natively as `RANGE BETWEEN INTERVAL 90
    * DAY PRECEDING`; date peers are frame-mates under both. Same
    * one-shuffle window shape as q15–q17. */
  def q118RangeFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(unix_timestamp(col("o_orderdate")))
      .rangeBetween(-90L * 86400L, 0L)
    Tables.orders(s, dir)
      .filter(col("o_custkey") < 200)
      .select(col("o_custkey"), col("o_orderkey"),
        sum(floor(col("o_totalprice") * 1e2).cast("long")).over(w)
          .as("trail90_fp"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** q120 — NULL-SAFE equi join (`<=>` / IS NOT DISTINCT FROM): the
    * join both engines need when the key domain includes NULL and
    * NULL must match NULL (SQL `=` drops those rows silently — the
    * classic missing-rows bug when joining on nullable dimensions).
    * Keys are nullified deterministically so both engines see the same
    * domain; aggregates are joined (not rows) so the NULL×NULL match
    * stays one row. Spark plans EqualNullSafe inside a regular hash
    * join — same shuffle shape as `=`. Explicit NULLS FIRST: Spark's
    * ASC default differs from DuckDB's. */
  def q120NullSafeJoin(s: SparkSession, dir: String): DataFrame = {
    val lhs = Tables.orders(s, dir)
      .groupBy(nullif(col("o_custkey") % 50, lit(17)).as("k"))
      .agg(count(lit(1)).as("n_orders"))
    val rhs = Tables.customer(s, dir)
      .groupBy(nullif(col("c_custkey") % 50, lit(17)).as("k2"))
      .agg(count(lit(1)).as("n_cust"))
    lhs.join(rhs, lhs("k") <=> rhs("k2"), "inner")
      .select(col("k"), col("n_orders"), col("n_cust"))
      .orderBy(asc_nulls_first("k"))
  }

  /** q121 — BINNED range join: points (lineitem ship dates) into
    * intervals (14-day windows around a sampled order set) with NO
    * equi key. The naive plan for pure interval containment is a
    * nested-loop O(points × intervals); the scalable rewrite bins
    * time: intervals explode into their covered days (one row per
    * day), points map to their ONE day — so the pair space collapses
    * to an EQUI join on the bin plus an exact containment re-check,
    * and each (point, interval) pair meets at exactly one bin (the
    * point's), so no dedup is needed. Shuffle volume is points +
    * interval-days, never their product; the plan-shape spec asserts
    * no nested-loop join survives. DuckDB oracles it with its native
    * inequality (IEJoin) plan — an independent strategy for the same
    * semantics. */
  def q121BinnedRangeJoin(s: SparkSession, dir: String): DataFrame = {
    val win = Tables.orders(s, dir)
      .filter(col("o_orderkey") % 997 === 0)
      .select(col("o_orderkey").as("win_id"),
        col("o_orderdate").as("w_start"),
        (col("o_orderdate") + expr("INTERVAL 14 DAYS")).as("w_end"))
    val binned = win.select(col("win_id"), col("w_start"), col("w_end"),
      explode(sequence(date_trunc("DAY", col("w_start")),
        date_trunc("DAY", col("w_end")), expr("INTERVAL 1 DAY"))).as("bin"))
    Tables.lineitem(s, dir)
      .select(col("l_shipdate"), col("l_extendedprice"),
        date_trunc("DAY", col("l_shipdate")).as("bin"))
      .join(binned, Seq("bin"))
      .filter(col("l_shipdate") >= col("w_start") &&
        col("l_shipdate") < col("w_end"))
      .groupBy("win_id")
      .agg(count(lit(1)).as("n_lines"),
        dsum(col("l_extendedprice")).as("window_rev"))
      .orderBy("win_id")
  }

  /** q123 — multiset set operations (INTERSECT ALL / EXCEPT ALL):
    * bag semantics keep DUPLICATE cardinality — min(m, n) copies for
    * intersect, max(m − n, 0) for except — which q19's distinct
    * variants erase. Spark plans both as a single aggregate computing
    * per-row counts on each side then a generate (no join); the result
    * is aggregated per key here so the output order is total. */
  def q123SetOpsAll(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
    val urgent = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey")
    val low = orders.filter(col("o_orderpriority") === "5-LOW")
      .select("o_custkey")
    urgent.intersectAll(low).groupBy("o_custkey")
      .agg(count(lit(1)).as("copies"))
      .withColumn("setop", lit("intersect_all"))
      .unionByName(urgent.exceptAll(low).groupBy("o_custkey")
        .agg(count(lit(1)).as("copies"))
        .withColumn("setop", lit("except_all")))
      .select("setop", "o_custkey", "copies")
      .orderBy("setop", "o_custkey")
  }

  // -------------------------------------------------------- sort / set ops

  /** q18 — global top-k: planned as TakeOrderedAndProject (per-partition
    * heap + driver merge of k rows), NOT a full sort — the only safe
    * global ordering at 100 TB. Tie-broken on the unique key. */
  def q18TopK(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  /** q19 — set ops: INTERSECT and EXCEPT of two customer key sets,
    * tagged and UNION ALL'd into one deterministic result. */
  def q19SetOps(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
    val urgent = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey")
    val low = orders.filter(col("o_orderpriority") === "5-LOW")
      .select("o_custkey")
    urgent.intersect(low).withColumn("setop", lit("both"))
      .unionAll(urgent.except(low).withColumn("setop", lit("urgent_only")))
      .orderBy("setop", "o_custkey")
  }

  // ------------------------------------------------------- scalar functions

  /** q20 — date/time functions: year/quarter extraction + month
    * truncation drive a two-level time aggregate. */
  def q20DateFns(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(year(col("l_shipdate")).as("yr"),
        quarter(col("l_shipdate")).as("qtr"),
        date_trunc("month", col("l_shipdate")).as("month_start"))
      .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("qty"))
      .orderBy("yr", "qtr", "month_start")

  /** q21 — string functions: case, length, substring, concat, replace,
    * lpad over the customer dim. */
  def q21StringFns(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .filter(col("c_custkey") < 200)
      .select(col("c_custkey"),
        upper(col("c_name")).as("name_upper"),
        length(col("c_name")).as("name_len"),
        substring(col("c_mktsegment"), 1, 3).as("seg3"),
        concat_ws("|", col("c_name"), col("c_mktsegment")).as("tagged"),
        regexp_replace(col("c_name"), "[0-9]", "#").as("masked"),
        lpad(col("c_custkey").cast("string"), 8, "0").as("key_pad"))
      .orderBy("c_custkey")

  /** q22 — math functions: round/floor/ceil/sqrt/abs over lineitem.
    * sqrt is IEEE-correctly-rounded so it is bit-stable across engines;
    * transcendentals (ln/exp) are deliberately avoided in oracle-checked
    * output. */
  def q22MathFns(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") < 500)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 1).as("price_r1"),
        floor(col("l_extendedprice")).as("price_floor"),
        ceil(col("l_discount") * 100).as("disc_pct_ceil"),
        sqrt(col("l_quantity")).as("qty_sqrt"),
        abs(col("l_quantity") - lit(25.0)).as("qty_dev"))
      // total order over the projection — same duplicate-PK law as q02
      .orderBy("l_orderkey", "l_linenumber", "price_r1", "price_floor",
        "disc_pct_ceil", "qty_sqrt", "qty_dev")

  /** q23 — conditional bucketing: CASE WHEN tiering + aggregate. */
  def q23CaseWhen(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_totalprice"),
        when(col("o_totalprice") < 50000, "small")
          .when(col("o_totalprice") < 150000, "medium")
          .otherwise("large").as("tier"))
      .groupBy("tier")
      .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("total"))
      .orderBy("tier")

  /** The serving-store SQL surface (SURVEY.md §2.5): the identical SQL
    * text runs through Spark's full Catalyst path (ANTLR parse →
    * analyze over temp views → optimize → execute) on one side and
    * DuckDB on the other. */
  val SqlSurfaceText: String =
    s"""SELECT o_orderpriority, count(*) AS n_lines,
       |  ${fsum("l_extendedprice")} AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
       |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** q29 — ad-hoc SQL entry point: registered views + `spark.sql`. */
  def q29SqlSurface(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    s.sql(SqlSurfaceText)
  }

  /** q50 — exact interpolated percentiles + median per group,
    * bit-identical to the built-in `percentile`/`median` aggregates
    * but computed through [[graft.operators.ExactQuantiles]]. The
    * built-in is a single-buffer aggregate holding EVERY distinct
    * o_totalprice per 3-value status group — the aggregation-buffer
    * analog of the low-parallelism window collapse, invisible at test
    * scale and an executor OOM at 100 TB. The two-phase form ranks
    * the (status, price) histogram with bucketed prefix sums and
    * interpolates from the two bracket rows; `ExactQuantilesSpec`
    * pins bit-equality against the superseded aggregate spelling.
    * Rides the RELEASED lifecycle: the build pays one eager job, the
    * operator's input-sized histogram cache is dropped before this
    * returns, and only the group-sized (3-status) snapshot stays
    * cached (ExactQuantiles "Cache lifecycle"). */
  def q50Percentiles(s: SparkSession, dir: String): DataFrame =
    graft.operators.ExactQuantiles.quantilesReleased(
      Tables.orders(s, dir), Seq("o_orderstatus"), "o_totalprice",
      Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75, "med" -> 0.5))
      .select(col("o_orderstatus"), col("p25"), col("p50"), col("p75"),
        col("med"), col("exq_rows").as("n"))
      .orderBy("o_orderstatus")

  /** q54 — pivot: status columns from row values (explicit value list
    * keeps the schema static — mandatory at scale: an unlisted pivot
    * triggers a distinct-scan planning job). Missing cells filled 0. */
  def q54Pivot(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("F", "O", "P"))
      .orderBy("o_orderpriority")

  /** q55 — unpivot/melt: wide metric columns to (metric, value) rows. */
  def q55Unpivot(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") < 200)
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_discount"), col("l_tax")),
        "metric", "value")
      // "value" tiebreaker — the duplicate-(okey,lnum) law (r16)
      .orderBy("l_orderkey", "l_linenumber", "metric", "value")

  /** q56 — distribution window functions: quartile bucketing,
    * percent_rank, cume_dist per priority partition. The frame is the
    * FIXED 100-customer cohort's orders (measured 1,009 rows at
    * sf0.01), so the low-cardinality priority partitions ride a
    * cohort-report-sized slice, not the orders table — the window
    * census pins this query as a reviewed exception on exactly that
    * ground; an unfiltered form would need the q195/q155-style
    * two-phase rank. */
  def q56WindowDistribution(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, dir)
      .filter(col("o_custkey") < 100)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cum_dist"))
      .orderBy("o_orderpriority", "o_orderkey")
  }

  /** q85 — part/supplier star join (TPC-H Q9-flavored brand revenue by
    * supplier nation). Only nation keeps a hard `broadcast()` — it is
    * FIXED at 25 rows. part and supplier are dims relative to lineitem
    * but SCALE with SF (SF x 200k / SF x 10k rows; tens of billions at
    * the 100 TB target), so hard hints there would force an OOM; they
    * are unhinted and AQE makes the runtime size call per join —
    * broadcast at bench scale, shuffle on the key at cluster scale
    * (the fact side hash-partitions on l_partkey/l_suppkey, which AQE
    * skew-splits if needed). The final (n_name, p_brand) aggregate is
    * bounded by |nations|·|brands| groups after map-side combine. */
  def q85PartSupplierStar(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name", "p_brand")
      .agg(count(lit(1)).as("line_cnt"),
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
      .orderBy("n_name", "p_brand")

  /** q86 — promo revenue share (TPC-H Q14-style): part-attribute
    * conditional aggregate per ship month. Numerator and denominator
    * both go through the fixed-point sum, so the final share is one
    * double multiply + divide of identical operands on both engines.
    * The part join is unhinted (part scales with SF — a hard
    * broadcast() would OOM at 100 TB; AQE broadcasts it at small SF
    * and shuffles on l_partkey at scale); the month aggregate is the
    * one guaranteed shuffle, |months|-bounded after map-side combine. */
  def q86PromoShare(s: SparkSession, dir: String): DataFrame = {
    val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val promo = when(col("p_type") === "PROMO", disc).otherwise(lit(0.0))
    Tables.lineitem(s, dir)
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .groupBy(date_trunc("month", col("l_shipdate")).as("ship_month"))
      .agg(count(lit(1)).as("line_cnt"),
        dsum(promo, 4).as("promo_revenue"),
        dsum(disc, 4).as("total_revenue"),
        // nullif: a month whose discounted revenue floors to 0 would
        // throw under Spark ANSI while DuckDB yields inf — NULL on both
        // sides is the one agreeing answer (same discipline as q68)
        (dsum(promo, 4) * lit(100.0) / nullif(dsum(disc, 4), lit(0.0)))
          .as("promo_share_pct"))
      .orderBy("ship_month")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q85_part_supplier_star" -> (q85PartSupplierStar _),
    "q86_promo_share" -> (q86PromoShare _),
    "q50_percentiles" -> (q50Percentiles _),
    "q54_pivot" -> (q54Pivot _),
    "q55_unpivot" -> (q55Unpivot _),
    "q56_window_distribution" -> (q56WindowDistribution _),
    "q02_filter_project" -> (q02FilterProject _),
    "q03_join_broadcast" -> (q03JoinBroadcast _),
    "q04_join_shuffle" -> (q04JoinShuffle _),
    "q05_left_join" -> (q05LeftJoin _),
    "q06_semi_join" -> (q06SemiJoin _),
    "q07_anti_join" -> (q07AntiJoin _),
    "q08_cross_join" -> (q08CrossJoin _),
    "q09_range_join" -> (q09RangeJoin _),
    "q10_group_agg" -> (q10GroupAgg _),
    "q11_distinct" -> (q11Distinct _),
    "q12_approx_distinct" -> (q12ApproxDistinct _),
    "q13_rollup" -> (q13Rollup _),
    "q14_cube" -> (q14Cube _),
    "q15_window_rank" -> (q15WindowRank _),
    "q16_window_lag" -> (q16WindowLag _),
    "q17_window_frame" -> (q17WindowFrame _),
    "q118_range_frame" -> (q118RangeFrame _),
    "q120_null_safe_join" -> (q120NullSafeJoin _),
    "q121_binned_range_join" -> (q121BinnedRangeJoin _),
    "q123_setops_all" -> (q123SetOpsAll _),
    "q18_topk" -> (q18TopK _),
    "q19_setops" -> (q19SetOps _),
    "q20_date_fns" -> (q20DateFns _),
    "q21_string_fns" -> (q21StringFns _),
    "q22_math_fns" -> (q22MathFns _),
    "q23_case_when" -> (q23CaseWhen _),
    "q29_sql_surface" -> (q29SqlSurface _),
  )

  /** DuckDB rendering of [[dsum]]: `1eN` literals are DOUBLE in DuckDB
    * (plain `100.0` would be DECIMAL and change the arithmetic). */
  private def fsum(x: String, scale: Int = 2): String =
    s"CAST(sum(CAST(floor(($x) * 1e$scale) AS BIGINT)) AS DOUBLE) / 1e$scale"

  private def favg(x: String, scale: Int = 2): String =
    s"(${fsum(x, scale)}) / count(*)"

  /** DuckDB equivalents. Column aliases match the Spark side exactly —
    * the driver sorts columns by name before hashing. */
  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
        |  ${fsum("l_quantity")} AS sum_qty,
        |  ${fsum("l_extendedprice")} AS sum_base_price,
        |  ${fsum("l_extendedprice * (CAST(1 AS DOUBLE) - l_discount)", 4)} AS sum_disc_price,
        |  ${fsum("l_extendedprice * (CAST(1 AS DOUBLE) - l_discount) * (CAST(1 AS DOUBLE) + l_tax)", 4)} AS sum_charge,
        |  ${favg("l_quantity")} AS avg_qty,
        |  ${favg("l_extendedprice")} AS avg_price,
        |  ${favg("l_discount", 6)} AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_quantity > 45 AND l_discount >= 0.05 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin,
    "q03_join_broadcast" ->
      s"""SELECT n_name, count(*) AS order_cnt,
        |  ${fsum("o_totalprice")} AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q04_join_shuffle" ->
      s"""SELECT o_orderpriority, count(*) AS line_cnt,
        |  ${fsum("l_extendedprice * (CAST(1 AS DOUBLE) - l_discount)", 4)} AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q05_left_join" ->
      s"""SELECT c_custkey, c_name, count(o_orderkey) AS order_cnt,
        |  ${fsum("o_totalprice")} AS spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,
    "q06_semi_join" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "q07_anti_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,
    "q08_cross_join" ->
      """SELECT r_name, n_name, concat_ws('/', r_name, n_name) AS pair
        |FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,
    "q09_range_join" ->
      """SELECT o_orderpriority, count(*) AS lines_in_window
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  AND l_shipdate >= o_orderdate
        |  AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q10_group_agg" ->
      s"""SELECT o_orderstatus, count(*) AS n_orders,
        |  count(DISTINCT o_custkey) AS n_custs,
        |  min(o_orderdate) AS first_date, max(o_orderdate) AS last_date,
        |  ${fsum("o_totalprice")} AS total
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q11_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q13_rollup" ->
      s"""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  count(*) AS cnt,
        |  ${fsum("l_quantity")} AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q14_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority, count(*) AS cnt
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q15_window_rank" ->
      s"""SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q16_window_lag" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price
        |FROM orders WHERE o_custkey < 50
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q17_window_frame" ->
      s"""SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT)) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 1e2
        |    AS running_spend
        |FROM orders WHERE o_custkey < 50
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q118_range_frame" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT)) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate
        |    RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS trail90_fp
        |FROM orders WHERE o_custkey < 200
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q123_setops_all" ->
      """WITH urgent AS (SELECT o_custkey FROM orders
        |                WHERE o_orderpriority = '1-URGENT'),
        |low AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW')
        |SELECT 'intersect_all' AS setop, o_custkey, count(*) AS copies
        |FROM (SELECT * FROM urgent INTERSECT ALL SELECT * FROM low)
        |GROUP BY o_custkey
        |UNION ALL
        |SELECT 'except_all', o_custkey, count(*)
        |FROM (SELECT * FROM urgent EXCEPT ALL SELECT * FROM low)
        |GROUP BY o_custkey
        |ORDER BY setop, o_custkey""".stripMargin,
    "q121_binned_range_join" ->
      s"""SELECT w.o_orderkey AS win_id, count(*) AS n_lines,
        |  ${fsum("l.l_extendedprice")} AS window_rev
        |FROM (SELECT o_orderkey, o_orderdate FROM orders
        |      WHERE o_orderkey % 997 = 0) w
        |JOIN lineitem l
        |  ON l.l_shipdate >= w.o_orderdate
        | AND l.l_shipdate < w.o_orderdate + INTERVAL 14 DAY
        |GROUP BY w.o_orderkey ORDER BY win_id""".stripMargin,
    "q120_null_safe_join" ->
      """SELECT l.k, l.n_orders, r.n_cust
        |FROM (SELECT nullif(o_custkey % 50, 17) AS k, count(*) AS n_orders
        |      FROM orders GROUP BY 1) l
        |JOIN (SELECT nullif(c_custkey % 50, 17) AS k2, count(*) AS n_cust
        |      FROM customer GROUP BY 1) r
        |  ON l.k IS NOT DISTINCT FROM r.k2
        |ORDER BY l.k NULLS FIRST""".stripMargin,
    "q18_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q19_setops" ->
      """SELECT o_custkey, 'both' AS setop FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW') a
        |UNION ALL
        |SELECT o_custkey, 'urgent_only' AS setop FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW') b
        |ORDER BY setop, o_custkey""".stripMargin,
    "q20_date_fns" ->
      s"""SELECT CAST(year(l_shipdate) AS INTEGER) AS yr,
        |  CAST(quarter(l_shipdate) AS INTEGER) AS qtr,
        |  date_trunc('month', l_shipdate) AS month_start,
        |  count(*) AS cnt,
        |  ${fsum("l_quantity")} AS qty
        |FROM lineitem GROUP BY 1, 2, 3 ORDER BY yr, qtr, month_start""".stripMargin,
    "q21_string_fns" ->
      """SELECT c_custkey, upper(c_name) AS name_upper,
        |  CAST(length(c_name) AS INTEGER) AS name_len,
        |  substring(c_mktsegment, 1, 3) AS seg3,
        |  concat_ws('|', c_name, c_mktsegment) AS tagged,
        |  regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
        |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_pad
        |FROM customer WHERE c_custkey < 200 ORDER BY c_custkey""".stripMargin,
    "q22_math_fns" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(l_extendedprice, 1) AS price_r1,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |  CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
        |  sqrt(l_quantity) AS qty_sqrt,
        |  abs(l_quantity - 25.0) AS qty_dev
        |FROM lineitem WHERE l_orderkey < 500
        |ORDER BY l_orderkey, l_linenumber, price_r1, price_floor,
        |  disc_pct_ceil, qty_sqrt, qty_dev""".stripMargin,
    "q23_case_when" ->
      s"""SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
        |  WHEN o_totalprice < 150000 THEN 'medium' ELSE 'large' END AS tier,
        |  count(*) AS cnt,
        |  ${fsum("o_totalprice")} AS total
        |FROM orders GROUP BY 1 ORDER BY tier""".stripMargin,
    "q29_sql_surface" -> SqlSurfaceText,
    "q54_pivot" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q55_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
        |  l_quantity AS "value" FROM lineitem WHERE l_orderkey < 200
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        |  FROM lineitem WHERE l_orderkey < 200
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
        |  FROM lineitem WHERE l_orderkey < 200
        |ORDER BY l_orderkey, l_linenumber, metric, "value"""".stripMargin,
    "q56_window_distribution" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cum_dist
        |FROM orders WHERE o_custkey < 100
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "q85_part_supplier_star" ->
      s"""SELECT n_name, p_brand, count(*) AS line_cnt,
        |  ${fsum("l_quantity")} AS sum_qty,
        |  ${fsum("l_extendedprice * (CAST(1 AS DOUBLE) - l_discount)", 4)} AS revenue
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name, p_brand ORDER BY n_name, p_brand""".stripMargin,
    "q86_promo_share" -> {
      val disc = "l_extendedprice * (CAST(1 AS DOUBLE) - l_discount)"
      val promo = s"CASE WHEN p_type = 'PROMO' THEN $disc ELSE CAST(0 AS DOUBLE) END"
      s"""SELECT date_trunc('month', l_shipdate) AS ship_month,
        |  count(*) AS line_cnt,
        |  ${fsum(promo, 4)} AS promo_revenue,
        |  ${fsum(disc, 4)} AS total_revenue,
        |  (${fsum(promo, 4)}) * 1e2 / NULLIF((${fsum(disc, 4)}), 0e0) AS promo_share_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY ship_month""".stripMargin
    },
    "q50_percentiles" ->
      """SELECT o_orderstatus,
        |  quantile_cont(o_totalprice, 0.25) AS p25,
        |  quantile_cont(o_totalprice, 0.5) AS p50,
        |  quantile_cont(o_totalprice, 0.75) AS p75,
        |  median(o_totalprice) AS med,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
  )
}
