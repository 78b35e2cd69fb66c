package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType}

import graft.Tables
import graft.operators.IterBarrierSyntax.BarrierOps

/** Extended operator surface (round 3): grouping sets, exact
  * statistical aggregates, vocabulary/TF-IDF text analytics,
  * edit-distance fuzzy matching, deterministic collection aggregates,
  * conditional aggregates, calendar-spine gap filling, near-duplicate
  * CLUSTERING (connected components over the n-gram Jaccard pair
  * graph), fixed-width histograms, and null-handling functions.
  *
  * Determinism follows Relational's rules: keyed ORDER BY everywhere;
  * doubles only via expressions whose IEEE operation sequence is
  * spelled identically in the DuckDB oracle (exact integer sufficient
  * statistics → one double formula), never via order-dependent
  * `sum(double)`.
  */
object ExtendedOps {

  // ------------------------------------------------------------ relational

  /** q59 — GROUPING SETS: explicitly chosen subtotal combinations in
    * one pass (rollup/cube are special cases — §2.4 completes the
    * trio). `grouping()` disambiguates "grouped-out" from data NULL. */
  def q59GroupingSets(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping(col("l_returnflag")).cast(IntegerType).as("g_rf"),
        count(lit(1)).as("cnt"),
        Relational.dsum(col("l_quantity")).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("g_rf"), col("cnt"), col("sum_qty"))
      .orderBy("returnflag", "linestatus")

  /** q60 — statistical aggregates (variance / stddev / covariance /
    * correlation) computed from EXACT integer sufficient statistics:
    * per-row fixed-point floors summed as BIGINT/DECIMAL(38) (order
    * independent), then ONE double formula evaluated identically by
    * both engines. The built-ins (`stddev_samp`, `corr`) are one-liners
    * but accumulate doubles in scan order — cross-engine bit-equality
    * needs the sufficient-statistics form. Same shape Welford-style
    * partial aggregation uses at scale: map-side combine of (n, Σx,
    * Σy, Σxy, Σx², Σy²), constant state per group. */
  def q60StatsAgg(s: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val xl = floor(col("l_quantity"))                    // long, exact
    val yl = floor(col("l_extendedprice") * lit(100.0))  // long, exact
    val stats = Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("nl"),
        sum(xl).as("sxl"),
        sum(yl.cast(dec)).as("syl"),
        sum((xl * yl).cast(dec)).as("sxyl"),
        sum(xl * xl).as("sxxl"),
        sum(yl.cast(dec) * yl.cast(dec)).as("syyl"))
    val n = col("nl").cast(DoubleType)
    val sx = col("sxl").cast(DoubleType)
    val sy = col("syl").cast(DoubleType)
    val sxy = col("sxyl").cast(DoubleType)
    val sxx = col("sxxl").cast(DoubleType)
    val syy = col("syyl").cast(DoubleType)
    val varQty = (sxx - sx * sx / n) / (n - 1)
    val varPrice = (syy - sy * sy / n) / (n - 1)
    val covar = (sxy - sx * sy / n) / (n - 1)
    stats.select(col("l_returnflag"),
      col("nl").as("n_rows"),
      (sx / n).as("mean_qty"),
      varQty.as("var_qty"),
      sqrt(varQty).as("stddev_qty"),
      covar.as("covar_qp"),
      (covar / (sqrt(varQty) * sqrt(varPrice))).as("corr_qp"))
      .orderBy("l_returnflag")
  }

  /** q64 — collection aggregates rendered deterministically:
    * collect_set sorted then joined to a string (a raw collect_list is
    * order-nondeterministic under parallelism — never emit one from a
    * distributed aggregate without sorting). */
  def q64CollectAgg(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .agg(array_join(sort_array(collect_set(col("o_orderstatus"))), ",")
        .as("statuses"),
        size(collect_set(col("o_orderstatus"))).as("n_statuses"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")

  /** q65 — conditional + positional aggregates: count_if, filtered
    * fixed-point sum, and arg-max/arg-min keyed by the UNIQUE orderkey
    * (max_by on a non-unique ordinate is tie-nondeterministic). */
  def q65ConditionalAgg(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderstatus")
      .agg(count_if(col("o_totalprice") > 200000).as("n_big"),
        Relational.dsum(when(col("o_totalprice") > 200000, col("o_totalprice"))
          .otherwise(lit(0.0))).as("big_total"),
        max_by(col("o_custkey"), col("o_orderkey")).as("latest_cust"),
        min_by(col("o_custkey"), col("o_orderkey")).as("first_cust"))
      .orderBy("o_orderstatus")

  /** q66 — calendar-spine gap filling: per-customer month sequence
    * (`sequence` + explode) left-joined to actual monthly counts, so
    * zero-activity months surface as rows — the time-series
    * densification step ahead of any window/trend computation. */
  def q66DateSpine(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir).filter(col("o_custkey") < 5)
    val bounds = base.groupBy("o_custkey")
      .agg(date_trunc("month", min(col("o_orderdate"))).as("fm"),
        date_trunc("month", max(col("o_orderdate"))).as("lm"))
    val spine = bounds.select(col("o_custkey"),
      explode(sequence(col("fm"), col("lm"), expr("interval 1 month")))
        .as("month_start"))
    val counts = base
      .groupBy(col("o_custkey"),
        date_trunc("month", col("o_orderdate")).as("month_start"))
      .agg(count(lit(1)).as("n"))
    spine.join(counts, Seq("o_custkey", "month_start"), "left")
      .select(col("o_custkey"), col("month_start"),
        coalesce(col("n"), lit(0L)).as("n_orders"))
      .orderBy("o_custkey", "month_start")
  }

  /** q70 — fixed-width histogram: bucket = floor(x / width). Stable
    * bucket boundaries (unlike ntile) so histograms from different
    * partitions/engines align — the scalable distribution profile
    * (one groupBy, map-side combinable). */
  def q70Histogram(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(floor(col("o_totalprice") / 50000).as("bucket"))
      .agg(count(lit(1)).as("cnt"),
        Relational.dsum(col("o_totalprice")).as("total"))
      .select(col("bucket"), (col("bucket") * 50000).as("lo"),
        col("cnt"), col("total"))
      .orderBy("bucket")

  /** q71 — null-handling scalar functions: nullif / coalesce /
    * greatest / least and null-aware counting over a column made
    * sparse by `nullif`. */
  def q71NullFns(s: SparkSession, dir: String): DataFrame = {
    val disc = nullif(col("l_discount"), lit(0.0))
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") < 300)
      .select(col("l_orderkey"), col("l_linenumber"),
        disc.as("disc_or_null"),
        coalesce(disc, lit(-1.0)).as("disc_filled"),
        greatest(col("l_tax"), col("l_discount")).as("max_rate"),
        least(col("l_tax"), col("l_discount")).as("min_rate"),
        disc.isNull.as("is_zero_disc"))
      // total order over the projection — the duplicate-(okey,lnum)
      // law (r16): nullable sort keys need NULLS FIRST spelled in the
      // DuckDB twin (Spark's ascending default)
      .orderBy("l_orderkey", "l_linenumber", "disc_or_null",
        "max_rate", "min_rate")
  }

  /** q75 — error-safe expression surface (Spark 4 runs under ANSI
    * mode, where overflow/bad-cast/div-by-zero THROW): `try_divide` /
    * `try_cast` / `try_add` return NULL instead, the contract batch
    * pipelines want for dirty data — one malformed row must not kill a
    * 100 TB job. */
  def q75TryFns(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") < 300)
      .select(col("l_orderkey"), col("l_linenumber"),
        try_divide(col("l_quantity"), col("l_discount")).as("qty_per_disc"),
        try_divide(col("l_quantity"), nullif(col("l_discount"), col("l_discount")))
          .as("div_null"),
        expr("try_cast(l_returnflag AS INT)").as("flag_as_int"),
        expr("try_cast(l_linenumber AS STRING)").as("line_str"))
      // total order over the projection — duplicate-(okey,lnum) law
      .orderBy("l_orderkey", "l_linenumber", "qty_per_disc")

  /** q77 — pure theta join (no equi conjunct): every nation paired
    * with the nations of strictly-higher REGIONS (nations in the top
    * region drop out — no higher region exists). Plans as
    * BroadcastNestedLoopJoin — acceptable ONLY when one side is
    * broadcast-small; a theta join of two facts is the plan to reject
    * in review (O(n·m) compares with no partitioning to hide behind). */
  def q77ThetaJoin(s: SparkSession, dir: String): DataFrame = {
    val a = Tables.nation(s, dir)
      .select(col("n_nationkey").as("key_a"), col("n_name").as("name_a"),
        col("n_regionkey").as("reg_a"))
    val b = Tables.nation(s, dir)
      .select(col("n_nationkey").as("key_b"), col("n_regionkey").as("reg_b"))
    a.join(broadcast(b), col("reg_a") < col("reg_b"))
      .groupBy("key_a", "name_a")
      .agg(count(lit(1)).as("n_higher_region"),
        min(col("key_b")).as("min_higher_key"))
      .orderBy("key_a")
  }

  /** q78 — full outer join: customer spend vs a quota table built from
    * another segment — unmatched rows survive from BOTH sides with
    * NULLs. The fill pattern (coalesce over both keys) is the standard
    * reconciliation-report idiom. */
  def q78FullOuter(s: SparkSession, dir: String): DataFrame = {
    val auto = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "AUTOMOBILE" && col("c_custkey") < 200)
      .select(col("c_custkey").as("key_a"), col("c_acctbal").as("bal_a"))
    val mach = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "MACHINERY" && col("c_custkey") < 200)
      .select(col("c_custkey").as("key_b"), col("c_acctbal").as("bal_b"))
    auto.join(mach, col("key_a") === col("key_b"), "full_outer")
      .select(coalesce(col("key_a"), col("key_b")).as("custkey"),
        when(col("key_a").isNotNull && col("key_b").isNotNull, "both")
          .when(col("key_a").isNotNull, "auto_only")
          .otherwise("mach_only").as("side"),
        col("bal_a"), col("bal_b"))
      .orderBy("custkey")
  }

  /** q79 — calendar arithmetic beyond q20: month shifting with
    * end-of-month clamping (`add_months`), month-end snapping
    * (`last_day`), day-of-week / ISO week extraction, and
    * pattern formatting — the second tier of the date/time surface
    * (dialect parity with DuckDB verified: Spark's Sunday=1 dayofweek
    * is DuckDB's Sunday=0 plus one). */
  def q79DateFns2(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_orderkey") < 2000)
      .select(col("o_orderkey"),
        add_months(col("o_orderdate"), 3).as("plus_3m"),
        last_day(col("o_orderdate")).as("month_end"),
        dayofweek(col("o_orderdate")).as("dow"),
        weekofyear(col("o_orderdate")).as("iso_week"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
      .orderBy("o_orderkey")

  /** q81 — right outer join: all orders kept, customer attributes
    * NULL where the (filtered) customer side has no match — the
    * mirror of q05's left join, completing the outer-join family. */
  def q81RightJoin(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(s, dir).filter(col("o_orderkey") < 2000),
        col("c_custkey") === col("o_custkey"), "right")
      .select(col("o_orderkey"), col("o_custkey"),
        col("c_name"), col("c_mktsegment"),
        col("c_custkey").isNotNull.as("has_building_cust"))
      .orderBy("o_orderkey")

  /** q84 — approximate percentiles (Greenwald-Khanna sketch): the
    * 100 TB answer to q50's exact sort-based percentiles — bounded
    * sketch state per group, map-side combinable, error ≤ 1/accuracy.
    * Completes the approximate family (HLL count-distinct q12,
    * Misra-Gries heavy hitters q76). Rows-only: sketch contents are
    * engine-specific (DuckDB uses t-digest). */
  def q84ApproxPercentiles(s: SparkSession, dir: String): DataFrame = {
    val ps = percentile_approx(col("o_totalprice"),
      array(lit(0.25), lit(0.5), lit(0.75)), lit(1000))
    Tables.orders(s, dir)
      .groupBy("o_orderstatus")
      .agg(ps.as("p"), count(lit(1)).as("n"))
      .select(col("o_orderstatus"),
        element_at(col("p"), 1).as("p25"),
        element_at(col("p"), 2).as("p50"),
        element_at(col("p"), 3).as("p75"),
        col("n"))
      .orderBy("o_orderstatus")
  }

  /** q82 — higher-order array functions: `filter` / `exists` /
    * `forall` / `transform`+`aggregate` lambdas over token arrays —
    * the codegen-friendly per-row collection programs that replace
    * row-at-a-time UDFs. */
  def q82HigherOrder(s: SparkSession, dir: String): DataFrame = {
    val t = split(col("text"), "\\s+")
    Tables.documents(s, dir)
      .select(col("doc_id"),
        size(filter(t, x => length(x) > 5)).as("n_long"),
        exists(t, x => x.rlike("[0-9]")).as("has_digit"),
        forall(t, x => !x.rlike("[A-Z]")).as("all_lower"),
        aggregate(transform(t, x => length(x).cast("long")), lit(0L),
          (acc, x) => acc + x).as("total_chars"))
      .orderBy("doc_id")
  }

  /** q83 — `explode_outer`: generator that PRESERVES rows whose array
    * is empty (a plain explode silently drops them — the classic
    * lost-rows trap when flattening sparse extractions). */
  def q83ExplodeOuter(s: SparkSession, dir: String): DataFrame = {
    val rare = filter(split(lower(col("text")), "\\s+"), x => x.like("qu%"))
    Tables.documents(s, dir)
      .select(col("doc_id"), explode_outer(rare).as("rare_tok"))
      .orderBy(col("doc_id"), col("rare_tok"))
  }

  // ------------------------------------------------------------------ text

  /** q61 — corpus vocabulary top-k: explode tokens → count → global
    * top 20. The explode shuffles once on the token (word-count
    * shape, map-side combined); the final top-k is
    * TakeOrderedAndProject, never a full sort. */
  def q61TopTokens(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(split(lower(col("text")), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(20)

  /** q62 — TF-IDF term weighting: term frequency per (doc, term),
    * document frequency per term, weight = tf · (N/df). The idf is the
    * raw N/df ratio, not ln(N/df): ln is a transcendental whose last
    * ulp differs between libm implementations, which would break
    * cross-engine bit-equality (monotonically equivalent for ranking).
    * Shape at scale: one token explode feeding two word-count-style
    * aggregates. The broadcast side is the PROBE side — tf restricted
    * to the fixed 25-doc report set (bounded rows at any corpus size),
    * NOT the document-frequency table: vocabulary GROWS with the
    * corpus (Heaps' law — hundreds of millions of distinct terms with
    * df >= 25 at 100 TB), so a hard broadcast() of dfreq is an OOM at
    * the target scale (round-11 broadcast census; `plans/
    * BroadcastGuard`). Broadcasting the bounded tf side keeps the
    * vocabulary-sized dfreq stationary: it never shuffles for the
    * join at all. */
  def q62Tfidf(s: SparkSession, dir: String): DataFrame = {
    val td = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(lower(col("text")), "\\s+")).as("term"))
      .filter(col("term") =!= "")
    val tf = td.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = td.groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
    val n = Tables.documents(s, dir).agg(count(lit(1)).as("n_docs"))
    broadcast(tf.filter(col("doc_id") < 25))
      .join(dfreq.filter(col("df") >= 25), Seq("term"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        (col("tf").cast(DoubleType) *
          (col("n_docs").cast(DoubleType) / col("df").cast(DoubleType)))
          .as("weight"))
      .orderBy("doc_id", "term")
  }

  /** q63 — edit-distance fuzzy matching: Levenshtein pairs within a
    * blocking key (nation) — the fuzzy-join primitive for entity
    * resolution. Blocked, never all-pairs: candidates exist only
    * inside a block, same scale posture as the LSH dedups. */
  def q63FuzzyMatch(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).filter(col("c_custkey") < 1000)
    val a = c.select(col("c_nationkey"), col("c_custkey").as("id_a"),
      col("c_name").as("name_a"))
    val b = c.select(col("c_nationkey"), col("c_custkey").as("id_b"),
      col("c_name").as("name_b"))
    a.join(b.hint("SHUFFLE_HASH"), Seq("c_nationkey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("c_nationkey"), col("id_a"), col("id_b"),
        levenshtein(col("name_a"), col("name_b")).as("edit_dist"))
      .filter(col("edit_dist") <= 2)
      .orderBy("id_a", "id_b")
  }

  /** q67 — near-duplicate CLUSTERING: connected components over the
    * q45 n-gram-Jaccard pair graph (threshold 0.5), labels = min doc_id
    * reachable. Each round does min-label propagation over the
    * (bidirectional) edge list PLUS pointer jumping (comp := comp of
    * comp — path halving), so even chain-shaped components converge in
    * O(log diameter) rounds instead of O(diameter). Convergence is
    * detected by the (monotonically decreasing) label sum going stable
    * — one cheap aggregate per round instead of a change-count join.
    * `localCheckpoint` truncates lineage so per-round planning cost
    * stays constant. At 100 TB the same loop runs with edges
    * hash-partitioned by src (alternating large-star/small-star is the
    * published O(log n) refinement). Output: one row per clustered doc
    * (singletons excluded by construction).
    *
    * This is the step that turns pairwise near-dup detection into the
    * keep-one-per-cluster decision a training-data pipeline needs. */
  def q67DedupClusters(s: SparkSession, dir: String): DataFrame =
    connectedComponents(
      TextOps.ngramJaccardPairs(s, dir, 0.5).select("id_a", "id_b"))
      .select(col("id").as("doc_id"), col("cluster_id"))
      .orderBy("doc_id")

  /** Connected components over an (id_a, id_b) pair frame — q67's
    * engine, reusable (the curation pipeline runs it over its own
    * survivor pair set). Returns (id, cluster_id = min reachable id)
    * for every id appearing in a pair.
    *
    * Fault-tolerance: the default per-round barrier is
    * [[graft.operators.IterBarrier]] — `localCheckpoint` (fastest,
    * single-node) unless the session sets
    * `spark.graft.checkpointDir`, which upgrades the whole iterative
    * family to RELIABLE checkpoints. The explicit `checkpointDir`
    * parameter predates the conf and wins for this call when passed
    * (a reliable store: HDFS/object storage on a cluster), so a
    * 100 TB run survives executor loss mid-loop at the cost of one
    * write+read of the (small) label table per round. The session's
    * previous checkpoint dir is restored on exit; the CALLER owns the
    * directory's lifecycle (each round leaves one label-table
    * checkpoint behind — delete the dir after consuming the result,
    * or run with
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true`). */
  private[graft] def connectedComponents(pairs: DataFrame,
      checkpointDir: Option[String] = None): DataFrame = {
    val sc = pairs.sparkSession.sparkContext
    val prevCkptDir = sc.getCheckpointDir
    checkpointDir.foreach(sc.setCheckpointDir)
    def barrier(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint()
      else graft.operators.IterBarrier(df)
    try {
    // Iterated graph CONTRACTION, not fixed-graph label propagation:
    // each round computes l(v) = min(v, neighbors), pointer-jumps once
    // (l∘l — keeps chain diameters O(log) instead of O(n) rounds),
    // relabels the edge list by l∘l and DROPS intra-component edges.
    // Near-dup graphs are mostly dense cliques, so the first round
    // collapses almost everything and later rounds run on a
    // geometrically shrinking remainder — unlike propagation on the
    // full edge list, which rescans 100% of the edges every round.
    // That shrinkage is the 100 TB property: total work is ~2 passes
    // over the input edges, not rounds × edges.
    var edges = barrier(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst"))))
    // id → current component label for EVERY original vertex; composed
    // with each round's contraction map
    var mapping = barrier(
      edges.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("comp")))
    var nEdges = edges.count()
    var iter = 0
    while (nEdges > 0 && iter < 25) {
      // min over self ∪ neighbors (the symmetric edge list has every
      // vertex on the src side, so (src, src) supplies the identity)
      val l1 = edges.select(col("dst").as("v"), col("src").as("cand"))
        .union(edges.select(col("src").as("v"), col("src").as("cand")))
        .groupBy("v").agg(min(col("cand")).as("l"))
      // one pointer jump: l2(v) = l(l(v)); every l value is itself a
      // vertex of the current graph, so the self-join is total
      val l2 = barrier(
        l1.join(l1.select(col("v").as("lv"), col("l").as("ll")),
            l1("l") === col("lv"))
          .select(l1("v"), col("ll").as("l")))
      // contract: relabel both endpoints, drop now-internal edges
      edges = barrier(
        edges.join(l2.select(col("v").as("sv"), col("l").as("sl")),
            col("src") === col("sv"))
          .join(l2.select(col("v").as("dv"), col("l").as("dl")),
            col("dst") === col("dv"))
          .filter(col("sl") =!= col("dl"))
          .select(col("sl").as("src"), col("dl").as("dst"))
          .distinct())
      // compose: comp values are current-graph vertices; ones whose
      // component already fully contracted have no l2 row and keep
      // their (final) label — hence the left join + coalesce
      mapping = barrier(
        mapping.join(l2.select(col("v").as("mv"), col("l").as("ml")),
            mapping("comp") === col("mv"), "left")
          .select(mapping("id"), coalesce(col("ml"), mapping("comp")).as("comp")))
      nEdges = edges.count()
      iter += 1
    }
    mapping.select(col("id"), col("comp").as("cluster_id"))
    } finally {
      // don't leave the session-global checkpoint dir repointed at our
      // directory — later callers' checkpoint() would land here
      if (checkpointDir.isDefined) sc.setCheckpointDir(prevCkptDir.orNull)
    }
  }

  /** q124 — MERGEABLE distinct-count sketches (DataSketches HLL):
    * per-group sketches that UNION to any rollup level without
    * re-scanning — the pre-aggregated distinct-count store pattern
    * (persist the binary sketch per partition/day, answer "distinct
    * users last N days" by merging N sketches). q12's
    * approx_count_distinct gives one number; this keeps the STATE
    * re-aggregatable. The 'ALL' row is the union of the five per-group
    * sketches, not a second scan. Rows-only (sketch internals are
    * engine-specific); the union-consistency and error-bound
    * properties are unit-tested. */
  def q124HllSketch(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .agg(expr("hll_sketch_agg(o_custkey)").as("sk"),
        count(lit(1)).as("n_rows"))
    per.select(col("o_orderpriority").as("grp"),
        expr("hll_sketch_estimate(sk)").as("est_distinct"), col("n_rows"))
      .unionByName(per.agg(
          expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_distinct"),
          sum(col("n_rows")).as("n_rows"))
        .select(lit("ALL").as("grp"), col("est_distinct"), col("n_rows")))
      .orderBy("grp")
  }

  /** q165 — Jaro-Winkler fuzzy matching via the native
    * [[graft.functions.JaroWinkler]] kernel: the probabilistic
    * entity-resolution scorer (q63's levenshtein is edit-COUNT; JW is
    * the prefix-weighted similarity record-linkage systems actually
    * rank by — Winkler 1990). Part names within a (brand, size) block
    * score pairwise; pairs at ≥ 0.88 survive. Blocked, never
    * all-pairs: candidates exist only inside a block (the q63/q143
    * posture), and the kernel's arithmetic mirrors DuckDB's
    * `jaro_winkler_similarity` bit-for-bit (same match-window, greedy
    * marking, floor-halved transpositions, 0.7 boost threshold — all
    * probed; see the kernel's scaladoc), so the DOUBLE similarity
    * itself is hash-verified, not just the pair set. */
  def q165JaroWinkler(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val p = Tables.part(s, dir)
      .select(col("p_brand"), col("p_size"), col("p_partkey"),
        col("p_name"))
    val a = p.select(col("p_brand"), col("p_size"),
      col("p_partkey").as("id_a"), col("p_name").as("name_a"))
    val b = p.select(col("p_brand"), col("p_size"),
      col("p_partkey").as("id_b"), col("p_name").as("name_b"))
    a.join(b.hint("SHUFFLE_HASH"), Seq("p_brand", "p_size"))
      .filter(col("id_a") < col("id_b"))
      .select(col("p_brand"), col("p_size"), col("id_a"), col("id_b"),
        call_function("jaro_winkler", col("name_a"), col("name_b"))
          .as("jw"))
      .filter(col("jw") >= 0.88)
      .orderBy("id_a", "id_b")
  }

  // ---------------------------------------------------------------- q180

  /** q180 — per-brand skyline (Pareto frontier) on (price ↓, size ↑):
    * a part is on its brand's frontier iff no same-brand part is
    * BOTH cheaper-or-equal and larger, with at least one strict — the
    * "best tradeoff" query every catalog/recommendation surface runs.
    * The 2-D skyline needs NO pairwise self-join: sort by price and a
    * running max of size decides dominance — m1 (max size strictly
    * cheaper) kills rows a cheaper-larger part dominates, m2 (max size
    * at ≤ price, peers included) kills rows an equal-price-larger part
    * dominates. O(n log n) per brand vs the O(n²) nested-loop form.
    * The windows partition by brand — HASH-partitioned into ~25
    * per-brand sorts, acceptable here because the frame is the part
    * DIMENSION table (catalog-bounded, the window-census-pinned
    * ground; a fact-sized frame would need the q195-style two-phase
    * rank). Prices quantize to integer cents (q125's idiom) →
    * bit-exact. */
  def q180Skyline(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir).select(col("p_brand"), col("p_partkey"),
      floor(col("p_retailprice") * 100).cast("long").as("price_c"),
      col("p_size"))
    val w1 = Window.partitionBy("p_brand").orderBy("price_c")
      .rangeBetween(Window.unboundedPreceding, -1)
    val w2 = Window.partitionBy("p_brand").orderBy("price_c")
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    p.withColumn("m1", max(col("p_size")).over(w1))
      .withColumn("m2", max(col("p_size")).over(w2))
      .filter((col("m1").isNull || col("m1") < col("p_size")) &&
        col("m2") === col("p_size"))
      .select(col("p_brand"), col("p_partkey"), col("price_c"), col("p_size"))
      .orderBy("p_brand", "price_c", "p_partkey")
  }

  private val SkylineSql: String =
    """WITH p AS (SELECT p_brand, p_partkey,
      |    CAST(floor(p_retailprice * 100) AS BIGINT) AS price_c, p_size
      |  FROM part),
      |m AS (SELECT *,
      |    max(p_size) OVER (PARTITION BY p_brand ORDER BY price_c
      |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m1,
      |    max(p_size) OVER (PARTITION BY p_brand ORDER BY price_c
      |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m2
      |  FROM p)
      |SELECT p_brand, p_partkey, price_c, p_size FROM m
      |WHERE (m1 IS NULL OR m1 < p_size) AND m2 = p_size
      |ORDER BY p_brand, price_c, p_partkey""".stripMargin

  // ---------------------------------------------------------------- q184

  private val ErThreshold = 0.92
  private val ErRounds = 3

  /** q184 — end-to-end entity resolution: block part names by
    * (brand, size) — q165's candidate generator — score candidates
    * with the native Jaro-Winkler kernel, keep pairs ≥ 0.92, and
    * cluster the match graph with 3 synchronized rounds of min-label
    * propagation (each node, via a self-loop, keeps its own label and
    * adopts the smallest label within one hop). The fixed round count
    * is the distributed posture (q157/q177's discipline): both engines
    * run the SAME 3 rounds, so results agree even on components whose
    * diameter exceeds 3. Emits one row per cluster with its canonical
    * (minimum) id — the survivorship key a downstream golden-record
    * pass (q170) consumes. All joins are blocked or node-sized;
    * labels localCheckpoint per round (q177's lineage discipline). */
  def q184EntityResolution(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val p = Tables.part(s, dir)
    val a = p.select(col("p_brand"), col("p_size"),
      col("p_partkey").as("id_a"), col("p_name").as("name_a"))
    val b = p.select(col("p_brand"), col("p_size"),
      col("p_partkey").as("id_b"), col("p_name").as("name_b"))
    val matches = a.join(b.hint("SHUFFLE_HASH"), Seq("p_brand", "p_size"))
      .filter(col("id_a") < col("id_b"))
      .filter(call_function("jaro_winkler", col("name_a"), col("name_b"))
        >= ErThreshold)
      .select(col("id_a"), col("id_b"))
      .iterBarrier() // und + node seed both read it
    val und = matches.select(col("id_a").as("n"), col("id_b").as("nbr"))
      .unionAll(matches.select(col("id_b").as("n"), col("id_a").as("nbr")))
    val nodes = und.select("n").distinct()
    // self-loop: each node always sees its own current label
    val undSelf = und.unionAll(nodes.withColumn("nbr", col("n")))
    var lbl = nodes.withColumn("lbl", col("n")).iterBarrier()
    for (_ <- 1 to ErRounds) {
      lbl = undSelf.join(lbl.withColumnRenamed("n", "nbr"), "nbr")
        .groupBy("n").agg(min(col("lbl")).as("lbl"))
        .iterBarrier()
    }
    lbl.groupBy(col("lbl").as("cluster_id"))
      .agg(count(lit(1)).as("n_members"), max(col("n")).as("max_id"))
      .orderBy("cluster_id")
  }

  private val EntityResolutionSql: String = {
    def round(k: Int) =
      s"""l$k AS (SELECT u.n, min(l.lbl) AS lbl
         |  FROM undself u JOIN l${k - 1} l ON u.nbr = l.n GROUP BY u.n)"""
        .stripMargin
    s"""WITH m AS (SELECT a.p_partkey AS id_a, b.p_partkey AS id_b
       |  FROM part a JOIN part b
       |    ON a.p_brand = b.p_brand AND a.p_size = b.p_size
       |    AND a.p_partkey < b.p_partkey
       |  WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= $ErThreshold),
       |und AS (SELECT id_a AS n, id_b AS nbr FROM m
       |        UNION ALL SELECT id_b, id_a FROM m),
       |nodes AS (SELECT DISTINCT n FROM und),
       |undself AS (SELECT n, nbr FROM und
       |            UNION ALL SELECT n, n FROM nodes),
       |l0 AS (SELECT n, n AS lbl FROM nodes),
       |${(1 to ErRounds).map(round).mkString(",\n")}
       |SELECT lbl AS cluster_id, count(*) AS n_members, max(n) AS max_id
       |FROM l$ErRounds GROUP BY lbl ORDER BY cluster_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q165_jaro_winkler" -> (q165JaroWinkler _),
    "q180_skyline" -> (q180Skyline _),
    "q184_entity_resolution" -> (q184EntityResolution _),
    "q124_hll_sketch" -> (q124HllSketch _),
    "q59_grouping_sets" -> (q59GroupingSets _),
    "q60_stats_agg" -> (q60StatsAgg _),
    "q61_top_tokens" -> (q61TopTokens _),
    "q62_tfidf" -> (q62Tfidf _),
    "q63_fuzzy_match" -> (q63FuzzyMatch _),
    "q64_collect_agg" -> (q64CollectAgg _),
    "q65_conditional_agg" -> (q65ConditionalAgg _),
    "q66_date_spine" -> (q66DateSpine _),
    "q67_dedup_clusters" -> (q67DedupClusters _),
    "q70_histogram" -> (q70Histogram _),
    "q71_null_fns" -> (q71NullFns _),
    "q75_try_fns" -> (q75TryFns _),
    "q77_theta_join" -> (q77ThetaJoin _),
    "q78_full_outer" -> (q78FullOuter _),
    "q79_date_fns2" -> (q79DateFns2 _),
    "q81_right_join" -> (q81RightJoin _),
    "q82_higher_order" -> (q82HigherOrder _),
    "q83_explode_outer" -> (q83ExplodeOuter _),
    "q84_approx_percentiles" -> (q84ApproxPercentiles _),
  )

  val oracles: Map[String, String] = Map(
    "q180_skyline" -> SkylineSql,
    "q184_entity_resolution" -> EntityResolutionSql,
    "q59_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  CAST(grouping(l_returnflag) AS INTEGER) AS g_rf,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(floor(l_quantity * 1e2) AS BIGINT)) AS DOUBLE) / 1e2 AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q60_stats_agg" ->
      """WITH s AS (
        |  SELECT l_returnflag,
        |    count(*) AS nl,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(floor(l_extendedprice * 100.0) AS HUGEINT)) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(floor(l_quantity) AS BIGINT) * CAST(floor(l_extendedprice * 100.0) AS BIGINT)) AS DOUBLE) AS sxy,
        |    CAST(sum(CAST(floor(l_quantity) AS BIGINT) * CAST(floor(l_quantity) AS BIGINT)) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(floor(l_extendedprice * 100.0) AS HUGEINT) * CAST(floor(l_extendedprice * 100.0) AS HUGEINT)) AS DOUBLE) AS syy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, nl AS n_rows,
        |  sx / n AS mean_qty,
        |  (sxx - sx * sx / n) / (n - 1) AS var_qty,
        |  sqrt((sxx - sx * sx / n) / (n - 1)) AS stddev_qty,
        |  (sxy - sx * sy / n) / (n - 1) AS covar_qp,
        |  ((sxy - sx * sy / n) / (n - 1)) /
        |    (sqrt((sxx - sx * sx / n) / (n - 1)) * sqrt((syy - sy * sy / n) / (n - 1))) AS corr_qp
        |FROM s ORDER BY l_returnflag""".stripMargin,
    "q61_top_tokens" ->
      """SELECT t AS token, count(*) AS cnt FROM (
        |  SELECT unnest(string_split_regex(lower(text), '[ \t\n\x0B\f\r]+')) AS t
        |  FROM documents)
        |WHERE t <> '' GROUP BY t
        |ORDER BY cnt DESC, token LIMIT 20""".stripMargin,
    "q62_tfidf" ->
      """WITH td AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(text), '[ \t\n\x0B\f\r]+')) AS term
        |  FROM documents),
        |td2 AS (SELECT * FROM td WHERE term <> ''),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM td2 GROUP BY 1, 2),
        |dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM td2 GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
        |  CAST(tf.tf AS DOUBLE) * (CAST(n.n_docs AS DOUBLE) / CAST(dfreq.df AS DOUBLE)) AS weight
        |FROM tf JOIN dfreq USING (term) CROSS JOIN n
        |WHERE dfreq.df >= 25 AND tf.doc_id < 25
        |ORDER BY doc_id, term""".stripMargin,
    "q165_jaro_winkler" ->
      """SELECT a.p_brand, a.p_size, a.p_partkey AS id_a,
        |  b.p_partkey AS id_b,
        |  jaro_winkler_similarity(a.p_name, b.p_name) AS jw
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_size = b.p_size
        |  AND a.p_partkey < b.p_partkey
        |WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.88
        |ORDER BY id_a, id_b""".stripMargin,
    "q63_fuzzy_match" ->
      """SELECT a.c_nationkey, a.c_custkey AS id_a, b.c_custkey AS id_b,
        |  CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS edit_dist
        |FROM customer a JOIN customer b
        |  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
        |WHERE a.c_custkey < 1000 AND b.c_custkey < 1000
        |  AND levenshtein(a.c_name, b.c_name) <= 2
        |ORDER BY id_a, id_b""".stripMargin,
    "q64_collect_agg" ->
      """SELECT o_orderpriority,
        |  array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
        |  CAST(len(list(DISTINCT o_orderstatus)) AS INTEGER) AS n_statuses,
        |  count(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q65_conditional_agg" ->
      """SELECT o_orderstatus,
        |  count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
        |  CAST(sum(CAST(floor((CASE WHEN o_totalprice > 200000 THEN o_totalprice
        |    ELSE 0.0 END) * 1e2) AS BIGINT)) AS DOUBLE) / 1e2 AS big_total,
        |  arg_max(o_custkey, o_orderkey) AS latest_cust,
        |  arg_min(o_custkey, o_orderkey) AS first_cust
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q66_date_spine" ->
      """WITH base AS (SELECT * FROM orders WHERE o_custkey < 5),
        |b AS (SELECT o_custkey,
        |        date_trunc('month', min(o_orderdate)) AS fm,
        |        date_trunc('month', max(o_orderdate)) AS lm
        |      FROM base GROUP BY o_custkey),
        |spine AS (SELECT o_custkey,
        |            unnest(generate_series(fm, lm, INTERVAL 1 MONTH)) AS month_start
        |          FROM b),
        |counts AS (SELECT o_custkey, date_trunc('month', o_orderdate) AS month_start,
        |             count(*) AS n
        |           FROM base GROUP BY 1, 2)
        |SELECT s.o_custkey, s.month_start, coalesce(c.n, 0) AS n_orders
        |FROM spine s LEFT JOIN counts c USING (o_custkey, month_start)
        |ORDER BY o_custkey, month_start""".stripMargin,
    // AS MATERIALIZED is load-bearing at scale (r15): DuckDB INLINES
    // plain CTEs, so `pr` (the 39.6M-pair jaccard block join at sf1)
    // was recomputed in BOTH edges branches and then per RECURSIVE
    // iteration through the inlined `edges` — ~12 CPU-hours at sf1.
    // Materialized, the pair join runs once and the recursion works a
    // small edge table. Results identical at every SF.
    "q67_dedup_clusters" ->
      s"""WITH RECURSIVE pr AS MATERIALIZED (
        |  SELECT id_a, id_b FROM (${TextOps.JaccardPairsSql})
        |  WHERE jaccard >= 0.5),
        |edges AS MATERIALIZED (
        |          SELECT id_a AS s, id_b AS d FROM pr
        |          UNION SELECT id_b, id_a FROM pr),
        |reach AS (SELECT s AS id, d AS r FROM edges
        |          UNION
        |          SELECT e.s AS id, r.r FROM edges e JOIN reach r ON e.d = r.id)
        |SELECT id AS doc_id, CAST(least(id, min(r)) AS BIGINT) AS cluster_id
        |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin,
    "q70_histogram" ->
      """SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
        |  CAST(floor(o_totalprice / 50000) AS BIGINT) * 50000 AS lo,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT)) AS DOUBLE) / 1e2 AS total
        |FROM orders GROUP BY 1, 2 ORDER BY bucket""".stripMargin,
    "q82_higher_order" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(t, x -> length(x) > 5)) AS INTEGER) AS n_long,
        |  len(list_filter(t, x -> regexp_matches(x, '[0-9]'))) > 0 AS has_digit,
        |  len(list_filter(t, x -> NOT regexp_matches(x, '[A-Z]'))) = len(t) AS all_lower,
        |  CAST(list_aggregate(list_transform(t, x -> length(x)), 'sum') AS BIGINT) AS total_chars
        |FROM (SELECT doc_id, string_split_regex(text, '[ \t\n\x0B\f\r]+') AS t FROM documents)
        |ORDER BY doc_id""".stripMargin,
    // NULLS FIRST matches Spark's ascending default (DuckDB defaults
    // to NULLS LAST) — the preserved empty-array rows sort first
    "q83_explode_outer" ->
      """SELECT doc_id,
        |  unnest(CASE WHEN len(z) = 0 THEN [NULL] ELSE z END) AS rare_tok
        |FROM (SELECT doc_id, list_filter(string_split_regex(lower(text), '[ \t\n\x0B\f\r]+'),
        |        x -> x LIKE 'qu%') AS z FROM documents)
        |ORDER BY doc_id, rare_tok NULLS FIRST""".stripMargin,
    "q79_date_fns2" ->
      """SELECT o_orderkey,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus_3m,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
        |  CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
        |  strftime(o_orderdate, '%Y-%m') AS ym
        |FROM orders WHERE o_orderkey < 2000
        |ORDER BY o_orderkey""".stripMargin,
    "q81_right_join" ->
      """SELECT o_orderkey, o_custkey, c_name, c_mktsegment,
        |  c_custkey IS NOT NULL AS has_building_cust
        |FROM (SELECT * FROM customer WHERE c_mktsegment = 'BUILDING') c
        |RIGHT JOIN (SELECT * FROM orders WHERE o_orderkey < 2000) o
        |  ON c.c_custkey = o.o_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "q77_theta_join" ->
      """SELECT a.n_nationkey AS key_a, a.n_name AS name_a,
        |  count(*) AS n_higher_region,
        |  CAST(min(b.n_nationkey) AS INTEGER) AS min_higher_key
        |FROM nation a JOIN nation b ON a.n_regionkey < b.n_regionkey
        |GROUP BY a.n_nationkey, a.n_name
        |ORDER BY key_a""".stripMargin,
    "q78_full_outer" ->
      """SELECT coalesce(a.c_custkey, b.c_custkey) AS custkey,
        |  CASE WHEN a.c_custkey IS NOT NULL AND b.c_custkey IS NOT NULL THEN 'both'
        |    WHEN a.c_custkey IS NOT NULL THEN 'auto_only'
        |    ELSE 'mach_only' END AS side,
        |  a.c_acctbal AS bal_a, b.c_acctbal AS bal_b
        |FROM (SELECT * FROM customer
        |      WHERE c_mktsegment = 'AUTOMOBILE' AND c_custkey < 200) a
        |FULL OUTER JOIN (SELECT * FROM customer
        |      WHERE c_mktsegment = 'MACHINERY' AND c_custkey < 200) b
        |  ON a.c_custkey = b.c_custkey
        |ORDER BY custkey""".stripMargin,
    // DuckDB has no try_divide and its double x/0.0 yields NaN (Spark's
    // try_divide yields NULL), so the oracle spells the NULL-on-zero
    // contract with an explicit CASE
    "q75_try_fns" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_discount = 0 THEN NULL
        |    ELSE l_quantity / l_discount END AS qty_per_disc,
        |  CAST(NULL AS DOUBLE) AS div_null,
        |  TRY_CAST(l_returnflag AS INTEGER) AS flag_as_int,
        |  CAST(l_linenumber AS VARCHAR) AS line_str
        |FROM lineitem WHERE l_orderkey < 300
        |ORDER BY l_orderkey, l_linenumber, qty_per_disc NULLS FIRST""".stripMargin,
    "q71_null_fns" ->
      """SELECT l_orderkey, l_linenumber,
        |  nullif(l_discount, 0.0) AS disc_or_null,
        |  coalesce(nullif(l_discount, 0.0), -1.0) AS disc_filled,
        |  greatest(l_tax, l_discount) AS max_rate,
        |  least(l_tax, l_discount) AS min_rate,
        |  nullif(l_discount, 0.0) IS NULL AS is_zero_disc
        |FROM lineitem WHERE l_orderkey < 300
        |ORDER BY l_orderkey, l_linenumber, nullif(l_discount, 0.0)
        |  NULLS FIRST, greatest(l_tax, l_discount),
        |  least(l_tax, l_discount)""".stripMargin,
  )
}
