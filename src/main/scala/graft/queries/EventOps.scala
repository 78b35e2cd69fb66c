package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, MapType, StringType}

import graft.Tables

/** Event-stream analytics over the `events` table — the batch twins of
  * the Structured Streaming pipeline in [[graft.streaming.EventStream]].
  * The same transform functions are shared by both: what is verified
  * here against the DuckDB oracle is byte-for-byte the logic the
  * streaming job runs incrementally.
  */
object EventOps {

  /** Tumbling-window aggregate, shared with the streaming path.
    * `window(ts, "1 hour")` is the streaming-compatible form of
    * `date_trunc('hour', ts)` — identical bucket boundaries. */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        // fixed-point exact sum (see Relational.dsum for why not DECIMAL)
        (sum(floor(col("value") * 1e6)).cast(DoubleType) / 1e6).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** q24 — JSON extraction (`get_json_object`) + aggregate. The driver
    * oracle uses a regexp pull of the same field so the check does not
    * depend on DuckDB's JSON extension. */
  def q24JsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** q25 — tumbling 1-hour event-time windows (batch twin of the
    * streaming aggregate; see [[graft.streaming.EventStream]]). */
  def q25TumblingWindow(s: SparkSession, dir: String): DataFrame =
    tumblingHourly(Tables.events(s, dir))
      .orderBy("hour_start", "event_type")

  /** q26 — sessionization: gap-based sessions (30 min inactivity) per
    * user via lag + cumulative session counter, then per-user session
    * stats. One shuffle on user_id; windows are partition-local after
    * it. The streaming equivalent is session_window / state timeouts. */
  def q26Sessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val run = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("prev_us", lag(unix_micros(col("ts").cast("timestamp")), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts").cast("timestamp")) - col("prev_us") > 1800L * 1000000L, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(run))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        max(col("n_events")).as("max_session_events"),
        sum(col("n_events")).as("total_events"))
      .orderBy("user_id")
  }

  /** q27 — as-of join: for each `error` event, the latest preceding
    * `click` by the same user. Implemented scalably as union + one
    * keyed window (partition on user_id, order by ts): the carried
    * `max(click ts so far)` IS the as-of match — one shuffle on the
    * key, no range self-join, no per-row probe. The oracle uses
    * DuckDB's native ASOF JOIN, so this checks our re-expression
    * against a reference implementation of the operator. */
  def q27AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .filter(col("event_type").isin("click", "error"))
      .select(col("event_id"), col("user_id"), col("ts"),
        when(col("event_type") === "click", 0).otherwise(1).as("tag"))
    // clicks (tag 0) sort before errors at equal ts → inclusive `<=`
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("tag"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("last_click_ts", max(when(col("tag") === 0, col("ts"))).over(w))
      .filter(col("tag") === 1 && col("last_click_ts").isNotNull)
      .select(col("event_id"), col("user_id"), col("last_click_ts"),
        ((unix_micros(col("ts").cast("timestamp")) -
          unix_micros(col("last_click_ts").cast("timestamp"))) / lit(1e6))
          .as("gap_seconds"))
      .orderBy("event_id")
  }

  /** q46 — map type + functions: `from_json` parses props into a real
    * `map<string,int>`, then map accessors/cardinality drive an
    * aggregate. Scalar outputs keep the oracle compare map-free. */
  def q46MapFns(s: SparkSession, dir: String): DataFrame = {
    val m = from_json(col("props"), MapType(StringType, IntegerType))
    Tables.events(s, dir)
      .select(col("event_type"),
        element_at(m, "k").as("k_val"),
        size(map_keys(m)).as("n_keys"),
        array_join(map_keys(m), ",").as("key_list"))
      .groupBy("event_type", "n_keys", "key_list")
      .agg(count(lit(1)).as("n"),
        sum(col("k_val")).as("sum_k"))
      .orderBy("event_type", "n_keys", "key_list")
  }

  /** q49 — sliding windows (1 hour every 15 min): each event lands in 4
    * overlapping windows via Spark's `window(ts, len, slide)`; the
    * oracle replicates with time_bucket + 4 offsets. Batch twin of
    * [[graft.streaming.EventStream.slidingCounts]]. */
  def q49SlidingWindow(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n_events"),
        (sum(floor(col("value") * 1e6)).cast(DoubleType) / 1e6).as("sum_value"))
      .select(col("window.start").as("win_start"),
        col("n_events"), col("sum_value"))
      .orderBy("win_start")

  /** q106 — the SAME as-of query as q27, through the custom
    * sorted-merge plan ([[graft.plans.AsofJoin]] → `AsofJoinExec`)
    * instead of the union+window re-expression: co-partition errors
    * and clicks on user_id, sort each side once, one forward merge
    * pass. Shares q27's DuckDB native-ASOF oracle — so BOTH the
    * declarative twin and the custom operator are independently
    * verified against a reference as-of implementation, and each
    * other. */
  def q106AsofExec(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val errors = ev.filter(col("event_type") === "error")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("ts").as("c_ts"))
    graft.operators.AsofJoinOp
      .asof(errors, clicks, Seq("user_id" -> "c_user_id"), "ts" -> "c_ts")
      .filter(col("c_ts").isNotNull)
      .select(col("event_id"), col("user_id"),
        col("c_ts").as("last_click_ts"),
        ((unix_micros(col("ts").cast("timestamp")) -
          unix_micros(col("c_ts").cast("timestamp"))) / lit(1e6))
          .as("gap_seconds"))
      .orderBy("event_id")
  }

  /** q119 — FORWARD as-of with a tolerance window, through the same
    * custom exec: for every click, the NEXT error by that user within
    * 10 minutes ("did this interaction precede a failure") — the
    * `merge_asof(direction='forward', tolerance=…)` shape. The merge
    * stays one pass (left times are non-decreasing, so rights behind
    * the cursor are dead for every later left too); candidates outside
    * the window degrade to the left-outer NULL row. DuckDB's native
    * ASOF has no tolerance, so the oracle is the LATERAL top-1 form —
    * an independent implementation, not an echo. */
  def q119AsofForward(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user_id"), col("ts").as("e_ts"))
    graft.operators.AsofJoinOp
      .asof(clicks, errors, Seq("user_id" -> "e_user_id"), "ts" -> "e_ts",
        direction = "forward", toleranceUnits = Some(10L * 60 * 1000000))
      .select(col("event_id"), col("user_id"),
        col("e_ts").as("next_error_ts"),
        ((unix_micros(col("e_ts").cast("timestamp")) -
          unix_micros(col("ts").cast("timestamp"))) / lit(1e6))
          .as("gap_seconds"))
      .orderBy("event_id")
  }

  /** q144 — NEAREST as-of join, completing the direction family (q27
    * backward, q119 forward): for every `error`, the closest `click`
    * by the same user in EITHER direction — `merge_asof(direction=
    * 'nearest')`. Same scalable shape as q27: union + ONE keyed sort
    * window computing both the carried `max(click ts ≤ t)` and the
    * carried-from-the-right `min(click ts ≥ t)`, then an arithmetic
    * pick of the smaller |gap| (ties prefer the preceding click, and
    * an equal-ts click is distance 0 via the backward frame). One
    * shuffle on user_id, no range self-join. The oracle is the DuckDB
    * LATERAL top-1-by-|distance| form — an independent
    * implementation, not an echo. */
  def q144AsofNearest(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .filter(col("event_type").isin("click", "error"))
      .select(col("event_id"), col("user_id"), col("ts"),
        when(col("event_type") === "click", 0).otherwise(1).as("tag"))
    val order = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("tag"), col("event_id"))
    val wB = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = order.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    def us(c: Column): Column = unix_micros(c.cast("timestamp"))
    ev
      .withColumn("prev_ts", max(when(col("tag") === 0, col("ts"))).over(wB))
      .withColumn("next_ts", min(when(col("tag") === 0, col("ts"))).over(wF))
      .filter(col("tag") === 1)
      .withColumn("nearest_click_ts",
        when(col("prev_ts").isNull, col("next_ts"))
          .when(col("next_ts").isNull, col("prev_ts"))
          .when(us(col("next_ts")) - us(col("ts")) <
            us(col("ts")) - us(col("prev_ts")), col("next_ts"))
          .otherwise(col("prev_ts")))
      .filter(col("nearest_click_ts").isNotNull)
      .select(col("event_id"), col("user_id"), col("nearest_click_ts"),
        ((us(col("nearest_click_ts")) - us(col("ts"))) / lit(1e6))
          .as("gap_seconds"))
      .orderBy("event_id")
  }

  /** q147 — time-series autocorrelation: Pearson correlation of each
    * event type's DAILY value total with itself at lag 1 and lag 7 —
    * the day-over-day persistence and weekly-seasonality signals a
    * monitoring pipeline derives before fitting anything fancier.
    * Exactness is the q97/q60 discipline: daily totals are fixed-point
    * BIGINTs, the six sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²)
    * aggregate as exact integers (order-independent), and the final
    * double formula is the IDENTICAL expression tree in both engines —
    * bit-identical output. Shape: one shuffle to daily grain (rows =
    * types × days regardless of event volume), one window per type,
    * two 5-row aggregates.
    *
    * Overflow bound: the int64 sufficient statistics require
    * n·max(v)² < 2^63, i.e. daily fixed-point totals |v| ≲ 3e9·/√days
    * (at 365 days, |v| < 1.6e8 ⇒ daily raw totals < 1.6e6 at the ×100
    * quantization). At a corpus where daily totals exceed that, drop
    * the quantization to ×1 (or pre-scale v by its type-level
    * magnitude) before fitting — DuckDB promotes to HUGEINT silently
    * while non-ANSI Spark wraps, so the bound is the cross-engine
    * contract, not a Spark-only concern. */
  def q147Autocorr(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("v"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val lagged = daily
      .withColumn("l1", lag(col("v"), 1).over(w))
      .withColumn("l7", lag(col("v"), 7).over(w))
    def corrAt(lagCol: Column, k: Int): DataFrame =
      lagged.filter(lagCol.isNotNull)
        .groupBy("event_type")
        // decimal moment sums — the q168 overflow law (sum of v·v
        // crosses int64 near sf10); see q168TrendOls
        .agg(count(lit(1)).as("n"),
          sum(col("v").cast("decimal(38,0)")).as("sx"),
          sum(lagCol.cast("decimal(38,0)")).as("sy"),
          sum(col("v").cast("decimal(19,0)") *
            lagCol.cast("decimal(19,0)")).as("sxy"),
          sum(col("v").cast("decimal(19,0)") *
            col("v").cast("decimal(19,0)")).as("sxx"),
          sum(lagCol.cast("decimal(19,0)") *
            lagCol.cast("decimal(19,0)")).as("syy"))
        .select(col("event_type"), lit(k).as("lag_k"),
          col("n").as("n_pairs"),
          ((col("n") * col("sxy") - col("sx") * col("sy")).cast(DoubleType)
            / sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
              .cast(DoubleType))
            / sqrt((col("n") * col("syy") - col("sy") * col("sy"))
              .cast(DoubleType))).as("autocorr"))
    corrAt(col("l1"), 1).unionAll(corrAt(col("l7"), 7))
      .orderBy("event_type", "lag_k")
  }

  /** q125 — z-score anomaly detection over sensor values: per-type
    * mean/std from EXACT integer sufficient statistics (the q97
    * discipline — fixed-point sums are order-independent, the
    * double formulas are evaluated in identical expression trees on
    * both engines → bit-identical), then a second pass flags events
    * with |z| > 3. Two scans, one broadcast of the 4-row stats frame —
    * the monitoring shape that runs over a 100 TB event log as two
    * columnar passes with no shuffle beyond the tiny aggregate. */
  def q125Outliers(s: SparkSession, dir: String): DataFrame = {
    val fv = floor(col("value") * 100).cast("long")
    val ev = Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), fv.as("fv"))
    val d = (c: Column) => c.cast("double")
    val stats = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("fv")).as("sx"),
        sum(col("fv") * col("fv")).as("sxx"))
      .select(col("event_type"), col("n"),
        (d(col("sx")) / col("n")).as("mean_fp"),
        sqrt(d(col("sxx")) / col("n") -
          (d(col("sx")) / col("n")) * (d(col("sx")) / col("n"))).as("std_fp"))
    ev.join(broadcast(stats), "event_type")
      .groupBy("event_type")
      .agg(first(col("n")).as("n"),
        count_if(abs(d(col("fv")) - col("mean_fp")) >
          lit(3.0) * col("std_fp")).as("n_outliers"),
        (first(col("mean_fp")) / 1e2).as("mean_value"),
        (first(col("std_fp")) / 1e2).as("std_value"))
      .orderBy("event_type")
  }

  /** q126 — conversion funnel (the ClickHouse `windowFunnel` shape):
    * per user, the deepest stage of signup→view→click→purchase reached
    * IN ORDER within 1 day of the first signup. Each stage's first
    * qualifying timestamp is a per-user constant, so the whole chain is
    * four conditional-min windows over ONE user_id partition — one
    * shuffle, one sort, no self-joins; at 100 TB the cost is a single
    * keyed exchange regardless of funnel depth. */
  def q126Funnel(s: SparkSession, dir: String): DataFrame =
    funnelStages(Tables.events(s, dir))

  /** Core of [[q126Funnel]], on any frame with (user_id, event_type, ts). */
  def funnelStages(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
    val lim = col("s0") + expr("INTERVAL 1 DAY")
    val staged = events
      .select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("s0", min(when(col("event_type") === "signup", col("ts"))).over(w))
      .withColumn("v0", min(when(col("event_type") === "view" &&
        col("ts") >= col("s0") && col("ts") <= lim, col("ts"))).over(w))
      .withColumn("c0", min(when(col("event_type") === "click" &&
        col("ts") >= col("v0") && col("ts") <= lim, col("ts"))).over(w))
      .withColumn("p0", min(when(col("event_type") === "purchase" &&
        col("ts") >= col("c0") && col("ts") <= lim, col("ts"))).over(w))
    staged.groupBy("user_id")
      .agg(min(col("s0")).as("s0"), min(col("v0")).as("v0"),
        min(col("c0")).as("c0"), min(col("p0")).as("p0"))
      .select(when(col("p0").isNotNull, 4).when(col("c0").isNotNull, 3)
        .when(col("v0").isNotNull, 2).when(col("s0").isNotNull, 1)
        .otherwise(0).as("stage"))
      .groupBy("stage").agg(count(lit(1)).as("n_users"))
      .orderBy("stage")
  }

  /** q127 — weekly cohort retention: users grouped by first-seen week,
    * fraction still active N weeks later. One narrow (user_id, week)
    * dedup, a cohort min-aggregate, one keyed join, and a tiny matrix
    * aggregate — every shuffle is on user_id or the (cohort, offset)
    * matrix key, all width-pruned before exchange. */
  def q127Retention(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("week"))
    val cohort = ev.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
    ev.distinct().join(cohort, "user_id")
      .groupBy(col("cohort_week"),
        expr("datediff(week, cohort_week) div 7").as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .withColumn("cohort_size",
        max(when(col("week_offset") === 0, col("n_active")))
          .over(Window.partitionBy("cohort_week")))
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        (col("n_active").cast(DoubleType) / col("cohort_size")).as("retention"))
      .orderBy("cohort_week", "week_offset")
  }

  /** q128 — event transition matrix (first-order Markov counts): for
    * each consecutive pair of events per user, count prev→next and its
    * conditional probability. lag over the user partition (one keyed
    * shuffle), then a 25-cell aggregate; probabilities are exact
    * BIGINT/BIGINT divisions so both engines round identically. */
  def q128Transitions(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", col("n").cast(DoubleType) /
        sum(col("n")).over(Window.partitionBy("prev_type")))
      .orderBy("prev_type", "next_type")
  }

  /** q129 — exact exponentially-weighted moving average (α = 1/2) of
    * each user's sensor value over their last 16 events, reported at
    * their latest event. The halving weights are powers of two, so the
    * weighted sum is EXACT 64-bit integer arithmetic (fv·2^k), and both
    * engines perform the identical double division at the end — a
    * smoothing operator that is usually "approximately equal" across
    * engines becomes bit-exact. One keyed shuffle; the frame walk is
    * partition-local. */
  def q129Ewma(s: SparkSession, dir: String): DataFrame =
    ewmaLatest(Tables.events(s, dir))

  /** Core of [[q129Ewma]], on any frame with (user_id, event_id, ts, value). */
  def ewmaLatest(events: DataFrame): DataFrame = {
    val order = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val frame = order.rowsBetween(-15, Window.currentRow)
    events
      .filter(col("value").isNotNull)
      .select(col("user_id"), col("event_id"), col("ts"),
        floor(col("value") * 100).cast("long").as("fv"))
      .withColumn("arr", collect_list(col("fv")).over(frame))
      .withColumn("rn", row_number().over(order))
      .withColumn("n_events", count(lit(1)).over(Window.partitionBy("user_id")))
      .filter(col("rn") === col("n_events"))
      .withColumn("num", expr(
        """aggregate(zip_with(arr, sequence(1, size(arr)),
          |  (x, p) -> x * shiftleft(CAST(1 AS BIGINT), 16 + p - 1 - size(arr))),
          |  CAST(0 AS BIGINT), (a, b) -> a + b)""".stripMargin))
      .withColumn("den", expr(
        "shiftleft(CAST(1 AS BIGINT), 16 - size(arr)) * (shiftleft(CAST(1 AS BIGINT), size(arr)) - 1)"))
      .select(col("user_id"), col("n_events"),
        (col("num").cast(DoubleType) / col("den") / 1e2).as("ewma_value"))
      .orderBy("user_id")
  }

  /** q130 — DAU / trailing-28-day MAU / stickiness per day. The scale
    * shape: events collapse to distinct (user, day) pairs FIRST (one
    * narrow dedup shuffle shared by BOTH branches — identical subtrees
    * so ReuseExchange scans events once), then each pair EXPLODES into
    * the ≤28 trailing days it keeps a user "monthly-active" for. The
    * expansion is bounded by 28 × |user-days| regardless of spine
    * length — a spine × user-days range join would grow with the
    * calendar instead. Days past the observed range fall out via the
    * final inner join with the DAU spine. */
  def q130DauMau(s: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(s, dir)
      .select(col("user_id"), date_trunc("day", col("ts")).cast("date").as("d"))
      // d is never null, but the DAU join pushes an isnotnull(day)
      // filter into ONLY its branch; stating it here keeps both
      // branches' dedup subtrees canonically identical so AQE reuses
      // the shuffle stage (one events scan, not two).
      .filter(col("d").isNotNull)
      .distinct()
    val dau = ud.groupBy(col("d").as("day")).agg(count(lit(1)).as("dau"))
    val mau = ud
      .select(col("user_id"),
        explode(sequence(col("d"), date_add(col("d"), 27))).as("day"))
      .groupBy("day").agg(countDistinct(col("user_id")).as("mau"))
    dau.join(mau, "day")
      .select(col("day"), col("dau"), col("mau"),
        (col("dau").cast(DoubleType) / col("mau")).as("stickiness"))
      .orderBy("day")
  }

  /** q142 — peak concurrency via the sweep line: per-(user, day)
    * activity intervals [first event, last event] become ±1 boundary
    * events, a running sum ordered by (time, +1-before-−1) counts how
    * many intervals overlap each instant, and the per-day max is the
    * peak concurrent-user load — the capacity-planning query interval
    * trees answer point-wise, done set-at-a-time. Determinism under
    * ties: rows with equal (t, delta) may process in any order, but
    * within such a group the running sum moves monotonically (all
    * deltas share a sign), so the per-day MAX — the only exposed
    * value — is order-invariant, and +1 sorting before −1 makes
    * touching intervals count as concurrent in both engines. Cost: one
    * shuffle to build intervals, one window sort per day partition —
    * boundary rows are 2×users×days regardless of event volume. */
  def q142ConcurrentSessions(s: SparkSession, dir: String): DataFrame = {
    val iv = Tables.events(s, dir)
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(min(col("ts")).as("st"), max(col("ts")).as("en"))
    val bounds = iv.select(col("day"), col("st").as("t"), lit(1).as("delta"))
      .unionAll(iv.select(col("day"), col("en").as("t"), lit(-1).as("delta")))
    val w = Window.partitionBy("day").orderBy(col("t"), col("delta").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bounds.select(col("day"), sum(col("delta")).over(w).as("running"))
      .groupBy("day")
      .agg((count(lit(1)) / lit(2)).cast("long").as("n_sessions"),
        max(col("running")).as("max_concurrent"))
      .orderBy("day")
  }

  // ---------------------------------------------------------------- q160

  /** q160 — robust (MAD) outlier report per event type: median and
    * median-absolute-deviation replace q125's mean/stddev, flagging
    * values beyond 3·1.4826·MAD — the robust z-score that a heavy-tail
    * metric stream needs (a single spike inflates a stddev fence and
    * hides later spikes; the median fence doesn't move). Values
    * quantize to integer cents first (q125's idiom); both medians are
    * EXACT (hash-proven ≡ DuckDB `quantile_cont`) but computed
    * two-phase via [[graft.operators.ExactQuantiles]] — the built-in
    * `percentile` would buffer every distinct cent value per
    * handful-of-values event_type group in one aggregation buffer,
    * value-domain-sized state that grows with the metric's range. The
    * fence constant is spelled as the same 3·1.4826 product in both
    * engines so the comparison sees identical bits. Shape: ONE scan
    * of events builds the per-(type, cents) value histogram; every
    * later step is histogram-space — the deviation histogram is a
    * FOLD of the value histogram (counts at med±d merge under
    * |v−med|), and n/n_outliers are count sums over it, so neither
    * median pass nor the fence count ever touches the event rows
    * again. */
  def q160RobustOutliers(s: SparkSession, dir: String): DataFrame = {
    val hist = Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        floor(col("value") * 100).cast("long").as("fv"))
      .groupBy(col("event_type"), col("fv").cast(DoubleType).as("v"))
      .agg(count(lit(1)).as("c"))
      // consumers: median core + the deviation fold (released below)
      .persist()
    // Released lifecycle (the r12 verdict's item), with ONE eager
    // action: both quantile passes stay LAZY (their internal stats
    // frames collected into `caches`), the final group-sized report is
    // snapshotted with a single count() that materializes the whole
    // chain in pipelined order, and THEN every input-sized cache (the
    // two histograms + the operator's internals) is dropped — so after
    // the build the only cached frame is the |event_type|-sized
    // report. (The first cut of this rework snapshotted each pass
    // eagerly — three sequential blocking jobs cost +1.6 s at sf0.1
    // over the lazy chain; one action costs ~nothing.)
    val caches = scala.collection.mutable.Buffer
      .empty[org.apache.spark.sql.DataFrame]
    val med = graft.operators.ExactQuantiles
      .quantilesOfHist(hist, Seq("event_type"), "v", "c",
        Seq("med" -> 0.5), caches = caches)
      .select("event_type", "med")
    val devHist = hist.join(broadcast(med), "event_type")
      .groupBy(col("event_type"), abs(col("v") - col("med")).as("dev"))
      .agg(sum(col("c")).as("c"), min(col("med")).as("med"))
      .persist() // consumers: MAD core + the fence count
    val mad = graft.operators.ExactQuantiles
      .quantilesOfHist(devHist, Seq("event_type"), "dev", "c",
        Seq("mad" -> 0.5), caches = caches)
      .select("event_type", "mad")
    val report = devHist.join(broadcast(mad), "event_type")
      .groupBy("event_type")
      .agg(sum(col("c")).as("n"),
        sum(when(col("dev") > lit(3.0) * lit(1.4826) * col("mad"),
          col("c")).otherwise(lit(0L))).as("n_outliers"),
        (min(col("med")) / 1e2).as("median_value"),
        (min(col("mad")) / 1e2).as("mad_value"))
      .persist()
    report.count()
    (Seq(hist, devHist) ++ caches)
      .foreach(_.unpersist(blocking = false))
    report.orderBy("event_type")
  }

  /** q163 — batch twin of [[graft.streaming.AggMaintenance]], the
    * incremental-materialized-view fold: the event log is split into
    * four deterministic "micro-batches" (event_id mod 4 — standing in
    * for arrival order), each batch is reduced by the streaming
    * pipeline's OWN `partial` (count + exact fixed-point sum per
    * (hour, type)), and the deltas are folded by the streaming view's
    * OWN `fold`. Because both statistics are additive, the result must
    * equal the one-shot aggregate — which is exactly what the DuckDB
    * oracle computes through the same two-level grouping. This gives
    * the one streaming component without an oracle-checkable twin a
    * hash-exact check: same code path as the running view, driven by a
    * batch source. Scale shape: partials are window-count-sized per
    * batch (never event-sized); the fold is a map-side-combined sum
    * over (hour, type) keys. */
  def q163MvMaintenance(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val deltas = (0 until 4).map { b =>
      graft.streaming.AggMaintenance.partial(
        ev.filter(pmod(col("event_id"), lit(4)) === b))
    }.reduce(_ unionAll _)
    graft.streaming.AggMaintenance.fold(deltas)
      .select(col("hour_start"), col("event_type"), col("n_events"),
        col("sum_fp"))
  }

  /** q166 — OHLC bar resampling: each (event_type, 15-minute bucket)
    * collapses to open/high/low/close/volume — the downsampling shape
    * every time-series store runs (financial bars, sensor rollups,
    * sparkline pre-aggregation). open/close pick the first/last VALUE
    * by the total (ts, event_id) order via min_by/max_by — picked, not
    * computed, so the doubles are bit-exact cross-engine with zero
    * quantization. ONE map-side-combined aggregate to (type × bucket)
    * grain; no window, no second pass — the 100 TB form. */
  def q166OhlcBars(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir).filter(col("value").isNotNull)
      .groupBy(col("event_type"),
        window(col("ts"), "15 minutes").as("w"))
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id")))
          .as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id")))
          .as("close"),
        count(lit(1)).as("volume"))
      .select(col("event_type"), col("w.start").as("bar_start"),
        col("open"), col("high"), col("low"), col("close"),
        col("volume"))
      .orderBy("event_type", "bar_start")
  }

  /** q167 — CDC latest-wins merge (the MERGE INTO / Debezium-compact
    * semantic): the event log is read as a change stream keyed by
    * user_id — every event upserts (event_type, value), 'error'
    * events act as DELETE tombstones — and the query emits the
    * compacted CURRENT snapshot: per key, the payload of the
    * latest-by-(ts, event_id) op, with tombstoned keys absent. ONE
    * max_by aggregate per key (map-side combined, never a window over
    * the log), then the tombstone filter — the scalable compaction
    * shape; q115's SCD2 keeps history, this keeps heads. Values are
    * picked, not computed → bit-exact. */
  def q167CdcMerge(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_ops"),
        max_by(struct(col("event_type"), col("value"), col("ts")),
          struct(col("ts"), col("event_id"))).as("last"))
      .filter(col("last.event_type") =!= "error")
      .select(col("user_id"), col("n_ops"),
        col("last.event_type").as("last_type"),
        col("last.value").as("last_value"),
        col("last.ts").as("last_ts"))
      .orderBy("user_id")

  /** q168 — per-series OLS trend detection: each event type's daily
    * fixed-point total regressed on the day index (x = datediff from
    * the series' own first day), emitting slope, intercept and R² —
    * the "is this metric drifting" primitive a monitoring stack runs
    * over every series every night. The q147 exactness discipline:
    * x and y are exact BIGINTs, all five sufficient statistics
    * (n, Σx, Σy, Σxy, Σx²,​ Σy²) aggregate as exact integers
    * (order-independent), and slope/intercept/R² are the IDENTICAL
    * double expression trees in both engines — bit-exact. Shape: one
    * shuffle to daily grain (types × days rows), one 5-row aggregate;
    * nothing event-sized past the first groupBy. */
  def q168TrendOls(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("y"))
    val x = datediff(col("day"),
      min(col("day")).over(Window.partitionBy("event_type")))
      .cast("long")
    daily.select(col("event_type"), x.as("x"), col("y"))
      .groupBy("event_type")
      // moment sums in DECIMAL(38,0): daily y is ~1e6·sf, so
      // sum(y·y) crosses int64 near sf10 (caught by the r17 sf10
      // gate — the q202 overflow class, third member). decimal keeps
      // the sufficient statistics EXACT to ~1e38; the oracle's
      // HUGEINT sums are the same exact integers, so the final
      // double casts stay bit-identical
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum(col("x").cast("decimal(19,0)") *
          col("y").cast("decimal(19,0)")).as("sxy"),
        sum(col("x").cast("decimal(19,0)") *
          col("x").cast("decimal(19,0)")).as("sxx"),
        sum(col("y").cast("decimal(19,0)") *
          col("y").cast("decimal(19,0)")).as("syy"))
      .select(col("event_type"), col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast(DoubleType)
          / (col("n") * col("sxx") - col("sx") * col("sx"))
            .cast(DoubleType)).as("slope"),
        ((col("sy").cast(DoubleType)
          - (col("n") * col("sxy") - col("sx") * col("sy")).cast(DoubleType)
            / (col("n") * col("sxx") - col("sx") * col("sx"))
              .cast(DoubleType)
            * col("sx").cast(DoubleType)) / col("n").cast(DoubleType))
          .as("intercept"),
        (((col("n") * col("sxy") - col("sx") * col("sy")).cast(DoubleType)
          * (col("n") * col("sxy") - col("sx") * col("sy")).cast(DoubleType))
          / ((col("n") * col("sxx") - col("sx") * col("sx")).cast(DoubleType)
            * (col("n") * col("syy") - col("sy") * col("sy"))
              .cast(DoubleType))).as("r2"))
      .orderBy("event_type")
  }

  /** q170 — survivorship profile assembly (golden record): one pass
    * over the event log builds each user's consolidated profile —
    * lifetime span, latest purchase/view values, last error time,
    * signup flag — with every "latest" picked by `max_by` over the
    * total order (ts, event_id) and every per-source attribute scoped
    * by an aggregate FILTER clause. This is the entity-consolidation
    * operator of a CDP/feature store: sparse signals from one stream
    * fold into a dense profile row, nulls arising naturally where a
    * user never emitted that signal. ONE shuffle on user_id with
    * map-side partial aggregation (FILTER'd aggregates all combine in
    * the same hash slot) — no self-joins, nothing event-sized past the
    * aggregate; the picked doubles/timestamps are row passthroughs, so
    * the oracle hash-matches bit-exact. */
  def q170Survivorship(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(
        expr("count(*)").as("n_events"),
        expr("min(ts)").as("first_seen"),
        expr("max(ts)").as("last_seen"),
        expr("count(*) FILTER (WHERE event_type = 'purchase')")
          .as("n_purchases"),
        expr("max_by(value, struct(ts, event_id))" +
          " FILTER (WHERE event_type = 'purchase')").as("last_purchase_value"),
        expr("max_by(value, struct(ts, event_id))" +
          " FILTER (WHERE event_type = 'view')").as("last_view_value"),
        expr("max(ts) FILTER (WHERE event_type = 'error')").as("last_error_ts"),
        expr("bool_or(event_type = 'signup')").as("has_signup"))
      .orderBy("user_id")

  /** q171 — seasonality-adjusted anomaly detection: daily fixed-point
    * totals per event type, baselined against that type's SAME
    * day-of-week distribution (retail/traffic data is weekly-periodic;
    * a plain global z-score would flag every weekend). The flag
    * predicate is PURE INTEGER — `(n·y − s1)² > 4·(n·s2 − s1²)` is
    * |z| > 2 cleared of divisions — so which days alert is exactly
    * reproducible at any parallelism, and the reported z is one
    * IEEE sqrt+divide over those same integers (bit-exact
    * cross-engine). Integer bound: |n·y| must stay under ~3e9 for the
    * square to fit BIGINT — holds through ~sf10 daily totals (ANSI
    * overflow would fail loudly, not corrupt); rescale the 1e2
    * fixed-point factor beyond that, as in q147. Shape: one shuffle to
    * daily grain, then windows over the (type × dow)-keyed frame —
    * nothing event-sized past the first groupBy. */
  def q171SeasonalAnomaly(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("y"))
      // Spark weekday() is 0=Monday; +1 matches DuckDB's isodow
      .withColumn("dow", expr("weekday(day) + 1").cast("long"))
    val w = Window.partitionBy("event_type", "dow")
    val n = count(lit(1)).over(w)
    val s1 = sum(col("y")).over(w)
    val s2 = sum(col("y") * col("y")).over(w)
    val num = n * col("y") - s1   // n·(y − mean), integer
    val den = n * s2 - s1 * s1    // n²·var, integer
    daily.select(col("event_type"), col("day"), col("dow"), col("y"),
        num.as("num"), den.as("den"))
      .filter(col("den") > 0 && col("num") * col("num") > lit(4) * col("den"))
      .select(col("event_type"), col("day"), col("dow"), col("y"),
        (col("num").cast(DoubleType)
          / sqrt(col("den").cast(DoubleType))).as("z"))
      .orderBy("event_type", "day")
  }

  /** q172 — behavioral path mining: the most frequent length-3 event
    * sequences (trigrams) across all users, each user's stream ordered
    * by the total order (ts, event_id). The funnel-discovery
    * primitive: q126 checks a GIVEN funnel, this surfaces which paths
    * exist. One shuffle to user partitions (the window sort), trigrams
    * emitted map-side by two `lead`s, then a count aggregate over the
    * trigram-keyed frame — the same shape at any scale, no self-joins.
    * Top-25 with the full trigram as tie-break → deterministic. */
  def q172PathTrigrams(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type").as("t1"),
        lead(col("event_type"), 1).over(w).as("t2"),
        lead(col("event_type"), 2).over(w).as("t3"))
      .filter(col("t3").isNotNull)
      .groupBy("t1", "t2", "t3").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("t1"), col("t2"), col("t3"))
      .limit(25)
  }

  /** q174 — salted two-phase aggregation: exact per-event-type totals
    * computed through an EXPLICIT salt stage — groupBy (type, salt=
    * event_id%16) partials first, then combine per type. event_type
    * has 5 values, so at 100 TB a single-phase shuffle hashes the
    * entire table into 5 reducer keys (the canonical hot-partition
    * failure); the salt spreads each hot key over 16 reducers and the
    * second shuffle moves only 5×16 partial rows. Spark's own map-side
    * partial aggregation usually hides this for algebraic aggregates —
    * the explicit form is the discipline for when it can't (high
    *-cardinality side columns defeating hash-map partials, exact
    * per-key structures, or any `collect_*`-style agg). All partials
    * are integers → recombination is order-independent and the result
    * equals the plain GROUP BY bit-exactly, which is precisely what
    * the oracle (an UNSALTED direct aggregate) proves. The spec
    * asserts the two-exchange plan shape. */
  def q174SaltedAgg(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"), pmod(col("event_id"), lit(16)).as("salt"))
      .agg(count(lit(1)).as("c"),
        sum(floor(col("value") * 100).cast("long")).as("v"),
        max(col("value")).as("mx"))
      .groupBy("event_type")
      .agg(sum(col("c")).as("n_events"),
        (sum(col("v")).cast(DoubleType) / 100).as("sum_value"),
        max(col("mx")).as("max_value"))
      .orderBy("event_type")

  /** q186 — CUSUM change-point detection over daily fixed-point totals
    * per event type: the one-sided cumulative-sum statistics
    * s⁺ᵢ = max(0, s⁺ᵢ₋₁ + dᵢ) and s⁻ᵢ = max(0, s⁻ᵢ₋₁ − dᵢ) that flag a
    * sustained mean shift long before any single day trips a z-score —
    * the classic SPC monitor a metrics platform runs per series.
    *
    * The recurrence looks inherently sequential, but unrolls exactly:
    * s⁺ᵢ = Pᵢ − min₀≤ⱼ≤ᵢ Pⱼ where Pᵢ is the prefix sum of dᵢ (and s⁻
    * symmetrically with a running max), so the whole statistic is TWO
    * stacked window functions over one day-grain partition — one
    * shuffle on event_type, no self-joins, no driver loop, and it
    * parallelizes over series exactly like any windowed aggregate.
    *
    * Exactness: deviations are mean-centered WITHOUT division —
    * dᵢ = n·xᵢ − Σx (everything scaled by the series length n) — so
    * every value in the pipeline is an exact BIGINT and both engines
    * agree bit-for-bit. The alarm fires when the accumulated drift
    * exceeds one mean-day of volume (s⁺ > Σx, i.e. Σ(xⱼ−μ) > μ in
    * unscaled units). Integer bound: |n·xᵢ| ≤ 31·(daily fp total),
    * far under 2⁶³ through sf100 (same budget as q171). */
  def q186Cusum(s: SparkSession, dir: String): DataFrame = {
    val byType = Window.partitionBy("event_type")
    val toDay = Window.partitionBy("event_type").orderBy("day")
    Tables.events(s, dir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("x"))
      .withColumn("n", count(lit(1)).over(byType))
      .withColumn("sx", sum(col("x")).over(byType))
      .withColumn("d", col("n") * col("x") - col("sx"))
      .withColumn("p", sum(col("d")).over(toDay))
      .withColumn("cusum_pos", col("p") - least(min(col("p")).over(toDay), lit(0L)))
      .withColumn("cusum_neg", greatest(max(col("p")).over(toDay), lit(0L)) - col("p"))
      .select(col("event_type"), col("day"), col("x").as("v_fp"),
        col("cusum_pos"), col("cusum_neg"),
        (col("cusum_pos") > col("sx")).as("alarm_up"),
        (col("cusum_neg") > col("sx")).as("alarm_down"))
      .orderBy("event_type", "day")
  }

  /** q187 — CUPED experiment readout (Controlled-experiment Using
    * Pre-Existing Data, Deng et al., WSDM 2013): each user's
    * post-period spend is variance-adjusted by their own pre-period
    * spend — ŷ = y − θ(x − x̄), θ = cov(x,y)/var(x) — which shrinks
    * metric variance by ρ² and is the standard sensitivity lever of
    * every large experimentation platform. Arms are a deterministic
    * user_id % 2 split; the pre/post cut is day 16 of the 30-day
    * window.
    *
    * Shape: one user-grain aggregate (conditional sums — the only
    * event-sized shuffle), then a 6-integer pooled aggregate and a
    * 2-row per-arm aggregate, joined by a broadcast-trivial cross of
    * one scalar row. Exactness: x/y are fixed-point BIGINTs and all
    * sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²) aggregate as
    * exact integers; θ, x̄, ρ² and the adjusted means are IDENTICAL
    * double expression trees over those integers in both engines —
    * bit-exact (the q168/q147 discipline). Integer bound: n·Σx² must
    * stay under 2⁶³ — holds through ~sf10 at the 1e2 quantization;
    * rescale to 1e1 beyond (q147's documented budget). */
  def q187Cuped(s: SparkSession, dir: String): DataFrame = {
    val cut = lit("2024-01-16").cast("timestamp")
    val fv = floor(col("value") * 100).cast("long")
    val perUser = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(sum(when(col("ts") < cut, fv).otherwise(0L)).as("x"),
        sum(when(col("ts") >= cut, fv).otherwise(0L)).as("y"))
      .withColumn("arm", pmod(col("user_id"), lit(2)))
    val pooled = perUser.agg(
      count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"),
      sum(col("y") * col("y")).as("syy"))
    val arms = perUser.groupBy("arm")
      .agg(count(lit(1)).as("n_users"), sum(col("x")).as("sx_a"),
        sum(col("y")).as("sy_a"))
    val c = (col("n") * col("sxy") - col("sx") * col("sy")).cast(DoubleType)
    val v = (col("n") * col("sxx") - col("sx") * col("sx")).cast(DoubleType)
    val vy = (col("n") * col("syy") - col("sy") * col("sy")).cast(DoubleType)
    val theta = c / v
    val xbar = col("sx").cast(DoubleType) / col("n").cast(DoubleType)
    val meanY = col("sy_a").cast(DoubleType) / col("n_users").cast(DoubleType)
    val meanX = col("sx_a").cast(DoubleType) / col("n_users").cast(DoubleType)
    arms.crossJoin(pooled)
      .select(col("arm"), col("n_users"),
        (meanY / 100.0).as("mean_y"),
        ((meanY - theta * (meanX - xbar)) / 100.0).as("mean_y_cuped"),
        theta.as("theta"), ((c * c) / (v * vy)).as("rho2"))
      .orderBy("arm")
  }

  /** q189 — maximum drawdown per series: over each event type's
    * cumulative daily fixed-point total, the largest peak-to-trough
    * decline and the (first) day it bottomed — the risk statistic
    * finance and SLO dashboards compute over every equity curve /
    * error-budget burn line. Two stacked windows (running sum, running
    * max) + one whole-partition max and a filter — one shuffle on
    * event_type, day-grain data only past the first aggregate; no
    * self-joins. All integer → bit-exact cross-engine; tie on equal
    * drawdowns broken by earliest day in both engines. */
  def q189Drawdown(s: SparkSession, dir: String): DataFrame = {
    val byDay = Window.partitionBy("event_type").orderBy("day")
    val all = Window.partitionBy("event_type")
    Tables.events(s, dir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("v"))
      .withColumn("cum", sum(col("v")).over(byDay))
      .withColumn("peak", max(col("cum")).over(byDay))
      .withColumn("dd", col("peak") - col("cum"))
      .withColumn("max_dd", max(col("dd")).over(all))
      .filter(col("dd") === col("max_dd"))
      .groupBy("event_type")
      .agg(max(col("max_dd")).as("max_drawdown_fp"),
        min(col("day")).as("trough_day"))
      .orderBy("event_type")
  }

  /** q190 — signup→purchase conversion-lag quartiles per signup-week
    * cohort: per user, the delay from first signup to first subsequent
    * purchase; converters are quartiled WITHIN their signup week
    * (ntile over the exact (lag, user) order — deterministic ties),
    * and each (cohort, quartile) cell reports its population and exact
    * integer-second boundaries. The time-to-convert distribution
    * behind activation dashboards and funnel SLAs. Partitioning the
    * rank by cohort is the scale posture (q181's quintile discipline):
    * no global sort ever materializes — each week's converters rank
    * independently, so the window parallelizes across cohorts at any
    * corpus size. Shape: one user-grain aggregate (conditional min —
    * the only event-sized shuffle), a purchase-side min-join, then a
    * cohort-partitioned ntile and a tiny matrix aggregate. All
    * integer → bit-exact. */
  def q190ConversionLag(s: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "signup", col("ts"))).as("s0"))
    val firstBuy = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .join(perUser.filter(col("s0").isNotNull), "user_id")
      .filter(col("ts") >= col("s0"))
      .groupBy("user_id")
      .agg((unix_timestamp(min(col("ts")))
        - unix_timestamp(first(col("s0")))).as("lag_s"),
        date_trunc("week", first(col("s0"))).cast("date").as("cohort_week"))
    firstBuy
      .withColumn("quartile", ntile(4).over(Window
        .partitionBy("cohort_week").orderBy(col("lag_s"), col("user_id"))))
      .groupBy("cohort_week", "quartile")
      .agg(count(lit(1)).as("n_users"), min(col("lag_s")).as("min_lag_s"),
        max(col("lag_s")).as("max_lag_s"), sum(col("lag_s")).as("sum_lag_s"))
      .orderBy("cohort_week", "quartile")
  }

  /** q191 — last-touch conversion attribution: each purchase credits
    * the user's most recent PRIOR non-purchase event (the marketing
    * "last touch wins" model), and revenue rolls up by crediting touch
    * type; purchases with no prior touchpoint credit 'none'. One
    * keyed window (conditional `last(..., ignoreNulls)` over the
    * (ts, event_id) total order — the same carry-forward shape as
    * q116's LOCF) + a 5-row aggregate: ONE event-sized shuffle, no
    * self-joins, parallel across users at any scale. Counts and
    * fixed-point revenue are integers → bit-exact cross-engine. */
  def q191Attribution(s: SparkSession, dir: String): DataFrame = {
    val before = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, dir)
      .withColumn("touch", last(
        when(col("event_type") =!= "purchase", col("event_type")),
        ignoreNulls = true).over(before))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("touch"), lit("none")).as("touch_type"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(floor(col("value") * 100).cast("long")).as("revenue_fp"))
      .orderBy("touch_type")
  }

  /** q193 — Kaplan-Meier survival estimator over session durations:
    * sessions are 30-minute-inactivity-gap user activity runs (the q26
    * sessionization), a session "dies" when it ends, and sessions
    * still receiving events in the final 30 minutes of the window are
    * right-CENSORED (their true duration is only known to exceed the
    * observation). The KM product-limit table — at each death time t:
    * the risk set nᵢ, deaths dᵢ, and Ŝ(t) = Π(1 − dⱼ/nⱼ) — is THE
    * duration-curve estimator that handles censoring correctly (a
    * naive duration histogram under-counts long sessions cut off by
    * the window edge).
    *
    * Shape: one user-partitioned lag window + one session-grain
    * aggregate (the only event-sized operations, both parallel by
    * user), then everything is duration-grain — the KM table has at
    * most (window ÷ minute) rows regardless of corpus size, so the
    * global-ordered window runs on a frame that never grows with the
    * data. Exactness: durations are exact integer minutes, the
    * survival product is carried as an exact BIGINT cumsum of
    * floor-quantized ln((n−d)/n) terms (the q107 fixed-point-log
    * discipline — addition-order-free) and surfaced in LN-SPACE
    * (`log_surv`, a correctly-rounded division — exp() is not
    * correctly rounded across libms, so Ŝ(t)=exp(log_surv) is left to
    * the caller). A time where the whole risk set dies gets a −1e12
    * sentinel term (Ŝ exp-underflows to exactly 0). */
  def q193KaplanMeier(s: SparkSession, dir: String): DataFrame = {
    def us(c: Column): Column = unix_micros(c.cast("timestamp"))
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    val ev = Tables.events(s, dir).select(col("user_id"), col("ts"))
    val sessions = ev
      .withColumn("new_sess",
        when(us(col("ts")) - us(lag(col("ts"), 1).over(byUser))
          > 30L * 60 * 1000000, 1L).otherwise(lit(0L)))
      .withColumn("sess_id", sum(
        when(lag(col("ts"), 1).over(byUser).isNull, 1L)
          .otherwise(col("new_sess")))
        .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sess_id")
      .agg(min(col("ts")).as("s_start"), max(col("ts")).as("s_end"))
    val cutoff = ev.agg(max(col("ts")).as("max_ts"))
    val lifetimes = sessions.crossJoin(broadcast(cutoff))
      // floor(double-div) — NOT a bare cast: DuckDB CAST(DOUBLE AS
      // BIGINT) rounds while Spark's truncates; floor() agrees on both
      .select(floor((us(col("s_end")) - us(col("s_start")))
          / lit(60000000L)).cast("long").as("dur"),
        (us(col("s_end")) > us(col("max_ts")) - 30L * 60 * 1000000)
          .as("censored"))
    val total = lifetimes.agg(count(lit(1)).as("n_total"))
    val byDur = lifetimes.groupBy("dur")
      .agg(count(when(!col("censored"), 1)).as("n_deaths"),
        count(when(col("censored"), 1)).as("n_censored"))
    val ord = Window.orderBy("dur")
    byDur.crossJoin(broadcast(total))
      .withColumn("n_risk", col("n_total")
        - coalesce(sum(col("n_deaths") + col("n_censored"))
          .over(ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("term",
        when(col("n_deaths") === col("n_risk"), lit(-1000000000000L))
          .otherwise(floor(log((col("n_risk") - col("n_deaths"))
              .cast(DoubleType) / col("n_risk").cast(DoubleType)) * 1e9)
            .cast("long")))
      .withColumn("surv_scaled", sum(col("term"))
        .over(ord.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("n_deaths") > 0)
      // ln-space output: Ŝ(t) = exp(log_surv). exp() is NOT correctly
      // rounded (JVM vs libm diverge in the last ulp — measured 3e-18
      // at sf0.01), so the boundary emits the exact scaled integer and
      // its correctly-rounded division; callers exp() it client-side.
      .select(col("dur").as("duration_min"), col("n_risk"), col("n_deaths"),
        col("n_censored"), col("surv_scaled"),
        (col("surv_scaled").cast(DoubleType) / 1e9).as("log_surv"))
      .orderBy("duration_min")
  }

  // SPRT constants, fixed-point 1e9 — precomputed literals (identical
  // in the oracle SQL), so NO runtime float op feeds the decision:
  //   ln(p1/p0) = ln(0.55/0.50) = ln(1.1):  floor(0.09531018…·1e9)
  //   ln(q1/q0) = ln(0.45/0.50) = ln(0.9):  floor(−0.10536052…·1e9)
  //   bound ln((1−β)/α) = ln(19) at α=β=0.05: floor(2.94443898…·1e9)
  private[graft] val SprtLnP = 95310179L
  private[graft] val SprtLnQ = -105360516L
  private[graft] val SprtBound = 2944438979L

  /** q194 — SPRT (Wald's sequential probability ratio test) on a
    * running A/B experiment: arms are the deterministic user_id % 2
    * split; each click/view event is a Bernoulli trial (success =
    * click) testing H₀: p = 0.50 vs H₁: p = 0.55. Per arm and day the
    * log-likelihood ratio increments x·ln(p1/p0) + (n−x)·ln(q1/q0)
    * accumulate until the boundary ±ln(19) (α = β = 0.05) is crossed —
    * the early-stopping monitor every experimentation platform runs so
    * a decided test stops burning traffic.
    *
    * Shape: one (arm, day) aggregate — the only event-sized shuffle,
    * map-side combined — then a 2-partition day-ordered window over a
    * days×arms frame and two tiny aggregates; scales as pure keyed
    * streaming aggregation. Exactness: the LLR terms are integer
    * multiples of precomputed BIGINT constants (no runtime ln), the
    * cumsum is exact, and the crossing day / decision are pure integer
    * comparisons — bit-exact cross-engine at any scale. */
  def q194Sprt(s: SparkSession, dir: String): DataFrame = {
    val byArm = Window.partitionBy("arm").orderBy("day")
    val daily = Tables.events(s, dir)
      .filter(col("event_type").isin("click", "view"))
      .groupBy((col("user_id") % 2).as("arm"),
        date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(count(lit(1)).as("n"),
        count(when(col("event_type") === "click", 1)).as("x"))
    val cum = daily.withColumn("cum_llr",
      sum(col("x") * SprtLnP + (col("n") - col("x")) * SprtLnQ).over(byArm))
    val crossings = cum
      .filter(col("cum_llr") >= SprtBound || col("cum_llr") <= -SprtBound)
      .withColumn("rn", row_number().over(byArm))
      .filter(col("rn") === 1)
      .select(col("arm"), col("day").as("decision_day"),
        col("cum_llr").as("cum_at_decision"),
        when(col("cum_llr") >= SprtBound, "reject_h0")
          .otherwise("accept_h0").as("decision"))
    cum.groupBy("arm")
      .agg(count(lit(1)).as("n_days"), sum(col("x")).as("total_x"),
        sum(col("n")).as("total_n"))
      .join(crossings, Seq("arm"), "left")
      .select(col("arm"), col("n_days"), col("total_x"), col("total_n"),
        coalesce(col("decision"), lit("continue")).as("decision"),
        col("decision_day"), col("cum_at_decision"))
      .orderBy("arm")
  }

  /** q203 — Markov next-event prediction, leakage-safe eval: train the
    * first-order transition argmax on pairs completing BEFORE day 16
    * of the window, predict the majority next event per current type,
    * and score accuracy on pairs completing on/after the cut — the
    * sequence-model baseline every session-prediction system is judged
    * against (and the eval twin of q128's transition matrix, which
    * reports probabilities but never tests them out of sample).
    *
    * Shape: one user-partitioned lag window (the only event-sized
    * operation), then type²-sized aggregates; train/test split is a
    * pure filter on the pair's completion time, so no leakage path
    * exists. Exactness: the argmax is decided by (count DESC, type
    * ASC) row_number — integer ordering, no probabilities — and
    * accuracy is an exact ppm division. */
  def q203MarkovEval(s: SparkSession, dir: String): DataFrame = {
    val cut = lit("2024-01-16").cast("timestamp")
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev_type").isNotNull)
      .select(col("prev_type"), col("event_type").as("next_type"),
        (col("ts") < cut).as("is_train"))
      .persist() // train aggregate + test aggregate
    val model = pairs.filter(col("is_train"))
      .groupBy("prev_type", "next_type").agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(Window.partitionBy("prev_type")
        .orderBy(col("n").desc, col("next_type"))))
      .filter(col("rn") === 1)
      .select(col("prev_type"), col("next_type").as("predicted"))
    pairs.filter(!col("is_train"))
      .join(model, Seq("prev_type"), "left")
      .groupBy("prev_type")
      .agg(first(col("predicted")).as("predicted"),
        count(lit(1)).as("n_test"),
        count(when(col("next_type") === col("predicted"), 1)).as("n_correct"))
      .withColumn("acc_ppm", expr("n_correct * 1000000 div n_test"))
      .orderBy("prev_type")
  }

  /** q205 — change-point localization by binary segmentation (first
    * split): per event type's daily fixed-point series, the split that
    * maximizes the between-segment sum of squares
    * SL²/nL + SR²/nR − S²/n — WHERE the level shifted, complementing
    * q186's CUSUM (which only alarms that it did). One split of the
    * top-down segmentation every changepoint library starts with.
    *
    * Shape: day-grain after the first aggregate; two stacked windows
    * (prefix sums, then argmax by row_number) — all partitioned by
    * event type. Exactness: prefix sums/counts are exact BIGINTs;
    * daily totals stay < 2³² so SL² < 2⁵³ and the gain doubles are
    * EXACT integer-valued ratios — the argmax (gain DESC, day ASC)
    * is deterministic cross-engine. */
  def q205BinsegChangepoint(s: SparkSession, dir: String): DataFrame = {
    val byType = Window.partitionBy("event_type")
    val toDay = byType.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("v"))
    val gains = daily
      .withColumn("sl", sum(col("v")).over(toDay))
      .withColumn("nl", count(lit(1)).over(toDay))
      .withColumn("s", sum(col("v")).over(byType))
      .withColumn("n", count(lit(1)).over(byType))
      .filter(col("nl") < col("n")) // split AFTER this day
      .withColumn("gain",
        (col("sl") * col("sl")).cast(DoubleType) / col("nl")
          + ((col("s") - col("sl")) * (col("s") - col("sl"))).cast(DoubleType)
            / (col("n") - col("nl"))
          - (col("s") * col("s")).cast(DoubleType) / col("n"))
    gains.withColumn("rn", row_number().over(
        byType.orderBy(col("gain").desc, col("day"))))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("day").as("split_day"), col("gain"),
        (col("sl").cast(DoubleType) / (col("nl") * lit(100.0)))
          .as("mean_left"),
        ((col("s") - col("sl")).cast(DoubleType)
          / ((col("n") - col("nl")) * lit(100.0))).as("mean_right"))
      .orderBy("event_type")
  }

  /** q208 — TWAP (time-weighted average price/value) per type and
    * day: each observation is weighted by how long it REMAINED the
    * latest reading (to the next same-type event, or the day
    * boundary) — the standard irregular-sampling average for sensor
    * and market data, where the plain mean over-weights bursts (a
    * sensor that reports 100× during a spike would drag the naive
    * mean; TWAP charges each value for its holding time only).
    *
    * Shape: one keyed lead window + one keyed aggregate — nothing
    * beyond (type, day) grain ever shuffles. Exactness: weights are
    * exact integer microseconds, values fixed-point cents, the
    * weighted sum an exact BIGINT (bound: Σ v·dt < 2⁶³ holds while
    * |v| < ~1e8 cents at a day's 8.64e10 µs — far past target scale),
    * and `twap` is the identical final double division. */
  def q208Twap(s: SparkSession, dir: String): DataFrame = {
    def us(c: Column): Column = unix_micros(c.cast("timestamp"))
    val byTypeDay = Window.partitionBy("event_type", "day")
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("event_type"), col("event_id"), col("ts"),
        date_trunc("day", col("ts")).as("day"),
        floor(col("value") * 100).cast("long").as("v"))
      .withColumn("dt",
        coalesce(us(lead(col("ts"), 1).over(byTypeDay)),
          us(col("day")) + 86400000000L) - us(col("ts")))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n_events"),
        sum(col("v") * col("dt")).as("twap_num"),
        sum(col("dt")).as("dt_total"))
      .select(col("event_type"), col("day"), col("n_events"),
        col("twap_num"), col("dt_total"),
        (col("twap_num").cast(DoubleType)
          / (col("dt_total").cast(DoubleType) * lit(1e2))).as("twap"))
      .orderBy("event_type", "day")
  }

  // ----------------------------------------- q236 delta-method ratio

  /** q236 — delta-method standard error for a ratio-of-sums metric
    * (clicks per view, revenue per session — the metric form most A/B
    * dashboards report and most naive variance formulas get wrong,
    * because users, not events, are the independent units): with
    * per-user (x_i, y_i), R = Σx/Σy and
    * Var(R) ≈ (S_xx + R²·S_yy − 2R·S_xy) / (n·ȳ²), the first-order
    * Taylor expansion. Completes the metrology family: q187 CUPED
    * (variance reduction), q222 Poisson bootstrap (resampling), this
    * (closed form).
    *
    * Exactness: per-user counts are integers, so all five moments
    * (Σx, Σy, Σx², Σy², Σxy) are exact BIGINTs and the SE is one
    * fixed expression over them — deterministic doubles on both
    * engines. One user-grain aggregate then a single-row fold. */
  def q236DeltaMethodRatio(s: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(s, dir)
      .groupBy("user_id")
      .agg(sum((col("event_type") === "click").cast("long")).as("x"),
        sum((col("event_type") === "view").cast("long")).as("y"))
    val m = perUser.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("x") * col("y")).as("sxy"))
    val n = col("n").cast("double")
    val r = col("sx").cast("double") / col("sy").cast("double")
    val ybar = col("sy").cast("double") / n
    val vx = (col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double") / n) / (n - lit(1.0))
    val vy = (col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double") / n) / (n - lit(1.0))
    val cxy = (col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double") / n) / (n - lit(1.0))
    val se = sqrt((vx + r * r * vy - lit(2.0) * r * cxy) /
      (n * ybar * ybar))
    m.select(col("n").as("n_users"), r.as("ratio"), se.as("se"),
      (r - lit(1.96) * se).as("ci_lo"), (r + lit(1.96) * se).as("ci_hi"))
  }

  private val DeltaMethodRatioSql: String =
    """SELECT n AS n_users,
      |  CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE) AS ratio,
      |  sqrt(((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) *
      |      CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1e0)
      |    + (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE)) *
      |      (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE)) *
      |      ((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) *
      |        CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) /
      |        (CAST(n AS DOUBLE) - 1e0))
      |    - 2e0 * (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE)) *
      |      ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) *
      |        CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) /
      |        (CAST(n AS DOUBLE) - 1e0)))
      |    / (CAST(n AS DOUBLE) * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) *
      |       (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))) AS se,
      |  CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE) - 1.96e0 * sqrt(
      |    ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) *
      |      CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1e0)
      |    + (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE)) *
      |      (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE)) *
      |      ((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) *
      |        CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) /
      |        (CAST(n AS DOUBLE) - 1e0))
      |    - 2e0 * (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE)) *
      |      ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) *
      |        CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) /
      |        (CAST(n AS DOUBLE) - 1e0)))
      |    / (CAST(n AS DOUBLE) * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) *
      |       (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))) AS ci_lo,
      |  CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE) + 1.96e0 * sqrt(
      |    ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) *
      |      CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1e0)
      |    + (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE)) *
      |      (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE)) *
      |      ((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) *
      |        CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) /
      |        (CAST(n AS DOUBLE) - 1e0))
      |    - 2e0 * (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE)) *
      |      ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) *
      |        CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) /
      |        (CAST(n AS DOUBLE) - 1e0)))
      |    / (CAST(n AS DOUBLE) * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) *
      |       (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))) AS ci_hi
      |FROM (
      |  SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
      |    CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx,
      |    CAST(sum(y * y) AS BIGINT) AS syy,
      |    CAST(sum(x * y) AS BIGINT) AS sxy
      |  FROM (
      |    SELECT user_id,
      |      CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |        AS BIGINT) AS x,
      |      CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      |        AS BIGINT) AS y
      |    FROM events GROUP BY user_id))""".stripMargin

  // --------------------------------------------- q234 policy replay

  private val ReplayArms =
    Seq("click", "error", "purchase", "signup", "view")

  /** q234 — unbiased offline policy evaluation by replay (Li et al.,
    * WSDM'11): to score a new decision policy π on LOGGED data, keep
    * only the events where π(user) happens to equal the arm the
    * logging policy actually showed, and average the observed reward
    * there. When logging was uniform over K arms (it is here — ~equal
    * volume per type), the matched subset is an unbiased sample of
    * "what π would have seen", at a match rate of 1/K. This is the
    * standard pre-deployment eval for recommenders/bandits — no
    * simulator, no counterfactual model, just a filter and a mean.
    * π is md5-derived per user (deterministic, reproducible).
    *
    * Exactness: rewards go through floor(value·1e6) micros, so every
    * mean is a BIGINT/BIGINT division. One scan, one K-group
    * aggregate. Output per arm: logged volume, matched volume, the
    * logged-average reward and the replay (policy-matched) estimate. */
  def q234PolicyReplay(s: SparkSession, dir: String): DataFrame = {
    val pi = element_at(array(ReplayArms.map(lit): _*),
      (CorpusOps.md5Hash32(concat(lit("pi:"), col("user_id").cast("string")))
        % 5).cast("int") + 1)
    Tables.events(s, dir)
      .select(col("event_type").as("arm"),
        (pi === col("event_type")).cast("long").as("m"),
        floor(col("value") * lit(1e6)).as("vmi"))
      .groupBy("arm")
      .agg(count(lit(1)).as("n_logged"),
        sum(col("m")).as("n_matched"),
        sum(col("vmi")).as("sv"),
        sum(col("m") * col("vmi")).as("smv"))
      .select(col("arm"), col("n_logged"), col("n_matched"),
        (col("sv").cast("double") / col("n_logged").cast("double") /
          lit(1e6)).as("logged_mean"),
        when(col("n_matched") > 0,
          col("smv").cast("double") / col("n_matched").cast("double") /
            lit(1e6)).otherwise(lit(null).cast("double"))
          .as("replay_mean"))
      .orderBy("arm")
  }

  private val PolicyReplaySql: String =
    """SELECT arm, n_logged, n_matched,
      |  CAST(sv AS DOUBLE) / CAST(n_logged AS DOUBLE) / 1e6
      |    AS logged_mean,
      |  CASE WHEN n_matched > 0
      |    THEN CAST(smv AS DOUBLE) / CAST(n_matched AS DOUBLE) / 1e6
      |    ELSE NULL END AS replay_mean
      |FROM (
      |  SELECT event_type AS arm, count(*) AS n_logged,
      |    CAST(sum(m) AS BIGINT) AS n_matched,
      |    CAST(sum(vmi) AS BIGINT) AS sv,
      |    CAST(sum(m * vmi) AS BIGINT) AS smv
      |  FROM (
      |    SELECT event_type,
      |      CASE WHEN (['click', 'error', 'purchase', 'signup', 'view'])[
      |        CAST(CAST(('0x' || substr(md5('pi:' ||
      |          CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 5
      |          AS INTEGER) + 1] = event_type THEN 1 ELSE 0 END AS m,
      |      CAST(floor("value" * 1e6) AS BIGINT) AS vmi
      |    FROM events)
      |  GROUP BY event_type)
      |ORDER BY arm""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q234_policy_replay" -> (q234PolicyReplay _),
    "q236_delta_method_ratio" -> (q236DeltaMethodRatio _),
    "q193_kaplan_meier" -> (q193KaplanMeier _),
    "q194_sprt" -> (q194Sprt _),
    "q203_markov_eval" -> (q203MarkovEval _),
    "q205_binseg_changepoint" -> (q205BinsegChangepoint _),
    "q208_twap" -> (q208Twap _),
    "q191_attribution" -> (q191Attribution _),
    "q189_drawdown" -> (q189Drawdown _),
    "q190_conversion_lag" -> (q190ConversionLag _),
    "q187_cuped" -> (q187Cuped _),
    "q186_cusum" -> (q186Cusum _),
    "q174_salted_agg" -> (q174SaltedAgg _),
    "q170_survivorship" -> (q170Survivorship _),
    "q171_seasonal_anomaly" -> (q171SeasonalAnomaly _),
    "q172_path_trigrams" -> (q172PathTrigrams _),
    "q168_trend_ols" -> (q168TrendOls _),
    "q166_ohlc_bars" -> (q166OhlcBars _),
    "q167_cdc_merge" -> (q167CdcMerge _),
    "q163_mv_maintenance" -> (q163MvMaintenance _),
    "q160_robust_outliers" -> (q160RobustOutliers _),
    "q142_concurrent_sessions" -> (q142ConcurrentSessions _),
    "q144_asof_nearest" -> (q144AsofNearest _),
    "q147_autocorr" -> (q147Autocorr _),
    "q125_outliers" -> (q125Outliers _),
    "q129_ewma" -> (q129Ewma _),
    "q130_dau_mau" -> (q130DauMau _),
    "q126_funnel" -> (q126Funnel _),
    "q127_retention" -> (q127Retention _),
    "q128_transitions" -> (q128Transitions _),
    "q24_json_extract" -> (q24JsonExtract _),
    "q49_sliding_window" -> (q49SlidingWindow _),
    "q25_tumbling_window" -> (q25TumblingWindow _),
    "q26_sessionize" -> (q26Sessionize _),
    "q27_asof_join" -> (q27AsofJoin _),
    "q106_asof_exec" -> (q106AsofExec _),
    "q119_asof_forward" -> (q119AsofForward _),
    "q46_map_fns" -> (q46MapFns _),
  )

  /** DuckDB arg_min/arg_max (1.0) reject struct ORDER keys, so the
    * (ts, event_id) total order is encoded as a zero-padded
    * `epoch_us || event_id` varchar whose lexicographic order equals
    * the numeric pair order — Spark's max_by(struct(...)) picks the
    * identical row. */
  private val ArgKeySql: String =
    "lpad(CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS VARCHAR), 20, '0')" +
      " || lpad(CAST(event_id AS VARCHAR), 12, '0')"

  val oracles: Map[String, String] = Map(
    "q234_policy_replay" -> PolicyReplaySql,
    "q236_delta_method_ratio" -> DeltaMethodRatioSql,
    "q208_twap" ->
      """WITH ev AS (SELECT event_type, event_id,
        |    CAST(ts AS TIMESTAMP) AS ts,
        |    date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
        |    CAST(floor("value" * 100) AS BIGINT) AS v FROM events),
        |l AS (SELECT *, lead(ts) OVER (PARTITION BY event_type, day
        |        ORDER BY ts, event_id) AS next_ts FROM ev),
        |d AS (SELECT *, coalesce(epoch_us(next_ts),
        |        epoch_us(day) + 86400000000) - epoch_us(ts) AS dt FROM l)
        |SELECT event_type, day, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(v * dt) AS BIGINT) AS twap_num,
        |  CAST(sum(dt) AS BIGINT) AS dt_total,
        |  CAST(CAST(sum(v * dt) AS BIGINT) AS DOUBLE)
        |    / (CAST(CAST(sum(dt) AS BIGINT) AS DOUBLE) * 1e2) AS twap
        |FROM d GROUP BY 1, 2 ORDER BY event_type, day""".stripMargin,
    "q203_markov_eval" ->
      """WITH ev AS (SELECT user_id, event_id,
        |    CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
        |p AS (SELECT prev_type, event_type AS next_type,
        |        ts < TIMESTAMP '2024-01-16' AS is_train
        |      FROM (SELECT *, lag(event_type) OVER (PARTITION BY user_id
        |              ORDER BY ts, event_id) AS prev_type FROM ev)
        |      WHERE prev_type IS NOT NULL),
        |m AS (SELECT prev_type, next_type AS predicted FROM (
        |        SELECT prev_type, next_type, row_number() OVER (
        |            PARTITION BY prev_type
        |            ORDER BY count(*) DESC, next_type) AS rn
        |        FROM p WHERE is_train GROUP BY prev_type, next_type)
        |      WHERE rn = 1),
        |t AS (SELECT p.prev_type, any_value(m.predicted) AS predicted,
        |        CAST(count(*) AS BIGINT) AS n_test,
        |        CAST(count(*) FILTER (WHERE p.next_type = m.predicted)
        |          AS BIGINT) AS n_correct
        |      FROM p LEFT JOIN m ON p.prev_type = m.prev_type
        |      WHERE NOT is_train GROUP BY 1)
        |SELECT prev_type, predicted, n_test, n_correct,
        |  n_correct * 1000000 // n_test AS acc_ppm
        |FROM t ORDER BY prev_type""".stripMargin,
    "q205_binseg_changepoint" ->
      """WITH daily AS (SELECT event_type,
        |    date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
        |    CAST(sum(CAST(floor("value" * 100) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |g AS (SELECT *,
        |    CAST(sum(v) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS sl,
        |    CAST(count(*) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS nl,
        |    CAST(sum(v) OVER (PARTITION BY event_type) AS BIGINT) AS s,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM daily),
        |h AS (SELECT *, CAST(sl * sl AS DOUBLE) / nl
        |        + CAST((s - sl) * (s - sl) AS DOUBLE) / (n - nl)
        |        - CAST(s * s AS DOUBLE) / n AS gain
        |      FROM g WHERE nl < n),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |        ORDER BY gain DESC, day) AS rn FROM h)
        |SELECT event_type, day AS split_day, gain,
        |  CAST(sl AS DOUBLE) / (nl * 1e2) AS mean_left,
        |  CAST(s - sl AS DOUBLE) / ((n - nl) * 1e2) AS mean_right
        |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin,
    "q193_kaplan_meier" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |marked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |           IS NULL THEN 1
        |         WHEN epoch_us(ts) - epoch_us(lag(ts)
        |             OVER (PARTITION BY user_id ORDER BY ts))
        |           > 30 * 60 * 1000000 THEN 1
        |         ELSE 0 END AS new_sess
        |  FROM ev),
        |sess AS (
        |  SELECT user_id, ts,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS sess_id
        |  FROM marked),
        |sessions AS (
        |  SELECT user_id, sess_id, min(ts) AS s_start, max(ts) AS s_end
        |  FROM sess GROUP BY 1, 2),
        |cut AS (SELECT max(ts) AS max_ts FROM ev),
        |lt AS (SELECT
        |         CAST(floor((epoch_us(s_end) - epoch_us(s_start))
        |           / 60000000) AS BIGINT) AS dur,
        |         epoch_us(s_end) > (SELECT epoch_us(max_ts) FROM cut)
        |           - 30 * 60 * 1000000 AS censored
        |       FROM sessions),
        |tot AS (SELECT count(*) AS n_total FROM lt),
        |bd AS (SELECT dur,
        |         CAST(count(*) FILTER (WHERE NOT censored) AS BIGINT) AS n_deaths,
        |         CAST(count(*) FILTER (WHERE censored) AS BIGINT) AS n_censored
        |       FROM lt GROUP BY 1),
        |r AS (SELECT *, (SELECT n_total FROM tot) - coalesce(
        |        CAST(sum(n_deaths + n_censored) OVER (ORDER BY dur
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
        |        0) AS n_risk
        |      FROM bd),
        |t AS (SELECT *, CASE WHEN n_deaths = n_risk
        |          THEN CAST(-1000000000000 AS BIGINT)
        |          ELSE CAST(floor(ln(CAST(n_risk - n_deaths AS DOUBLE)
        |            / CAST(n_risk AS DOUBLE)) * 1e9) AS BIGINT) END AS term
        |      FROM r),
        |c AS (SELECT *, CAST(sum(term) OVER (ORDER BY dur
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |        AS surv_scaled
        |      FROM t)
        |SELECT dur AS duration_min, n_risk, n_deaths, n_censored,
        |  surv_scaled, CAST(surv_scaled AS DOUBLE) / 1e9 AS log_surv
        |FROM c WHERE n_deaths > 0 ORDER BY duration_min""".stripMargin,
    "q194_sprt" ->
      """WITH daily AS (
        |  SELECT user_id % 2 AS arm,
        |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS x
        |  FROM events WHERE event_type IN ('click', 'view') GROUP BY 1, 2),
        |cum AS (SELECT *, CAST(sum(x * 95310179 + (n - x) * (-105360516))
        |          OVER (PARTITION BY arm ORDER BY day) AS BIGINT) AS cum_llr
        |        FROM daily),
        |cr AS (SELECT arm, day AS decision_day, cum_llr AS cum_at_decision,
        |         CASE WHEN cum_llr >= 2944438979 THEN 'reject_h0'
        |              ELSE 'accept_h0' END AS decision,
        |         row_number() OVER (PARTITION BY arm ORDER BY day) AS rn
        |       FROM cum
        |       WHERE cum_llr >= 2944438979 OR cum_llr <= -2944438979),
        |pa AS (SELECT arm, CAST(count(*) AS BIGINT) AS n_days,
        |         CAST(sum(x) AS BIGINT) AS total_x,
        |         CAST(sum(n) AS BIGINT) AS total_n
        |       FROM cum GROUP BY 1)
        |SELECT pa.arm, pa.n_days, pa.total_x, pa.total_n,
        |  coalesce(c.decision, 'continue') AS decision,
        |  c.decision_day, c.cum_at_decision
        |FROM pa LEFT JOIN (SELECT * FROM cr WHERE rn = 1) c ON pa.arm = c.arm
        |ORDER BY pa.arm""".stripMargin,
    "q191_attribution" ->
      """WITH t AS (
        |  SELECT event_type, "value",
        |    last_value(CASE WHEN event_type <> 'purchase'
        |        THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS touch
        |  FROM events)
        |SELECT COALESCE(touch, 'none') AS touch_type,
        |  count(*) AS n_conversions,
        |  CAST(sum(CAST(floor("value" * 100) AS BIGINT)) AS BIGINT)
        |    AS revenue_fp
        |FROM t WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY touch_type""".stripMargin,
    "q189_drawdown" ->
      """WITH daily AS (
        |  SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
        |    CAST(sum(CAST(floor("value" * 100) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |c AS (
        |  SELECT event_type, day, CAST(sum(v) OVER w AS BIGINT) AS cum
        |  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)),
        |p AS (
        |  SELECT event_type, day,
        |    max(cum) OVER w - cum AS dd
        |  FROM c WINDOW w AS (PARTITION BY event_type ORDER BY day)),
        |m AS (
        |  SELECT event_type, day, dd,
        |    max(dd) OVER (PARTITION BY event_type) AS max_dd
        |  FROM p)
        |SELECT event_type, CAST(max(max_dd) AS BIGINT) AS max_drawdown_fp,
        |  min(day) AS trough_day
        |FROM m WHERE dd = max_dd
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q190_conversion_lag" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'signup'
        |        THEN CAST(ts AS TIMESTAMP) END) AS s0
        |  FROM events GROUP BY 1),
        |fb AS (
        |  SELECT e.user_id,
        |    CAST(date_diff('second', min(pu.s0),
        |      min(CAST(e.ts AS TIMESTAMP))) AS BIGINT) AS lag_s,
        |    CAST(date_trunc('week', min(pu.s0)) AS DATE) AS cohort_week
        |  FROM events e JOIN pu ON e.user_id = pu.user_id
        |  WHERE e.event_type = 'purchase' AND pu.s0 IS NOT NULL
        |    AND CAST(e.ts AS TIMESTAMP) >= pu.s0
        |  GROUP BY e.user_id),
        |q AS (
        |  SELECT cohort_week, user_id, lag_s,
        |    CAST(ntile(4) OVER (PARTITION BY cohort_week
        |      ORDER BY lag_s, user_id) AS INTEGER) AS quartile
        |  FROM fb)
        |SELECT cohort_week, quartile, count(*) AS n_users,
        |  min(lag_s) AS min_lag_s, max(lag_s) AS max_lag_s,
        |  CAST(sum(lag_s) AS BIGINT) AS sum_lag_s
        |FROM q GROUP BY 1, 2 ORDER BY cohort_week, quartile""".stripMargin,
    "q187_cuped" ->
      """WITH pu AS (
        |  SELECT user_id, user_id % 2 AS arm,
        |    CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
        |      THEN CAST(floor("value" * 100) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
        |      THEN CAST(floor("value" * 100) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |pooled AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM pu),
        |arms AS (
        |  SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(sum(x) AS BIGINT) AS sx_a, CAST(sum(y) AS BIGINT) AS sy_a
        |  FROM pu GROUP BY arm)
        |SELECT arm, n_users,
        |  (CAST(sy_a AS DOUBLE) / CAST(n_users AS DOUBLE)) / 100.0 AS mean_y,
        |  ((CAST(sy_a AS DOUBLE) / CAST(n_users AS DOUBLE)
        |    - (CAST(n * sxy - sx * sy AS DOUBLE)
        |       / CAST(n * sxx - sx * sx AS DOUBLE))
        |      * (CAST(sx_a AS DOUBLE) / CAST(n_users AS DOUBLE)
        |         - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))) / 100.0
        |    AS mean_y_cuped,
        |  CAST(n * sxy - sx * sy AS DOUBLE)
        |    / CAST(n * sxx - sx * sx AS DOUBLE) AS theta,
        |  (CAST(n * sxy - sx * sy AS DOUBLE)
        |    * CAST(n * sxy - sx * sy AS DOUBLE))
        |    / (CAST(n * sxx - sx * sx AS DOUBLE)
        |       * CAST(n * syy - sy * sy AS DOUBLE)) AS rho2
        |FROM arms CROSS JOIN pooled ORDER BY arm""".stripMargin,
    "q186_cusum" ->
      """WITH daily AS (
        |  SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
        |    CAST(sum(CAST(floor("value" * 100) AS BIGINT)) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, day, x,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
        |    CAST(sum(x) OVER (PARTITION BY event_type) AS BIGINT) AS sx
        |  FROM daily),
        |pre AS (
        |  SELECT event_type, day, x, sx,
        |    CAST(sum(n * x - sx) OVER w AS BIGINT) AS p
        |  FROM st WINDOW w AS (PARTITION BY event_type ORDER BY day)),
        |cs AS (
        |  SELECT event_type, day, x, sx, p,
        |    p - least(CAST(min(p) OVER w AS BIGINT), 0) AS cusum_pos,
        |    greatest(CAST(max(p) OVER w AS BIGINT), 0) - p AS cusum_neg
        |  FROM pre WINDOW w AS (PARTITION BY event_type ORDER BY day))
        |SELECT event_type, day, x AS v_fp, cusum_pos, cusum_neg,
        |  cusum_pos > sx AS alarm_up, cusum_neg > sx AS alarm_down
        |FROM cs ORDER BY event_type, day""".stripMargin,
    // deliberately UNSALTED: the oracle proving the salted two-phase
    // plan is semantics-preserving is the point of q174
    "q174_salted_agg" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CAST(floor("value" * 1e2) AS BIGINT)) AS DOUBLE) / 1e2
        |    AS sum_value,
        |  max("value") AS max_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q170_survivorship" -> s"""
      |SELECT user_id, count(*) AS n_events,
      |  min(CAST(ts AS TIMESTAMP)) AS first_seen,
      |  max(CAST(ts AS TIMESTAMP)) AS last_seen,
      |  count(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
      |  arg_max("value", $ArgKeySql)
      |    FILTER (WHERE event_type = 'purchase') AS last_purchase_value,
      |  arg_max("value", $ArgKeySql)
      |    FILTER (WHERE event_type = 'view') AS last_view_value,
      |  max(CAST(ts AS TIMESTAMP))
      |    FILTER (WHERE event_type = 'error') AS last_error_ts,
      |  bool_or(event_type = 'signup') AS has_signup
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q171_seasonal_anomaly" ->
      """WITH daily AS (
        |  SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
        |    isodow(date_trunc('day', CAST(ts AS TIMESTAMP))) AS dow,
        |    CAST(sum(CAST(floor("value" * 100) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2, 3),
        |st AS (
        |  SELECT event_type, day, dow, y,
        |    count(*) OVER w AS n,
        |    CAST(sum(y) OVER w AS BIGINT) AS s1,
        |    CAST(sum(y * y) OVER w AS BIGINT) AS s2
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type, dow))
        |SELECT event_type, day, dow, y,
        |  CAST(n * y - s1 AS DOUBLE) / sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE))
        |    AS z
        |FROM st
        |WHERE n * s2 - s1 * s1 > 0
        |  AND (n * y - s1) * (n * y - s1) > 4 * (n * s2 - s1 * s1)
        |ORDER BY event_type, day""".stripMargin,
    "q172_path_trigrams" ->
      """WITH seq AS (
        |  SELECT user_id, event_type AS t1,
        |    lead(event_type, 1) OVER w AS t2,
        |    lead(event_type, 2) OVER w AS t3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT t1, t2, t3, count(*) AS cnt
        |FROM seq WHERE t3 IS NOT NULL
        |GROUP BY t1, t2, t3
        |ORDER BY cnt DESC, t1, t2, t3 LIMIT 25""".stripMargin,
    "q168_trend_ols" ->
      """WITH daily AS (
        |  SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
        |    CAST(sum(CAST(floor("value" * 100) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |xy AS (
        |  SELECT event_type,
        |    CAST(date_diff('day', min(day) OVER (PARTITION BY event_type),
        |      day) AS BIGINT) AS x, y
        |  FROM daily),
        |st AS (
        |  SELECT event_type, count(*) AS n,
        |    sum(x) AS sx, sum(y) AS sy,
        |    sum(x * y) AS sxy,
        |    sum(x * x) AS sxx,
        |    sum(y * y) AS syy
        |  FROM xy GROUP BY event_type)
        |SELECT event_type, n,
        |  CAST(n * sxy - sx * sy AS DOUBLE)
        |    / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
        |  (CAST(sy AS DOUBLE)
        |    - CAST(n * sxy - sx * sy AS DOUBLE)
        |      / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    / CAST(n AS DOUBLE) AS intercept,
        |  (CAST(n * sxy - sx * sy AS DOUBLE)
        |    * CAST(n * sxy - sx * sy AS DOUBLE))
        |    / (CAST(n * sxx - sx * sx AS DOUBLE)
        |      * CAST(n * syy - sy * sy AS DOUBLE)) AS r2
        |FROM st ORDER BY event_type""".stripMargin,
    "q166_ohlc_bars" -> s"""
      |SELECT event_type,
      |  time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
      |    AS bar_start,
      |  arg_min("value", $ArgKeySql) AS open,
      |  max("value") AS high, min("value") AS low,
      |  arg_max("value", $ArgKeySql) AS close,
      |  count(*) AS volume
      |FROM events WHERE "value" IS NOT NULL
      |GROUP BY 1, 2 ORDER BY event_type, bar_start""".stripMargin,
    "q167_cdc_merge" -> s"""
      |WITH heads AS (
      |  SELECT user_id, count(*) AS n_ops,
      |    arg_max(struct_pack(t := event_type, v := "value",
      |                        lts := CAST(ts AS TIMESTAMP)), $ArgKeySql)
      |      AS l
      |  FROM events GROUP BY user_id)
      |SELECT user_id, n_ops, l.t AS last_type, l.v AS last_value,
      |  l.lts AS last_ts
      |FROM heads WHERE l.t <> 'error' ORDER BY user_id""".stripMargin,
    "q163_mv_maintenance" ->
      """WITH deltas AS (
        |  SELECT event_id % 4 AS b,
        |    CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
        |      AS hour_start,
        |    event_type, count(*) AS n_events,
        |    CAST(sum(CAST(floor("value" * 1e6) AS BIGINT)) AS BIGINT)
        |      AS sum_fp
        |  FROM events GROUP BY 1, 2, 3)
        |SELECT hour_start, event_type,
        |  CAST(sum(n_events) AS BIGINT) AS n_events,
        |  CAST(sum(sum_fp) AS BIGINT) AS sum_fp
        |FROM deltas GROUP BY 1, 2
        |ORDER BY hour_start, event_type""".stripMargin,
    "q160_robust_outliers" ->
      """WITH ev AS (SELECT event_type,
        |              CAST(floor(value * 100) AS BIGINT) AS fv
        |            FROM events WHERE value IS NOT NULL),
        |med AS (SELECT event_type, quantile_cont(fv, 0.5) AS med
        |        FROM ev GROUP BY event_type),
        |dev AS (SELECT ev.event_type, med,
        |          abs(CAST(fv AS DOUBLE) - med) AS dev
        |        FROM ev JOIN med USING (event_type)),
        |mad AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad
        |        FROM dev GROUP BY event_type)
        |SELECT dev.event_type, count(*) AS n,
        |  CAST(sum(CASE WHEN dev > 3e0 * 1.4826e0 * mad
        |             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  min(med) / 1e2 AS median_value,
        |  min(mad) / 1e2 AS mad_value
        |FROM dev JOIN mad USING (event_type)
        |GROUP BY dev.event_type ORDER BY event_type""".stripMargin,
    "q142_concurrent_sessions" ->
      """WITH iv AS (
        |  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |    min(CAST(ts AS TIMESTAMP)) AS st, max(CAST(ts AS TIMESTAMP)) AS en
        |  FROM events GROUP BY 1, 2),
        |b AS (
        |  SELECT day, st AS t, 1 AS delta FROM iv
        |  UNION ALL
        |  SELECT day, en AS t, -1 AS delta FROM iv),
        |r AS (
        |  SELECT day, sum(delta) OVER (
        |    PARTITION BY day ORDER BY t, delta DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
        |  FROM b)
        |SELECT day, CAST(count(*) / 2 AS BIGINT) AS n_sessions,
        |  CAST(max(running) AS BIGINT) AS max_concurrent
        |FROM r GROUP BY day ORDER BY day""".stripMargin,
    "q24_json_extract" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(regexp_extract(props, '"k": (\d+)', 1) AS INTEGER)) AS BIGINT) AS sum_k,
        |  min(CAST(regexp_extract(props, '"k": (\d+)', 1) AS INTEGER)) AS min_k,
        |  max(CAST(regexp_extract(props, '"k": (\d+)', 1) AS INTEGER)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q25_tumbling_window" ->
      """SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS hour_start,
        |  event_type, count(*) AS n_events,
        |  CAST(sum(CAST(floor("value" * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin,
    "q26_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER w IS NULL
        |      OR epoch_us(CAST(ts AS TIMESTAMP))
        |         - lag(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER w > 1800000000
        |      THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sessions AS (
        |  SELECT user_id,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged
        |), per_session AS (
        |  SELECT user_id, session_id, count(*) AS n_events
        |  FROM sessions GROUP BY user_id, session_id
        |)
        |SELECT user_id, count(*) AS n_sessions,
        |  max(n_events) AS max_session_events,
        |  CAST(sum(n_events) AS BIGINT) AS total_events
        |FROM per_session GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q27_asof_join" ->
      """SELECT e.event_id, e.user_id,
        |  CAST(c.ts AS TIMESTAMP) AS last_click_ts,
        |  (epoch_us(CAST(e.ts AS TIMESTAMP)) - epoch_us(CAST(c.ts AS TIMESTAMP))) / 1e6 AS gap_seconds
        |FROM (SELECT * FROM events WHERE event_type = 'error') e
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON e.user_id = c.user_id AND c.ts <= e.ts
        |ORDER BY e.event_id""".stripMargin,
    // identical semantics through the custom sorted-merge exec
    "q129_ewma" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |             CAST(floor(value * 1e2) AS BIGINT) AS fv
        |           FROM events WHERE value IS NOT NULL),
        |w AS (SELECT user_id,
        |        list(fv) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                       ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS arr,
        |        row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        |        count(*) OVER (PARTITION BY user_id) AS n_events
        |      FROM e)
        |SELECT user_id, n_events,
        |  CAST(list_sum(list_transform(arr, (x, p) ->
        |      x * (CAST(1 AS BIGINT) << (16 + p - 1 - len(arr))))) AS DOUBLE)
        |    / ((CAST(1 AS BIGINT) << (16 - len(arr)))
        |       * ((CAST(1 AS BIGINT) << len(arr)) - 1))
        |    / 1e2 AS ewma_value
        |FROM w WHERE rn = n_events ORDER BY user_id""".stripMargin,
    "q130_dau_mau" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |              CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d
        |            FROM events),
        |days AS (SELECT DISTINCT d AS day FROM ud),
        |dau AS (SELECT d AS day, count(*) AS dau FROM ud GROUP BY 1),
        |mau AS (SELECT days.day AS day, count(DISTINCT ud.user_id) AS mau
        |        FROM ud JOIN days ON ud.d BETWEEN days.day - 27 AND days.day
        |        GROUP BY 1)
        |SELECT dau.day AS day, dau.dau AS dau, mau.mau AS mau,
        |  CAST(dau.dau AS DOUBLE) / mau.mau AS stickiness
        |FROM dau JOIN mau ON dau.day = mau.day ORDER BY day""".stripMargin,
    "q126_funnel" ->
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |s AS (SELECT *, min(CASE WHEN event_type = 'signup' THEN ts END)
        |               OVER (PARTITION BY user_id) AS s0 FROM e),
        |v AS (SELECT *, min(CASE WHEN event_type = 'view' AND ts >= s0
        |                         AND ts <= s0 + INTERVAL 1 DAY THEN ts END)
        |               OVER (PARTITION BY user_id) AS v0 FROM s),
        |c AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts >= v0
        |                         AND ts <= s0 + INTERVAL 1 DAY THEN ts END)
        |               OVER (PARTITION BY user_id) AS c0 FROM v),
        |p AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= c0
        |                         AND ts <= s0 + INTERVAL 1 DAY THEN ts END)
        |               OVER (PARTITION BY user_id) AS p0 FROM c),
        |u AS (SELECT user_id,
        |        max(CASE WHEN p0 IS NOT NULL THEN 4 WHEN c0 IS NOT NULL THEN 3
        |                 WHEN v0 IS NOT NULL THEN 2 WHEN s0 IS NOT NULL THEN 1
        |                 ELSE 0 END) AS stage
        |      FROM p GROUP BY user_id)
        |SELECT stage, count(*) AS n_users FROM u GROUP BY stage ORDER BY stage""".stripMargin,
    "q127_retention" ->
      """WITH ev AS (SELECT user_id,
        |              CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS week
        |            FROM events),
        |cohort AS (SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY user_id),
        |m AS (SELECT c.cohort_week,
        |        date_diff('day', c.cohort_week, a.week) // 7 AS week_offset,
        |        count(DISTINCT a.user_id) AS n_active
        |      FROM (SELECT DISTINCT user_id, week FROM ev) a
        |      JOIN cohort c ON a.user_id = c.user_id
        |      GROUP BY 1, 2)
        |SELECT cohort_week, week_offset, n_active,
        |  CAST(n_active AS DOUBLE) /
        |    max(CASE WHEN week_offset = 0 THEN n_active END)
        |      OVER (PARTITION BY cohort_week) AS retention
        |FROM m ORDER BY cohort_week, week_offset""".stripMargin,
    "q128_transitions" ->
      """WITH l AS (SELECT user_id, event_type,
        |             lag(event_type) OVER (PARTITION BY user_id
        |               ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_type
        |           FROM events),
        |g AS (SELECT prev_type, event_type AS next_type, count(*) AS n
        |      FROM l WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, next_type, n,
        |  CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS p
        |FROM g ORDER BY prev_type, next_type""".stripMargin,
    "q125_outliers" ->
      """WITH f AS (SELECT event_type, CAST(floor(value * 1e2) AS BIGINT) AS fv
        |           FROM events WHERE value IS NOT NULL),
        |st AS (SELECT event_type, count(*) AS n,
        |         CAST(sum(fv) AS BIGINT) AS sx,
        |         CAST(sum(fv * fv) AS BIGINT) AS sxx
        |       FROM f GROUP BY event_type),
        |m AS (SELECT event_type, n,
        |        CAST(sx AS DOUBLE) / n AS mean_fp,
        |        sqrt(CAST(sxx AS DOUBLE) / n -
        |          (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)) AS std_fp
        |      FROM st)
        |SELECT f.event_type, any_value(m.n) AS n,
        |  count(*) FILTER (WHERE abs(CAST(f.fv AS DOUBLE) - m.mean_fp)
        |                     > 3e0 * m.std_fp) AS n_outliers,
        |  any_value(m.mean_fp) / 1e2 AS mean_value,
        |  any_value(m.std_fp) / 1e2 AS std_value
        |FROM f JOIN m ON f.event_type = m.event_type
        |GROUP BY f.event_type ORDER BY f.event_type""".stripMargin,
    "q119_asof_forward" ->
      """SELECT c.event_id, c.user_id,
        |  CAST(n.ts AS TIMESTAMP) AS next_error_ts,
        |  (epoch_us(CAST(n.ts AS TIMESTAMP)) - epoch_us(CAST(c.ts AS TIMESTAMP)))
        |    / 1e6 AS gap_seconds
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |LEFT JOIN LATERAL (
        |  SELECT e.ts FROM events e
        |  WHERE e.event_type = 'error' AND e.user_id = c.user_id
        |    AND e.ts >= c.ts AND e.ts <= c.ts + INTERVAL 10 MINUTE
        |  ORDER BY e.ts LIMIT 1) n ON TRUE
        |ORDER BY c.event_id""".stripMargin,
    "q147_autocorr" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |    sum(CAST(floor("value" * 1e2) AS BIGINT)) AS v
        |  FROM events GROUP BY 1, 2),
        |lagged AS (
        |  SELECT event_type, v,
        |    lag(v, 1) OVER w AS l1, lag(v, 7) OVER w AS l7
        |  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)),
        |c1 AS (
        |  SELECT event_type, 1 AS lag_k, n AS n_pairs,
        |    CAST(n*sxy - sx*sy AS DOUBLE)
        |      / sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
        |      / sqrt(CAST(n*syy - sy*sy AS DOUBLE)) AS autocorr
        |  FROM (SELECT event_type, count(*) AS n, sum(v) AS sx,
        |          sum(l1) AS sy, sum(v*l1) AS sxy, sum(v*v) AS sxx,
        |          sum(l1*l1) AS syy
        |        FROM lagged WHERE l1 IS NOT NULL GROUP BY event_type)),
        |c7 AS (
        |  SELECT event_type, 7 AS lag_k, n AS n_pairs,
        |    CAST(n*sxy - sx*sy AS DOUBLE)
        |      / sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
        |      / sqrt(CAST(n*syy - sy*sy AS DOUBLE)) AS autocorr
        |  FROM (SELECT event_type, count(*) AS n, sum(v) AS sx,
        |          sum(l7) AS sy, sum(v*l7) AS sxy, sum(v*v) AS sxx,
        |          sum(l7*l7) AS syy
        |        FROM lagged WHERE l7 IS NOT NULL GROUP BY event_type))
        |SELECT * FROM c1 UNION ALL SELECT * FROM c7
        |ORDER BY event_type, lag_k""".stripMargin,
    "q144_asof_nearest" ->
      """SELECT e.event_id, e.user_id,
        |  CAST(n.ts AS TIMESTAMP) AS nearest_click_ts,
        |  (epoch_us(CAST(n.ts AS TIMESTAMP)) - epoch_us(CAST(e.ts AS TIMESTAMP)))
        |    / 1e6 AS gap_seconds
        |FROM (SELECT * FROM events WHERE event_type = 'error') e,
        |LATERAL (
        |  SELECT c.ts FROM events c
        |  WHERE c.event_type = 'click' AND c.user_id = e.user_id
        |  ORDER BY abs(epoch_us(CAST(c.ts AS TIMESTAMP))
        |      - epoch_us(CAST(e.ts AS TIMESTAMP))),
        |    CASE WHEN c.ts <= e.ts THEN 0 ELSE 1 END
        |  LIMIT 1) n
        |ORDER BY e.event_id""".stripMargin,
    "q106_asof_exec" ->
      """SELECT e.event_id, e.user_id,
        |  CAST(c.ts AS TIMESTAMP) AS last_click_ts,
        |  (epoch_us(CAST(e.ts AS TIMESTAMP)) - epoch_us(CAST(c.ts AS TIMESTAMP))) / 1e6 AS gap_seconds
        |FROM (SELECT * FROM events WHERE event_type = 'error') e
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON e.user_id = c.user_id AND c.ts <= e.ts
        |ORDER BY e.event_id""".stripMargin,
    "q49_sliding_window" ->
      """SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
        |    - to_minutes(k.k * 15) AS win_start,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(floor("value" * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS sum_value
        |FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) k(k)
        |GROUP BY 1 ORDER BY win_start""".stripMargin,
    // n_keys / key_list are DERIVED from the props text (same key-order
    // regex on both engines: JSON object keys in document order), not
    // hard-coded to the current single-key testdata shape — richer
    // future props rows regroup instead of silently diverging.
    // key_list coalesces to '': DuckDB's array_to_string of an EMPTY
    // list is NULL where Spark's array_join is '' (fuzz divergence #9,
    // FUZZ_SCALARS.md) — an empty-props row would silently regroup
    "q46_map_fns" ->
      """SELECT event_type,
        |  CAST(len(regexp_extract_all(props, '"([^"]+)"[ \t\n\x0B\f\r]*:', 1)) AS INTEGER) AS n_keys,
        |  coalesce(array_to_string(regexp_extract_all(props, '"([^"]+)"[ \t\n\x0B\f\r]*:', 1), ','), '') AS key_list,
        |  count(*) AS n,
        |  CAST(sum(CAST(regexp_extract(props, '"k": (\d+)', 1) AS INTEGER)) AS BIGINT) AS sum_k
        |FROM events GROUP BY 1, 2, 3 ORDER BY event_type, n_keys, key_list""".stripMargin,
  )
}
