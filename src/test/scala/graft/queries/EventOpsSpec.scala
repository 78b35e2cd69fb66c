package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic unit tests for the event-analytics operators on synthetic
  * frames (value-level correctness against real data is covered by the
  * DuckDB oracle gate; these pin the ORDERING semantics the oracle's
  * aggregated output cannot distinguish). */
class EventOpsSpec extends SparkTestBase {

  private def events(rows: Seq[(Long, Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("event_id", "user_id", "event_type", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s")).cast("timestamp_ntz"))
      .drop("ts_s")
  }

  test("funnel stages require IN-ORDER progression within the window") {
    // u1: full ordered funnel inside one day          -> stage 4
    // u2: purchase BEFORE click (out of order)        -> stage 3, not 4
    // u3: view only after the 1-day window            -> stage 1
    // u4: no signup at all                            -> stage 0
    val df = events(Seq(
      (1L, 1L, "signup", "2024-01-01 00:00:00"),
      (2L, 1L, "view", "2024-01-01 01:00:00"),
      (3L, 1L, "click", "2024-01-01 02:00:00"),
      (4L, 1L, "purchase", "2024-01-01 03:00:00"),
      (5L, 2L, "signup", "2024-01-01 00:00:00"),
      (6L, 2L, "view", "2024-01-01 01:00:00"),
      (7L, 2L, "purchase", "2024-01-01 02:00:00"),
      (8L, 2L, "click", "2024-01-01 03:00:00"),
      (9L, 3L, "signup", "2024-01-01 00:00:00"),
      (10L, 3L, "view", "2024-01-02 00:00:01"),
      (11L, 4L, "view", "2024-01-01 00:00:00")))
    val got = EventOps.funnelStages(df)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got === Map(0 -> 1L, 1 -> 1L, 3 -> 1L, 4 -> 1L))
    // u2's purchase at 02:00 precedes its first post-view click
    // (03:00), so stage 4 must not count — but the click itself is a
    // valid stage-3 progression.
  }

  test("funnel purchase after a valid click counts even at equal ts") {
    val df = events(Seq(
      (1L, 1L, "signup", "2024-01-01 00:00:00"),
      (2L, 1L, "view", "2024-01-01 01:00:00"),
      (3L, 1L, "click", "2024-01-01 02:00:00"),
      (4L, 1L, "purchase", "2024-01-01 02:00:00"))) // ts >= c0 inclusive
    val got = EventOps.funnelStages(df)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got === Map(4 -> 1L))
  }

  test("ewma halving weights are exact on a hand-computed frame") {
    import spark.implicits._
    val df = Seq(
      (1L, 1L, "2024-01-01 00:00:00", 1.00),
      (2L, 1L, "2024-01-01 00:01:00", 2.00))
      .toDF("event_id", "user_id", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s")).cast("timestamp_ntz"))
      .drop("ts_s")
    val row = EventOps.ewmaLatest(df).collect().head
    // L=2: weights 2^14, 2^15; (100*16384 + 200*32768) / (16384*3) / 100
    assert(row.getLong(1) === 2L)
    assert(row.getDouble(2) === 8192000.0 / 49152.0 / 100.0)
  }

  test("ewma frame is capped at 16 events (older values fall out)") {
    import spark.implicits._
    // 17 events: first value 1000.0 must NOT contribute; the rest are 2.0
    val rows = (1 to 17).map(i =>
      (i.toLong, 1L, f"2024-01-01 00:${i}%02d:00", if (i == 1) 1000.0 else 2.0))
    val df = rows.toDF("event_id", "user_id", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s")).cast("timestamp_ntz"))
      .drop("ts_s")
    val row = EventOps.ewmaLatest(df).collect().head
    assert(row.getDouble(2) === 2.0) // all 16 in-frame values are 2.0
  }

  test("q142 sweep line: concurrency bounded by sessions, exact on a fixture") {
    val rows = EventOps.q142ConcurrentSessions(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_sessions")
      val m = r.getAs[Long]("max_concurrent")
      assert(m >= 1 && m <= n, s"day ${r.get(0)}: max $m not in [1, $n]")
    }
    // fixture: 3 users on one day — A [00:00,02:00], B [01:00,03:00],
    // C [02:30,02:40] → peak 2 (A∩B at 01:00-02:00, B∩C at 02:30-02:40)
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, to_timestamp}
    val fx = Seq(
      (1L, 1L, "2024-01-01 00:00:00"), (2L, 1L, "2024-01-01 02:00:00"),
      (3L, 2L, "2024-01-01 01:00:00"), (4L, 2L, "2024-01-01 03:00:00"),
      (5L, 3L, "2024-01-01 02:30:00"), (6L, 3L, "2024-01-01 02:40:00"))
      .toDF("event_id", "user_id", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    fx.createOrReplaceTempView("q142_fixture")
    val iv = fx.groupBy(col("user_id"),
      org.apache.spark.sql.functions.date_trunc("day", col("ts")).as("day"))
      .agg(org.apache.spark.sql.functions.min("ts").as("st"),
        org.apache.spark.sql.functions.max("ts").as("en"))
    val b = iv.select(col("day"), col("st").as("t"),
      org.apache.spark.sql.functions.lit(1).as("delta"))
      .unionAll(iv.select(col("day"), col("en").as("t"),
        org.apache.spark.sql.functions.lit(-1).as("delta")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("day")
      .orderBy(col("t"), col("delta").desc)
      .rowsBetween(Long.MinValue, 0)
    val peak = b.select(org.apache.spark.sql.functions.sum(col("delta"))
      .over(w).as("r")).agg(org.apache.spark.sql.functions.max("r"))
      .collect().head.getLong(0)
    assert(peak == 2L, s"fixture peak concurrency $peak != 2")
  }

  test("q147 autocorrelation agrees with the built-in corr") {
    import org.apache.spark.sql.functions._
    val ours = EventOps.q147Autocorr(spark, Sf).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(3)).toMap
    val daily = graft.Tables.events(spark, Sf)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("day")
    val lagged = daily
      .withColumn("l1", lag(col("v"), 1).over(w))
      .withColumn("l7", lag(col("v"), 7).over(w))
    Seq(("l1", 1), ("l7", 7)).foreach { case (c, k) =>
      val builtin = lagged.filter(col(c).isNotNull)
        .groupBy("event_type").agg(corr(col("v"), col(c)).as("r"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      builtin.foreach { case (t, r) =>
        assert(math.abs(ours((t, k)) - r) < 1e-9,
          s"$t lag $k: ${ours((t, k))} vs builtin $r")
      }
    }
  }

  test("q144 nearest as-of is never farther than the backward match") {
    // q27 (backward) is oracle-verified; nearest must dominate it:
    // same join key, |nearest gap| <= backward gap for every error
    val nearest = EventOps.q144AsofNearest(spark, Sf).collect()
      .map(r => r.getAs[Long]("event_id") ->
        math.abs(r.getAs[Double]("gap_seconds"))).toMap
    val backward = EventOps.q27AsofJoin(spark, Sf).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("gap_seconds"))
    assert(backward.nonEmpty)
    backward.foreach { case (id, gb) =>
      val gn = nearest(id) // every backward-matched error has a nearest
      assert(gn <= gb + 1e-9, s"event $id: nearest $gn > backward $gb")
    }
  }

  test("q142 touching intervals count as concurrent (tie rule)") {
    // A ends exactly when B starts: +1 sorts before -1 at the tie, so
    // the instant 01:00 sees both — peak 2, matching the oracle's rule
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val fx = Seq(
      (1L, 1L, "2024-01-01 00:00:00"), (2L, 1L, "2024-01-01 01:00:00"),
      (3L, 2L, "2024-01-01 01:00:00"), (4L, 2L, "2024-01-01 02:00:00"))
      .toDF("event_id", "user_id", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val iv = fx.groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(min("ts").as("st"), max("ts").as("en"))
    val b = iv.select(col("day"), col("st").as("t"), lit(1).as("delta"))
      .unionAll(iv.select(col("day"), col("en").as("t"), lit(-1).as("delta")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("day")
      .orderBy(col("t"), col("delta").desc).rowsBetween(Long.MinValue, 0)
    val peak = b.select(sum(col("delta")).over(w).as("r"))
      .agg(max("r")).collect().head.getLong(0)
    assert(peak == 2L, s"touching intervals must overlap at the boundary: $peak")
  }

  test("q160 robust outliers match a brute-force MAD replica") {
    // interpolated percentile(v, 0.5), the engines' shared definition
    def median(v: Seq[Double]): Double = {
      val s = v.sorted
      val idx = 0.5 * (s.length - 1)
      val l = idx.toInt
      s(l) + (idx - l) * (s(math.min(l + 1, s.length - 1)) - s(l))
    }
    val data = graft.Tables.events(spark, Sf)
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        floor(col("value") * 100).cast("long").as("fv"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val rows = EventOps.q160RobustOutliers(spark, Sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n")).sum == data.length)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val fv = data.collect { case (et, v) if et == t => v.toDouble }.toSeq
      val med = median(fv)
      val dev = fv.map(v => math.abs(v - med))
      val mad = median(dev)
      assert(r.getAs[Long]("n") == fv.length)
      assert(r.getAs[Double]("median_value") == med / 1e2)
      assert(r.getAs[Double]("mad_value") == mad / 1e2)
      assert(r.getAs[Long]("n_outliers") ==
        dev.count(_ > 3.0 * 1.4826 * mad))
    }
  }

  test("q163 delta-log fold equals the one-shot aggregate (additivity)") {
    // the batch twin splits events into 4 synthetic micro-batches,
    // runs AggMaintenance's own partial per batch and fold over the
    // deltas — additivity of count and fixed-point sum means the
    // result must be EXACTLY the unsplit aggregate
    val got = EventOps.q163MvMaintenance(spark, Sf).collect()
      .map(r => (r.get(0).toString, r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val oneShot = graft.streaming.AggMaintenance.partial(
      graft.Tables.events(spark, Sf)).collect()
      .map(r => (r.get(0).toString, r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got.nonEmpty && got == oneShot)
  }

  test("q168 OLS trend agrees with Spark's built-in regr_* aggregates") {
    val daily = graft.Tables.events(spark, Sf)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("y"))
    val x = datediff(col("day"), min(col("day")).over(
      org.apache.spark.sql.expressions.Window.partitionBy("event_type")))
    val ref = daily.select(col("event_type"), x.cast("double").as("x"),
        col("y").cast("double").as("y"))
      .groupBy("event_type")
      .agg(expr("regr_slope(y, x)").as("s"),
        expr("regr_intercept(y, x)").as("i"),
        expr("regr_r2(y, x)").as("r"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val rows = EventOps.q168TrendOls(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (s, i, r2) = ref(r.getString(0))
      assert(math.abs(r.getAs[Double]("slope") - s) <= 1e-9 * math.abs(s))
      assert(math.abs(r.getAs[Double]("intercept") - i) <=
        1e-9 * math.abs(i))
      assert(math.abs(r.getAs[Double]("r2") - r2) <= 1e-9)
      assert(r2 >= 0.0 && r2 <= 1.0)
    }
  }

  test("q170 survivorship profile matches a brute-force replica") {
    // ts is timestamp_ntz → LocalDateTime on collect; compare as epoch
    def ep(t: java.time.LocalDateTime): Long =
      t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000
    val events = graft.Tables.events(spark, Sf)
      .select("user_id", "event_id", "event_type", "ts", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        ep(r.getAs[java.time.LocalDateTime](3)), r.getDouble(4)))
    val want = events.groupBy(_._1).map { case (uid, rows) =>
      def latest(t: String) = {
        val m = rows.filter(_._3 == t)
        if (m.isEmpty) None
        else Some(m.maxBy(r => (r._4, r._2))._5)
      }
      uid -> (rows.length.toLong,
        rows.count(_._3 == "purchase").toLong,
        latest("purchase"), latest("view"),
        rows.exists(_._3 == "signup"),
        rows.exists(_._3 == "error"))
    }
    val got = EventOps.q170Survivorship(spark, Sf).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val uid = r.getAs[Long]("user_id")
      val (n, nP, lastP, lastV, signup, hasErr) = want(uid)
      assert(r.getAs[Long]("n_events") == n)
      assert(r.getAs[Long]("n_purchases") == nP)
      assert(Option(r.getAs[java.lang.Double]("last_purchase_value"))
        .map(_.doubleValue) == lastP)
      assert(Option(r.getAs[java.lang.Double]("last_view_value"))
        .map(_.doubleValue) == lastV)
      assert(r.getAs[Boolean]("has_signup") == signup)
      assert((r.getAs[java.time.LocalDateTime]("last_error_ts") != null)
        == hasErr)
    }
  }

  test("q171 seasonal anomalies: every flagged day clears |z|>2 within its dow group") {
    val daily = graft.Tables.events(spark, Sf)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("y"))
      .withColumn("dow", expr("weekday(day) + 1").cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getAs[java.time.LocalDateTime](1),
        r.getLong(2), r.getLong(3)))
    val flagged = EventOps.q171SeasonalAnomaly(spark, Sf).collect()
    // replica: integer predicate over the same daily frame
    val want = daily.groupBy(r => (r._1, r._4)).toSeq.flatMap { case (_, g) =>
      val n = g.length.toLong
      val s1 = g.map(_._3).sum
      val s2 = g.map(v => v._3 * v._3).sum
      g.filter { r =>
        val num = n * r._3 - s1
        val den = n * s2 - s1 * s1
        den > 0 && num * num > 4 * den
      }
    }.map(r => (r._1, r._2)).toSet
    assert(flagged.map(r => (r.getAs[String]("event_type"),
      r.getAs[java.time.LocalDateTime]("day"))).toSet == want)
    flagged.foreach(r => assert(math.abs(r.getAs[Double]("z")) > 2.0))
  }

  test("q172 path trigrams match a brute-force sequence count") {
    val got = EventOps.q172PathTrigrams(spark, Sf).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        r.getAs[Long]("cnt")))
    val byUser = graft.Tables.events(spark, Sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0),
        r.getAs[java.time.LocalDateTime](1)
          .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
          + r.getAs[java.time.LocalDateTime](1).getNano / 1000,
        r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    val counts = new scala.collection.mutable.HashMap[(String, String, String), Long]()
      .withDefaultValue(0L)
    byUser.values.foreach { g =>
      val seq = g.sortBy(r => (r._2, r._3)).map(_._4)
      seq.sliding(3).filter(_.length == 3).foreach(t =>
        counts((t(0), t(1), t(2))) += 1)
    }
    val want = counts.toSeq.sortBy { case ((a, b, c), n) => (-n, a, b, c) }
      .take(25)
    assert(got.toSeq == want)
  }

  test("q174 salted two-phase agg equals the direct aggregate, two exchanges") {
    val got = EventOps.q174SaltedAgg(spark, Sf).collect().map(_.toString)
    val want = graft.Tables.events(spark, Sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        (sum(floor(col("value") * 100).cast("long")).cast("double") / 100)
          .as("sum_value"),
        max(col("value")).as("max_value"))
      .orderBy("event_type").collect().map(_.toString)
    assert(got.sameElements(want))
    // plan shape: the salt stage adds a second aggregate exchange
    val plan = EventOps.q174SaltedAgg(spark, Sf)
      .queryExecution.executedPlan.toString
    assert("hashpartitioning".r.findAllIn(plan).size >= 2, plan.take(1500))
    // the salt expression survives into the first grouping stage
    // (inlined by the optimizer as a grouping expression)
    assert(plan.contains("pmod(event_id"), "salt key missing from the plan")
  }

  test("q166 OHLC bars: low <= open,close <= high; volume accounts for every row") {
    val rows = EventOps.q166OhlcBars(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (o, h, l, c) = (r.getAs[Double]("open"), r.getAs[Double]("high"),
        r.getAs[Double]("low"), r.getAs[Double]("close"))
      assert(l <= o && o <= h && l <= c && c <= h, s"OHLC violated: $r")
      // bar boundaries sit on the 15-minute grid (ts is NTZ ->
      // LocalDateTime on collect)
      val b = r.getAs[java.time.LocalDateTime]("bar_start")
      assert(b.getMinute % 15 == 0 && b.getSecond == 0 && b.getNano == 0)
    }
    val n = graft.Tables.events(spark, Sf)
      .filter(col("value").isNotNull).count()
    assert(rows.map(_.getAs[Long]("volume")).sum == n)
  }

  test("q167 CDC merge: tombstoned keys absent, heads are the true latest op") {
    val rows = EventOps.q167CdcMerge(spark, Sf).collect()
    assert(rows.nonEmpty)
    // brute-force replica: latest op per user by (ts, event_id)
    val latest = graft.Tables.events(spark, Sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .groupBy(_.getAs[Long]("user_id"))
      .view.mapValues(_.maxBy { r =>
        val t = r.getAs[java.time.LocalDateTime]("ts")
        (t.toEpochSecond(java.time.ZoneOffset.UTC), t.getNano,
          r.getAs[Long]("event_id"))
      }).toMap
    val emitted = rows.map(_.getAs[Long]("user_id")).toSet
    latest.foreach { case (u, r) =>
      val isTomb = r.getAs[String]("event_type") == "error"
      assert(emitted.contains(u) != isTomb,
        s"user $u tombstone=$isTomb emitted=${emitted.contains(u)}")
    }
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      assert(r.getAs[String]("last_type") ==
        latest(u).getAs[String]("event_type"))
    }
  }

  test("q186 CUSUM window form equals the sequential recurrence") {
    val rows = EventOps.q186Cusum(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      val xs = rs.map(_.getAs[Long]("v_fp"))
      val n = xs.length.toLong
      val sx = xs.sum
      // the textbook recurrence s+_i = max(0, s+_{i-1} + d_i), replayed
      // sequentially — rows come back ordered by (event_type, day)
      var sp = 0L; var sn = 0L
      rs.zip(xs).foreach { case (r, x) =>
        val d = n * x - sx
        sp = math.max(0L, sp + d)
        sn = math.max(0L, sn - d)
        assert(r.getAs[Long]("cusum_pos") == sp)
        assert(r.getAs[Long]("cusum_neg") == sn)
        assert(r.getAs[Boolean]("alarm_up") == (sp > sx))
        assert(r.getAs[Boolean]("alarm_down") == (sn > sx))
      }
      // both one-sided statistics are nonnegative by construction
      assert(rs.forall(r => r.getAs[Long]("cusum_pos") >= 0 &&
        r.getAs[Long]("cusum_neg") >= 0))
    }
  }

  test("q187 CUPED matches a driver-side replica and reduces variance") {
    val out = EventOps.q187Cuped(spark, Sf).collect()
    assert(out.length == 2 && out.map(_.getAs[Long]("arm")).toSeq == Seq(0L, 1L))
    // replica: per-user fixed-point pre/post sums from raw events
    val cut = java.time.LocalDateTime.parse("2024-01-16T00:00:00")
    val ev = graft.Tables.events(spark, Sf)
      .select("user_id", "ts", "value").collect()
    val pu = ev.groupBy(_.getAs[Long]("user_id")).map { case (u, rs) =>
      def tsOf(r: org.apache.spark.sql.Row) =
        r.getAs[java.time.LocalDateTime]("ts")
      val x = rs.filter(tsOf(_).isBefore(cut))
        .map(r => math.floor(r.getAs[Double]("value") * 100).toLong).sum
      val y = rs.filter(!tsOf(_).isBefore(cut))
        .map(r => math.floor(r.getAs[Double]("value") * 100).toLong).sum
      (u, x, y)
    }.toSeq
    val n = pu.size.toLong
    val sx = pu.map(_._2).sum; val sy = pu.map(_._3).sum
    val sxx = pu.map(t => t._2 * t._2).sum
    val sxy = pu.map(t => t._2 * t._3).sum
    val theta = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    val xbar = sx.toDouble / n.toDouble
    out.foreach { r =>
      val arm = r.getAs[Long]("arm")
      val mine = pu.filter(_._1 % 2 == arm)
      assert(r.getAs[Long]("n_users") == mine.size.toLong)
      val meanY = mine.map(_._3).sum.toDouble / mine.size
      assert(math.abs(r.getAs[Double]("mean_y") - meanY / 100.0) < 1e-9)
      val meanX = mine.map(_._2).sum.toDouble / mine.size
      val adj = (meanY - theta * (meanX - xbar)) / 100.0
      assert(math.abs(r.getAs[Double]("mean_y_cuped") - adj) < 1e-9)
      assert(math.abs(r.getAs[Double]("theta") - theta) < 1e-9)
      val rho2 = r.getAs[Double]("rho2")
      assert(rho2 >= 0.0 && rho2 <= 1.0)
    }
    // CUPED's point: adjusted per-user metric has no more variance
    val yAdj = pu.map(t => t._3.toDouble - theta * (t._2.toDouble - xbar))
    def varOf(v: Seq[Double]) = {
      val m = v.sum / v.size; v.map(a => (a - m) * (a - m)).sum / v.size
    }
    assert(varOf(yAdj) <= varOf(pu.map(_._3.toDouble)) + 1e-9)
  }

  test("q189 max drawdown matches a sequential replay of the equity curve") {
    val out = EventOps.q189Drawdown(spark, Sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("max_drawdown_fp"),
          r.getAs[java.sql.Timestamp]("trough_day"))).toMap
    assert(out.nonEmpty)
    // replay: daily totals in day order, running peak, max gap
    val daily = graft.Tables.events(spark, Sf)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("v"))
      .orderBy("event_type", "day").collect()
    daily.groupBy(_.getAs[String]("event_type")).foreach { case (t, rs) =>
      var cum = 0L; var peak = 0L; var mdd = -1L
      var trough: java.sql.Timestamp = null
      rs.foreach { r =>
        cum += r.getAs[Long]("v")
        peak = math.max(peak, cum)
        val dd = peak - cum
        if (dd > mdd) { mdd = dd; trough = r.getAs[java.sql.Timestamp]("day") }
      }
      assert(out(t) == ((mdd, trough)), s"type $t")
    }
  }

  test("q191 last-touch attribution matches a sequential per-user walk") {
    val got = EventOps.q191Attribution(spark, Sf).collect()
      .map(r => r.getAs[String]("touch_type") ->
        (r.getAs[Long]("n_conversions"), r.getAs[Long]("revenue_fp"))).toMap
    val ev = graft.Tables.events(spark, Sf)
      .select("user_id", "ts", "event_id", "event_type", "value").collect()
    val credit = scala.collection.mutable.Map[String, (Long, Long)]()
    ev.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      var touch: String = null
      rs.sortBy(r => (r.getAs[java.time.LocalDateTime]("ts"),
        r.getAs[Long]("event_id")))(
        Ordering.Tuple2(Ordering.ordered, Ordering.Long)).foreach { r =>
        val t = r.getAs[String]("event_type")
        if (t == "purchase") {
          val key = Option(touch).getOrElse("none")
          val (n, v) = credit.getOrElse(key, (0L, 0L))
          credit(key) = (n + 1,
            v + math.floor(r.getAs[Double]("value") * 100).toLong)
        } else touch = t
      }
    }
    assert(got == credit.toMap)
  }

  test("q193 Kaplan-Meier: survival is monotone non-increasing from 1 and matches d/n recurrence") {
    val rows = EventOps.q193KaplanMeier(spark, Sf).collect()
    assert(rows.nonEmpty)
    var prevSurv = 1.0
    var prevRisk = Long.MaxValue
    rows.foreach { r =>
      val nRisk = r.getAs[Long]("n_risk")
      val d = r.getAs[Long]("n_deaths")
      val surv = math.exp(r.getAs[Double]("log_surv"))
      assert(d >= 1 && d <= nRisk)
      assert(nRisk <= prevRisk)
      assert(surv <= prevSurv + 1e-12, s"survival increased at $r")
      assert(surv >= 0.0 && surv <= 1.0)
      prevSurv = surv; prevRisk = nRisk
    }
    // recompute the product-limit estimate independently (double product
    // vs the fixed-point-log path: agreement to float tolerance)
    var s = 1.0
    rows.foreach { r =>
      val n = r.getAs[Long]("n_risk").toDouble
      val d = r.getAs[Long]("n_deaths").toDouble
      s *= (n - d) / n
      assert(math.abs(math.exp(r.getAs[Double]("log_surv")) - s) < 1e-6,
        s"KM product mismatch at ${r.getAs[Long]("duration_min")}")
    }
  }

  test("q194 SPRT: decisions are consistent with the cumulative LLR path") {
    val rows = EventOps.q194Sprt(spark, Sf).collect()
    assert(rows.map(_.getAs[Long]("arm")).toSet == Set(0L, 1L))
    rows.foreach { r =>
      val dec = r.getAs[String]("decision")
      assert(Set("reject_h0", "accept_h0", "continue")(dec))
      if (dec == "continue") {
        assert(r.isNullAt(r.fieldIndex("decision_day")))
        assert(r.isNullAt(r.fieldIndex("cum_at_decision")))
      } else {
        val cum = r.getAs[Long]("cum_at_decision")
        assert(if (dec == "reject_h0") cum >= 2944438979L
               else cum <= -2944438979L)
      }
      // trials dominate successes
      assert(r.getAs[Long]("total_x") <= r.getAs[Long]("total_n"))
    }
  }

  test("q208 TWAP: weights cover first event to day end, bounds hold") {
    val rows = EventOps.q208Twap(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dt = r.getAs[Long]("dt_total")
      assert(dt > 0 && dt <= 86400000000L)
      val twap = r.getAs[Double]("twap")
      assert(twap == r.getAs[Long]("twap_num").toDouble / (dt.toDouble * 1e2))
    }
    // single-event day in a tiny replica: TWAP equals that value and
    // the weight runs to the day boundary
    import spark.implicits._
    val one = Seq((1L, java.time.LocalDateTime.parse("2024-01-01T06:00:00"),
      1L, "x", 2.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val tmp = java.nio.file.Files.createTempDirectory("graft_twap").toString
    graft.Tables.names.foreach { t =>
      val df = if (t == "events") one else graft.Tables(spark, Sf, t)
      df.write.mode("overwrite").parquet(s"$tmp/$t.parquet")
    }
    val o = EventOps.q208Twap(spark, tmp).collect()
    assert(o.length == 1)
    assert(o.head.getAs[Long]("dt_total") == 18L * 3600 * 1000000)
    assert(math.abs(o.head.getAs[Double]("twap") - 2.5) < 1e-12)
  }

  test("q203 Markov eval: argmax prediction replayed sequentially, leakage-free") {
    val rows = EventOps.q203MarkovEval(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nt, nc) = (r.getAs[Long]("n_test"), r.getAs[Long]("n_correct"))
      assert(nc >= 0 && nc <= nt)
      assert(r.getAs[Long]("acc_ppm") == nc * 1000000L / nt)
    }
    // replay: per-user sorted walk, train on pairs before day 16
    val cut = java.time.LocalDateTime.parse("2024-01-16T00:00:00")
    val ev = graft.Tables.events(spark, Sf)
      .select("user_id", "event_id", "ts", "event_type").collect()
    val pairs = ev.groupBy(_.getAs[Long]("user_id")).toSeq.flatMap {
      case (_, rs) =>
        rs.sortBy(r => (r.getAs[java.time.LocalDateTime]("ts"),
          r.getAs[Long]("event_id")))(
          Ordering.Tuple2(Ordering.ordered, Ordering.Long))
          .sliding(2).collect { case Array(a, b) =>
            (a.getAs[String]("event_type"), b.getAs[String]("event_type"),
              b.getAs[java.time.LocalDateTime]("ts").isBefore(cut))
          }
    }
    val model = pairs.filter(_._3).groupBy(_._1).map { case (p, ps) =>
      p -> ps.groupBy(_._2).toSeq
        .sortBy { case (t, xs) => (-xs.size, t) }.head._1
    }
    val want = pairs.filterNot(_._3).groupBy(_._1).map { case (p, ps) =>
      p -> (ps.size.toLong,
        ps.count(x => model.get(p).contains(x._2)).toLong)
    }
    val got = rows.map(r => r.getAs[String]("prev_type") ->
      (r.getAs[Long]("n_test"), r.getAs[Long]("n_correct"))).toMap
    assert(got == want)
  }

  test("q205 binseg: chosen split maximizes between-segment SS in a replay") {
    val rows = EventOps.q205BinsegChangepoint(spark, Sf).collect()
    assert(rows.nonEmpty)
    val daily = graft.Tables.events(spark, Sf)
      .groupBy(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.date_trunc("day",
          org.apache.spark.sql.functions.col("ts")).as("day"))
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.floor(
          org.apache.spark.sql.functions.col("value") * 100).cast("long"))
        .as("v"))
      .collect()
      .groupBy(_.getAs[String]("event_type"))
    rows.foreach { r =>
      val series = daily(r.getAs[String]("event_type"))
        .sortBy(_.getAs[java.sql.Timestamp]("day").getTime)
        .map(_.getAs[Long]("v"))
      val s = series.sum.toDouble
      val n = series.length.toDouble
      val gains = (1 until series.length).map { k =>
        val sl = series.take(k).sum.toDouble
        sl * sl / k + (s - sl) * (s - sl) / (n - k) - s * s / n
      }
      assert(math.abs(r.getAs[Double]("gain") - gains.max) < 1e-6,
        s"${r.getAs[String]("event_type")}: ${r.getAs[Double]("gain")} vs ${gains.max}")
    }
  }

  test("q190 conversion-lag quartiles are contiguous and account for all converters") {
    val rows = EventOps.q190ConversionLag(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[java.sql.Date]("cohort_week")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("quartile"))
      // quartile boundaries are monotone: q_i.max <= q_{i+1}.min
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("max_lag_s") <= b.getAs[Long]("min_lag_s"))
        case _ =>
      }
      // ntile balance: cell sizes differ by at most 1 within a cohort
      val ns = sorted.map(_.getAs[Long]("n_users"))
      assert(ns.max - ns.min <= 1)
      // lags are sane: purchase at/after signup
      assert(sorted.forall(_.getAs[Long]("min_lag_s") >= 0))
    }
  }
}
