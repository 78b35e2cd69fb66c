package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Subquery decorrelation plan shapes + window-frame and aggregate
  * semantics for the SqlOps surface on sf0.001. */
class SqlOpsSpec extends SparkTestBase {

  test("q89 correlated scalar subquery decorrelates (no cartesian, has aggregate+join)") {
    val df = SqlOps.q89CorrelatedScalar(spark, Sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(plan.contains("HashAggregate"), plan.take(2000))
    assert(df.count() > 0)
  }

  test("q90 EXISTS plans a left semi join") {
    val plan = SqlOps.q90Exists(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan.take(2000))
  }

  test("q92 lateral top-k: at most 2 orders per customer, correctly ranked") {
    val rows = SqlOps.q92LateralTopk(spark, Sf).collect()
    val plan = SqlOps.q92LateralTopk(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    val perCust = rows.groupBy(_.getLong(0))
    assert(perCust.values.forall(_.length <= 2))
    // the kept orders really are the customer's most expensive ones
    val allOrders = graft.Tables.orders(spark, Sf)
      .select("o_custkey", "o_orderkey", "o_totalprice").collect()
      .groupBy(_.getLong(0))
    perCust.foreach { case (cust, kept) =>
      val expect = allOrders(cust)
        .sortBy(r => (-r.getDouble(2), r.getLong(1))).take(2)
        .map(_.getLong(1)).toSet
      assert(kept.map(_.getLong(1)).toSet == expect, s"customer $cust")
    }
  }

  test("q91 window values: full frame (not the default CURRENT ROW frame)") {
    val rows = SqlOps.q91WindowValues(spark, Sf).collect()
    val orders = graft.Tables.orders(spark, Sf)
      .filter(col("o_custkey") < 300)
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
      .collect()
      .groupBy(_.getLong(0))
      .map { case (c, rs) =>
        c -> rs.sortBy(r => (r.getAs[java.time.LocalDateTime]("o_orderdate")
          .toString, r.getLong(1)))
      }
    rows.foreach { r =>
      val seq = orders(r.getLong(1))
      // last_value must be the partition's LAST row — with the default
      // frame it would equal the current row's own price instead
      assert(r.getDouble(2) == seq.head.getDouble(3), s"first ${r.getLong(0)}")
      assert(r.getDouble(3) == seq.last.getDouble(3), s"last ${r.getLong(0)}")
      val second = r.get(4)
      if (seq.length >= 2) assert(second == seq(1).getDouble(3))
      else assert(second == null)
    }
  }

  test("q93 bool/bit aggregates match a driver-side fold") {
    val rows = SqlOps.q93BoolBitAgg(spark, Sf).collect()
    val orders = graft.Tables.orders(spark, Sf)
      .select("o_orderpriority", "o_orderkey", "o_totalprice", "o_orderstatus")
      .collect().groupBy(_.getString(0))
    rows.foreach { r =>
      val grp = orders(r.getString(0))
      val keys = grp.map(_.getLong(1))
      assert(r.getLong(1) == keys.reduce(_ & _))
      assert(r.getLong(2) == keys.reduce(_ | _))
      assert(r.getLong(3) == keys.reduce(_ ^ _))
      assert(r.getBoolean(4) == grp.forall(_.getDouble(2) > 0))
      assert(r.getBoolean(5) == grp.exists(_.getString(3) == "P"))
    }
  }

  test("q95 HAVING scalar subquery returns the above-average spenders") {
    val rows = SqlOps.q95HavingScalar(spark, Sf).collect()
    assert(rows.nonEmpty)
    // independently recompute the threshold and re-check every survivor
    val spends = graft.Tables.orders(spark, Sf)
      .groupBy("o_custkey")
      .agg(sum(floor(col("o_totalprice") * 100)).as("cents"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // threshold in cents: 2 × (total spend / distinct customers)
    val threshold = 2.0 * spends.values.map(BigInt(_)).sum.toDouble / spends.size
    rows.foreach { r => assert(spends(r.getLong(0)) > threshold - 1) }
    assert(rows.length == spends.values.count(_ > threshold))
  }

  test("q96 NOT IN plans the null-aware anti join and matches set difference") {
    val df = SqlOps.q96NotIn(spark, Sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan.take(2000))
    val got = df.collect().map(_.getLong(0)).toSet
    val custs = graft.Tables.customer(spark, Sf)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val big = graft.Tables.orders(spark, Sf)
      .filter(col("o_totalprice") > 300000)
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    assert(got == custs.diff(big))
  }

  test("q97 closed-form regression agrees with Spark's built-in regr_* aggregates") {
    val ours = SqlOps.q97RegressionStats(spark, Sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val builtin = graft.Tables.lineitem(spark, Sf)
      .groupBy("l_returnflag")
      .agg(expr("regr_slope(floor(l_extendedprice), l_quantity)").as("s"),
        expr("regr_intercept(floor(l_extendedprice), l_quantity)").as("i"),
        expr("regr_r2(floor(l_extendedprice), l_quantity)").as("r"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    ours.foreach { case (k, (s, i, r)) =>
      val (bs, bi, br) = builtin(k)
      assert(math.abs(s - bs) < 1e-6 * math.max(1, math.abs(bs)), s"slope $k")
      assert(math.abs(i - bi) < 1e-6 * math.max(1, math.abs(bi)), s"intercept $k")
      assert(math.abs(r - br) < 1e-6, s"r2 $k")
    }
  }

  test("q98 column profile: one row per column, internally consistent") {
    val rows = SqlOps.q98ColumnProfile(spark, Sf).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority",
        "o_orderstatus", "o_totalprice"))
    val n = graft.Tables.orders(spark, Sf).count()
    rows.foreach { r =>
      assert(r.getLong(1) == n)
      assert(r.getLong(2) == 0)                 // no nulls in testdata
      assert(r.getLong(3) >= 1 && r.getLong(3) <= n)
      assert(r.getString(4) <= r.getString(5) ||
        r.getString(0) == "o_totalprice" || r.getString(0) == "o_custkey" ||
        r.getString(0) == "o_orderkey")         // numeric strings don't sort lexically
    }
    val okey = rows.find(_.getString(0) == "o_orderkey").get
    assert(okey.getLong(3) == n)                // primary key: all distinct
  }

  test("q99 array set ops: inclusion-exclusion holds per document") {
    val rows = SqlOps.q99ArraySetOps(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (common, union, headOnly) = (r.getInt(1), r.getInt(2), r.getInt(3))
      assert(common >= 0 && headOnly >= 0)
      // |head| = common + headOnly; |union| = |head| + |tail| - common
      assert(union >= common + headOnly)
      assert(r.getBoolean(4) == (common > 0))
    }
  }

  test("q109 all checks pass on clean data and FIRE on poisoned data") {
    val clean = SqlOps.q109DataQuality(spark, Sf).collect()
    assert(clean.length == 6)
    val cleanV = clean.map(r => r.getString(0) -> r.getLong(2)).toMap
    // the audit SURFACES REAL DIRT: the synthetic generator reuses
    // line numbers, so (l_orderkey, l_linenumber) is not unique —
    // everything else is clean
    assert(cleanV("lineitem_pk_unique") > 0L)
    assert(clean.filter(_.getString(0) != "lineitem_pk_unique")
      .forall(_.getAs[Boolean]("pass")),
      s"unexpected violations: ${cleanV.filter(_._2 > 0)}")
    // poison the orders view: an orphan custkey, a bad status, a
    // non-positive price, a duplicated lineitem pk — then the same SQL
    // text must count exactly those violations
    import spark.implicits._
    graft.Tables.orders(spark, Sf)
      .unionByName(Seq((-1L, -999L, "X", -5.0))
        .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .withColumn("o_orderdate", lit(null).cast("timestamp_ntz"))
        .withColumn("o_orderpriority", lit("1-URGENT")))
      .createOrReplaceTempView("orders")
    val li = graft.Tables.lineitem(spark, Sf)
    li.limit(1).unionByName(li).createOrReplaceTempView("lineitem")
    val fired = spark.sql(SqlOps.DataQualitySql).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(fired("orders_custkey_fk") == cleanV("orders_custkey_fk") + 1)
    assert(fired("orders_status_domain") == cleanV("orders_status_domain") + 1)
    assert(fired("orders_price_positive") == cleanV("orders_price_positive") + 1)
    assert(fired("lineitem_pk_unique") == cleanV("lineitem_pk_unique") + 1)
    // the poisoned order has no lineitems, so the lineitem fk is clean
    assert(fired("lineitem_orderkey_fk") == cleanV("lineitem_orderkey_fk"))
  }

  test("q94 string tier-2 spot values") {
    val r = SqlOps.q94StringFns2(spark, Sf)
      .filter(col("c_custkey") === 7).collect().head
    val name = graft.Tables.customer(spark, Sf)
      .filter(col("c_custkey") === 7).select("c_name").collect().head.getString(0)
    assert(r.getAs[String]("name_rev") == name.reverse)
    assert(r.getAs[String]("name_left") == name.take(4))
    assert(r.getAs[String]("name_right") == name.takeRight(3))
    assert(r.getAs[String]("bucket_chr") == ('A' + 7 % 26).toChar.toString)
    assert(r.getAs[Int]("hash_pos") == name.indexOf('#') + 1)
  }

  test("q111 listagg: element count matches the group size, order is by date") {
    val rows = SqlOps.q111Listagg(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val seq = r.getAs[String]("prio_seq")
      assert(seq.split("\\|", -1).length == r.getAs[Long]("n_orders"))
    }
    // spot-check one customer's concatenation order against the table
    val k = rows.head.getAs[Long]("o_custkey")
    val expected = graft.Tables.orders(spark, Sf)
      .filter(col("o_custkey") === k)
      .orderBy("o_orderdate", "o_orderkey")
      .select("o_orderpriority").collect().map(_.getString(0)).mkString("|")
    assert(rows.head.getAs[String]("prio_seq") == expected)
  }

  test("q112 ordered-set aggregates: percentiles ordered and drawn from data") {
    val prices = graft.Tables.orders(spark, Sf)
      .select("o_totalprice").collect().map(_.getDouble(0)).toSet
    SqlOps.q112ModePdisc(spark, Sf).collect().foreach { r =>
      val (p25, p50, p75) = (r.getAs[Double]("p25"),
        r.getAs[Double]("p50"), r.getAs[Double]("p75"))
      assert(p25 <= p50 && p50 <= p75)
      // percentile_disc picks actual data values, never interpolates
      assert(prices(p25) && prices(p50) && prices(p75))
      assert(Set("F", "O", "P")(r.getAs[String]("status_mode")))
    }
  }

  test("q113 recursive spine: contiguous months covering the full range") {
    val rows = SqlOps.q113RecursiveSpine(spark, Sf).collect()
    val months = rows.map(_.getAs[java.sql.Timestamp]("m").toLocalDateTime)
    // contiguous: each month is exactly +1 from its predecessor
    months.sliding(2).foreach { case Array(a, b) =>
      assert(a.plusMonths(1) == b)
      case _ => ()
    }
    // spine covers exactly [min, max] of the data
    val (lo, hi) = {
      val r = graft.Tables.orders(spark, Sf)
        .agg(min(date_trunc("month", col("o_orderdate"))),
          max(date_trunc("month", col("o_orderdate")))).collect().head
      (r.getAs[java.sql.Timestamp](0).toLocalDateTime,
        r.getAs[java.sql.Timestamp](1).toLocalDateTime)
    }
    assert(months.head == lo && months.last == hi)
    // every order lands in exactly one month bucket
    assert(rows.map(_.getAs[Long]("n_orders")).sum ==
      graft.Tables.orders(spark, Sf).count())
  }

  test("q151 decorrelates both EXISTS into semi/anti joins (no per-row subquery)") {
    val plan = SqlOps.q151MultiExists(spark, Sf)
      .queryExecution.executedPlan.toString
    // the EXISTS must become a LeftSemi and the NOT EXISTS a LeftAnti,
    // both co-partitioned joins on l_orderkey — never a re-executed
    // per-row subquery or a cartesian fallback
    assert(plan.contains("LeftSemi"), s"no semi join in plan:\n${plan.take(800)}")
    assert(plan.contains("LeftAnti"), s"no anti join in plan:\n${plan.take(800)}")
    assert(!plan.contains("CartesianProduct"), "cartesian fallback in q151 plan")
  }

  // ---------------------------------------------------------------- q181

  test("q181 RFM scores replicate ntile(5) exactly per segment") {
    val out = SqlOps.q181Rfm(spark, Sf).collect()
    assert(out.nonEmpty)
    // exact ntile replica: bucket i (1-based) over n rows in sorted
    // order has size n/5 + (i <= n%5)
    def ntile5(sorted: Seq[Long]): Map[Long, Int] = {
      val n = sorted.length
      sorted.zipWithIndex.map { case (k, i) =>
        // rank i (0-based) → bucket via the standard ntile split
        val big = n % 5; val small = n / 5
        val b = if (i < big * (small + 1)) i / (small + 1)
        else big + (i - big * (small + 1)) / small
        k -> (b + 1)
      }.toMap
    }
    out.groupBy(_.getAs[String]("c_mktsegment")).foreach { case (_, rows) =>
      val r = ntile5(rows.sortBy(x =>
        (-x.getAs[Long]("recency_days"), x.getAs[Long]("c_custkey")))
        .map(_.getAs[Long]("c_custkey")).toSeq)
      val f = ntile5(rows.sortBy(x =>
        (x.getAs[Long]("frequency"), x.getAs[Long]("c_custkey")))
        .map(_.getAs[Long]("c_custkey")).toSeq)
      val m = ntile5(rows.sortBy(x =>
        (x.getAs[Long]("monetary_c"), x.getAs[Long]("c_custkey")))
        .map(_.getAs[Long]("c_custkey")).toSeq)
      rows.foreach { x =>
        val k = x.getAs[Long]("c_custkey")
        assert(x.getAs[Int]("r_score") == r(k))
        assert(x.getAs[Int]("f_score") == f(k))
        assert(x.getAs[Int]("m_score") == m(k))
        assert(x.getAs[Int]("rfm_code") ==
          r(k) * 100 + f(k) * 10 + m(k))
      }
    }
  }

  // ---------------------------------------------------------------- q182

  test("q182 weighted median matches the brute-force crossing point") {
    val li = graft.Tables.lineitem(spark, Sf)
      .select("l_returnflag", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getAs[String]("l_returnflag"),
        math.floor(r.getAs[Double]("l_quantity")).toLong,
        math.floor(r.getAs[Double]("l_extendedprice") * 100).toLong))
    val want = li.groupBy(_._1).map { case (flag, rows) =>
      val byQ = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum)
        .toSeq.sortBy(_._1)
      val total = byQ.map(_._2).sum
      var cum = 0L
      val med = byQ.find { case (_, w) => cum += w; cum * 2 >= total }.get._1
      flag -> ((med, total))
    }
    val got = SqlOps.q182WeightedMedian(spark, Sf).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val (med, total) = want(r.getAs[String]("flag"))
      assert(r.getAs[Long]("wmedian_qty") == med)
      assert(r.getAs[Long]("total_cents") == total)
    }
  }
}
