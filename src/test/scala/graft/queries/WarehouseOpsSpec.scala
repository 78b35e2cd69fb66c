package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Invariant tests for the warehouse/iterative family (q114–q117);
  * cross-engine value equality is the driver's DuckDB oracle. */
class WarehouseOpsSpec extends SparkTestBase {
  import spark.implicits._

  // ---------------------------------------------------------------- q114

  test("pagerank: teleport floor holds and total mass never grows") {
    val ranks = WarehouseOps.q114PageRank(spark, Sf).collect()
    assert(ranks.nonEmpty)
    val rs = ranks.map(_.getAs[Long]("rank_fp"))
    // every node keeps at least the teleport mass
    assert(rs.forall(_ >= 150000000L))
    // top-100 is sorted desc with the id tie-break
    assert(rs.sameElements(rs.sortBy(-_)))
    // integer flooring only LOSES mass: no single node can exceed the
    // whole graph's initial mass (a sanity ceiling, not a tight bound)
    val li = graft.Tables.lineitem(spark, Sf)
    val nNodes = li.join(li.groupBy("l_orderkey").count().filter($"count" > 1),
      "l_orderkey").select("l_partkey").distinct().count()
    assert(rs.forall(_ <= nNodes * 1000000000L))
  }

  test("pagerank: deterministic across runs") {
    val a = WarehouseOps.q114PageRank(spark, Sf).collect().map(_.toString)
    val b = WarehouseOps.q114PageRank(spark, Sf).collect().map(_.toString)
    assert(a.sameElements(b))
  }

  // ---------------------------------------------------------------- q115

  test("scd2: exactly one current version per key, closed rows bounded") {
    val out = WarehouseOps.q115Scd2(spark, Sf)
    // every key has exactly one current version
    val perKey = out.groupBy("c_custkey")
      .agg(sum(when($"is_current", 1).otherwise(0)).as("n_cur"))
    assert(perKey.filter($"n_cur" =!= 1).count() == 0)
    // closed rows carry the batch timestamp; current rows carry none
    assert(out.filter(!$"is_current" && $"valid_to".isNull).count() == 0)
    assert(out.filter($"is_current" && $"valid_to".isNotNull).count() == 0)
    // row count = base + change rows (each change adds one version)
    val base = graft.Tables.customer(spark, Sf).count()
    val changed = graft.Tables.customer(spark, Sf)
      .filter($"c_custkey" % 7 === 3).count()
    val added = graft.Tables.customer(spark, Sf)
      .filter($"c_custkey" % 31 === 0).count()
    assert(out.count() == base + changed + added)
    // a changed key's history: closed 1995 version + current 1998 one
    val k = out.filter($"c_custkey" === 3).orderBy("valid_from").collect()
    assert(k.length == 2 && !k(0).getAs[Boolean]("is_current") &&
      k(1).getAs[Boolean]("is_current") &&
      k(1).getAs[String]("segment") == "PROMO")
  }

  // ---------------------------------------------------------------- q116

  test("gap-fill: dense per-user spine, LOCF leaves no nulls") {
    val out = WarehouseOps.q116GapFill(spark, Sf)
    // the spine starts at each user's first observed day, so LOCF
    // always has a value to carry — no nulls anywhere
    assert(out.filter($"v_filled".isNull).count() == 0)
    // spine density: rows per user == day span + 1
    val dense = out.groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        (datediff(max($"day"), min($"day")) + 1).as("span"))
    assert(dense.filter($"n" =!= $"span").count() == 0)
    // filled gap rows repeat the previous day's value
    val gap = out.orderBy("user_id", "day").collect()
      .sliding(2).find { case Array(prev, cur) =>
        cur.getAs[Boolean]("is_gap") &&
          prev.getAs[Long]("user_id") == cur.getAs[Long]("user_id")
        case _ => false
      }
    gap.foreach { case Array(prev, cur) =>
      assert(cur.getAs[Long]("v_filled") == prev.getAs[Long]("v_filled"))
    }
  }

  // ---------------------------------------------------------------- q121

  test("binned range join: equi-join plan, identical to the nested-loop form") {
    val df = Relational.q121BinnedRangeJoin(spark, Sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
      plan.take(2000))
    // the naive inequality join — correct but O(points × intervals)
    val win = graft.Tables.orders(spark, Sf)
      .filter($"o_orderkey" % 997 === 0)
      .select($"o_orderkey".as("win_id"), $"o_orderdate".as("w_start"),
        ($"o_orderdate" + expr("INTERVAL 14 DAYS")).as("w_end"))
    val naive = graft.Tables.lineitem(spark, Sf)
      .join(win, $"l_shipdate" >= $"w_start" && $"l_shipdate" < $"w_end")
      .groupBy("win_id").agg(count(lit(1)).as("n_lines"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val binned = df.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(binned == naive)
  }

  // ---------------------------------------------------------------- q122

  test("triangle counts match a brute-force reference") {
    val out = WarehouseOps.q122Triangles(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute force on the collected subgraph
    val li = graft.Tables.lineitem(spark, Sf)
      .filter($"l_partkey" % 10 === 0)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct.toSeq
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.toSet
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val triCount = new scala.collection.mutable.HashMap[Long, Long]()
      .withDefaultValue(0L)
    for ((a, b) <- edges; c <- adj.getOrElse(b, Set.empty) if edges((a, c))) {
      triCount(a) += 1; triCount(b) += 1; triCount(c) += 1
    }
    val expected = triCount.toSeq.sortBy(t => (-t._2, t._1)).take(50).toMap
    assert(out == expected)
  }

  // ---------------------------------------------------------------- q117

  test("zorder2 expression matches the per-bit reference interleave") {
    graft.functions.GraftFunctions.register(spark)
    def ref(x: Long, y: Long): Long = {
      var z = 0L
      for (i <- 0 until 16) {
        z |= ((x >> i) & 1L) << (2 * i)
        z |= ((y >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val rnd = new scala.util.Random(7)
    val cases = Seq.tabulate(200)(_ =>
      (rnd.nextLong().abs % 65536, rnd.nextLong().abs % 65536)) ++
      Seq((0L, 0L), (65535L, 65535L), (1L, 0L), (0L, 1L))
    val got = cases.toDF("x", "y")
      .select(call_function("zorder2", $"x", $"y").as("z"))
      .collect().map(_.getLong(0))
    assert(got.sameElements(cases.map { case (x, y) => ref(x, y) }))
  }

  test("z-sorted layout keeps BOTH dimensions' chunk spans tight") {
    // the data-skipping claim, measured on a 64×64 uniform grid: chunk
    // rows stand in for parquet row groups. A z-sort's 256-row chunk
    // covers a ~16×16 tile (both spans ~sqrt(chunk)); an x-sort's
    // chunk covers 4 full columns (y-span = table width). Grid data
    // makes the geometry exact — q117's skewed custkey/orderkey ranges
    // at tiny SF don't.
    graft.functions.GraftFunctions.register(spark)
    val n = 64
    val grid = for (x <- 0L until n; y <- 0L until n) yield (x, y)
    val zRows = grid.toDF("x", "y")
      .select($"x", $"y", call_function("zorder2", $"x", $"y").as("z"))
      .orderBy("z").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val chunkSize = 256
    def avgSpan(rows: Seq[(Long, Long)], sel: ((Long, Long)) => Long): Double = {
      val chunks = rows.grouped(chunkSize).toSeq
      chunks.map(c => (c.map(sel).max - c.map(sel).min).toDouble)
        .sum / chunks.size
    }
    val xSorted = grid.sortBy(identity) // lexicographic (x, then y)
    val (zx, zy) = (avgSpan(zRows, _._1), avgSpan(zRows, _._2))
    val xSortY = avgSpan(xSorted, _._2) // = 63: every chunk sees all y
    assert(xSortY == n - 1.0)
    // both z-spans stay at tile scale — an order of magnitude under
    // the table width the single-column sort leaves on y
    assert(zx <= 16 && zy <= 16, s"z spans ($zx, $zy) exceed tile size")
  }

  test("q152 itemsets: support bounds, ordered pairs, lift consistency") {
    import org.apache.spark.sql.functions.col
    val rows = WarehouseOps.q152Itemsets(spark, Sf).collect()
    assert(rows.length == 20)
    val n = graft.Tables.lineitem(spark, Sf)
      .select("l_orderkey").distinct().count()
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("a"), r.getAs[Long]("b"))
      val (sab, sa, sb) = (r.getAs[Long]("supp_ab"),
        r.getAs[Long]("supp_a"), r.getAs[Long]("supp_b"))
      assert(a < b, "pairs must be ordered")
      // pair support can never exceed either item's support
      assert(sab >= 1 && sab <= math.min(sa, sb))
      // lift is exactly the declared ratio
      assert(r.getAs[Double]("lift") == sab.toDouble * n / (sa * sb))
    }
    // descending support with deterministic tie-break
    val supports = rows.map(_.getAs[Long]("supp_ab"))
    assert(supports.zip(supports.tail).forall { case (x, y) => x >= y })
  }

  test("q152 has no forced broadcast on the part-keyed support frames") {
    // supp has one row per distinct part — catalog-sized, so a hard
    // broadcast() is a memory ceiling at 100×; only the 1-row
    // n_orders singleton may keep its hint (genuinely constant-size).
    import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, ResolvedHint}
    val plan = WarehouseOps.q152Itemsets(spark, Sf).queryExecution.analyzed
    val forced = plan.collect {
      case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) => h
    }
    val partKeyed = forced.filter(
      _.output.exists(a => Set("supp_a", "supp_b", "supp").contains(a.name)))
    assert(partKeyed.isEmpty,
      s"forced broadcast of a part-keyed frame in q152: $partKeyed")
    assert(forced.forall(_.output.exists(_.name == "n_orders")),
      s"unexpected forced broadcast in q152: $forced")
  }

  test("q169 bloom reduction is semantics-preserving and actually prunes") {
    val got = WarehouseOps.q169BloomJoin(spark, Sf).collect().map(_.toString)
    // the same query with NO bloom prefilter — must be value-identical
    val urgent = graft.Tables.orders(spark, Sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_orderdate")
    val want = graft.Tables.lineitem(spark, Sf)
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .join(urgent, col("l_orderkey") === col("o_orderkey"))
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg((sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * 100)).cast("double") / 100).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("month").collect().map(_.toString)
    assert(got.sameElements(want))
    // the probe filter sits in the physical plan (below the join) and
    // keeps a superset of the true matches but far less than the scan
    val physical = WarehouseOps.q169BloomJoin(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(physical.contains("bloom_might_contain"),
      "bloom probe missing from the physical plan")
    val nKeys = math.max(urgent.count(), 1L)
    val bf = urgent.stat.bloomFilter("o_orderkey", nKeys, 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val probe = org.apache.spark.sql.graft.Bridge.column(
      graft.functions.BloomMightContain(
        org.apache.spark.sql.graft.Bridge.expr(col("l_orderkey")),
        bos.toByteArray))
    val li = graft.Tables.lineitem(spark, Sf)
    val total = li.count()
    val kept = li.filter(probe).count()
    val trueMatches = li.join(urgent,
      col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    assert(kept >= trueMatches, "bloom filter dropped a true match")
    // urgent is ~20% of orders; 1% fpp keeps the pruned side well
    // under half the scan even with false positives
    assert(kept < total / 2,
      s"bloom filter pruned nothing: kept $kept of $total")
  }

  test("q157 k-core peel matches an in-memory replica of the 3 rounds") {
    val got = WarehouseOps.q157KcorePeel(spark, Sf).collect()
      .map(r => r.getAs[Long]("part_id") -> r.getAs[Long]("deg")).toMap
    // replicate: same subgraph, 3 rounds of deg>=8 pruning, in Scala
    val li = graft.Tables.lineitem(spark, Sf)
      .filter(col("l_partkey") % 10 === 0)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    var edges = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSet
    for (_ <- 1 to 3) {
      val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (n, v) => n -> v.size }
      val keep = deg.filter(_._2 >= 8).keySet
      edges = edges.filter(e => keep(e._1) && keep(e._2))
    }
    val want = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (n, v) => n -> v.size.toLong }
    assert(got == want, s"${got.size} survivors vs ${want.size} expected")
  }

  // ---------------------------------------------------------------- q177

  /** Oriented sampled co-purchase edge set, replicated in memory —
    * shared input of the q177/q178 replicas (q157's replica shape). */
  private def replicaEdges(): Set[(Long, Long)] = {
    val li = graft.Tables.lineitem(spark, Sf)
      .filter(col("l_partkey") % 10 === 0)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSet
  }

  test("q177 label propagation matches an in-memory replica of 3 sync rounds") {
    val edges = replicaEdges()
    val und = edges.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
    val nbrs = und.groupBy(_._1).map { case (n, v) => n -> v.map(_._2) }
    var lbl: Map[Long, Long] = nbrs.keys.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      lbl = nbrs.map { case (n, ns) =>
        val counts = ns.map(lbl).groupBy(identity)
          .map { case (l, v) => l -> v.size }
        // most frequent neighbor label, ties to the smallest label
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val want = lbl.values.groupBy(identity)
      .map { case (c, v) => c -> v.size.toLong }.toSeq
      .sortBy { case (c, n) => (-n, c) }.take(50)
    val got = WarehouseOps.q177LabelProp(spark, Sf).collect()
      .map(r => r.getAs[Long]("community") -> r.getAs[Long]("n_members")).toSeq
    assert(got == want, s"got ${got.take(5)}... want ${want.take(5)}...")
  }

  test("q177 min_part is a member and community sizes conserve nodes") {
    val out = WarehouseOps.q177LabelProp(spark, Sf).collect()
    assert(out.nonEmpty)
    // min_part of each community must itself carry that community's
    // label only if the community id is a real node — weaker invariant:
    // community ids and min_parts are drawn from the node universe
    val nodes = replicaEdges().toSeq.flatMap(e => Seq(e._1, e._2)).toSet
    assert(out.forall(r => nodes(r.getAs[Long]("community"))))
    assert(out.forall(r => nodes(r.getAs[Long]("min_part"))))
    assert(out.map(_.getAs[Long]("n_members")).sum <= nodes.size)
  }

  // ---------------------------------------------------------------- q178

  test("q178 link prediction: non-adjacent, counts match replica, jac bounded") {
    val edges = replicaEdges()
    val got = WarehouseOps.q178LinkPredict(spark, Sf).collect()
    assert(got.nonEmpty)
    // replica common-neighbor counts over the undirected graph
    val nbrs = edges.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).map { case (n, v) => n -> v.map(_._2).toSet }
    got.foreach { r =>
      val (a, c) = (r.getAs[Long]("a"), r.getAs[Long]("c"))
      assert(!edges((a, c)), s"pair ($a,$c) is an existing edge")
      val cn = (nbrs(a) & nbrs(c)).size.toLong
      assert(r.getAs[Long]("cn") == cn)
      assert(r.getAs[Long]("deg_a") == nbrs(a).size.toLong)
      val jac = cn * 1000000L / (nbrs(a).size + nbrs(c).size - cn)
      assert(r.getAs[Long]("jac_ppm") == jac)
      assert(jac <= 1000000L)
    }
  }

  test("q192 HITS: top authority is max-normalized and scores replay in-memory") {
    val rows = WarehouseOps.q192Hits(spark, Sf).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    val scores = rows.map(_.getAs[Long]("auth_fp"))
    // max-normalized: the best authority carries exactly 1e6
    assert(scores.head == 1000000L)
    assert(scores.forall(a => a >= 0 && a <= 1000000L))
    // descending with part_id tiebreak
    rows.sliding(2).foreach {
      case Array(a, b) =>
        val (sa, sb) = (a.getAs[Long]("auth_fp"), b.getAs[Long]("auth_fp"))
        assert(sa > sb || (sa == sb &&
          a.getAs[Long]("part_id") < b.getAs[Long]("part_id")))
      case _ =>
    }
    // replay the 2-iteration fixed-point walk in memory
    val e = graft.Tables.orders(spark, Sf).select("o_orderkey", "o_custkey")
      .join(graft.Tables.lineitem(spark, Sf).select("l_orderkey", "l_partkey"),
        org.apache.spark.sql.functions.col("o_orderkey") ===
          org.apache.spark.sql.functions.col("l_orderkey"))
      .select("o_custkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    var h = e.map(_._1).distinct.map(_ -> 1000000L).toMap
    var a = Map.empty[Long, Long]
    for (_ <- 1 to 2) {
      val ar = e.groupBy(_._2).map { case (p, es) =>
        p -> es.map(x => h(x._1)).sum }
      val am = ar.values.max
      a = ar.map { case (p, s) => p -> s * 1000000L / am }
      val hr = e.groupBy(_._1).map { case (c, es) =>
        c -> es.map(x => a(x._2)).sum }
      val hm = hr.values.max
      h = hr.map { case (c, s) => c -> s * 1000000L / hm }
    }
    rows.foreach { r =>
      assert(a(r.getAs[Long]("part_id")) == r.getAs[Long]("auth_fp"))
    }
  }

  test("q195 zonemap: clustered layout never skips less, invariants hold") {
    val rows = WarehouseOps.q195Zonemap(spark, Sf).collect()
    assert(rows.length == 8) // 2 layouts x 4 predicates
    val total = rows.head.getAs[Long]("rows_total")
    rows.foreach { r =>
      assert(r.getAs[Long]("rows_total") == total)
      assert(r.getAs[Long]("blocks_skipped") <= r.getAs[Long]("n_blocks"))
      assert(r.getAs[Long]("rows_skipped") <= total)
      val ppm = r.getAs[Long]("skip_ppm")
      assert(ppm == r.getAs[Long]("rows_skipped") * 1000000L / total)
    }
    // the point of the operator: shipdate clustering dominates natural
    // layout for shipdate range predicates
    val byPred = rows.groupBy(_.getAs[String]("pred"))
    byPred.values.foreach { prs =>
      val nat = prs.find(_.getAs[String]("layout") == "natural").get
      val clu = prs.find(_.getAs[String]("layout") == "clustered").get
      assert(clu.getAs[Long]("rows_skipped") >= nat.getAs[Long]("rows_skipped"),
        s"clustering lost on ${prs.head.getAs[String]("pred")}")
    }
  }

  test("q196 Benford: ppm shares sum to ~1e6 and digits cover 1-9") {
    val rows = WarehouseOps.q196Benford(spark, Sf).collect()
    assert(rows.map(_.getAs[Int]("digit")).toSeq == (1 to 9))
    val obsSum = rows.map(_.getAs[Long]("obs_ppm")).sum
    assert(obsSum > 999990L && obsSum <= 1000000L, s"obs sum $obsSum")
    val benSum = rows.map(_.getAs[Long]("benford_ppm")).sum
    assert(benSum > 999990L && benSum <= 1000000L)
    val total = rows.map(_.getAs[Long]("n_obs")).sum
    rows.foreach { r =>
      assert(r.getAs[Long]("obs_ppm") ==
        r.getAs[Long]("n_obs") * 1000000L / total)
      assert(r.getAs[Long]("dev_ppm") ==
        math.abs(r.getAs[Long]("obs_ppm") - r.getAs[Long]("benford_ppm")))
    }
  }

  test("q199 rank-1 ALS: factors replay the two alternations in memory") {
    val got = WarehouseOps.q199AlsRank1(spark, Sf).collect()
    assert(got.nonEmpty && got.length <= 20)
    val ratings = graft.Tables.orders(spark, Sf)
      .select("o_orderkey", "o_custkey")
      .join(graft.Tables.lineitem(spark, Sf)
          .select("l_orderkey", "l_partkey", "l_quantity"),
        org.apache.spark.sql.functions.col("o_orderkey") ===
          org.apache.spark.sql.functions.col("l_orderkey"))
      .collect()
      .groupBy(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("l_partkey")))
      .map { case ((c, p), rs) =>
        (c, p, rs.map(r => math.floor(r.getAs[Double]("l_quantity")).toLong).sum) }
      .toSeq
    val S = 1000L
    val u = ratings.groupBy(_._1).map { case (c, rs) =>
      val num = rs.map(_._3 * S).sum
      val den = rs.map(_ => S * S).sum
      c -> S * S * num / den
    }
    val v = ratings.groupBy(_._2).map { case (p, rs) =>
      val num = rs.map(t => t._3 * u(t._1)).sum
      val den = rs.map(t => u(t._1) * u(t._1)).sum
      p -> (S * S * num / den, rs.size.toLong)
    }
    got.foreach { r =>
      val (vf, n) = v(r.getAs[Long]("part_id"))
      assert(r.getAs[Long]("v_fp") == vf && r.getAs[Long]("n_buyers") == n)
    }
    // descending output with part tiebreak
    got.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("v_fp") > b.getAs[Long]("v_fp") ||
          (a.getAs[Long]("v_fp") == b.getAs[Long]("v_fp") &&
            a.getAs[Long]("part_id") < b.getAs[Long]("part_id")))
      case _ =>
    }
  }

  test("q204 reconcile: buckets partition all orders and bounds hold") {
    val rows = WarehouseOps.q204OrderReconcile(spark, Sf).collect()
    assert(rows.nonEmpty)
    val nOrders = graft.Tables.orders(spark, Sf).count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == nOrders)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      val (lo, hi) = (r.getAs[Long]("min_diff_fp"), r.getAs[Long]("max_diff_fp"))
      assert(lo <= hi)
      // digit-count bucket: |diff| in [10^(b-1), 10^b) (bucket 1 includes 0)
      val cap = math.pow(10, b.toDouble).toLong
      assert(math.abs(lo) < cap && math.abs(hi) < cap)
      assert(r.getAs[Long]("sum_abs_fp") >= math.max(math.abs(lo), math.abs(hi)))
    }
  }

  test("q206 apriori: triples replay brute-force counts and respect monotonicity") {
    val rows = WarehouseOps.q206Apriori3(spark, Sf).collect()
    val baskets = graft.Tables.lineitem(spark, Sf)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .groupBy(_.getAs[Long]("l_orderkey"))
      .map(_._2.map(_.getAs[Long]("l_partkey")).sorted.toVector)
    val tripleCounts = scala.collection.mutable.Map[(Long, Long, Long), Long]()
    val pairCounts = scala.collection.mutable.Map[(Long, Long), Long]()
    baskets.foreach { ps =>
      for (i <- ps.indices; j <- i + 1 until ps.size) {
        pairCounts((ps(i), ps(j))) = pairCounts.getOrElse((ps(i), ps(j)), 0L) + 1
        for (k <- j + 1 until ps.size)
          tripleCounts((ps(i), ps(j), ps(k))) =
            tripleCounts.getOrElse((ps(i), ps(j), ps(k)), 0L) + 1
      }
    }
    val want = tripleCounts.filter { case ((a, b, c), n) =>
      n >= 5 && pairCounts((a, b)) >= 5 && pairCounts((a, c)) >= 5 &&
        pairCounts((b, c)) >= 5
    }.toSeq.sortBy { case ((a, b, c), n) => (-n, a, b, c) }.take(20)
    val got = rows.map(r => ((r.getAs[Long]("a"), r.getAs[Long]("b"),
      r.getAs[Long]("c")), r.getAs[Long]("supp"))).toSeq
    assert(got == want, s"got=${got.take(3)} want=${want.take(3)}")
    // monotonicity: a frequent triple's support never exceeds its pairs'
    got.foreach { case ((a, b, c), n) =>
      assert(n <= pairCounts((a, b)) && n <= pairCounts((a, c)) &&
        n <= pairCounts((b, c)))
    }
  }

  test("q185 BFS hops matches an in-memory 3-round multi-source BFS") {
    val edges = replicaEdges()
    val nbrs = edges.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).map { case (n, v) => n -> v.map(_._2).toSet }
    var dist: Map[Long, Long] = nbrs.keys.filter(_ % 100 == 0)
      .map(n => n -> 0L).toMap
    for (_ <- 1 to 3) {
      val relaxed = dist.toSeq.flatMap { case (n, h) =>
        nbrs(n).map(_ -> (h + 1)) }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (n, v) => n -> v.map(_._2).min }
    }
    val got = WarehouseOps.q185BfsHops(spark, Sf).collect()
      .map(r => r.getAs[Long]("part_id") -> r.getAs[Long]("hop")).toMap
    assert(got == dist)
    assert(got.nonEmpty && got.values.forall(h => h >= 0 && h <= 3))
    // frontier consistency: every hop-k>0 node has a hop-(k-1) neighbor
    got.foreach { case (n, h) =>
      if (h > 0) assert(nbrs(n).exists(m => got.get(m).exists(_ == h - 1)))
    }
  }

  // ---- convergence-criterion twins of the bounded-round iterative ops
  // The registered queries run FIXED unrolled rounds (oracle-able); a
  // real 100× graph needs a stopping rule. These assert the fixpoint
  // loops are the SAME update — bit-identical to the unrolled form at
  // the round count the loop actually ran.

  test("pageRankFixpoint equals the unrolled form at its stopping round") {
    // loose epsilon so the fixture converges in a handful of rounds
    val (ranks, iters) = WarehouseOps.pageRankFixpoint(spark, Sf,
      epsFp = 20000000L, maxIters = 20)
    assert(iters > 0 && iters < 20, s"iters=$iters") // STOPPED, not capped
    val viaLoop = ranks.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val unrolled = WarehouseOps.pageRankRanks(spark, Sf, iters)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaLoop.sameElements(unrolled))
    // and the stopping rule held: one more round moves every node < eps
    val more = WarehouseOps.pageRankRanks(spark, Sf, iters + 1)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val maxDelta = viaLoop.zip(more).map { case ((_, a), (_, b)) =>
      math.abs(a - b) }.max
    assert(maxDelta < 20000000L, s"maxDelta=$maxDelta")
  }

  test("kcoreFixpoint reaches the true k-core and equals the unrolled form") {
    val (report, rounds) = WarehouseOps.kcoreFixpoint(spark, Sf, maxRounds = 50)
    assert(rounds < 50, s"rounds=$rounds") // converged, not capped
    val viaLoop = report.collect().map(r => (r.getLong(0), r.getLong(1)))
    val unrolled = WarehouseOps.kcoreReport(
        WarehouseOps.kcoreEdgesAfter(spark, Sf, rounds))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaLoop.sameElements(unrolled))
    // fixpoint stability: one more peel round changes nothing
    val onceMore = WarehouseOps.kcoreReport(
        WarehouseOps.kcoreEdgesAfter(spark, Sf, rounds + 1))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaLoop.sameElements(onceMore))
    // every survivor really has >= K neighbors in the survivor graph
    assert(viaLoop.forall(_._2 >= 8))
  }

  test("labelPropFixpoint equals the unrolled form at its stopping round") {
    val (report, rounds) = WarehouseOps.labelPropFixpoint(spark, Sf,
      maxRounds = 30)
    assert(rounds > 0, s"rounds=$rounds")
    val viaLoop = report.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val unrolled = WarehouseOps.labelPropReport(
        WarehouseOps.labelPropLabels(spark, Sf, rounds))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(viaLoop.sameElements(unrolled))
    if (rounds < 30) {
      // converged: one more round reproduces the same communities
      val onceMore = WarehouseOps.labelPropReport(
          WarehouseOps.labelPropLabels(spark, Sf, rounds + 1))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(viaLoop.sameElements(onceMore))
    }
  }

  test("bfsFixpoint exhausts the frontier and equals the unrolled form") {
    val (dist, rounds) = WarehouseOps.bfsFixpoint(spark, Sf, maxRounds = 50)
    assert(rounds > 0 && rounds < 50, s"rounds=$rounds") // STOPPED, not capped
    val viaLoop = dist.collect().map(r => (r.getLong(0), r.getLong(1)))
    val unrolled = WarehouseOps.bfsHopsAfter(spark, Sf, rounds)
      .select(col("n").as("part_id"), col("hop")).orderBy("part_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaLoop.sameElements(unrolled))
    // fixpoint stability: one more relaxation round changes nothing —
    // every reachable node already holds its true hop distance
    val onceMore = WarehouseOps.bfsHopsAfter(spark, Sf, rounds + 1)
      .select(col("n").as("part_id"), col("hop")).orderBy("part_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaLoop.sameElements(onceMore))
  }

  test("ssspFixpoint reaches true shortest paths and equals the unrolled form") {
    val (dist, rounds) = WarehouseOps.ssspFixpoint(spark, Sf, maxRounds = 100)
    assert(rounds > 0 && rounds < 100, s"rounds=$rounds")
    val viaLoop = dist.collect().map(r => (r.getLong(0), r.getLong(1)))
    val unrolled = WarehouseOps.ssspCostsAfter(spark, Sf, rounds)
      .select(col("n").as("part_id"), col("cost")).orderBy("part_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaLoop.sameElements(unrolled))
    // Bellman-Ford termination certificate: a further round improves
    // no cost, so triangle inequality holds on every edge
    val onceMore = WarehouseOps.ssspCostsAfter(spark, Sf, rounds + 1)
      .select(col("n").as("part_id"), col("cost")).orderBy("part_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaLoop.sameElements(onceMore))
    // weighted distances refine the unweighted BFS reachability: the
    // same node set is reached (same seeds, same adjacency support)
    assert(viaLoop.forall(_._2 >= 0L))
  }

  test("hitsFixpoint equals the unrolled form at its stopping round") {
    val (auths, iters) = WarehouseOps.hitsFixpoint(spark, Sf,
      epsFp = 5000L, maxIters = 30)
    assert(iters > 1 && iters < 30, s"iters=$iters") // STOPPED, not capped
    val viaLoop = auths.orderBy("p").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val unrolled = WarehouseOps.hitsAuthsAfter(spark, Sf, iters)
      .orderBy("p").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaLoop.sameElements(unrolled))
    // and the stopping rule held: one more iteration moves every
    // authority score < eps
    val more = WarehouseOps.hitsAuthsAfter(spark, Sf, iters + 1)
      .orderBy("p").collect().map(r => (r.getLong(0), r.getLong(1)))
    val maxDelta = viaLoop.zip(more).map { case ((_, a), (_, b)) =>
      math.abs(a - b) }.max
    assert(maxDelta < 5000L, s"maxDelta=$maxDelta")
  }
}
