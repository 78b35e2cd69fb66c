package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Round-3 extended surface: semantic invariants the DuckDB oracle
  * can't express (fixpoint properties, agreement with built-ins). */
class ExtendedOpsSpec extends SparkTestBase {

  test("q60 sufficient-statistics corr agrees with the built-in corr") {
    val ours = ExtendedOps.q60StatsAgg(spark, Sf)
      .select("l_returnflag", "corr_qp", "stddev_qty").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val builtin = graft.Tables.lineitem(spark, Sf)
      .groupBy("l_returnflag")
      .agg(corr(floor(col("l_quantity")),
        floor(col("l_extendedprice") * 100)).as("c"),
        stddev_samp(floor(col("l_quantity"))).as("sd"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(ours.keySet == builtin.keySet)
    ours.foreach { case (k, (c, sd)) =>
      assert(math.abs(c - builtin(k)._1) < 1e-9, s"corr mismatch for $k")
      assert(math.abs(sd - builtin(k)._2) < 1e-9, s"stddev mismatch for $k")
    }
  }

  test("q67 cluster labels are a fixpoint of the pair graph") {
    val labels = ExtendedOps.q67DedupClusters(spark, Sf)
    val byDoc = labels.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // label is the min doc_id of its cluster and a member of it
    byDoc.foreach { case (doc, c) =>
      assert(c <= doc)
      assert(byDoc(c) == c, s"cluster rep $c is not its own representative")
    }
    // every near-dup pair's endpoints carry the same label (fixpoint)
    val pairs = TextOps.ngramJaccardPairs(spark, Sf, 0.5)
      .select("id_a", "id_b").collect()
    pairs.foreach { r =>
      assert(byDoc(r.getLong(0)) == byDoc(r.getLong(1)),
        s"pair ${r.getLong(0)},${r.getLong(1)} split across clusters")
    }
  }

  test("connectedComponents with a reliable checkpoint dir matches localCheckpoint") {
    // the 100 TB fault-tolerance path: same labels, different barrier.
    // The reliable run survives executor loss (lineage is on storage,
    // not in executor memory) — here we assert result equivalence and
    // that the checkpoint dir was actually used
    val pairs = TextOps.ngramJaccardPairs(spark, Sf, 0.5).select("id_a", "id_b")
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val local = ExtendedOps.connectedComponents(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val reliable = ExtendedOps.connectedComponents(pairs, Some(ckptDir)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(local == reliable)
    val written = java.nio.file.Files.walk(java.nio.file.Paths.get(ckptDir))
      .filter(java.nio.file.Files.isRegularFile(_)).count()
    assert(written > 0, "reliable checkpoint wrote nothing")
  }

  test("q66 date spine is gap-free and contiguous per customer") {
    val rows = ExtendedOps.q66DateSpine(spark, Sf).collect()
    val byCust = rows.groupBy(_.getLong(0))
    byCust.foreach { case (_, rs) =>
      val months = rs.map(_.getTimestamp(1).toLocalDateTime).sortBy(_.toString)
      months.sliding(2).foreach {
        case Array(a, b) => assert(a.plusMonths(1) == b, s"gap between $a and $b")
        case _ =>
      }
    }
    // gap months exist and carry zero counts
    assert(rows.exists(_.getLong(2) == 0L), "expected zero-activity months")
  }

  test("q63 fuzzy pairs are blocked, ordered, within threshold") {
    val rows = ExtendedOps.q63FuzzyMatch(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) < r.getLong(2))
      assert(r.getInt(3) >= 1 && r.getInt(3) <= 2)
    }
  }

  test("q61 top tokens are count-descending with tie-break on token") {
    val rows = ExtendedOps.q61TopTokens(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length == 20)
    rows.sliding(2).foreach {
      case Array((ta, ca), (tb, cb)) =>
        assert(ca > cb || (ca == cb && ta < tb))
      case _ =>
    }
  }

  test("q59 grouping sets: grand total matches table count") {
    val rows = ExtendedOps.q59GroupingSets(spark, Sf).collect()
    val total = rows.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(total.length == 1)
    assert(total.head.getLong(3) == graft.Tables.lineitem(spark, Sf).count())
  }

  test("q124 HLL sketches: estimates near exact, union consistent with one scan") {
    import org.apache.spark.sql.functions._
    val rows = ExtendedOps.q124HllSketch(spark, Sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactPer = graft.Tables.orders(spark, Sf)
      .groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("d")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exactPer.foreach { case (g, exact) =>
      val est = rows(g)
      assert(math.abs(est - exact) <= math.max(3L, (exact * 0.05).toLong),
        s"$g: est $est vs exact $exact")
    }
    val exactAll = graft.Tables.orders(spark, Sf)
      .select(countDistinct(col("o_custkey"))).collect().head.getLong(0)
    assert(math.abs(rows("ALL") - exactAll) <=
      math.max(3L, (exactAll * 0.05).toLong))
    // the union of per-group sketches equals a direct one-scan sketch
    val direct = graft.Tables.orders(spark, Sf)
      .select(expr("hll_sketch_estimate(hll_sketch_agg(o_custkey))"))
      .collect().head.getLong(0)
    assert(rows("ALL") == direct, "sketch union diverged from direct sketch")
  }

  test("q84 GK sketch percentiles stay within the eps*n rank bound of exact") {
    // GK guarantee at accuracy a: the returned value is an actual input
    // element whose rank is within n/a of the target rank. q50 is the
    // exact twin; this quantifies the last un-gated rows-only sketch.
    val eps = 1.0 / 1000 // accuracy literal in q84
    val approx = ExtendedOps.q84ApproxPercentiles(spark, Sf).collect()
      .map(r => r.getString(0) ->
        (Seq(0.25 -> r.getDouble(1), 0.5 -> r.getDouble(2),
          0.75 -> r.getDouble(3)), r.getLong(4))).toMap
    val vals = graft.Tables.orders(spark, Sf)
      .select("o_orderstatus", "o_totalprice").collect()
      .groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getDouble(1)).sorted }
    approx.foreach { case (st, (ps, n)) =>
      val v = vals(st)
      assert(v.length == n)
      ps.foreach { case (q, a) =>
        // rank interval of the returned value in the exact sorted data
        val lo = v.count(_ < a) + 1
        val hi = v.count(_ <= a)
        assert(hi >= lo, s"$st p$q: approx value $a is not an input element")
        // the sketch targets integer rank ceil(q*n) with an integer
        // error budget ceil(eps*n) (the summary quantizes both)
        val target = math.ceil(q * n)
        val err = math.ceil(eps * n)
        assert(lo - err <= target && target <= hi + err,
          s"$st p$q: value $a rank [$lo,$hi] vs target $target (n=$n)")
      }
    }
  }

  test("jaro_winkler kernel matches the published reference values") {
    import org.apache.spark.unsafe.types.UTF8String
    val k = graft.functions.JaroWinkler(null, null)
    def jw(a: String, b: String): Double =
      k.compute(UTF8String.fromString(a), UTF8String.fromString(b))
    // classic literature pairs — exact doubles DuckDB also returns
    assert(jw("MARTHA", "MARHTA") == 0.9611111111111111)
    assert(jw("DWAYNE", "DUANE") == 0.8400000000000001)
    assert(jw("DIXON", "DICKSONX") == 0.8133333333333332)
    // boost threshold: jaro == 2/3 <= 0.7, prefix 3 must NOT boost
    assert(jw("abcdef", "abcxyz") == 0.6666666666666666)
    // odd transposition count floors (t = 3/2 -> 1), prefix 0
    assert(jw("abcdef", "bcadef") == 0.9444444444444445)
    // DuckDB edge semantics: empty strings are 0-similar, even to
    // each other; identical strings are 1
    assert(jw("", "") == 0.0 && jw("", "abc") == 0.0)
    assert(jw("abc", "abc") == 1.0 && jw("a", "b") == 0.0)
    // symmetry
    assert(jw("DIXON", "DICKSONX") == jw("DICKSONX", "DIXON"))
  }

  test("q165 JW pairs: blocked, ordered, threshold respected") {
    val rows = ExtendedOps.q165JaroWinkler(spark, Sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"))
      val jw = r.getAs[Double]("jw")
      assert(jw >= 0.88 && jw <= 1.0)
    }
  }

  // ---------------------------------------------------------------- q180

  test("q180 skyline matches the O(n²) dominance definition per brand") {
    val parts = graft.Tables.part(spark, Sf)
      .select("p_brand", "p_partkey", "p_retailprice", "p_size").collect()
      .map(r => (r.getAs[String]("p_brand"), r.getAs[Long]("p_partkey"),
        math.floor(r.getAs[Double]("p_retailprice") * 100).toLong,
        r.getAs[Int]("p_size")))
    val want = parts.filter { case (b, k, pc, sz) =>
      !parts.exists { case (b2, k2, pc2, sz2) =>
        b2 == b && k2 != k && pc2 <= pc && sz2 >= sz &&
          (pc2 < pc || sz2 > sz)
      }
    }.map(t => (t._1, t._2)).toSet
    val got = ExtendedOps.q180Skyline(spark, Sf).collect()
      .map(r => (r.getAs[String]("p_brand"), r.getAs[Long]("p_partkey")))
    assert(got.toSet == want, s"${got.length} frontier vs ${want.size}")
    assert(got.length == got.toSet.size) // no duplicate emissions
  }

  // ---------------------------------------------------------------- q184

  test("q184 clusters match 3 rounds of min-label propagation over q165 matches") {
    // q165 (oracle-verified) at >= 0.92 IS q184's match graph
    val m = ExtendedOps.q165JaroWinkler(spark, Sf).collect()
      .filter(_.getAs[Double]("jw") >= 0.92)
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    val und = m.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
    val nodes = und.map(_._1).distinct
    val nbrs = und.groupBy(_._1).map { case (n, v) => n -> v.map(_._2) }
    var lbl = nodes.map(n => n -> n).toMap
    for (_ <- 1 to 3)
      lbl = nodes.map(n => n -> (nbrs(n).map(lbl) :+ lbl(n)).min).toMap
    val want = lbl.groupBy(_._2).map { case (c, v) =>
      (c, v.size.toLong, v.keys.max)
    }.toSet
    val got = ExtendedOps.q184EntityResolution(spark, Sf).collect()
      .map(r => (r.getAs[Long]("cluster_id"), r.getAs[Long]("n_members"),
        r.getAs[Long]("max_id"))).toSet
    assert(got == want, s"${got.size} clusters vs ${want.size}")
    // canonical ids: every cluster id is its own minimum member
    got.foreach { case (c, n, mx) => assert(c <= mx && n >= 1) }
  }
}
