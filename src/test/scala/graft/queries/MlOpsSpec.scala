package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** k-means (q135) and the round-6 curation additions (q136–q138) on
  * sf0.001. */
class MlOpsSpec extends SparkTestBase {

  test("q135 kmeans: clusters partition the corpus") {
    val nVecs = graft.Tables.embeddings(spark, Sf)
      .filter(col("embedding").isNotNull).count()
    val rows = MlOps.q135Kmeans(spark, Sf).collect()
    assert(rows.nonEmpty && rows.length <= 8)
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == nVecs)
    assert(rows.forall(_.getAs[Long]("inertia") >= 0))
  }

  test("q135 kmeans: bit-deterministic across runs") {
    val a = MlOps.q135Kmeans(spark, Sf).collect().toSeq
    val b = MlOps.q135Kmeans(spark, Sf).collect().toSeq
    assert(a == b)
  }

  test("q135 kmeans: Lloyd iterations do not increase inertia") {
    // floor-quantized centroids re-land on the integer grid, so each
    // update minimizes within one quantization step of the true mean —
    // allow that slack, require the big-picture decrease
    def inertia(rounds: Int): Long = {
      val (_, _, asg) = MlOps.kmeansState(spark, Sf, rounds)
      asg.agg(sum(col("nc.dist"))).collect()(0).getLong(0)
    }
    val (i1, i2, i3) = (inertia(1), inertia(2), inertia(3))
    assert(i2 <= (i1 * 1.001).toLong, s"round 2 inertia rose: $i1 -> $i2")
    assert(i3 <= (i2 * 1.001).toLong, s"round 3 inertia rose: $i2 -> $i3")
  }

  test("q135 kmeans: kernel assignment equals brute-force argmin") {
    val (cids, cents, asg) = MlOps.kmeansState(spark, Sf, 3)
    val rows = asg.select(col("q"), col("nc.cid"), col("nc.dist")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val q = r.getSeq[Long](0).toArray
      val got = (r.getInt(1), r.getLong(2))
      val want = cids.zip(cents).map { case (cid, c) =>
        var s = 0L
        var i = 0
        while (i < math.min(q.length, c.length)) {
          val t = q(i) - c(i); s += t * t; i += 1
        }
        (s, cid)
      }.min
      assert(got == ((want._2, want._1)),
        s"kernel ${got} != brute-force ${(want._2, want._1)}")
    }
  }

  private def recallAt10(df: org.apache.spark.sql.DataFrame): Double = {
    val exact = VectorOps.q40CosineTopK(spark, Sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("cand_id")).toSet).toMap
    val got = df.collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("cand_id")).toSet).toMap
    assert(exact.nonEmpty && exact.values.forall(_.size == 10))
    exact.map { case (q, truth) =>
      truth.intersect(got.getOrElse(q, Set.empty)).size.toDouble / truth.size
    }.sum / exact.size
  }

  test("q139 trained IVF: probing every list IS the exact top-k") {
    assert(recallAt10(MlOps.annIvfTrained(spark, Sf, nprobe = 8, k = 10)) == 1.0)
  }

  test("q139 trained IVF clears the recall gate at nprobe=2") {
    val r = recallAt10(MlOps.q139AnnIvfTrained(spark, Sf))
    assert(r >= 0.4, s"recall@10 = $r < 0.4")
  }

  test("q162 IVF→PQ→re-rank: probe-all + full shortlist IS the exact top-k") {
    // with every list probed and a shortlist bigger than the corpus,
    // the PQ stage filters nothing it shouldn't and the exact re-rank
    // must reproduce brute force bit-for-bit (same sim ordering)
    val n = graft.Tables.embeddings(spark, Sf).count().toInt
    val r = recallAt10(MlOps.ivfPqAnn(spark, Sf, nprobe = 8,
      shortlist = n, k = 10))
    assert(r == 1.0, s"exact configuration lost recall: $r")
  }

  test("q162 IVF→PQ→re-rank clears the recall gate as registered") {
    // the composed pipeline adds PQ lossiness ON TOP of the q139
    // coarse filter, but the exact re-rank recovers ordering inside
    // the shortlist — hold it to the same gate as q139
    val r = recallAt10(MlOps.q162IvfPqAnn(spark, Sf))
    assert(r >= 0.4, s"recall@10 = $r < 0.4")
  }

  test("q162 shortlist bounds candidates per query (ADC prunes)") {
    // k=10 from a 40-candidate shortlist: no query may return more
    // than 10 rows, and every returned pair must come from the probed
    // shortlist — i.e. output is (query × ≤k), never corpus-shaped
    val rows = MlOps.q162IvfPqAnn(spark, Sf).collect()
    val perQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(perQ.nonEmpty)
    perQ.foreach { case (q, rs) =>
      assert(rs.length <= 10, s"query $q returned ${rs.length} rows")
      val rks = rs.map(_.getAs[Int]("rk")).sorted.toSeq
      assert(rks == (1 to rs.length), s"query $q ranks not dense: $rks")
    }
  }

  test("q136 span dedup: planted 8-token duplicate span is found") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_span").toString
    val base = graft.Tables.documents(spark, Sf)
    val span = "alpha beta gamma delta epsilon zeta eta theta"
    val planted = spark.createDataFrame(Seq(
      (9000001L, s"prefix one $span suffix one", "en", "test", 1L),
      (9000002L, s"other lead-in $span and more text", "en", "test", 1L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    base.unionByName(planted).write.parquet(s"$dir/documents.parquet")
    val rows = CorpusOps.q136SpanDedup(spark, dir).collect()
    val md5Span = java.security.MessageDigest.getInstance("MD5")
      .digest(span.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val hit = rows.filter(_.getAs[String]("span_md5") == md5Span)
    assert(hit.length == 1, "planted span not reported")
    assert(hit(0).getAs[Long]("n_docs") == 2)
    assert(hit(0).getAs[Long]("min_doc") == 9000001L)
  }

  test("q137 k-anonymity: flags exactly the groups below k") {
    val rows = CorpusOps.q137KAnonymity(spark, Sf).collect()
    assert(rows.nonEmpty)
    val kAnon = rows.map(_.getAs[Long]("grp_n")).min
    rows.foreach { r =>
      assert(r.getAs[Long]("k_anonymity") == kAnon)
      assert((r.getAs[Int]("is_risky") == 1) == (r.getAs[Long]("grp_n") < 5))
    }
  }

  test("q138 mixture: rates flatten the language distribution") {
    val rows = CorpusOps.q138MixtureSample(spark, Sf).collect()
    assert(rows.nonEmpty)
    val byLang = rows.map(r => r.getAs[String]("lang") ->
      (r.getAs[Long]("n_docs"), r.getAs[Long]("rate_ppm"),
        r.getAs[Long]("n_kept"))).toMap
    byLang.values.foreach { case (n, ppm, kept) =>
      assert(ppm >= 0 && ppm <= 1000000L)
      assert(kept <= n)
    }
    // temperature < 1 keeps a LARGER fraction of smaller languages
    val sorted = byLang.values.toSeq.sortBy(_._1)
    val (nSmall, ppmSmall, _) = sorted.head
    val (nBig, ppmBig, _) = sorted.last
    if (nSmall < nBig) assert(ppmSmall >= ppmBig,
      s"small lang rate $ppmSmall < big lang rate $ppmBig")
  }

  test("q155 AUC: matches the brute-force pair count per fold") {
    val rows = MlOps.q155RocAuc(spark, Sf).collect()
    assert(rows.map(_.getAs[Int]("fold")).sorted.toSeq == (0 to 4))
    // ground truth: AUC = P(score_pos > score_neg) + 0.5 P(tie),
    // counted over every (pos, neg) pair — O(n²) is fine at sf0.001
    val data = graft.Tables.embeddings(spark, Sf)
      .select((col("vec_id") % 5).cast("int").as("fold"),
        element_at(col("embedding"), 1).cast("double").as("x"),
        (col("label").cast("int") >= 5).as("y"))
      .collect()
      .map(r => (r.getAs[Int]("fold"), r.getAs[Double]("x"),
        r.getAs[Boolean]("y")))
    assert(rows.map(_.getAs[Long]("n")).sum == data.length)
    rows.foreach { r =>
      val fold = r.getAs[Int]("fold")
      val pos = data.collect { case (f, x, true) if f == fold => x }
      val neg = data.collect { case (f, x, false) if f == fold => x }
      assert(r.getAs[Long]("n_pos") == pos.length)
      // exact: wins + half-ties over the pos×neg grid, doubled to int
      val wins2 = (for (p <- pos; q <- neg) yield
        if (p > q) 2L else if (p == q) 1L else 0L).sum
      val auc = r.getAs[Double]("auc")
      val brute = wins2.toDouble / (2.0 * pos.length * neg.length)
      assert(math.abs(auc - brute) < 1e-12, s"fold $fold: $auc vs $brute")
      assert(auc >= 0.0 && auc <= 1.0)
    }
  }

  test("q158 target encoding matches a brute-force replica of the split") {
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val brandOf = graft.Tables.part(spark, Sf)
      .select("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val train = graft.Tables.lineitem(spark, Sf)
      .select("l_orderkey", "l_partkey", "l_returnflag").collect()
      .filter { r =>
        val h = java.lang.Long.parseLong(
          md5hex("tenc:" + r.getLong(0)).take(8), 16)
        h % 100 < 80
      }
      .map(r => (brandOf(r.getLong(1)), if (r.getString(2) == "R") 1L else 0L))
    val nTot = train.length.toLong
    val yTot = train.map(_._2).sum
    val byBrand = train.groupBy(_._1)
    val rows = MlOps.q158TargetEncode(spark, Sf).collect()
    assert(rows.length == byBrand.size)
    rows.foreach { r =>
      val b = r.getAs[String]("p_brand")
      val g = byBrand(b)
      val (n, np) = (g.length.toLong, g.map(_._2).sum)
      assert(r.getAs[Long]("n_train") == n)
      assert(r.getAs[Long]("n_pos") == np)
      val enc = (np.toDouble + 10.0 * (yTot.toDouble / nTot)) / (n + 10.0)
      assert(r.getAs[Double]("enc") == enc, s"brand $b")
      // shrinkage: encoding sits between the brand rate and global rate
      val lo = math.min(np.toDouble / n, yTot.toDouble / nTot)
      val hi = math.max(np.toDouble / n, yTot.toDouble / nTot)
      assert(enc >= lo - 1e-12 && enc <= hi + 1e-12)
    }
  }

  test("q159 class metrics match a brute-force confusion matrix") {
    val data = graft.Tables.embeddings(spark, Sf)
      .select(element_at(col("embedding"), 1).cast("double").as("x"),
        (col("label").cast("int") >= 5).as("y"))
      .collect().map(r => (r.getDouble(0), r.getBoolean(1)))
    // interpolated median, the `percentile(x, 0.5)` definition
    val sorted = data.map(_._1).sorted
    val idx = 0.5 * (sorted.length - 1)
    val l = idx.toInt
    val thr = sorted(l) + (idx - l) * (sorted(math.min(l + 1,
      sorted.length - 1)) - sorted(l))
    val tp1 = data.count { case (x, y) => y && x > thr }.toLong
    val fp1 = data.count { case (x, y) => !y && x > thr }.toLong
    val fn1 = data.count { case (x, y) => y && x <= thr }.toLong
    val tn1 = data.count { case (x, y) => !y && x <= thr }.toLong
    val rows = MlOps.q159ClassMetrics(spark, Sf).collect()
      .map(r => r.getAs[Int]("cls") ->
        (r.getAs[Long]("tp"), r.getAs[Long]("fp"), r.getAs[Long]("fn"),
          r.getAs[Double]("precision"), r.getAs[Double]("recall"),
          r.getAs[Double]("f1"))).toMap
    assert(rows(1)._1 == tp1 && rows(1)._2 == fp1 && rows(1)._3 == fn1)
    assert(rows(0)._1 == tn1 && rows(0)._2 == fn1 && rows(0)._3 == fp1)
    rows.values.foreach { case (tp, fp, fn, p, r, f1) =>
      assert(p == tp.toDouble / (tp + fp))
      assert(r == tp.toDouble / (tp + fn))
      val want = 2.0 * (tp.toDouble / (tp + fp)) * (tp.toDouble / (tp + fn)) /
        ((tp.toDouble / (tp + fp)) + (tp.toDouble / (tp + fn)))
      assert(f1 == want && f1 >= 0.0 && f1 <= 1.0)
    }
  }
}
