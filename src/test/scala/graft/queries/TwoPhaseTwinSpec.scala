package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.{SparkTestBase, Tables}

/** In-Spark A/B twins for the round-11 two-phase reworks: each
  * registered query's scalable plan (bucketed two-phase ranking /
  * prefix sums / bounded heaps / histogram identities) is compared
  * ROW-FOR-ROW against the superseded single-window spelling, built
  * inline here exactly as the query used to be written. The DuckDB
  * oracle already proves cross-engine equality at sf0.01; this spec
  * pins the intra-Spark claim the rework rests on — "offset + local
  * rank IS the global rank", "the heap equals the window under the
  * total order", "Σ rank·x aggregates from the histogram" — against
  * the window semantics themselves, including every tie the corpus
  * produces. All comparisons are exact (the derived doubles are
  * functions of identical integers on both sides). */
class TwoPhaseTwinSpec extends SparkTestBase {

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  private def assertTwin(name: String, reworked: DataFrame,
      windowed: DataFrame): Unit = {
    val a = rows(reworked)
    val b = rows(windowed)
    assert(a == b, s"$name: two-phase result diverged from its " +
      s"single-window twin\n  two-phase: ${a.take(5)}\n  window: ${b.take(5)}")
    assert(a.nonEmpty, s"$name: twin comparison ran on empty output")
  }

  test("q195 two-phase global row numbering equals the partition-less " +
    "window form (both layouts, all predicates)") {
    val li = Tables.lineitem(spark, Sf)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
    def blocks(layout: String, ord: Seq[org.apache.spark.sql.Column]) = li
      .withColumn("rn", row_number().over(Window.orderBy(ord: _*)))
      .withColumn("blk", expr("(rn - 1) div 1000"))
      .groupBy("blk")
      .agg(min(col("l_shipdate")).as("lo"), max(col("l_shipdate")).as("hi"),
        count(lit(1)).as("n_rows"))
      .withColumn("layout", lit(layout))
    val stats = blocks("natural", Seq(col("l_orderkey"), col("l_linenumber")))
      .unionByName(blocks("clustered",
        Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))))
    val preds = Seq(
      ("p1_1996h1", "1996-01-01", "1996-07-01"),
      ("p2_1997jan", "1997-01-01", "1997-02-01"),
      ("p3_1995q1", "1995-01-01", "1995-04-01"),
      ("p4_2001", "2001-01-01", "2002-01-01"))
    val predDf = spark.range(1).select(explode(array(preds.map {
      case (n, lo, hi) => struct(lit(n).as("pred"),
        lit(lo).cast("timestamp").as("plo"),
        lit(hi).cast("timestamp").as("phi"))
    }: _*)).as("pr")).select(col("pr.*"))
    val skipped = col("hi") < col("plo") || col("lo") >= col("phi")
    val windowed = stats.crossJoin(broadcast(predDf))
      .groupBy("layout", "pred")
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(skipped, 1L).otherwise(0L)).as("blocks_skipped"),
        sum(when(skipped, col("n_rows")).otherwise(0L)).as("rows_skipped"),
        sum(col("n_rows")).as("rows_total"))
      .withColumn("skip_ppm", expr("rows_skipped * 1000000 div rows_total"))
      .orderBy("layout", "pred")
    assertTwin("q195", WarehouseOps.q195Zonemap(spark, Sf), windowed)
  }

  test("q104 heap-ranked Zipf head equals the per-lang window form") {
    val d = (c: org.apache.spark.sql.Column) => c.cast(DoubleType)
    val lnQ = (c: org.apache.spark.sql.Column) =>
      floor(log(d(c)) * 1e6).cast(LongType)
    val norm = (c: org.apache.spark.sql.Column) =>
      trim(regexp_replace(lower(c), "\\s+", " "))
    val ranked = Tables.documents(spark, Sf)
      .select(col("lang"), explode(split(norm(col("text")), " ")).as("t"))
      .groupBy("lang", "t").agg(count(lit(1)).as("c"))
      .withColumn("r", row_number().over(
        Window.partitionBy("lang").orderBy(col("c").desc, col("t"))))
      .filter(col("r") <= 1000)
      .select(col("lang"), lnQ(col("r")).as("x"), lnQ(col("c")).as("y"))
    val det = d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))
    val cov = d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))
    val windowed = ranked.groupBy("lang")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("lang"), col("n").as("n_terms"),
        (cov / nullif(det, lit(0.0))).as("slope"),
        ((d(col("sy")) - (cov / nullif(det, lit(0.0))) * d(col("sx"))) /
          d(col("n"))).as("intercept"),
        ((cov * cov) / nullif(det *
          (d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy"))),
          lit(0.0))).as("r2"))
      .orderBy("lang")
    assertTwin("q104", CorpusOps.q104ZipfFit(spark, Sf), windowed)
  }

  test("q105 heap-selected weighted sample equals the per-lang window " +
    "form") {
    val norm = (c: org.apache.spark.sql.Column) =>
      trim(regexp_replace(lower(c), "\\s+", " "))
    val u = (conv(substring(md5(norm(col("text"))), 1, 8), 16, 10)
      .cast(LongType) + 1).cast(DoubleType) / lit(4294967296.0)
    val key = -log(u) / nullif(col("n_chars"), lit(0L)).cast(DoubleType)
    val windowed = Tables.documents(spark, Sf)
      .select(col("lang"), col("doc_id"), col("n_chars"), key.as("k"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("lang").orderBy(col("k"), col("doc_id"))))
      .filter(col("rank") <= 5)
      .select(col("lang"), col("rank"), col("doc_id"), col("n_chars"))
      .orderBy("lang", "rank")
    assertTwin("q105", CorpusOps.q105WeightedSample(spark, Sf), windowed)
  }

  test("q210 heap-ranked heavy hitters equal the per-lang window form") {
    val counts = Tables.documents(spark, Sf)
      .select(col("lang"),
        explode(split(lower(col("text")), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("lang", "token").agg(count(lit(1)).as("cnt"))
    val windowed = counts
      .withColumn("rank", row_number().over(Window.partitionBy("lang")
        .orderBy(col("cnt").desc, col("token"))).cast(LongType))
      .filter(col("rank") <= 8)
      .select("lang", "rank", "token", "cnt")
      .orderBy("lang", "rank")
    assertTwin("q210", TextOps.q210HeavyHittersExact(spark, Sf), windowed)
  }

  test("q72 two-phase prefix sums equal the per-lang window cumsum") {
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val windowed = Tables.documents(spark, Sf)
      .select(col("lang"), col("doc_id"),
        size(split(col("text"), "\\s+")).cast("long").as("tok"))
      .withColumn("cum", sum(col("tok")).over(w))
      .select(col("lang"), col("doc_id"), col("tok"), col("cum"),
        floor((col("cum") - col("tok")) / 512).as("pack_id"))
      .orderBy("lang", "doc_id")
    assertTwin("q72", TextOps.q72SequencePacking(spark, Sf), windowed)
  }

  test("q161 histogram-identity Gini equals the per-document rank " +
    "window form") {
    val w = Window.partitionBy("lang").orderBy("x", "doc_id")
    val windowed = Tables.documents(spark, Sf)
      .select(col("lang"), col("doc_id"),
        col("n_chars").cast(LongType).as("x"))
      .select(col("lang"), col("x"),
        row_number().over(w).cast(LongType).as("rk"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("x")).as("total_chars"),
        sum(col("rk") * col("x")).as("srx"))
      .select(col("lang"), col("n_docs"), col("total_chars"),
        ((lit(2L) * col("srx")
          - (col("n_docs") + 1L) * col("total_chars")).cast(DoubleType)
          / (col("n_docs") * col("total_chars"))).as("gini"))
      .orderBy("lang")
    assertTwin("q161", CorpusOps.q161GiniLengths(spark, Sf), windowed)
  }

  test("q155 bucketed two-phase AUC ranks equal the per-fold window " +
    "form") {
    val scored = Tables.embeddings(spark, Sf)
      .select((col("vec_id") % 5).cast("int").as("fold"),
        element_at(col("embedding"), 1).cast(DoubleType).as("x"),
        (col("label").cast("int") >= 5).cast("long").as("y"))
    val wRank = Window.partitionBy("fold").orderBy("x")
    val wTies = Window.partitionBy("fold", "x")
    val windowed = scored
      .select(col("fold"), col("y"),
        (lit(2L) * rank().over(wRank)
          + count(lit(1)).over(wTies) - 1).as("ar2"))
      .groupBy("fold")
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
        sum(when(col("y") === 1, col("ar2")).otherwise(0L)).as("sum2_pos"))
      .select(col("fold"), col("n"), col("n_pos"), col("sum2_pos"),
        ((col("sum2_pos") - col("n_pos") * (col("n_pos") + 1))
          .cast(DoubleType)
          / (lit(2.0) * col("n_pos") * (col("n") - col("n_pos"))))
          .as("auc"))
      .orderBy("fold")
    assertTwin("q155", MlOps.q155RocAuc(spark, Sf), windowed)
  }

  // ---- round-11 follow-through: the ANN-family rank reworks (the
  // census's last standing collapse — per-query_id/anchor_id windows
  // over corpus-sized scored-candidate frames). One twin per heap
  // path: TopKByScoreRow (q40, shared by q41/q51/q110/q207 via
  // topKPerGroup), BottomKByScore-per-group (q148), BottomKByKeyRow
  // (q229).

  test("q40 heap-ranked cosine top-10 equals the per-query window form") {
    val emb = Tables.embeddings(spark, Sf)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val cands = emb.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("cand_id"), col("label"),
        col("embedding").as("c_emb"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("cand_id"))
    val windowed = cands.crossJoin(broadcast(queries))
      .select(col("query_id"), col("cand_id"), col("label"),
        VectorOps.cosineNative(spark, col("q_emb"), col("c_emb")).as("sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .select("query_id", "rk", "cand_id", "label", "sim")
      .orderBy("query_id", "rk")
    assertTwin("q40", VectorOps.q40CosineTopK(spark, Sf), windowed)
  }

  test("q148 composed shortlist+rerank (two-phase bucketed shortlist " +
    "rank + heap top-10) equals the naive double-window form") {
    // the superseded single-window spelling of BOTH stages (r13: q148
    // became the composed tier — Hamming shortlist of corpus-scaled
    // width, then exact cosine re-rank): shortlist = row_number by
    // (hamming, cand_id), re-rank = row_number by (sim desc, cand_id)
    val emb = Tables.embeddings(spark, Sf)
    val n = emb.filter(col("embedding").isNotNull).count()
    val nCand = math.max(50L, math.ceil(n / 5.0).toLong)
    def half(lo: Int): org.apache.spark.sql.Column =
      (0 until 32).map(i =>
        when(element_at(col("embedding"), lo + i + 1) >= 0f,
          lit(1L << i)).otherwise(lit(0L)))
        .reduce((a, b) => a.bitwiseOR(b))
    val sigs = emb.select(col("vec_id"), col("embedding"),
      half(0).as("lo"), half(32).as("hi"))
    val queries = sigs.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("lo").as("q_lo"), col("hi").as("q_hi"))
    val cands = sigs.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("cand_id"), col("embedding").as("c_emb"),
        col("lo"), col("hi"))
    val wShort = Window.partitionBy("query_id")
      .orderBy(col("hamming"), col("cand_id"))
    val short = cands.crossJoin(broadcast(queries))
      .select(col("query_id"), col("cand_id"), col("q_emb"), col("c_emb"),
        (bit_count(col("q_lo").bitwiseXOR(col("lo")))
          + bit_count(col("q_hi").bitwiseXOR(col("hi")))).as("hamming"))
      .withColumn("hrk", row_number().over(wShort))
      .filter(col("hrk") <= nCand)
    val wRerank = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("cand_id"))
    val windowed = short
      .select(col("query_id"), col("cand_id"), col("hamming"),
        VectorOps.cosineNative(spark, col("q_emb"), col("c_emb")).as("sim"))
      .withColumn("rk", row_number().over(wRerank))
      .filter(col("rk") <= 10)
      .select("query_id", "rk", "cand_id", "hamming", "sim")
      .orderBy("query_id", "rk")
    assertTwin("q148", VectorOps.q148HammingTopK(spark, Sf), windowed)
  }

  test("q229 heap-selected negatives equal the per-anchor window form") {
    val emb = Tables.embeddings(spark, Sf)
    val anchors = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("anchor_id"),
        col("label").as("anchor_label"))
    val cands = emb.select(col("vec_id").as("cand_id"),
      col("label").as("cand_label"))
    val windowed = cands.crossJoin(broadcast(anchors))
      .filter(col("cand_label") =!= col("anchor_label"))
      .withColumn("sk", md5(concat(col("anchor_id").cast("string"),
        lit(":"), col("cand_id").cast("string"))))
      .withColumn("rk", row_number().over(
        Window.partitionBy("anchor_id").orderBy(col("sk"), col("cand_id")))
        .cast(LongType))
      .filter(col("rk") <= 3)
      .select(col("anchor_id"), col("rk"), col("cand_id"),
        col("cand_label"))
      .orderBy("anchor_id", "rk")
    assertTwin("q229", CorpusOps.q229NegativeSampling(spark, Sf), windowed)
  }

  // ---- round-11 follow-through: the exact-percentile reworks
  // (single-buffer aggregate → ExactQuantiles two-phase histogram
  // ranks). ExactQuantilesSpec pins the operator's formula-level
  // bit-equality; these twins pin each REGISTERED query end-to-end
  // against its superseded single-buffer spelling.

  test("q50 two-phase exact percentiles equal the single-buffer " +
    "aggregate form") {
    val windowed = Tables.orders(spark, Sf)
      .groupBy("o_orderstatus")
      .agg(expr("percentile(o_totalprice, 0.25)").as("p25"),
        expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.75)").as("p75"),
        expr("median(o_totalprice)").as("med"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")
    assertTwin("q50", Relational.q50Percentiles(spark, Sf), windowed)
  }

  test("q154 decile bins off two-phase boundaries equal the " +
    "array-percentile aggregate form") {
    val scored = Tables.embeddings(spark, Sf)
      .select(col("vec_id"),
        element_at(col("embedding"), 1).cast(DoubleType).as("x"),
        (col("label").cast("int") >= 5).cast("int").as("y"))
    val bounds = scored.agg(expr(
      "percentile(x, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))").as("bs"))
    val windowed = scored.crossJoin(broadcast(bounds))
      .select(col("y"),
        aggregate(col("bs"), lit(0),
          (acc, b) => acc + when(col("x") > b, 1).otherwise(0)).as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("y")).cast("long").as("n_pos"))
      .select(col("bin"), col("n"), col("n_pos"),
        (col("n_pos").cast(DoubleType) / col("n")).as("pos_rate"))
      .orderBy("bin")
    assertTwin("q154", VectorOps.q154Calibration(spark, Sf), windowed)
  }

  test("q159 confusion cells off the two-phase median equal the " +
    "single-buffer form") {
    val scored = Tables.embeddings(spark, Sf)
      .select(element_at(col("embedding"), 1).cast(DoubleType).as("x"),
        (col("label").cast("int") >= 5).cast("int").as("y"))
    val thr = scored.agg(expr("percentile(x, 0.5)").as("thr"))
    val cells = scored.crossJoin(broadcast(thr))
      .select(col("y"), (col("x") > col("thr")).cast("int").as("p"))
      .agg(
        sum(when(col("y") === 1 && col("p") === 1, 1L).otherwise(0L)).as("tp1"),
        sum(when(col("y") === 0 && col("p") === 1, 1L).otherwise(0L)).as("fp1"),
        sum(when(col("y") === 1 && col("p") === 0, 1L).otherwise(0L)).as("fn1"),
        sum(when(col("y") === 0 && col("p") === 0, 1L).otherwise(0L)).as("tn1"))
    val pos = cells.select(lit(1).as("cls"), col("tp1").as("tp"),
      col("fp1").as("fp"), col("fn1").as("fn"))
    val neg = cells.select(lit(0).as("cls"), col("tn1").as("tp"),
      col("fn1").as("fp"), col("fp1").as("fn"))
    val d = (c: org.apache.spark.sql.Column) => c.cast(DoubleType)
    val windowed = pos.unionAll(neg)
      .select(col("cls"), col("tp"), col("fp"), col("fn"),
        (d(col("tp")) / (col("tp") + col("fp"))).as("precision"),
        (d(col("tp")) / (col("tp") + col("fn"))).as("recall"),
        (lit(2.0) * (d(col("tp")) / (col("tp") + col("fp")))
          * (d(col("tp")) / (col("tp") + col("fn")))
          / ((d(col("tp")) / (col("tp") + col("fp")))
            + (d(col("tp")) / (col("tp") + col("fn"))))).as("f1"))
      .orderBy("cls")
    assertTwin("q159", MlOps.q159ClassMetrics(spark, Sf), windowed)
  }

  test("q132 winsorization off two-phase disc cut points equals the " +
    "single-SQL-text form (the oracle's exact text, run by Spark)") {
    val windowed = SqlOps.q132WinsorizeSqlForm(spark, Sf)
    assertTwin("q132", SqlOps.q132Winsorize(spark, Sf), windowed)
  }

  test("q160 MAD fences off two-phase medians equal the single-buffer " +
    "form") {
    val ev = Tables.events(spark, Sf)
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        floor(col("value") * 100).cast("long").as("fv"))
    val med = ev.groupBy("event_type")
      .agg(expr("percentile(fv, 0.5)").as("med"))
    val dev = ev.join(broadcast(med), "event_type")
      .select(col("event_type"), col("med"),
        abs(col("fv").cast(DoubleType) - col("med")).as("dev"))
    val mad = dev.groupBy("event_type")
      .agg(expr("percentile(dev, 0.5)").as("mad"))
    val windowed = dev.join(broadcast(mad), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        count_if(col("dev") > lit(3.0) * lit(1.4826) * col("mad"))
          .as("n_outliers"),
        (min(col("med")) / 1e2).as("median_value"),
        (min(col("mad")) / 1e2).as("mad_value"))
      .orderBy("event_type")
    assertTwin("q160", EventOps.q160RobustOutliers(spark, Sf), windowed)
  }

  test("q153 bucketed two-phase quantile ranks equal the per-dim " +
    "window form") {
    val n = Tables.embeddings(spark, Sf).count()
    val el = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "x")))
    val w = Window.partitionBy("i").orderBy(col("x"), col("vec_id"))
    val windowed = el
      .select(col("vec_id"), (rank().over(w) - 1).cast("long").as("rk"))
      .groupBy("vec_id")
      .agg(sum(col("rk")).as("sum_rank"),
        min(col("rk")).as("min_rank"), max(col("rk")).as("max_rank"))
      .select(col("vec_id"), col("sum_rank"), col("min_rank"),
        col("max_rank"),
        (col("sum_rank").cast(DoubleType) / lit(64.0)
          / lit((n - 1).toDouble)).as("mean_quantile"))
      .orderBy("vec_id")
    assertTwin("q153", VectorOps.q153QuantileNorm(spark, Sf), windowed)
  }
}
