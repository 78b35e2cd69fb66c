package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Semantic properties of the CorpusOps surface (the oracle gate checks
  * value equality with DuckDB; these check the operators MEAN what they
  * claim). */
class CorpusOpsSpec extends SparkTestBase {

  test("q100 shard assignment is total, stable, and content-addressed") {
    val docs = graft.Tables.documents(spark, Sf)
    val rep = CorpusOps.q100ShardAssign(spark, Sf).collect()
    // every document lands in exactly one shard
    assert(rep.map(_.getLong(1)).sum == docs.count())
    assert(rep.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 64))
    // independent recomputation is byte-identical (content-addressed:
    // no RNG, no partition dependence)
    val again = CorpusOps.q100ShardAssign(spark, Sf).collect()
    assert(rep.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("q101 redaction leaves no matchable PII behind") {
    val out = CorpusOps.q101PiiRedact(spark, Sf)
    val leftover = out.filter(
      col("redacted").rlike("[a-z0-9.]+@[a-z0-9.-]+\\.[a-z]{2,}") ||
      col("redacted").rlike("\\b\\d{3}-555-\\d{4}\\b") ||
      col("redacted").rlike("\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"))
    assert(leftover.count() == 0)
    // and each constructed message contained exactly one of each class
    assert(out.filter(col("n_emails") =!= 1 || col("n_phones") =!= 1)
      .count() == 0)
    assert(out.filter(!col("redacted").contains("<EMAIL>") ||
      !col("redacted").contains("<PHONE>") ||
      !col("redacted").contains("<IP>")).count() == 0)
  }

  test("q102 entropy is 0 for single-type docs and ≤ ln(n_types)") {
    val out = CorpusOps.q102TokenEntropy(spark, Sf)
      .select("doc_id", "n_types", "entropy").collect()
    out.foreach { r =>
      val (types, ent) = (r.getLong(1), r.getDouble(2))
      if (types == 1L) assert(math.abs(ent) < 1e-5)
      // uniform distribution maximizes entropy at ln(n_types); the
      // quantized computation can overshoot by at most ~2e-6
      assert(ent <= math.log(types.toDouble) + 1e-5)
      assert(ent >= -1e-5)
    }
  }

  test("q103 per-dim quantization error is bounded by half a step") {
    val out = CorpusOps.q103EmbedQuant(spark, Sf)
      .select("n_dims", "max_abs", "err_scaled").collect()
    out.foreach { r =>
      val (n, maxAbs, err) = (r.getInt(0), r.getDouble(1), r.getLong(2))
      if (maxAbs > 0) {
        // q = floor(x·scale + ½) ⇒ |x − q/scale| ≤ (1/2)/scale per dim
        val bound = n * (maxAbs / 127.0 / 2.0) * 1e9 + n // +n: floor slack
        assert(err <= bound, s"err=$err bound=$bound")
      }
    }
  }

  test("q104 Zipf slope is negative with meaningful fit on every lang") {
    val out = CorpusOps.q104ZipfFit(spark, Sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getDouble(2) < 0.0, s"slope ${r.getDouble(2)} not negative")
      val r2 = r.getDouble(4)
      assert(r2 > 0.0 && r2 <= 1.0 + 1e-12)
    }
  }

  test("q105 weighted sample is deterministic and ranked per language") {
    val a = CorpusOps.q105WeightedSample(spark, Sf).collect()
    val b = CorpusOps.q105WeightedSample(spark, Sf).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    // exactly ranks 1..k per language, k ≤ 5
    a.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val ranks = rows.map(_.getInt(1)).sorted.toSeq
      assert(ranks == (1 to ranks.size))
    }
  }

  test("heap family null contract: q105's sentinel idiom round-trips a " +
    "NULL payload; a raw NULL payload silently reads as 0 (the hazard)") {
    import spark.implicits._
    val bottomk = udaf(graft.functions.BottomKByScore(3),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[graft.functions.ScoredRow]())
    val df = Seq(("en", 1L, Some(10L), 0.3), ("en", 2L, None, 0.1),
      ("en", 3L, Some(30L), 0.2), ("en", 4L, Some(5L), 0.9))
      .toDF("lang", "doc_id", "n_chars", "k")
    // the registered q105 shape: payload behind Long.MinValue, NULL
    // restored on output — ranks exactly like the window twin that
    // passed nulls through
    val out = df.groupBy("lang")
      .agg(bottomk(col("k"), col("doc_id"),
        coalesce(col("n_chars"), lit(Long.MinValue))).as("top"))
      .select(posexplode(col("top")).as(Seq("pos0", "e")))
      .select((col("pos0") + 1).as("rank"), col("e.id").as("doc_id"),
        nullif(col("e.payload"), lit(Long.MinValue)).as("n_chars"))
      .orderBy("rank").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(2L, 3L, 1L))
    assert(out(0).isNullAt(2), "NULL payload must round-trip as NULL")
    assert(out.drop(1).map(_.getLong(2)).toSeq == Seq(30L, 10L))
    // contract half: a raw NULL slot under a primitive entry field is
    // read as 0 — SILENTLY (no error anywhere) — which is exactly why
    // the family's scaladoc makes null mapping the caller's job
    // (ScoredRow doc); pin the hazard so it can't be re-discovered
    val raw = df.groupBy("lang")
      .agg(bottomk(col("k"), col("doc_id"), col("n_chars")).as("top"))
      .select(explode(col("top")).as("e"))
      .filter(col("e.id") === 2L).select(col("e.payload")).collect()
    assert(raw.map(_.getLong(0)).toSeq == Seq(0L),
      "a raw NULL payload silently deserializes to 0 — callers must " +
        "sentinel-coalesce (this pin failing means Spark's encoder " +
        "behavior changed: revisit the family contract)")
  }

  test("q107 cross-entropy is non-negative and repetition scores lowest") {
    val rows = CorpusOps.q107BigramLm(spark, Sf)
      .select("doc_id", "n_bigrams", "xent").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // xent = avg(ln c1 − ln c12) with c12 ≤ c1; quantization can dip
      // at most 1e-6 per bigram below zero
      assert(r.getDouble(2) >= -1e-5, s"doc ${r.getLong(0)} xent negative")
      assert(!r.getDouble(2).isNaN && !r.getDouble(2).isInfinite)
    }
    // a corpus-unique natural doc must outscore a doc made of one
    // repeated bigram — check the property on the real corpus: the
    // min-xent doc has lower type/token diversity than the max-xent doc
    val ent = CorpusOps.q102TokenEntropy(spark, Sf)
      .select("doc_id", "ttr").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val lo = rows.minBy(_.getDouble(2)).getLong(0)
    val hi = rows.maxBy(_.getDouble(2)).getLong(0)
    assert(ent(lo) <= ent(hi),
      s"min-xent doc $lo has higher TTR than max-xent doc $hi")
  }

  test("q140 corpus diff accounts for every v1 and v2 document") {
    val rows = CorpusOps.q140CorpusDiff(spark, Sf).collect()
    val byStatus = rows.groupBy(_.getAs[String]("status"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    assert(byStatus.keySet.subsetOf(
      Set("added", "removed", "modified", "unchanged")))
    val nV1 = graft.Tables.documents(spark, Sf)
      .filter(col("text").isNotNull).count()
    // v1 = removed + modified + unchanged (added rows are v2-only)
    assert(byStatus.getOrElse("removed", 0L)
      + byStatus.getOrElse("modified", 0L)
      + byStatus.getOrElse("unchanged", 0L) == nV1)
    assert(byStatus.getOrElse("added", 0L) > 0)
    assert(byStatus.getOrElse("modified", 0L) > 0)
  }

  test("q145 PSI detects the planted drift and covers all bins") {
    val rows = CorpusOps.q145DriftPsi(spark, Sf).collect()
    assert(rows.length == 8, "one row per length bin")
    val psi = rows.head.getAs[Long]("psi_scaled")
    assert(rows.forall(_.getAs[Long]("psi_scaled") == psi),
      "psi_scaled must be the same window total on every row")
    // v2 drops 5% and pads 10% of texts — the length distribution DID
    // shift, so the index must be strictly positive
    assert(psi > 0L, s"planted drift not detected: psi_scaled=$psi")
    val n1 = rows.map(_.getAs[Long]("n_v1")).sum
    val nDocs = graft.Tables.documents(spark, Sf)
      .filter(col("text").isNotNull).count()
    assert(n1 == nDocs, "v1 bins must partition the corpus")
  }

  test("q146 split is leakage-safe: every content fingerprint maps to ONE split") {
    import org.apache.spark.sql.functions.{countDistinct, md5}
    val docs = graft.Tables.documents(spark, Sf)
      .filter(col("text").isNotNull)
      .select(md5(trim(regexp_replace(lower(col("text")), "\\s+", " ")))
        .as("fp"))
    // replicate the split rule per doc, then demand one split per fp
    val withSplit = docs.withColumn("h",
      expr("conv(substring(md5(concat('split:', fp)), 1, 8), 16, 10)")
        .cast("long") % 100)
      .withColumn("split",
        when(col("h") < 80, "train").when(col("h") < 90, "val")
          .otherwise("test"))
    val maxSplits = withSplit.groupBy("fp")
      .agg(countDistinct(col("split")).as("k"))
      .agg(max(col("k"))).first().getLong(0)
    assert(maxSplits == 1L, "a fingerprint straddles splits — leakage")
    // and the aggregate's totals cover every doc exactly once
    val total = CorpusOps.q146TrainSplit(spark, Sf)
      .agg(sum(col("n_docs"))).first().getLong(0)
    assert(total == docs.count())
  }

  test("q105 weighting favors longer documents") {
    // Efraimidis–Spirakis with w = n_chars: the selected docs' mean
    // length should exceed the corpus mean (a weak but deterministic
    // check — the sample is fixed given the data)
    val docs = graft.Tables.documents(spark, Sf)
    val corpusMean = docs.agg(avg(col("n_chars"))).first().getDouble(0)
    val sampleMean = CorpusOps.q105WeightedSample(spark, Sf)
      .agg(avg(col("n_chars"))).first().getDouble(0)
    assert(sampleMean > corpusMean * 0.9,
      s"sample mean $sampleMean vs corpus mean $corpusMean")
  }

  test("q156 collocations: lift identity holds against recounted marginals") {
    val rows = CorpusOps.q156Collocations(spark, Sf).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    // recount the bigram universe independently (same normalization)
    val toks = graft.Tables.documents(spark, Sf)
      .select(split(trim(regexp_replace(lower(col("text")), "\\s+", " ")),
        " ").as("t"))
      .filter(size(col("t")) >= 2)
      .collect().map(_.getSeq[String](0))
    val pairs = toks.flatMap(t => t.sliding(2).map(p => (p(0), p(1))))
    val n = pairs.length.toLong
    val c12 = pairs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val c1 = pairs.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val c2 = pairs.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    rows.foreach { r =>
      val (w1, w2) = (r.getAs[String]("w1"), r.getAs[String]("w2"))
      assert(r.getAs[Long]("c12") == c12((w1, w2)))
      assert(r.getAs[Long]("c1") == c1(w1))
      assert(r.getAs[Long]("c2") == c2(w2))
      assert(r.getAs[Long]("c12") >= 5L)
      val lift = r.getAs[Double]("lift")
      assert(lift == c12((w1, w2)).toDouble * n / (c1(w1) * c2(w2)))
    }
    // descending lift with (w1, w2) tiebreak — the contract order
    val lifts = rows.map(_.getAs[Double]("lift")).toSeq
    assert(lifts == lifts.sorted(Ordering[Double].reverse))
  }

  test("q161 Gini matches a brute-force replica and stays in [0, 1)") {
    val data = graft.Tables.documents(spark, Sf)
      .select("lang", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getAs[Number](2).longValue))
    val rows = CorpusOps.q161GiniLengths(spark, Sf).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == data.length)
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val xs = data.filter(_._1 == lang).sortBy(t => (t._3, t._2)).map(_._3)
      val n = xs.length.toLong
      val tot = xs.sum
      val srx = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      assert(r.getAs[Long]("n_docs") == n)
      assert(r.getAs[Long]("total_chars") == tot)
      val gini = (2.0 * srx - (n + 1) * tot) / (n.toDouble * tot)
      val got = r.getAs[Double]("gini")
      assert(math.abs(got - gini) < 1e-12, s"$lang: $got vs $gini")
      assert(got >= 0.0 && got < 1.0)
    }
  }

  test("q164 DSIR: target-domain docs dominate the selected batch") {
    // the importance weight is the log-likelihood ratio between the
    // target ('en') bucket LM and the raw-corpus LM — so docs whose
    // hashed-bigram profile matches the target must rank above the
    // rest. Sanity: the top-50 skews 'en' beyond the corpus base rate,
    // weights are monotone non-increasing, and n_bigrams is positive.
    val rows = CorpusOps.q164DsirWeights(spark, Sf).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    val ws = rows.map(_.getAs[Long]("weight_scaled"))
    assert(ws.zip(ws.tail).forall { case (a, b) => a >= b }, "not sorted")
    assert(rows.forall(_.getAs[Long]("n_bigrams") > 0))
    val docs = graft.Tables.documents(spark, Sf)
      .filter(col("text").isNotNull)
    val baseRate = docs.filter(col("lang") === "en").count().toDouble /
      docs.count()
    val selRate = rows.count(_.getAs[String]("lang") == "en").toDouble /
      rows.length
    assert(selRate > baseRate,
      s"DSIR must up-select the target domain: $selRate <= $baseRate")
  }

  test("q175 compaction plan: full coverage, next-fit bin bound holds") {
    val rows = CorpusOps.q175CompactionPlan(spark, Sf).collect()
    val nDocs = graft.Tables.documents(spark, Sf).count()
    assert(rows.length == nDocs, "every document must be assigned once")
    val byBin = rows.groupBy(r =>
      (r.getAs[String]("source"), r.getAs[Long]("bin_id")))
    byBin.foreach { case ((src, bin), g) =>
      val fill = g.head.getAs[Long]("bin_bytes")
      assert(fill == g.map(_.getAs[Long]("n_chars")).sum)
      // next-fit bound: a bin exceeds the target by at most its own
      // last (smallest, given the desc sort) item
      val maxItem = g.map(_.getAs[Long]("n_chars")).max
      assert(fill <= 4000L + maxItem, s"$src bin $bin overfull: $fill")
    }
    // bins are contiguous from 0 within each source
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, g) =>
      val bins = g.map(_.getAs[Long]("bin_id")).distinct.sorted
      assert(bins.sameElements(0L until bins.length.toLong),
        s"$src bins not contiguous: ${bins.mkString(",")}")
    }
  }

  test("q176 largest-remainder allocation is exact and proportional") {
    val rows = CorpusOps.q176StratifiedAlloc(spark, Sf).collect()
    val total = rows.map(_.getAs[Long]("alloc")).sum
    assert(total == 1000L, s"allocation must sum to the budget: $total")
    val cTotal = rows.map(_.getAs[Long]("n_docs")).sum
    rows.foreach { r =>
      val fl = 1000L * r.getAs[Long]("n_docs") / cTotal
      val a = r.getAs[Long]("alloc")
      assert(a == fl || a == fl + 1,
        s"${r.getAs[String]("lang")}: alloc $a outside [floor, floor+1]")
    }
    // replica: full largest-remainder method in Scala
    val want = {
      val base = rows.map(r => (r.getAs[String]("lang"),
        r.getAs[Long]("n_docs")))
      val floored = base.map { case (l, n) =>
        (l, n, 1000L * n / cTotal, 1000L * n % cTotal) }
      val leftover = 1000L - floored.map(_._3).sum
      val bump = floored.sortBy(t => (-t._4, t._1)).take(leftover.toInt)
        .map(_._1).toSet
      floored.map(t => t._1 -> (t._3 + (if (bump(t._1)) 1L else 0L))).toMap
    }
    rows.foreach(r => assert(
      r.getAs[Long]("alloc") == want(r.getAs[String]("lang"))))
  }

  // ---------------------------------------------------------------- q179

  test("q179 rank fusion: bm25 ranks agree with q131, fused score exact") {
    val bm = CorpusOps.q131Bm25(spark, Sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_fp")))
    val rankA = bm.sortBy { case (id, sc) => (-sc, id) }.take(200)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    val out = CorpusOps.q179RankFusion(spark, Sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val ra = Option(r.getAs[java.lang.Long]("r_bm25")).map(_.toLong)
      // a doc carries a bm25 rank iff it made ranker A's top-K, and the
      // rank must equal its position in q131's (score desc, id) order
      assert(ra == rankA.get(id))
      val rb = Option(r.getAs[java.lang.Long]("r_tfidf")).map(_.toLong)
      assert(ra.isDefined || rb.isDefined)
      val want = ra.map(x => 1000000000L / (60 + x)).getOrElse(0L) +
        rb.map(x => 1000000000L / (60 + x)).getOrElse(0L)
      assert(r.getAs[Long]("rrf_fp") == want)
    }
    // fused order is (rrf desc, doc_id) — the contract ordering
    val sc = out.map(r => (r.getAs[Long]("rrf_fp"), r.getAs[Long]("doc_id")))
    assert(sc.sameElements(sc.sortBy { case (v, id) => (-v, id) }))
  }

  test("q188 feature hashing conserves token mass and bounds buckets") {
    val rows = CorpusOps.q188FeatureHash(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getAs[Long]("b")
      assert(b >= 0 && b < 64)
      // a bucket can't hold more distinct terms than total tokens
      assert(r.getAs[Long]("n_terms") >= 1 &&
        r.getAs[Long]("n_terms") <= r.getAs[Long]("n_tokens"))
    }
    // mass conservation: bucketed token counts sum to the corpus total
    val total = graft.Tables.documents(spark, Sf)
      .filter(col("text").isNotNull)
      .select(explode(split(trim(regexp_replace(lower(col("text")),
        "\\s+", " ")), " ")).as("tok"))
      .filter(col("tok") =!= "").count()
    val perLang = rows.groupBy(_.getAs[String]("lang"))
      .view.mapValues(_.map(_.getAs[Long]("n_tokens")).sum).toMap
    assert(perLang.values.sum == total)
    // hashing is deterministic: identical re-run, bit for bit
    val again = CorpusOps.q188FeatureHash(spark, Sf).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }
}
