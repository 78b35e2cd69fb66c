package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Round-9 retrieval/sketch family: SemDeDup (q211), ColBERT MaxSim
  * (q212), nDCG@10 (q213), Count-Min (q214). Each is oracle-verified
  * end-to-end by the driver; these specs pin the properties the hash
  * compare can't state — guarantees, internal consistency, and
  * brute-force equivalence of the composed plans. */
class RetrievalOpsSpec extends SparkTestBase {

  test("q211 semdedup: every drop points at a lower-id same-cluster " +
    "neighbor and matches the brute-force pair set") {
    val rows = VectorOps.q211SemDedup(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("dup_of") < r.getAs[Long]("vec_id"))
      assert(r.getAs[Double]("best_sim") >= 0.35)
      assert(r.getAs[Long]("n_dups") >= 1L)
    }
    // brute force via the declarative (non-native) cosine: identical
    // dropped-set — the label-join plan loses nothing vs all-pairs
    val emb = graft.Tables.embeddings(spark, Sf)
    val a = emb.select(col("label"), col("vec_id"), col("embedding").as("ae"))
    val b = emb.select(col("label").as("bl"), col("vec_id").as("b_id"),
      col("embedding").as("be"))
    val brute = a.crossJoin(b)
      .filter(col("label") === col("bl") && col("b_id") < col("vec_id"))
      .filter(VectorOps.cosine(col("ae"), col("be")) >= 0.35)
      .select("vec_id").distinct().collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getAs[Long]("vec_id")).toSet === brute)
  }

  test("q212 maxsim: scores match a per-label brute-force recompute " +
    "and ranks are a dense permutation") {
    val got = VectorOps.q212MaxSim(spark, Sf).collect()
    assert(got.nonEmpty)
    assert(got.map(_.getAs[Int]("rk")).sorted.toSeq === (1 to got.length))
    // every label's score: sum over the 8 query tokens of its best
    // cosine, recomputed with the declarative fold + the same
    // floor-scaled integer sum
    val emb = graft.Tables.embeddings(spark, Sf)
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("tok_id"), col("embedding").as("qe"))
    val c = emb.filter(col("vec_id") >= 8)
      .select(col("label"), col("embedding").as("ce"))
    val brute = c.crossJoin(q)
      .groupBy("label", "tok_id")
      .agg(max(VectorOps.cosine(col("qe"), col("ce"))).as("m"))
      .groupBy("label")
      .agg((sum(floor(col("m") * lit(1e9))) / lit(1e9)).as("s"))
      .collect().map(r => r.getAs[Int]("label") ->
        r.getAs[Double]("s")).toMap
    got.foreach { r =>
      assert(r.getAs[Double]("maxsim") === brute(r.getAs[Int]("label")))
    }
  }

  test("q213 ndcg: bounded in [0,1], hits consistent with q40's " +
    "top-10, and perfect-ranking queries score exactly 1") {
    val emb = graft.Tables.embeddings(spark, Sf)
    val qlab = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("label").as("ql"))
    val hits = VectorOps.q40CosineTopK(spark, Sf)
      .join(qlab, Seq("query_id"))
      .groupBy("query_id")
      .agg(sum((col("label") === col("ql")).cast("int")).as("h"))
      .collect().map(r => r.getAs[Long]("query_id") ->
        r.getAs[Long]("h")).toMap
    val rows = VectorOps.q213Ndcg(spark, Sf).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val nd = r.getAs[Double]("ndcg")
      assert(nd >= 0.0 && nd <= 1.0)
      assert(r.getAs[Long]("hits") === hits(r.getAs[Long]("query_id")))
      // hits all ranked at the top ⇒ DCG = IDCG exactly (same scaled
      // integer terms), so a contiguous-prefix ranking must emit 1.0
      val prefix = (1L to r.getAs[Long]("hits"))
      if (r.getAs[Long]("hits") > 0 && {
        val got = VectorOps.q40CosineTopK(spark, Sf)
          .join(qlab, Seq("query_id"))
          .filter(col("query_id") === r.getAs[Long]("query_id"))
          .filter(col("label") === col("ql"))
          .select("rk").collect().map(_.getAs[Int]("rk").toLong).sorted.toSeq
        got === prefix
      }) assert(nd === 1.0)
    }
  }

  test("q214 count-min: never undercounts and the min-over-depths " +
    "estimate sits within the e/w error budget") {
    val rows = TextOps.q214CountMin(spark, Sf).collect()
    assert(rows.length === 20)
    val n = graft.Tables.documents(spark, Sf)
      .select(explode(split(lower(col("text")), "\\s+")).as("t"))
      .filter(col("t") =!= "").count()
    rows.foreach { r =>
      val over = r.getAs[Long]("overest")
      assert(over >= 0L, s"CMS undercounted ${r.getAs[String]("token")}")
      // Markov bound per depth is N·e/w; min over 4 depths leaves huge
      // slack on this fixed corpus (measured overest is 0 throughout)
      assert(over <= math.ceil(n * math.E / 256).toLong)
    }
  }

  test("q215 cdc chunking: bytes reconcile exactly and chunking is " +
    "robust to an offset shift (fixed-size blocking is not)") {
    val rows = CorpusOps.q215CdcChunks(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_chunks"))
      assert(r.getAs[Long]("dup_bytes") < r.getAs[Long]("chunk_bytes"))
    }
    // Σ chunk bytes per source == Σ document bytes per source: the
    // spans tile every document exactly (no gaps, no overlaps)
    val docBytes = graft.Tables.documents(spark, Sf)
      .groupBy("source").agg(sum(length(col("text"))).as("b"))
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Long]("b")).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("chunk_bytes") ===
        docBytes(r.getAs[String]("source")))
    }
    // the CDC property: prepend one char to every document and most
    // chunk hashes SURVIVE — boundaries re-synchronize one window
    // after the edit, so only the head chunk (and the 1-in-16 tail
    // merges it causes) changes. A fixed-size blocker would lose
    // every chunk. ≥60% survival is far below observed, far above
    // what offset-shifted fixed blocks could achieve (~0%).
    val docs = graft.Tables.documents(spark, Sf)
      .select(col("doc_id"), col("source"), col("text"))
    val orig = CorpusOps.cdcChunkFrame(docs)
      .groupBy("chunk").count()
    val shifted = CorpusOps.cdcChunkFrame(
      docs.withColumn("text", concat(lit("X"), col("text"))))
      .groupBy("chunk").count().withColumnRenamed("count", "count2")
    val joined = orig.join(shifted, Seq("chunk"))
      .select(least(col("count"), col("count2")).as("kept"))
      .agg(sum("kept")).collect()(0).getLong(0)
    val total = orig.agg(sum("count")).collect()(0).getLong(0)
    assert(joined.toDouble / total >= 0.6,
      s"only $joined of $total chunks survived a 1-char shift")
  }

  test("q216 l-diversity: l bounded by group size, flags and global " +
    "min internally consistent") {
    val rows = CorpusOps.q216LDiversity(spark, Sf).collect()
    assert(rows.nonEmpty)
    val ls = rows.map(_.getAs[Long]("l"))
    rows.foreach { r =>
      assert(r.getAs[Long]("l") >= 1L)
      assert(r.getAs[Long]("l") <= r.getAs[Long]("grp_n"))
      assert(r.getAs[Int]("is_risky") === (if (r.getAs[Long]("l") < 3) 1 else 0))
      assert(r.getAs[Long]("l_diversity") === ls.min)
    }
  }

  test("q217 mmd matrix: all label pairs present, nonnegative, and " +
    "one pair re-derived from raw vectors driver-side matches") {
    val rows = VectorOps.q217MmdMatrix(spark, Sf).collect()
    val emb = graft.Tables.embeddings(spark, Sf)
      .select(col("label"), col("embedding")).collect()
      .groupBy(_.getAs[Int]("label"))
      .view.mapValues(_.map(_.getSeq[Float](1).toArray)).toMap
    val labels = emb.keySet.toSeq.sorted
    assert(rows.length === labels.size * (labels.size - 1) / 2)
    rows.foreach(r => assert(r.getAs[Double]("mmd2") >= 0.0))
    // independent recompute for the (smallest, largest) label pair
    // with the same quantization ladder, in plain driver-side Scala
    def means(vs: Array[Array[Float]]): Array[Double] =
      (0 until 64).map { d =>
        vs.map(v => math.floor(v(d).toDouble * 1e6).toLong).sum /
          (vs.length * 1e6)
      }.toArray
    val (la, lb) = (labels.head, labels.last)
    val (ma, mb) = (means(emb(la)), means(emb(lb)))
    val expect = (0 until 64).map { d =>
      math.floor((ma(d) - mb(d)) * (ma(d) - mb(d)) * 1e12).toLong
    }.sum / 1e12
    val got = rows.find(r => r.getAs[Int]("label_a") == la &&
      r.getAs[Int]("label_b") == lb).get.getAs[Double]("mmd2")
    assert(got === expect)
  }

  test("q218 rendezvous: expansion moves only what the new node wins, " +
    "and movers' destination IS the new node") {
    val rows = CorpusOps.q218Rendezvous(spark, Sf).collect()
    assert(rows.map(_.getAs[Int]("shard5")).sorted.toSeq === (0 until 5))
    val (docs, moved) = (rows.map(_.getAs[Long]("n_docs")).sum,
      rows.map(_.getAs[Long]("n_moved")).sum)
    // ~1/6 of keys move on a 5→6 expansion; mod-N would move ~5/6
    val frac = moved.toDouble / docs
    assert(frac > 0.05 && frac < 0.35, s"moved fraction $frac")
    // doc-level: a key either stays put or lands on the NEW node —
    // the defining minimal-disruption property of HRW
    val badMoves = CorpusOps.rendezvousPerDoc(spark, Sf)
      .filter(col("shard6") =!= col("shard5"))
      .filter(col("shard6") =!= 5).count()
    assert(badMoves === 0L,
      "a mover landed somewhere other than the new node")
  }

  test("q219 split leakage: matrix accounts for every near-dup pair " +
    "and the leaked flag marks exactly the off-diagonal") {
    val rows = CorpusOps.q219SplitLeakage(spark, Sf).collect()
    assert(rows.nonEmpty)
    val splits = Set("train", "val", "test")
    rows.foreach { r =>
      assert(splits(r.getAs[String]("split_a")))
      assert(splits(r.getAs[String]("split_b")))
      assert(r.getAs[Int]("leaked") ===
        (if (r.getAs[String]("split_a") != r.getAs[String]("split_b")) 1
         else 0))
    }
    val totalPairs = TextOps.ngramJaccardPairs(spark, Sf, 0.5).count()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum === totalPairs,
      "every near-dup pair must land in exactly one matrix cell")
  }

  test("q220 dp counts: release identity holds, noise is nonzero " +
    "and bounded") {
    val rows = CorpusOps.q220DpCounts(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, nm) = (r.getAs[Long]("n_docs"), r.getAs[Long]("noise_micro"))
      assert(r.getAs[Double]("released") === (n * 1e6 + nm) / 1e6)
      assert(nm !== 0L, "Laplace noise of exactly 0 is a hash bug")
      // P(|Lap(1)| > 20) ~ 2e-9 — on this fixed salt the draws are
      // single digits; 20 flags a broken inverse-CDF, not bad luck
      assert(math.abs(nm) < 20L * 1000000L)
      assert(r.getAs[Double]("epsilon") === 1.0)
    }
  }

  test("q221 compress ratio: codec contract — repetition compresses " +
    "into the boilerplate tail, hex noise into the noise tail") {
    val rows = CorpusOps.q221CompressRatio(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("avg_ratio_ppm") > 0L)
      assert(r.getAs[Long]("avg_ratio_ppm") < 1200000L)
      assert(r.getAs[Long]("n_boilerplate") +
        r.getAs[Long]("n_noise") <= r.getAs[Long]("n_docs"))
    }
    // behavioral contract of the signal itself, on constructed docs:
    // pure repetition lands deep in the boilerplate tail, digest-hex
    // "noise" text stays near-incompressible
    import spark.implicits._
    val synth = Seq(
      (1L, "en", "spam spam " * 60),
      (2L, "en", (1 to 60).map(i =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(i.toString.getBytes).map("%02x".format(_)).mkString)
        .mkString(" ")))
      .toDF("doc_id", "lang", "text")
    val lens = CorpusOps.withDeflateLen(synth).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("zip_len").toDouble / r.getAs[Int]("raw_len"))).toMap
    assert(lens(1L) < 0.45, s"repetition ratio ${lens(1L)} not boilerplate")
    assert(lens(2L) > 0.45, s"hex-noise ratio ${lens(2L)} too compressible")
  }

  test("q222 poisson bootstrap: CI brackets the full-data mean at a " +
    "width consistent with n") {
    val r = WarehouseOps.q222PoissonBootstrap(spark, Sf).collect()
    assert(r.length === 1)
    val (lo, hi, mean) = (r(0).getAs[Double]("ci_lo"),
      r(0).getAs[Double]("ci_hi"), r(0).getAs[Double]("mean_full"))
    assert(lo < mean && mean < hi,
      s"CI [$lo, $hi] must bracket the point estimate $mean")
    assert(r(0).getAs[Int]("n_resamples") === 100)
    // TPC-H acctbal is ~U(-999, 9999): sd ≈ 3175, so a 95% CI spans
    // roughly ±2·sd/√n. Allow [0.5×, 3×] of that — a resampler that
    // degenerates (width→0) or ignores n (width→sd) both fail.
    val n = r(0).getAs[Long]("n_rows").toDouble
    val expect = 2 * 2 * 3175.0 / math.sqrt(n)
    val width = hi - lo
    assert(width > expect * 0.25 && width < expect * 3.0,
      s"CI width $width vs expected ~$expect")
  }

  test("q223 hll: corpus lands in linear counting within 30%; a 20k " +
    "synthetic stream exercises the raw regime within 3 sigma") {
    val r = TextOps.q223HllTable(spark, Sf).collect()
    assert(r.length === 1)
    val (est, nTrue) = (r(0).getAs[Double]("est"), r(0).getAs[Long]("n_true"))
    assert(math.abs(est - nTrue) <= nTrue * 0.30,
      s"HLL est $est vs true $nTrue")
    assert(r(0).getAs[Long]("err_ppm") ===
      math.floor((est - nTrue.toDouble) / nTrue * 1e6).toLong)
    // raw-regime check: 20k distinct synthetic tokens (duplicated ×3 —
    // duplicates must not move a max-based sketch), σ = 1.04/√64
    import spark.implicits._
    val synth = spark.range(0, 20000).select(
      concat(lit("tok"), col("id")).as("token"))
      .union(spark.range(0, 20000).select(
        concat(lit("tok"), col("id")).as("token")))
      .union(spark.range(0, 20000).select(
        concat(lit("tok"), col("id")).as("token")))
    val raw = TextOps.hllTableOf(synth).collect()(0)
    val rawEst = raw.getAs[Double]("est")
    assert(raw.getAs[Double]("est_raw") === rawEst,
      "20k distinct must not fall into linear counting")
    assert(math.abs(rawEst - 20000) <= 20000 * (3 * 1.04 / 8),
      s"raw HLL estimate $rawEst vs 20000")
  }

  test("q224 jl audit: every pair accounted, ratios positive, mass " +
    "concentrated around 1 as the lemma promises") {
    val rows = VectorOps.q224JlAudit(spark, Sf).collect()
    val total = rows.map(_.getAs[Long]("n_pairs")).sum
    assert(total === 50L * 49 / 2, s"expected 1225 pairs, got $total")
    rows.foreach { r =>
      assert(r.getAs[Double]("min_ratio") > 0.0)
      assert(r.getAs[Double]("min_ratio") <= r.getAs[Double]("max_ratio"))
      // bucket must bracket its own min/max
      val bk = r.getAs[Long]("bucket")
      assert(math.floor(r.getAs[Double]("min_ratio") * 10).toLong === bk)
    }
    // E[ratio]=1, sd≈√(2/16)=0.35: the central [0.6, 1.4) buckets must
    // carry the bulk of the mass (≈68% theoretical; gate at 55%)
    val central = rows.filter(r => r.getAs[Long]("bucket") >= 6 &&
      r.getAs[Long]("bucket") <= 13).map(_.getAs[Long]("n_pairs")).sum
    assert(central.toDouble / total >= 0.55,
      s"only $central/$total pairs within ±0.4 of 1")
  }

  test("q225 fd audit: key-determined candidates at exactly 0 ppm, " +
    "independent pairs far above, keeps bounded by rows") {
    val rows = WarehouseOps.q225FdAudit(spark, Sf).collect()
      .map(r => r.getAs[String]("fd") -> r).toMap
    assert(rows.size === 5)
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_keep") <= r.getAs[Long]("n_rows"))
      assert(r.getAs[Long]("violations") ===
        r.getAs[Long]("n_rows") - r.getAs[Long]("n_keep"))
    }
    assert(rows("nation.n_nationkey->n_regionkey")
      .getAs[Long]("g3_ppm") === 0L)
    assert(rows("part.p_partkey->p_brand").getAs[Long]("g3_ppm") === 0L)
    assert(rows("customer.c_nationkey->c_mktsegment")
      .getAs[Long]("g3_ppm") > 100000L)
    assert(rows("part.p_brand->p_type").getAs[Long]("g3_ppm") > 100000L)
  }

  test("q226 ind audit: real star-schema edges cover fully, the decoy " +
    "does not") {
    val rows = WarehouseOps.q226IndAudit(spark, Sf).collect()
      .map(r => r.getAs[String]("ind") -> r).toMap
    assert(rows.size === 4)
    Seq("customer.c_nationkey<=nation.n_nationkey",
      "lineitem.l_orderkey<=orders.o_orderkey",
      "orders.o_custkey<=customer.c_custkey").foreach { k =>
      assert(rows(k).getAs[Long]("coverage_ppm") === 1000000L, k)
      assert(rows(k).getAs[Long]("n_uncovered") === 0L, k)
    }
    val decoy = rows("part.p_size<=nation.n_nationkey")
    assert(decoy.getAs[Long]("coverage_ppm") < 1000000L)
    assert(decoy.getAs[Long]("n_uncovered") > 0L)
  }

  test("q227 topk aggregate: bit-identical to the window form and " +
    "invariant under partitioning") {
    val viaAgg = TextOps.q227TopKPerGroup(spark, Sf).collect().map(_.toString)
    // window twin — the plan q227 exists to avoid
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("n_chars").desc, col("doc_id"))
    val viaWindow = graft.Tables.documents(spark, Sf)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("lang"), col("rank"), col("doc_id"),
        col("n_chars").cast("long").as("n_chars"))
      .orderBy("lang", "rank").collect().map(_.toString)
    assert(viaAgg.toSeq === viaWindow.toSeq)
    // merge associativity: the same answer regardless of how rows are
    // split across partitions (partial-aggregation correctness)
    val topk = udaf(graft.functions.TopKByScore(5),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[graft.functions.ScoredId]())
    def run(parts: Int) = graft.Tables.documents(spark, Sf)
      .repartition(parts)
      .groupBy("lang")
      .agg(topk(col("n_chars").cast("long"), col("doc_id")).as("top"))
      .select(col("lang"), col("top"))
      .collect().map(r => r.getAs[String]("lang") ->
        r.getSeq[org.apache.spark.sql.Row](1).map(_.toString).mkString(","))
      .toMap
    assert(run(1) === run(7))
  }

  test("q228 epoch shuffle: epochs are distinct permutations of the " +
    "same id space") {
    val rows = CorpusOps.q228EpochShuffle(spark, Sf).collect()
    val byEpoch = rows.groupBy(_.getAs[Int]("epoch"))
      .view.mapValues(_.sortBy(_.getAs[Long]("pos"))
        .map(_.getAs[Long]("doc_id")).toSeq).toMap
    assert(byEpoch.keySet === Set(0, 1, 2))
    byEpoch.values.foreach(ids => assert(ids.distinct.size === ids.size))
    // different epochs must produce different heads — identical
    // 10-prefixes across independently hashed epochs would be a
    // broken (epoch-insensitive) sort key
    assert(byEpoch(0) !== byEpoch(1))
    assert(byEpoch(1) !== byEpoch(2))
    // the SCALE contract: the heads come from the bounded-heap
    // aggregate, never a window over partitionBy(epoch) — 3 epochs
    // would collapse the whole corpus into 3 single-task sorts. The
    // executed plan must carry the udaf's object-hash aggregate and
    // contain NO window operator at all.
    val plan = CorpusOps.q228EpochShuffle(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"q228 must not rank via a window: $plan")
    assert(plan.contains("ObjectHashAggregate") &&
      plan.contains("bottomkbykey"),
      s"q228 must aggregate through BottomKByKey: $plan")
    // merge associativity of the heap: same heads no matter how rows
    // are split across partitions (partial-aggregation correctness)
    val bottomk = udaf(graft.functions.BottomKByKey(10),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[graft.functions.KeyedId]())
    def run(parts: Int) = graft.Tables.documents(spark, Sf)
      .select(col("doc_id"))
      .repartition(parts)
      .withColumn("sk", md5(concat(lit("0:"), col("doc_id").cast("string"))))
      .agg(bottomk(col("sk"), col("doc_id")).as("head"))
      .collect().map(_.getSeq[org.apache.spark.sql.Row](0)
        .map(_.toString).mkString(",")).toSeq
    assert(run(1) === run(7))
  }

  test("q229 negative sampling: negatives never share the anchor's " +
    "label and redraws are reproducible") {
    val rows = CorpusOps.q229NegativeSampling(spark, Sf).collect()
    val labels = graft.Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    assert(rows.groupBy(_.getAs[Long]("anchor_id")).forall(_._2.length == 3))
    rows.foreach { r =>
      assert(r.getAs[Int]("cand_label") !==
        labels(r.getAs[Long]("anchor_id")),
        s"negative shares anchor label for ${r.getAs[Long]("anchor_id")}")
    }
    val again = CorpusOps.q229NegativeSampling(spark, Sf).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("q230 novelty rate: both held-out splits reported with " +
    "internally consistent bounded counts") {
    val rows = CorpusOps.q230NoveltyRate(spark, Sf).collect()
      .map(r => r.getAs[String]("split") -> r).toMap
    assert(rows.keySet === Set("val", "test"))
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_novel") <= r.getAs[Long]("n_grams"))
      assert(r.getAs[Long]("n_distinct_novel") <= r.getAs[Long]("n_distinct"))
      // a novel distinct gram has ≥1 instance; a novel instance has a
      // novel distinct gram behind it
      assert((r.getAs[Long]("n_novel") > 0) ===
        (r.getAs[Long]("n_distinct_novel") > 0))
      assert(r.getAs[Long]("novelty_ppm") ===
        math.floor(r.getAs[Long]("n_novel").toDouble /
          r.getAs[Long]("n_grams") * 1e6).toLong)
    }
  }

  test("q230 Rabin gram identity is collision-free on the sf0.01 " +
    "corpus: distinct 41-bit keys == distinct string grams") {
    // r10 ADVICE: the 41-bit polynomial replacing the gram STRING as
    // the distinct/anti-join identity means a collision would
    // silently merge two distinct grams — and the oracle computes the
    // same polynomial, so the gate could never see it. This
    // cross-checks the key against raw string grams on the real
    // sf0.01 corpus (~1M+ gram instances): any collision shows up as
    // distinct(keys) < distinct(grams). The documented expectation is
    // <1 colliding pair at this scale; if corpus growth ever trips
    // this, widen the key (pair the polynomial with an independent
    // second hash) per the q230 docstring.
    val dir = "/root/testdata/sf0.01"
    graft.functions.GraftFunctions.register(spark)
    val n = graft.queries.TextOps.normText(col("text"))
    val docs = graft.Tables.documents(spark, dir)
      .filter(col("text").isNotNull).select(n.as("n"))
    val byKey = docs.select(
        explode(call_function("rabin_gram_keys", col("n"), lit(5)))
          .as("g"))
      .agg(countDistinct(col("g")), count(lit(1))).head()
    val byStr = docs
      .select(explode(when(length(col("n")) >= 5,
        sequence(lit(1), length(col("n")) - lit(4)))
        .otherwise(array())).as("i"), col("n"))
      .select(col("n").substr(col("i"), lit(5)).as("gram"))
      .agg(countDistinct(col("gram")), count(lit(1))).head()
    assert(byKey.getLong(1) === byStr.getLong(1),
      "kernel must emit exactly one key per gram instance")
    assert(byKey.getLong(0) === byStr.getLong(0),
      s"41-bit Rabin keys collided on the sf0.01 corpus: " +
        s"${byKey.getLong(0)} distinct keys vs ${byStr.getLong(0)} " +
        "distinct grams — widen the q230 key")
  }

  test("q231 geo grid join: the grid finds EVERY brute-force epsilon " +
    "pair (no false negatives) with a bounded candidate blowup") {
    val r = WarehouseOps.q231GeoGridJoin(spark, Sf).collect()
    assert(r.length === 1)
    val (nPts, nCand, nEps) = (r(0).getAs[Long]("n_points"),
      r(0).getAs[Long]("n_candidates"), r(0).getAs[Long]("n_eps_pairs"))
    val (expBins, _, _) = WarehouseOps.geoGridGeometry(nPts)
    assert(r(0).getAs[Long]("grid_bins") === expBins.toLong,
      "emitted grid resolution must equal the corpus-derived geometry")
    // brute-force ground truth over the same md5-projected coordinates
    def u32(s: String): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        d.digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_))
          .mkString, 16).toDouble / 4294967296.0
    }
    val ids = graft.Tables.customer(spark, Sf)
      .select("c_custkey").collect().map(_.getLong(0))
    val pts = ids.map(id =>
      (u32(s"lon:$id") * 360.0 - 180.0, u32(s"lat:$id") * 180.0 - 90.0))
    var brute = 0L
    for (i <- pts.indices; j <- (i + 1) until pts.length) {
      val (dx, dy) = (pts(i)._1 - pts(j)._1, pts(i)._2 - pts(j)._2)
      if (dx * dx + dy * dy < 25.0) brute += 1
    }
    assert(nEps === brute,
      s"grid found $nEps epsilon pairs, brute force says $brute")
    assert(nPts === ids.length.toLong)
    assert(nCand >= nEps)
    assert(nCand < nPts * nPts / 2, "grid filter must prune the cross join")
  }

  test("q231 adaptive grid: occupancy stays bounded and candidate mass " +
    "stays near-linear across a 10x corpus growth (the r14 verdict's " +
    "fixed-32x32 scale-killer, fixed via corpus-derived GeoBins)") {
    // geometry law: bins^2 >= n / targetOccupancy at ANY n, and the
    // ring radius always covers epsilon per axis (no false negatives)
    for (n <- Seq(150L, 1500L, 15000L, 150000L, 15000000L)) {
      val (bins, rx, ry) = WarehouseOps.geoGridGeometry(n)
      assert(n.toDouble / (bins.toLong * bins) <= 8.0 + 1e-9,
        s"expected occupancy exceeds the 8.0 target at n=$n (bins=$bins)")
      assert(rx * (360.0 / bins) >= 5.0 && ry * (180.0 / bins) >= 5.0,
        s"ring radius ($rx,$ry) does not cover epsilon at bins=$bins")
    }
    // measured: 10x the corpus (sf0.001 -> sf0.01 customer) must grow
    // candidates ~linearly (a frozen grid grows them ~quadratically;
    // 100x would be the quadratic signature, <30x is linear + geometry
    // quantization slack)
    val a = WarehouseOps.q231GeoGridJoin(spark, Sf).collect()(0)
    val b = WarehouseOps
      .q231GeoGridJoin(spark, "/root/testdata/sf0.01").collect()(0)
    assert(b.getAs[Long]("n_points") === 10 * a.getAs[Long]("n_points"))
    assert(b.getAs[Long]("grid_bins") > a.getAs[Long]("grid_bins"),
      "grid must refine as the corpus grows")
    val ratio = b.getAs[Long]("n_candidates").toDouble /
      a.getAs[Long]("n_candidates")
    assert(ratio < 30.0,
      s"candidate growth $ratio looks quadratic — grid not adapting")
  }

  test("q232 point in polygon: containment equals a driver-side " +
    "half-plane recompute and the hit rate tracks the area ratio") {
    val rows = WarehouseOps.q232PointInPolygon(spark, Sf).collect()
    val (nPts, nIn) = (rows.map(_.getAs[Long]("n_points")).sum,
      rows.map(_.getAs[Long]("n_inside")).sum)
    def u32(s: String): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        d.digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_))
          .mkString, 16).toDouble / 4294967296.0
    }
    val tri = Seq((-60.0, -40.0), (80.0, -20.0), (10.0, 70.0))
    def cross(a: (Double, Double), b: (Double, Double),
        p: (Double, Double)): Double =
      (b._1 - a._1) * (p._2 - a._2) - (b._2 - a._2) * (p._1 - a._1)
    val brute = graft.Tables.customer(spark, Sf)
      .select("c_custkey").collect().map(_.getLong(0)).count { id =>
        val p = (u32(s"lon:$id") * 360.0 - 180.0,
          u32(s"lat:$id") * 180.0 - 90.0)
        cross(tri(0), tri(1), p) >= 0 && cross(tri(1), tri(2), p) >= 0 &&
          cross(tri(2), tri(0), p) >= 0
      }
    assert(nIn === brute.toLong,
      s"engine found $nIn inside, driver recompute says $brute")
    // uniform projection ⇒ hit rate ≈ triangle area / world area
    val area = math.abs(cross(tri(0), tri(1), tri(2))) / 2.0
    val expect = area / (360.0 * 180.0)
    val rate = nIn.toDouble / nPts
    assert(math.abs(rate - expect) < 0.05,
      s"hit rate $rate vs area ratio $expect")
  }

  test("q233 tree rollup: parent equals the sum of its children plus " +
    "itself, and the root covers every keyed part") {
    val rows = WarehouseOps.q233TreeRollup(spark, Sf).collect()
      .map(r => r.getAs[Long]("node") ->
        (r.getAs[Long]("n_subtree"), r.getAs[Long]("subtree_cents"))).toMap
    assert(rows.keySet === (1L to 15L).toSet)
    val parts = graft.Tables.part(spark, Sf)
      .filter(col("p_partkey") >= 1)
      .select(col("p_partkey"),
        floor(col("p_retailprice") * 100 + lit(0.5)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("c"))
    assert(rows(1L)._1 === parts.length.toLong,
      "root subtree must cover every part with key >= 1")
    assert(rows(1L)._2 === parts.map(_._2).sum)
    // recursive identity on the fully-interior top rows: subtree(n) =
    // self(n) + subtree(2n) + subtree(2n+1)
    val self = parts.toMap
    (1L to 7L).foreach { n =>
      assert(rows(n)._2 ===
        self.getOrElse(n, 0L) + rows(2 * n)._2 + rows(2 * n + 1)._2,
        s"node $n violates the subtree identity")
      assert(rows(n)._1 ===
        (if (self.contains(n)) 1L else 0L) + rows(2 * n)._1 +
          rows(2 * n + 1)._1)
    }
  }

  test("q234 policy replay: 1/K match rate, bounded counts, and the " +
    "replay estimate tracks the logged mean on hash-independent reward") {
    // sf0.01: the law-of-large-numbers gates need a real user
    // population — sf0.001 has only 15 distinct users, so per-arm
    // match rates are lumpy (one arm can draw zero users) and the
    // replay estimator is legitimately undefined there
    val sf = "/root/testdata/sf0.01"
    val rows = EventOps.q234PolicyReplay(spark, sf).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val (n, m) = (r.getAs[Long]("n_logged"), r.getAs[Long]("n_matched"))
      assert(m <= n)
      // uniform 5-arm policy over many users ⇒ ~20% matched
      assert(m.toDouble / n > 0.10 && m.toDouble / n < 0.30,
        s"${r.getAs[String]("arm")} match rate ${m.toDouble / n}")
      // reward is independent of the user hash, so the matched subset
      // is a random ~n/5 sample: its mean sits within a few standard
      // errors of the logged mean. Values are ~U(0,100) ⇒ sd ≈ 29;
      // gate at 6·29/√m so the bound scales with the sample actually
      // matched at this SF (sf0.001 matches only ~40 events per arm)
      assert(math.abs(r.getAs[Double]("replay_mean") -
        r.getAs[Double]("logged_mean")) < 6.0 * 29.0 / math.sqrt(m.toDouble),
        s"${r.getAs[String]("arm")} replay deviates beyond 6 SE")
    }
    val again = EventOps.q234PolicyReplay(spark, sf).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("q235 weighted sssp: equals an independent driver-side " +
    "Bellman-Ford over the same weighted edges") {
    val got = WarehouseOps.q235WeightedSssp(spark, Sf).collect()
      .map(r => r.getAs[Long]("part_id") -> r.getAs[Long]("cost")).toMap
    // rebuild the weighted edge list in plain Scala from lineitem
    val li = graft.Tables.lineitem(spark, Sf)
      .filter(col("l_partkey") % 10 === 0)
      .select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    val mult = scala.collection.mutable.Map.empty[(Long, Long), Long]
    byOrder.values.foreach { ps =>
      for (a <- ps; b <- ps; if a < b)
        mult((a, b)) = mult.getOrElse((a, b), 0L) + 1L
    }
    val und = mult.toSeq.flatMap { case ((a, b), c) =>
      val w = 1000000L / c
      Seq((a, b, w), (b, a, w))
    }
    val nodes = und.map(_._1).distinct
    var dist = nodes.filter(_ % 100 == 0).map(_ -> 0L).toMap
    for (_ <- 1 to 4) {
      val next = scala.collection.mutable.Map[Long, Long](dist.toSeq: _*)
      und.foreach { case (n, nbr, w) =>
        dist.get(nbr).foreach { c =>
          if (!next.contains(n) || next(n) > c + w) next(n) = c + w
        }
      }
      dist = next.toMap
    }
    assert(got === dist,
      s"engine ${got.size} rows vs driver ${dist.size} rows differ")
    got.filter(_._1 % 100 == 0).values.foreach(c => assert(c === 0L))
  }

  test("q236 delta-method ratio: CI brackets the ratio and the SE " +
    "agrees with a driver-side bootstrap of the same user frame") {
    // sf0.01 for a real user population (150 users; sf0.001 has 15)
    val sf = "/root/testdata/sf0.01"
    val r = EventOps.q236DeltaMethodRatio(spark, sf).collect()(0)
    val (ratio, se) = (r.getAs[Double]("ratio"), r.getAs[Double]("se"))
    assert(se > 0.0)
    assert(r.getAs[Double]("ci_lo") === ratio - 1.96 * se)
    assert(r.getAs[Double]("ci_hi") === ratio + 1.96 * se)
    val xy = graft.Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(sum((col("event_type") === "click").cast("long")).as("x"),
        sum((col("event_type") === "view").cast("long")).as("y"))
      .collect().map(r => (r.getAs[Long]("x"), r.getAs[Long]("y")))
    assert(xy.length.toLong === r.getAs[Long]("n_users"))
    // Poisson bootstrap of the same ratio, driver-side, seeded
    val rng = new scala.util.Random(42)
    def pois(): Long = {
      var (k, p) = (0L, rng.nextDouble())
      val l = math.exp(-1.0)
      while (p > l) { k += 1; p *= rng.nextDouble() }
      k
    }
    val reps = (1 to 200).map { _ =>
      var (sx, sy) = (0L, 0L)
      xy.foreach { case (x, y) =>
        val w = pois(); sx += w * x; sy += w * y
      }
      sx.toDouble / sy
    }
    val mean = reps.sum / reps.length
    val sd = math.sqrt(reps.map(v => (v - mean) * (v - mean)).sum /
      (reps.length - 1))
    assert(se / sd > 0.6 && se / sd < 1.6,
      s"delta-method SE $se vs bootstrap SD $sd disagree")
  }

  test("q237 rater agreement: cells partition the corpus, kappa " +
    "matches the closed form and sits strictly below raw agreement") {
    val r = CorpusOps.q237RaterAgreement(spark, Sf).collect()(0)
    val (n, n11, n10, n01, n00) = (r.getAs[Long]("n"), r.getAs[Long]("n11"),
      r.getAs[Long]("n10"), r.getAs[Long]("n01"), r.getAs[Long]("n00"))
    assert(n11 + n10 + n01 + n00 === n)
    val po = (n11 + n00).toDouble / n
    val pe = ((n11 + n10).toDouble / n) * ((n11 + n01).toDouble / n) +
      ((n01 + n00).toDouble / n) * ((n10 + n00).toDouble / n)
    assert(r.getAs[Double]("po") === po)
    assert(r.getAs[Double]("kappa") === (po - pe) / (1.0 - pe))
    // chance correction must bite: correlated-but-imperfect raters
    // land strictly between 0 and raw agreement
    val k = r.getAs[Double]("kappa")
    assert(k > 0.0 && k < po)
  }
}
