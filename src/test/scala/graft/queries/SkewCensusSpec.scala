package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Behavioral pins for the round-12 SKEW census (`plans/SkewGuard`,
  * sweep + controls in `WindowCensusSpec`): the census's reviewed pins
  * cite in-plan multiplicity bounds — this spec proves the two bounds
  * the census ADDED (q47's adaptive signature width and degenerate-
  * bucket cap) actually bind, and records the measured block masses
  * the q45/q165 blocking-contract pins cite. */
class SkewCensusSpec extends SparkTestBase {

  /** Write an embeddings.parquet fixture dir and return the dir. */
  private def fixtureDir(tag: String,
      df: org.apache.spark.sql.DataFrame): String = {
    val dir = s"/tmp/graft_skew_fixture_$tag"
    df.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("q47 adaptive signature width: bits grows as ceil(log2(n/64)) " +
    "past the 8-bit floor — the plan carries a 9th hyperplane term at " +
    "20k vectors and none at the test-SF corpus (expected bucket <= 64 " +
    "at any scale)") {
    // 20,000 deterministic vectors: n/64 = 312.5 -> bits = 9
    val big = spark.range(20000).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 63), i -> " +
        "cast(sin(id * 64 + i) as float))").as("embedding"),
      lit(0).cast("int").as("label"))
    val dir = fixtureDir("width", big)
    val plan = VectorOps.q47EmbeddingNeardup(spark, dir)
      .queryExecution.executedPlan.toString
    // since r16 the signature rides the md5-parity Md5RhpBucket
    // kernel (oracle-pairable), whose plan rendering carries its
    // (bits, dims) params — md5_rhp_bucket(embedding#N, BITS, 64)
    def hasBits(p: String, bits: Int): Boolean =
      s"md5_rhp_bucket\\(embedding#\\d+, $bits, 64\\)".r
        .findFirstIn(p).isDefined
    assert(hasBits(plan, 9),
      s"20k vectors must widen the signature to 9 bits: $plan")
    val planSmall = VectorOps.q47EmbeddingNeardup(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(hasBits(planSmall, 8) && !hasBits(planSmall, 9),
      "at the test SF (500 vectors) the max(8, _) floor must bind — " +
        s"8 hyperplanes exactly: $planSmall")
  }

  test("q47 degenerate-bucket cap: a dense near-identical mass above " +
    "NeardupMaxBucket is carved out in-plan (its quadratic pair space " +
    "never exists) while small duplicate clusters are still reported") {
    // 1500 identical vectors (one bucket, > 1024 cap) + 600 varied +
    // one planted 2-vector duplicate cluster at ids 100000/100001
    val degenerate = spark.range(1500).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 63), i -> cast(i + 1 as float))")
        .as("embedding"), lit(0).cast("int").as("label"))
    val varied = spark.range(2000, 2600).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 63), i -> " +
        "cast(sin(id * 64 + i) as float))").as("embedding"),
      lit(0).cast("int").as("label"))
    val planted = spark.range(100000, 100002).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 63), i -> " +
        "cast(cos(i * 3 + 1) as float))").as("embedding"),
      lit(0).cast("int").as("label"))
    val dir = fixtureDir("cap",
      degenerate.unionAll(varied).unionAll(planted))
    val out = VectorOps.q47EmbeddingNeardup(spark, dir)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // the 1500-identical mass would emit 1500*1499/2 = 1.1M pairs —
    // the cap must remove ALL of them
    assert(!out.exists { case (a, b) => a < 1500 && b < 1500 },
      "capped degenerate bucket must contribute zero pairs")
    // the planted 2-vector cluster (identical -> same bucket at any
    // width, cosine exactly 1.0) must survive the cap
    assert(out.contains((100000L, 100001L)),
      s"planted duplicate pair must be reported: ${out.take(20).toSeq}")
  }

  test("blocking-contract measurements the q45/q165 census pins cite: " +
    "block mass is orders below the global all-pairs mass at sf0.01") {
    // q45/q219 grain: (lang, szbucket) length blocks over documents
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("lang"), floor(col("n_chars") / 64).as("szbucket"))
    val blocks = d.groupBy("lang", "szbucket").agg(count(lit(1)).as("b"))
      .agg(sum(col("b") * col("b")).as("mass"), max(col("b")).as("maxb"),
        sum(col("b")).as("n")).head()
    val (mass, maxb, n) =
      (blocks.getLong(0), blocks.getLong(1), blocks.getLong(2))
    info(s"q45 blocks: n=$n, max block=$maxb, pair mass=$mass, " +
      s"all-pairs=${n * n}")
    assert(mass * 4 < n * n,
      "length blocking must prune well below global all-pairs " +
        s"(mass=$mass vs n^2=${n * n})")
    // q165 grain: (brand, size) catalog blocks over part
    val p = graft.Tables.part(spark, "/root/testdata/sf0.01")
      .groupBy("p_brand", "p_size").agg(count(lit(1)).as("b"))
      .agg(sum(col("b") * col("b")).as("mass"), max(col("b")).as("maxb"),
        sum(col("b")).as("n")).head()
    info(s"q165 blocks: n=${p.getLong(2)}, max block=${p.getLong(1)}, " +
      s"pair mass=${p.getLong(0)}, all-pairs=${p.getLong(2) * p.getLong(2)}")
    assert(p.getLong(0) * 10 < p.getLong(2) * p.getLong(2),
      "catalog blocking must prune an order below all-pairs")
  }
}
