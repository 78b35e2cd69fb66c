package graft.queries

import graft.SparkTestBase

/** Parallelism-invariance census for the rows-only queries (round 12).
  *
  * The 14 queries registered without a SQL oracle (sketches, LSH/ANN
  * tiers, DEFLATE) are exactly the ones the cross-engine gate cannot
  * pin — and several build on machinery that COULD legitimately vary
  * with the physical layout (sketch merges, partition-batched codecs,
  * sampled quantizers). At 1000 executors the layout is whatever the
  * cluster gives you, so "same answer at any parallelism" must be a
  * measured property, not a hope.
  *
  * Method: run every rows-only query under two deliberately different
  * physical layouts — the suite default (AQE on, 4 shuffle
  * partitions) and a skewed alternative (AQE OFF, 13 shuffle
  * partitions — AQE's size-based coalescing would otherwise fold both
  * configurations back to near-identical layouts at this SF) — then
  * compare canonicalized results (rows sorted by string form; DOUBLE
  * cells printed via shortest rendering, so even 1-ulp drift fails).
  *
  * Everything passes with zero variance pins: HLL register merges are
  * idempotent max-folds, the GK quantile sketch here is built with a
  * deterministic merge tree at this scale, k-means/PCA/LSH machinery
  * rides seeded md5-derived initialization, top-k aggregators carry
  * total tie-break orders (the round-11 heap-law discipline), and
  * DEFLATE is reset per ROW (never cross-row state), so batching is
  * invisible. If a future rework makes one vary, this census names it
  * before a cluster does. */
class ParallelismInvarianceSpec extends SparkTestBase {

  private val RowsOnly = Seq(
    "q12_approx_distinct", "q37_minhash_pairs", "q38_simhash",
    "q41_ann_lsh", "q47_embedding_neardup", "q51_ann_ivf",
    "q76_heavy_hitters", "q84_approx_percentiles", "q110_ann_pca",
    "q124_hll_sketch", "q139_ann_ivf_trained", "q162_ivf_pq_ann",
    "q221_compress_ratio", "q87_simhash_pairs")

  private def canonical(name: String): Seq[String] = {
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    graft.SparkEntry.queries(name)(spark, Sf)
      .collect().map(_.toString).sorted.toSeq
  }

  test("every rows-only query returns IDENTICAL rows under two " +
    "different physical layouts (AQE on + 4 shuffle partitions vs " +
    "AQE off + 13) — the invariance the oracle gate can't check") {
    val conf = spark.conf
    val savedAqe = conf.get("spark.sql.adaptive.enabled", "true")
    val savedShuf = conf.get("spark.sql.shuffle.partitions")
    val a = RowsOnly.map(n => n -> canonical(n)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      conf.set("spark.sql.shuffle.partitions", "13")
      val b = RowsOnly.map(n => n -> canonical(n)).toMap
      val diffs = RowsOnly.filter(n => a(n) != b(n))
      assert(diffs.isEmpty,
        s"layout-dependent rows-only queries: $diffs — first diff: " +
          diffs.headOption.map { n =>
            val (x, y) = (a(n), b(n))
            s"$n sizes ${x.size}/${y.size}, first mismatch " +
              x.zipAll(y, "<missing>", "<missing>")
                .find { case (p, q) => p != q }
          }.getOrElse(""))
      assert(a.values.forall(_.nonEmpty)) // the runs actually ran
    } finally {
      conf.set("spark.sql.adaptive.enabled", savedAqe)
      conf.set("spark.sql.shuffle.partitions", savedShuf)
    }
  }
}
