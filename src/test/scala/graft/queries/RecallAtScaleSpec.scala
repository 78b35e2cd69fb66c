package graft.queries

import graft.SparkTestBase

/** Recall-at-scale gates for EVERY registered ANN tier (round 13).
  *
  * The per-tier recall gates run at sf0.001 (500 vectors); round 12
  * measured recall@10 at sf0.1 (2,000) and found every fixed demo
  * parameter decaying (q162's 40-candidate shortlist to 0.38; the four
  * untrained tiers to 0.12–0.28) — dials that were "the whole corpus"
  * at gate scale and a thin slice at 10×. Round 12 corpus-scaled q162
  * (0.94) and q47; round 13 applied the same precedent to the four
  * untrained tiers (the r12 verdict's item 2): q41 multi-table LSH
  * (measured 0.70), q51 half-list probing (0.76), q110 16-PC / n/5
  * shortlist (0.78), q148 Hamming-shortlist + cosine re-rank (0.92).
  * This spec pins ALL registered tiers at the larger SF with per-tier
  * floors just under the measured values (the pipeline is
  * deterministic — a miss means a parameter or plan regression, not
  * noise), so a regression reads as a red test, not a next-round
  * measurement surprise. Floors differ by tier because the tiers buy
  * different things: trained tiers (q139/q162) hold ≥ 0.9 cheaply;
  * untrained tiers pay candidate volume for recall on the iid-random
  * synthetic corpus (their worst case — real corpora have the
  * neighbor structure LSH/IVF/PCA exploit) and state floors at their
  * measured sf0.1 values. */
class RecallAtScaleSpec extends SparkTestBase {

  private val Sf01 = "/root/testdata/sf0.1"

  // measured at sf0.1 in round 13: 0.70 / 0.76 / 0.78 / 0.92 / 0.98 /
  // 0.94; q41 re-measured in r16 after the md5-parity re-draw and
  // table re-dial (12 tables → 0.80, RecallProbe) — floor raised
  private val Floors = Seq(
    "q41_ann_lsh" -> 0.75,
    "q51_ann_ivf" -> 0.70,
    "q110_ann_pca" -> 0.70,
    "q148_hamming_topk" -> 0.85,
    "q139_ann_ivf_trained" -> 0.90,
    "q162_ivf_pq_ann" -> 0.90)

  private def topk(name: String): Map[Long, Set[Long]] =
    graft.SparkEntry.queries(name)(spark, Sf01).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("cand_id")).toSet }

  test("every registered ANN tier holds its stated recall@10 floor at " +
    "sf0.1 (4x the per-tier gate corpus): corpus-scaled dials, not " +
    "fixed demo parameters") {
    val truth = topk("q40_cosine_topk")
    assert(truth.nonEmpty && truth.values.forall(_.size == 10))
    def recall(name: String): Double = {
      val got = topk(name)
      truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty[Long]).count(t).toDouble / t.size
      }.sum / truth.size
    }
    val misses = Floors.flatMap { case (name, floor) =>
      val r = recall(name)
      spark.sharedState.cacheManager.clearCache()
      if (r < floor) Some(s"$name recall@10 at sf0.1 = $r < floor $floor")
      else None
    }
    assert(misses.isEmpty, misses.mkString("; "))
  }
}
