package graft.queries

import graft.SparkTestBase

/** Recall-at-scale gates for the TRAINED ANN tiers (round 12).
  *
  * The per-tier recall gates run at sf0.001 (500 vectors); round 12
  * measured recall@10 at sf0.1 (2,000) and found the composed
  * IVF→PQ→rerank tier's fixed 40-candidate shortlist decaying to 0.38
  * — fixed demo parameters that were "the whole corpus" at gate scale
  * and a thin slice at 10×. q162 now derives its shortlist from a
  * corpus count (recall 0.94); this spec pins BOTH trained tiers at
  * the larger SF so a parameter regression reads as a red test, not a
  * next-round measurement surprise. The untrained demonstration tiers
  * (q41/q51/q110/q148) are deliberately fixed-parameter bucket-shape
  * demos — their measured sf0.1 decay and per-tier dials are recorded
  * in PERF round-12 addendum 7, not gated here. */
class RecallAtScaleSpec extends SparkTestBase {

  private val Sf01 = "/root/testdata/sf0.1"

  private def topk(name: String): Map[Long, Set[Long]] =
    graft.SparkEntry.queries(name)(spark, Sf01).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("cand_id")).toSet }

  test("trained tiers hold recall@10 >= 0.9 at sf0.1 (4x the per-tier " +
    "gate corpus): q139 ivf_trained and q162 ivf->pq->rerank with its " +
    "corpus-scaled shortlist") {
    val truth = topk("q40_cosine_topk")
    assert(truth.nonEmpty && truth.values.forall(_.size == 10))
    def recall(name: String): Double =
      topk(name) match {
        case got => truth.map { case (q, t) =>
          got.getOrElse(q, Set.empty[Long]).count(t).toDouble / t.size
        }.sum / truth.size
      }
    val r139 = recall("q139_ann_ivf_trained")
    val r162 = recall("q162_ivf_pq_ann")
    assert(r139 >= 0.9, s"q139 recall@10 at sf0.1 = $r139")
    assert(r162 >= 0.9, s"q162 recall@10 at sf0.1 = $r162")
  }
}
