package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** One-off measurement main (r14 verdict item 7): the volume-recall
  * frontier of the six registered ANN tiers at one SF, untrained vs
  * trained, so the docs can steer users with MEASURED numbers instead
  * of adjectives. For each tier it reports
  *
  *   - recall@10 against q40_cosine_topk's exact top-10 (the same
  *     ground truth RecallAtScaleSpec gates against), and
  *   - every join operator's numOutputRows from the EXECUTED plan —
  *     the scored/probed candidate volumes, read from the shipped
  *     query's own metrics rather than re-derived arithmetic, so the
  *     numbers cannot drift from the code.
  *
  * Usage: sbt "runMain graft.tools.AnnVolumeSweep [sfDir]"
  * Results recorded in PERF.md (round 15, ANN volume-recall table).
  */
object AnnVolumeSweep {
  private val Tiers = Seq("q40_cosine_topk", "q41_ann_lsh", "q51_ann_ivf",
    "q110_ann_pca", "q148_hamming_topk", "q139_ann_ivf_trained",
    "q162_ivf_pq_ann")

  private def joinRows(plan: SparkPlan): Seq[(String, Long)] = {
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val here = plan match {
      case a: AdaptiveSparkPlanExec => return joinRows(a.executedPlan)
      case q: QueryStageExec => return joinRows(q.plan)
      case c: InMemoryTableScanExec =>
        return joinRows(c.relation.cachedPlan)
      case p if p.nodeName.toLowerCase.contains("join") =>
        p.metrics.get("numOutputRows").map(m => (p.nodeName, m.value)).toSeq
      case _ => Seq.empty
    }
    here ++ plan.children.flatMap(joinRows) ++
      plan.subqueries.flatMap(joinRows)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def topSets(name: String): (Map[Long, Set[Long]], Seq[(String, Long)]) = {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val rows = df.collect()
      val sets = rows.groupBy(_.getAs[Long]("query_id"))
        .map { case (q, rs) =>
          q -> rs.map(_.getAs[Long]("cand_id")).toSet }
      (sets, joinRows(df.queryExecution.executedPlan))
    }

    val (truth, _) = topSets("q40_cosine_topk")
    Tiers.foreach { name =>
      val (got, joins) = topSets(name)
      val recalls = truth.toSeq.map { case (q, t) =>
        got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
      val recall = if (recalls.isEmpty) 0.0 else recalls.sum / recalls.size
      println(f"TIER $name recall@10=$recall%.3f joins=" +
        joins.map { case (n, v) => s"$n:$v" }.mkString("[", ", ", "]"))
    }
    spark.stop()
  }
}
