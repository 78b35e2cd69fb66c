package graft.queries

import org.apache.spark.sql.SparkSession

/** Throwaway-grade measurement main (r16): recall@10 and candidate
  * volume of the md5-basis multi-table LSH at a sweep of table
  * counts, against q40's exact truth — the dial-selection evidence
  * for q41's tables floor after the hash-basis change. Kept in-tree
  * so the number in PERF is reproducible with one command. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val truth = VectorOps.q40CosineTopK(spark, dir).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("cand_id")).toSet }
    // fail loudly on a bad/empty input dir instead of printing NaN
    // recall lines (r16 ADVICE): the probe's output feeds dial
    // selection, so a silent NaN would select a dial from noise
    require(truth.nonEmpty, s"q40 returned no rows for $dir — recall undefined")
    require(truth.forall(_._2.nonEmpty), s"empty per-query truth set in $dir")
    for (tables <- Seq(8, 10, 12, 16)) {
      val got = VectorOps.annLshMulti(spark, dir, bits = 8,
        tables = tables, maxHamming = 1, k = 10).collect()
        .groupBy(_.getAs[Long]("query_id"))
        .map { case (q, rs) => q -> rs.map(_.getAs[Long]("cand_id")).toSet }
      val recall = truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty[Long]).count(t).toDouble / t.size
      }.sum / truth.size
      println(f"tables=$tables%2d recall@10=$recall%.3f")
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
