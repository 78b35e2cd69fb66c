package graft.queries

import org.apache.spark.sql.SparkSession

/** Ad-hoc probe (test scope, not shipped): splits q67 into pair-stage
  * vs CC-loop wall time. Run:
  * `sbt "Test/runMain graft.ProbeQ67 /root/testdata/sf0.1"` */
object ProbeQ67 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm
    ExtendedOps.q67DedupClusters(spark, dir).count()
    var t0 = System.nanoTime
    val pairs = TextOps.ngramJaccardPairs(spark, dir, 0.5)
      .select("id_a", "id_b")
    println(f"PAIRS n=${pairs.count()} t=${(System.nanoTime - t0) / 1e9}%.2f s")
    t0 = System.nanoTime
    val n = ExtendedOps.q67DedupClusters(spark, dir).count()
    println(f"FULL  n=$n t=${(System.nanoTime - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
