package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for one or more registered queries to
  * files — the optimization round's measurement harness (guide §1:
  * capture the plan shape — Exchange count, join strategy,
  * PushedFilters/ReadSchema, WholeStageCodegen spans — before and
  * after every change).
  *
  * Usage: runMain graft.tools.PlanDump <outDir> [sfDir] [q1 q2 ...]
  *   - no query names → every registered query
  *   - each query's plan goes to <outDir>/<name>.txt
  *   - a one-line-per-query summary (Exchange count, join nodes) goes
  *     to <outDir>/SUMMARY.txt
  *
  * Plans are captured lazily (no action is executed), so this is cheap
  * enough to run over all 235 queries; queries whose construction
  * itself runs jobs (iterative fixpoints, persist+count snapshots)
  * still execute those driver-side steps.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse(sys.error(
      "usage: PlanDump <outDir> [sfDir] [query...]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // AQE partition sizing for CACHED plans (r17, guide §2.2/§5):
      // by default Spark pins a cached plan's output partitioning
      // (canChangeCachedPlanOutputPartitioning=false), so every
      // persist() materializes and every cache scan re-reads the full
      // pre-AQE shuffle partition count however small the frame.
      // Enabling it gives cached plans the SAME adaptive coalescing
      // as uncached ones — partition count follows data size at every
      // scale (advisory-size-driven), not a fixed constant. Measured
      // on the persist-heavy quantile family at sf0.1: q160 7.6→4.3 s,
      // q50 2.4→2.0 s (min-of-4 paired A/B); results identical (full
      // oracle gate green under the flag).
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val summary = new StringBuilder
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val line =
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.write(Paths.get(outDir, s"$name.txt"),
            plan.getBytes(StandardCharsets.UTF_8))
          val ex = "(?m)^\\s*[*+\\-: ]*Exchange".r
            .findAllIn(plan).length
          val joins = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)".r
            .findAllIn(plan).toSeq.groupBy(identity)
            .map { case (k, v) => s"$k:${v.size}" }.toSeq.sorted
            .mkString(",")
          val aqe = if (plan.contains("AdaptiveSparkPlan")) "aqe" else ""
          f"$name%-28s exchanges=$ex%-3d $aqe%-4s $joins"
        } catch {
          case e: Throwable =>
            f"$name%-28s ERROR ${e.getClass.getSimpleName}: ${e.getMessage.take(120)}"
        }
      summary.append(line).append('\n')
      // drop anything the query construction persisted so plans stay
      // independent (mirrors the bench's inter-query hygiene)
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.sharedState.cacheManager.clearCache()
    }
    Files.write(Paths.get(outDir, "SUMMARY.txt"),
      summary.toString.getBytes(StandardCharsets.UTF_8))
    println(s"[plandump] wrote ${names.size} plans to $outDir")
    spark.stop()
  }
}
