package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{SparkSession => CSparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.Bridge

import graft.plans.{AsofJoin, AsofJoinStrategy}

/** DataFrame-level entry point for the custom as-of join plan
  * (`graft.plans.AsofJoin`). Registers the planner strategy on the
  * session the first time it's used (deployments that set
  * `spark.sql.extensions=graft.functions.GraftExtensions` get it on
  * every session without this).
  *
  * `asof(trades, quotes, keys = Seq("sym" -> "sym"), time = "ts" -> "qts")`
  * returns trades ++ quotes columns where each trade carries the
  * latest quote with `qts <= ts` for its key (NULLs when none).
  */
object AsofJoinOp {

  /** `direction`: "backward" (default — latest right at or before) or
    * "forward" (earliest right at or after). `toleranceUnits` bounds
    * |right − left| in the time column's physical units (microseconds
    * for timestamps, days for dates, raw value for integral columns);
    * out-of-window candidates degrade to the left-outer NULL row. */
  def asof(left: DataFrame, right: DataFrame,
      keys: Seq[(String, String)], time: (String, String),
      direction: String = "backward",
      toleranceUnits: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key pair")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lPlan = Bridge.analyzed(left)
    // hand-built nodes bypass the analyzer's DeduplicateRelations, so a
    // self-join's shared attribute ids must be broken by re-aliasing
    // (fresh ids) before the node is assembled
    val rSafe =
      if (Bridge.analyzed(right).outputSet.intersect(lPlan.outputSet).nonEmpty)
        right.select(right.columns.toSeq.map(c => col(c).as(c)): _*)
      else right
    val rPlan = Bridge.analyzed(rSafe)
    val node = AsofJoin(lPlan, rPlan,
      keys.map(k => attr(lPlan, k._1)), keys.map(k => attr(rPlan, k._2)),
      attr(lPlan, time._1), attr(rPlan, time._2),
      forward = direction == "forward", toleranceUnits = toleranceUnits)
    Bridge.ofRows(spark, node)
  }

  private def attr(plan: LogicalPlan, name: String): Attribute =
    plan.output.filter(_.name.equalsIgnoreCase(name)) match {
      case Seq(one) => one
      case Seq() => throw new IllegalArgumentException(
        s"column $name not in [${plan.output.map(_.name).mkString(", ")}]")
      // post-join plans routinely carry duplicate names; binding the
      // first match silently would join on an arbitrary column — fail
      // like Spark's own resolver does on ambiguity
      case many => throw new IllegalArgumentException(
        s"column $name is ambiguous: ${many.size} matches " +
          s"[${many.map(a => s"${a.name}#${a.exprId.id}").mkString(", ")}]")
    }

  /** Idempotent per-session registration of the planner strategy and
    * the pushdown rule via the public `experimental` hooks (no session
    * rebuild needed). */
  def ensureStrategy(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cs = spark.asInstanceOf[CSparkSession]
    if (!cs.experimental.extraStrategies.contains(AsofJoinStrategy))
      cs.experimental.extraStrategies =
        cs.experimental.extraStrategies :+ AsofJoinStrategy
    if (!cs.experimental.extraOptimizations.contains(graft.plans.AsofJoinPushdown))
      cs.experimental.extraOptimizations =
        cs.experimental.extraOptimizations :+ graft.plans.AsofJoinPushdown
  }
}
