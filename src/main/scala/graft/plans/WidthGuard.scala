package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.columnar.InMemoryRelation

/** Materialization-WIDTH census — the fourth member of the census
  * family ([[WindowGuard]]: low-parallelism window sorts;
  * [[AggStateGuard]]: value-sized aggregation buffers;
  * [[BroadcastGuard]]: scaling broadcast hints / cartesians).
  *
  * A `localCheckpoint()`/`checkpoint()` barrier or a `persist()`
  * materializes EVERY column of its frame: the barrier truncates
  * lineage, so Catalyst's column pruning — free everywhere else —
  * cannot reach through it, and a cache builds its full cached-plan
  * output on first action regardless of which columns its scans later
  * prune. A column that no consumer ever references is therefore pure
  * materialization waste, invisible at test scale and very much not at
  * 100 TB (a stray `text` column riding a per-round graph barrier
  * re-writes the corpus once per iteration). The declarative-plan
  * discipline everywhere else in this repo makes width a non-issue —
  * THESE are exactly the sites where the discipline has a blind spot,
  * which is what earns the shape its own census (the round-10 Generate
  * audit caught the same hazard's explode-shaped sibling: never carry
  * a payload column through a multiplying operator).
  *
  * Detection, per registered query's OPTIMIZED plan: every
  * `LogicalRDD` (checkpoint barrier) and `InMemoryRelation` (cache)
  * leaf is keyed by its physical identity (RDD id / cache-builder
  * instance — self-joined consumers get per-branch attribute ids from
  * `DeduplicateRelations`, so occurrences of one materialization must
  * be unioned POSITIONALLY, not by `ExprId`), and a column position
  * counts as USED if any occurrence's attribute at that position is
  * referenced by any expression in the plan or escapes into the
  * query's own output. Positions used by NO occurrence are flagged.
  *
  * May-finds the shape test accepts: a column consumed only by a
  * DIFFERENT query over the same materialized frame (none here — each
  * registered query builds its own frames), and width a caller keeps
  * deliberately for a documented contract (reviewed pins in
  * `WindowCensusSpec`, like the sibling censuses). */
object WidthGuard {

  /** One over-wide materialization: `leaf` names the node kind,
    * `unused` the column names materialized but never referenced. */
  case class Finding(leaf: String, unused: Seq[String]) {
    def describe: String =
      s"$leaf materializes column(s) [${unused.mkString(", ")}] that no " +
        "consumer references: a checkpoint/cache stores every column it " +
        "is handed (lineage truncation hides them from column pruning) " +
        "— select() the needed columns before the barrier/persist"
  }

  def audit(plan: LogicalPlan): Seq[Finding] = {
    // used attribute ids = referenced by ANY expression anywhere in
    // the plan, or part of the query's own output (schema passthrough
    // reaches the output without appearing in an expression)
    val used = mutable.Set.empty[Long]
    plan.output.foreach(a => used += a.exprId.id)
    plan.foreach {
      // the materialization leaves carry their own output attributes
      // as expression-typed constructor args — QueryPlan.expressions
      // surfaces those, which would self-mark every column as used
      case _: LogicalRDD | _: InMemoryRelation =>
      case node =>
        node.expressions.foreach(_.references.foreach(a =>
          used += a.exprId.id))
    }
    // group occurrences of one physical materialization; union used
    // positions across them
    val occ = mutable.LinkedHashMap
      .empty[(String, AnyRef), (String, Seq[String], mutable.Set[Int])]
    plan.foreach {
      case l: LogicalRDD =>
        val key = ("rdd", Integer.valueOf(l.rdd.id))
        val e = occ.getOrElseUpdate(key,
          ("LogicalRDD", l.output.map(_.name), mutable.Set.empty[Int]))
        l.output.zipWithIndex.foreach { case (a, i) =>
          if (used(a.exprId.id)) e._3 += i
        }
      case m: InMemoryRelation =>
        val key = ("imr", m.cacheBuilder)
        val e = occ.getOrElseUpdate(key,
          ("InMemoryRelation", m.output.map(_.name), mutable.Set.empty[Int]))
        m.output.zipWithIndex.foreach { case (a, i) =>
          if (used(a.exprId.id)) e._3 += i
        }
      case _ =>
    }
    occ.values.toSeq.flatMap { case (kind, names, usedPos) =>
      val unused = names.indices.filterNot(usedPos).map(names)
      if (unused.isEmpty) None
      else Some(Finding(s"$kind[${names.mkString(", ")}]", unused))
    }
  }

  def audit(df: DataFrame): Seq[Finding] =
    audit(df.queryExecution.optimizedPlan)
}
