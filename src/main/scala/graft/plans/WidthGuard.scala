package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Generate, LogicalPlan}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.columnar.InMemoryRelation
import org.apache.spark.sql.types.{ArrayType, BinaryType, MapType}

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

  /** One wide Generate passthrough: `generator` names the exploding
    * expression, `carried` the container-typed columns it multiplies. */
  case class GenFinding(generator: String, carried: Seq[String]) {
    def describe: String =
      s"Generate[$generator] carries container column(s) " +
        s"[${carried.mkString(", ")}] through the explode: Generate " +
        "copies every passthrough column into EVERY output row, so an " +
        "array/map/binary payload riding a per-element explode costs " +
        "O(elements x payload) per input row — quadratic in document " +
        "length for a token/code-point array riding its own position " +
        "stream (the round-10 q215 measurement: 58 s vs 3 s at sf0.1). " +
        "Build the exploded value inside the generator (transform + " +
        "explode), emit ids and join back, or use a native kernel"
  }

  /** Both width audits over one plan, as one description list —
    * what [[WidthGuardRule]] reports. */
  def auditAll(plan: LogicalPlan): Seq[String] =
    audit(plan).map(_.describe) ++ auditGenerate(plan).map(_.describe)

  /** The multiplying sibling of the materialization audit: every
    * `Generate` (explode/posexplode/inline) whose REQUIRED CHILD
    * OUTPUT — the columns carried into each generated row — includes
    * an array/map/binary column. Scalar strings are deliberately out
    * of scope (the repo's passthroughs there are 2-char lang codes and
    * single tokens; a text-BODY string rides no explode here, and
    * judging string width is a review call, not a shape test —
    * round-10's manual audit and PERF.md lesson cover it). May-find:
    * a BOUNDED exploded frame (q41's 5-query probe set x 9 masks)
    * multiplies its payload by a constant — reviewed pins, as with the
    * sibling censuses. */
  def auditGenerate(plan: LogicalPlan): Seq[GenFinding] = plan.collect {
    case g: Generate =>
      val wide = g.requiredChildOutput.filter(a => a.dataType match {
        case _: ArrayType | _: MapType | BinaryType => true
        case _ => false
      })
      if (wide.isEmpty) None
      else Some(GenFinding(g.generator.prettyName, wide.map(_.name)))
  }.flatten
}

/** The in-optimizer width lint — the materialization-side member of
  * the rule trio ([[WindowGuardRule]]: sort collapse, default `warn`;
  * [[BroadcastGuardRule]]: exchange collapse, default `off`): audits
  * (never rewrites) each plan's checkpoint/cache leaves for
  * never-referenced columns and its Generates for container
  * passthroughs, reporting per `spark.graft.widthGuard` — `warn`
  * logs one line per finding, `fail` throws, `off` disables.
  *
  * Default is OFF, like the broadcast rule and for the analogous
  * reason plus a sharper one: the audit sees ONE query's plan, but a
  * cached frame may serve OTHER queries in the session whose usage
  * this plan cannot show (the registered-query census sidesteps that
  * because each registered query builds its own frames — a session
  * rule cannot assume it). Nested eager materializations widen the
  * may-find the same way (the census's reviewed q80/q209 pins).
  * The full audit with this repo's pins runs in `WindowCensusSpec`
  * regardless. Registered via `injectPreCBORule` for the same
  * once-per-query/post-pushdown reasons as the siblings. */
object WidthGuardRule
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {

  private def mode: String =
    conf.getConfString("spark.graft.widthGuard", "off")

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val m = mode
    if (m != "off") {
      val findings = WidthGuard.auditAll(plan)
      if (findings.nonEmpty && m == "fail")
        throw new IllegalStateException(
          "WidthGuard: " + findings.mkString("; "))
      findings.foreach(f => logWarning(s"WidthGuard: $f"))
    }
    plan
  }
}
