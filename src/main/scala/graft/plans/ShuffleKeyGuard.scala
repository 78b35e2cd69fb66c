package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualNullSafe, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{CoGroup, Join, LogicalPlan, MapGroups, RepartitionByExpression}

/** SHUFFLE-KEY census — the seventh member of the census family
  * ([[WindowGuard]]: low-parallelism window sorts; [[AggStateGuard]]:
  * value-sized aggregation buffers; [[BroadcastGuard]]: scaling
  * broadcast hints / cartesians; [[WidthGuard]]: over-wide
  * materializations and Generate passthroughs; [[StreamStateGuard]]:
  * typed-stateful state width).
  *
  * A shuffle hash-partitions its input by the key's VALUES, so an
  * operator keyed ONLY on O(1)-cardinality columns funnels its whole
  * input into at most |domain| tasks — the q228 window collapse
  * relocated from the sort to the exchange. Three operator shapes
  * carry a key-hash exchange that the window/agg censuses cannot see:
  *
  *   - an EQUI-JOIN whose every key is low-card: a sort-merge or
  *     shuffled-hash join moves BOTH full inputs through a ≤|domain|-
  *     task exchange. The collapse needs both sides data-sized — when
  *     one side is bounded by construction (a per-language stats
  *     aggregate, a fixed dim), AQE broadcasts it from runtime sizes
  *     at ANY scale and the big side never shuffles, which is exactly
  *     why the round-11 broadcast census DROPPED hard hints rather
  *     than adding them. Fix order for a real hit: broadcast the
  *     genuinely bounded side; aggregate a side first (most low-card
  *     joins want per-group stats, not row pairs); or add an
  *     entity/bucket column to the key.
  *   - a `repartition(lowCardCols)`: an explicit request for a
  *     ≤|domain|-partition layout of a data-sized frame.
  *   - a typed `groupByKey(...).mapGroups` / `cogroup`: the key is a
  *     SERIALIZED CLOSURE attribute (literally named "value"), so its
  *     cardinality is invisible to any plan walk — and the opaque
  *     group closure loses map-side partial aggregation on top (its
  *     declarative sibling at least combines before the exchange; the
  *     streaming variant is [[StreamStateGuard]]'s subject). These
  *     are therefore flagged UNCONDITIONALLY over scaling input,
  *     StreamStateGuard-style: a site either reworks onto the
  *     declarative form or carries a reviewed pin naming its key
  *     grain. (`reduceGroups` is exempt by construction — it plans as
  *     a partial-combinable typed Aggregate.)
  *
  * Like the sibling censuses this is a shape heuristic over the
  * optimized plan, parameterized by the same domain knowledge
  * ([[BroadcastGuard.audit]]'s `fixedTables` / `boundedCardKeys` /
  * `probeKeys` feed the shared boundedness test; `lowCardKeys` is the
  * window census's O(1)-domain name set). Aggregates keyed by
  * low-card columns are deliberately OUT of scope: a declarative
  * `groupBy(lang).agg` partially aggregates map-side, so the exchange
  * carries |domain| pre-combined rows per map task — the scalable
  * shape, not a collapse. */
object ShuffleKeyGuard {

  /** One collapsed shuffle key: the operator kind, the key column
    * names (all low-card), and the scaling leaves on the shuffled
    * side(s). */
  case class Finding(kind: String, keys: Seq[String], leaves: Seq[String]) {
    def describe: String =
      s"$kind keyed only on O(1)-cardinality column(s) " +
        s"[${keys.mkString(", ")}] with data-scaling input(s) " +
        s"[${leaves.mkString(", ")}]: the key hash funnels the full " +
        "input through a ≤|domain|-task exchange — broadcast the " +
        "bounded side, aggregate before joining, or add an " +
        "entity/bucket column to the key (PERF.md round-12 " +
        "shuffle-key census)"
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  /** Equi-key attribute pairs of a join condition: top-level
    * `=` / `<=>` conjuncts with a bare attribute from each side
    * (the pairs Spark would plan as the hash-partitioning key). */
  private def equiKeys(j: Join): Seq[(Attribute, Attribute)] =
    j.condition.toSeq.flatMap(conjuncts).collect {
      case EqualTo(a: Attribute, b: Attribute) => (a, b)
      case EqualNullSafe(a: Attribute, b: Attribute) => (a, b)
    }.flatMap { case (a, b) =>
      if (j.left.outputSet.contains(a) && j.right.outputSet.contains(b))
        Some((a, b))
      else if (j.left.outputSet.contains(b) && j.right.outputSet.contains(a))
        Some((b, a))
      else None
    }

  /** Census of `plan`: every equi-join, explicit repartition, and
    * typed group-map whose ONLY shuffle keys are `lowCardKeys`
    * columns over data-scaling input. Domain-knowledge parameters are
    * shared with [[BroadcastGuard.audit]]. */
  def audit(plan: LogicalPlan, lowCardKeys: Set[String],
      fixedTables: Set[String] = BroadcastGuard.FixedCardTables,
      boundedCardKeys: Set[String] = Set.empty,
      probeKeys: Set[String] = Set.empty): Seq[Finding] = {
    val unb = BroadcastGuard.unboundedLeaves(
      fixedTables, boundedCardKeys, probeKeys) _
    plan.collect {
      case j: Join =>
        val keys = equiKeys(j)
        val names = keys.flatMap(p => Seq(p._1.name, p._2.name)).distinct
        if (keys.nonEmpty && names.forall(lowCardKeys.contains)) {
          // both sides must scale: a bounded side broadcasts (AQE,
          // runtime sizes) at any scale and the big side never
          // shuffles — the round-11 census's drop-the-hint discipline
          val l = unb(j.left)
          val r = unb(j.right)
          if (l.nonEmpty && r.nonEmpty)
            Seq(Finding(s"${j.joinType} equi-join", names,
              (l ++ r).distinct))
          else Nil
        } else Nil
      case rp: RepartitionByExpression =>
        val names =
          rp.partitionExpressions.flatMap(_.references.toSeq.map(_.name))
        if (names.nonEmpty && names.forall(lowCardKeys.contains) &&
            unb(rp.child).nonEmpty)
          Seq(Finding("repartition", names.distinct, unb(rp.child).distinct))
        else Nil
      // typed group ops: the serialized closure key hides its
      // cardinality from the plan, so scaling input alone convicts —
      // rework declarative or pin with the reviewed key grain
      case m: MapGroups if unb(m.child).nonEmpty =>
        Seq(Finding("typed mapGroups",
          m.groupingAttributes.map(_.name), unb(m.child).distinct))
      case cg: CoGroup
          if unb(cg.left).nonEmpty || unb(cg.right).nonEmpty =>
        Seq(Finding("typed cogroup",
          cg.leftGroup.map(_.name),
          (unb(cg.left) ++ unb(cg.right)).distinct))
    }.flatten
  }
}

/** The in-optimizer shuffle-key lint, completing the guard family's
  * extensions seam ([[WindowGuardRule]] warn-default,
  * [[BroadcastGuardRule]] / [[WidthGuardRule]] off-default): audits
  * (never rewrites) each plan per `spark.graft.shuffleKeyGuard` —
  * `warn` logs one line per finding, `fail` throws, `off` (default)
  * disables. The low-card key set is domain knowledge the rule cannot
  * infer, so users declare it once per session via
  * `spark.graft.shuffleKeyGuard.keys` (comma-separated column names);
  * with no keys declared only the domain-free half runs (typed
  * mapGroups/cogroup over scaling input, whose serialized closure key
  * no plan walk can judge). Registered via `injectPreCBORule` for the
  * same once-per-query/post-pushdown reasons as the siblings. */
object ShuffleKeyGuardRule
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {

  private def mode: String =
    conf.getConfString("spark.graft.shuffleKeyGuard", "off")

  private def keys: Set[String] =
    conf.getConfString("spark.graft.shuffleKeyGuard.keys", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val m = mode
    if (m != "off") {
      val findings = ShuffleKeyGuard.audit(plan, keys)
      if (findings.nonEmpty && m == "fail")
        throw new IllegalStateException(
          "ShuffleKeyGuard: " + findings.map(_.describe).mkString("; "))
      findings.foreach(f => logWarning(s"ShuffleKeyGuard: ${f.describe}"))
    }
    plan
  }
}
