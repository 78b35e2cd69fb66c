package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.{ExistenceJoin, LeftAnti, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, HintInfo, Join, LocalLimit, GlobalLimit, LogicalPlan, Project, Repartition, RepartitionByExpression, Sort, Window, WindowGroupLimit}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.columnar.InMemoryRelation

/** SKEW census — the eighth member of the census family, and the
  * multiplicity axis the other seven cannot see. Every prior census
  * judges a key by its DOMAIN (O(1)-cardinality ⇒ too few tasks); this
  * one judges it by its per-key ROW MULTIPLICITY. A hash shuffle
  * places all rows of one key value on one task, so a key with
  * billions of distinct values is still a collapse if ONE value holds
  * a data-sized share — the Zipf shape every content-derived key
  * (token, n-gram, shingle hash, signature band) has on real text.
  * Hashing the content first does NOT help: xxhash64 of the hottest
  * gram is still a single value carrying that gram's full multiplicity.
  *
  * Where it bites, by operator shape:
  *
  *   - `groupBy(contentKey).agg(...)` is skew-SAFE for combinable
  *     aggregates: partial aggregation means each map task emits one
  *     row per distinct key it saw, so the hot key's reducer receives
  *     ≤ #mapTasks pre-combined rows, not the raw multiplicity.
  *     Deliberately out of scope (same reasoning as [[ShuffleKeyGuard]]).
  *   - an ENRICHMENT join — raw rows ⋈ a frame already aggregated to
  *     the join-key grain (mult ≤ 1 per key on that side) — produces
  *     output mass equal to the raw side. The hot key's rows land on
  *     one sort-merge partition, and AQE's OptimizeSkewedJoin splits
  *     that partition by SIZE and replicates the matching (1-row)
  *     other side: runtime-mitigated at any scale. Cleared, with the
  *     mechanism documented here.
  *   - a RAW ⋈ RAW join on a content key is the unfixable shape: per
  *     key the output is n_a·n_b pairs, so a hot key's pair mass is
  *     QUADRATIC in its multiplicity, and AQE cannot split it — a
  *     split of one side must replicate the other side's matching
  *     partition, which is itself data-sized. No runtime re-plan
  *     recovers this; the fix is upstream (cap the bucket, join at
  *     distinct grain and carry counts, prefix-filter to rare keys,
  *     or compose the key with an entity/bucket column). This is the
  *     shape the census flags.
  *
  * Clearing ladder, per equi-join over two data-scaling sides
  * (bounded sides never shuffle — AQE broadcasts them, the
  * [[BroadcastGuard]] discipline — so one bounded side clears):
  *
  *   1. any join-key column in `entityKeys` — synthetic per-entity
  *      identifiers whose per-key multiplicity is bounded by the DATA
  *      CONTRACT, not the distribution (a TPC-H orderkey holds ≤ 7
  *      lineitems; doc_id/vec_id are unique per document/vector;
  *      composite keys inherit the finest component's bound);
  *   2. BOTH sides aggregated to join-key grain (grouping keys ⊇ join
  *      keys below a rename-tracking walk): mult ≤ 1 × ≤ 1 — a
  *      distinct-grain join emits ≤ 1 row per key;
  *   3. ONE side key-grain: the enrichment shape above —
  *      AQE-skew-split-mitigated, cleared;
  *   4. otherwise: Finding. The site either reworks (the fix menu in
  *      `describe`) or carries a reviewed pin naming the in-plan
  *      multiplicity bound AND its measurement (SKEW_CENSUS.md).
  *
  * Like its siblings this is a name-heuristic over the optimized
  * plan: the grain walk tracks simple `Alias(attr)` renames through
  * Project/Filter/Sort/limits/Window/repartitions and reads cached
  * aggregates through InMemoryRelation's physical plan, but a grain
  * it cannot trace (an expression-valued key, a checkpoint barrier)
  * reports not-grain — a may-FIND census: false positives become
  * reviewed pins, never silent clears. */
object SkewGuard {

  /** One raw×raw content-keyed join: key names, per-side grain
    * verdicts, and the scaling leaves feeding each side. */
  case class Finding(keys: Seq[String], leftLeaves: Seq[String],
      rightLeaves: Seq[String]) {
    def describe: String =
      s"equi-join on content-derived key(s) [${keys.mkString(", ")}] " +
        s"with BOTH sides raw over scaling input(s) " +
        s"[left: ${leftLeaves.mkString(", ")}; " +
        s"right: ${rightLeaves.mkString(", ")}]: a hot key's output " +
        "is quadratic in its multiplicity and AQE cannot split a " +
        "raw×raw pair explosion — cap the per-key bucket, join at " +
        "distinct grain carrying counts, prefix-filter to rare keys, " +
        "compose an entity/bucket column into the key, or review + " +
        "pin with the multiplicity bound (SKEW_CENSUS.md, round 12)"
  }

  /** Does `side` have BOUNDED per-join-key multiplicity? True when an
    * Aggregate below (through rename-transparent operators, remapping
    * tracked key names through bare-attribute aliases) groups by a set
    * covered by `keys ∪ bounded`: distinct rows then differ in the
    * grouping tuple, so rows sharing one join-key value differ only in
    * bounded-domain columns — mult ≤ Π|bounded domains| = O(1). (The
    * tempting converse test, join keys ⊆ grouping keys, is WRONG: a
    * finer-grained aggregate — bigram counts joined on their first
    * token — has per-key multiplicity equal to the hot key's fan-out,
    * which is exactly the Zipf mass this census exists to catch.)
    * Anything untraceable (expression aliases over the key, joins,
    * generators, checkpoints) returns false — may-find. */
  /** Every output name one grouping expression is exposed under: its
    * own attribute/alias name PLUS any aggregate-output alias of it —
    * `groupBy(expr.as("k"))` optimizes to a synthetic
    * `_groupingexpression#N` grouping attribute whose public name "k"
    * lives only in the aggregate list (PullOutGroupingExpressions),
    * and `groupBy(col("x").as("pk"))` can keep the bare x in the
    * grouping with the pk alias in the output. Empty = untraceable. */
  private def groupingNames(g: Expression, a: Aggregate): Set[String] = {
    val own: Set[String] = g match {
      case at: Attribute => Set(at.name)
      case al: Alias => Set(al.name)
      case _ => Set.empty
    }
    val viaOutput = a.aggregateExpressions.collect {
      case al @ Alias(c: Attribute, _)
          if g.isInstanceOf[Attribute] &&
            c.exprId == g.asInstanceOf[Attribute].exprId => al.name
      case al @ Alias(c, _) if c.semanticEquals(g) => al.name
    }
    own ++ viaOutput
  }

  private[plans] def keyGrain(side: LogicalPlan, keys: Set[String],
      bounded: Set[String]): Boolean = {
    def grainOf(gks: Set[String], ks: Set[String]): Boolean =
      gks.subsetOf(ks ++ bounded)
    def walk(p: LogicalPlan, ks: Set[String]): Boolean = p match {
      case a: Aggregate =>
        // one output row per distinct grouping TUPLE, so the grain is
        // the grouping expressions' OUTPUT names (references would be
        // wrong both ways: `nullif(k, 17)` references k but its grain
        // IS the grouped output column, and a finer-keyed aggregate
        // referencing the join key is precisely NOT mult-bounded);
        // each grouping expr must be exposed under SOME name the join
        // key set (or a bounded domain) covers
        a.groupingExpressions.forall { g =>
          val names = groupingNames(g, a)
          names.nonEmpty && names.exists(n => (ks ++ bounded).contains(n))
        }
      case pr: Project =>
        // remap tracked names through simple renames; a key produced
        // by a non-attribute expression is untraceable -> not grain
        val remapped = ks.map { k =>
          pr.projectList.find(_.name == k) match {
            case Some(at: Attribute) => Some(at.name)
            case Some(Alias(child: Attribute, _)) => Some(child.name)
            case Some(_) => None
            case None => Some(k) // not projected here (shouldn't happen)
          }
        }
        remapped.forall(_.isDefined) &&
          walk(pr.child, remapped.flatten)
      case f: Filter => walk(f.child, ks)
      case s: Sort => walk(s.child, ks)
      case w: Window => walk(w.child, ks)
      case w: WindowGroupLimit => walk(w.child, ks)
      case r: Repartition => walk(r.child, ks)
      case r: RepartitionByExpression => walk(r.child, ks)
      case l: LocalLimit => walk(l.child, ks)
      case l: GlobalLimit => walk(l.child, ks)
      case imr: InMemoryRelation =>
        // persist() hides the producing Aggregate behind the cache
        // leaf; read the grain off the cached PHYSICAL aggregate
        // (same unwrap as BroadcastGuard's boundedness recovery)
        val phys = imr.cachedPlan match {
          case a: AdaptiveSparkPlanExec => a.inputPlan
          case p0 => p0
        }
        phys.collect { case a: BaseAggregateExec =>
          // physical grouping expressions are named — grain by name
          a.groupingExpressions.map(_.name).toSet
        }.exists(g => grainOf(g, ks))
      case _ => false
    }
    walk(side, keys)
  }

  /** Trace a join-key column through rename-transparent operators to
    * its source column name (fixpoint through bare-attribute aliases;
    * stops at anything opaque). Lets the entity test see through the
    * self-join idiom `t.select(col("c_custkey").as("key_a"))`. */
  private[plans] def resolveSource(side: LogicalPlan, name: String): String = {
    def walk(p: LogicalPlan, n: String): String = p match {
      case pr: Project =>
        pr.projectList.find(_.name == n) match {
          case Some(Alias(child: Attribute, _)) => walk(pr.child, child.name)
          case Some(at: Attribute) => walk(pr.child, at.name)
          case _ => n
        }
      case f: Filter => walk(f.child, n)
      case s: Sort => walk(s.child, n)
      case w: Window => walk(w.child, n)
      case w: WindowGroupLimit => walk(w.child, n)
      case r: Repartition => walk(r.child, n)
      case r: RepartitionByExpression => walk(r.child, n)
      case l: LocalLimit => walk(l.child, n)
      case l: GlobalLimit => walk(l.child, n)
      case _ => n
    }
    walk(side, name)
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  /** Equi-key pairs of a join, oriented (left attr, right attr) —
    * same extraction as [[ShuffleKeyGuard]]'s. */
  private def equiKeys(j: Join): Seq[(Attribute, Attribute)] =
    j.condition.toSeq.flatMap(conjuncts).collect {
      case org.apache.spark.sql.catalyst.expressions
          .EqualTo(a: Attribute, b: Attribute) => (a, b)
      case org.apache.spark.sql.catalyst.expressions
          .EqualNullSafe(a: Attribute, b: Attribute) => (a, b)
    }.flatMap { case (a, b) =>
      if (j.left.outputSet.contains(a) && j.right.outputSet.contains(b))
        Some((a, b))
      else if (j.left.outputSet.contains(b) && j.right.outputSet.contains(a))
        Some((b, a))
      else None
    }

  private def isBroadcast(h: Option[HintInfo]): Boolean =
    h.flatMap(_.strategy).exists(_.toString.contains("broadcast"))

  /** Census of `plan`: every OUTPUT-MULTIPLYING equi-join whose key
    * carries no entity-grain column, whose BOTH sides scale with the
    * data, and whose BOTH sides are raw (not aggregated to join-key
    * grain) — the quadratic-pair-mass shape. Out of scope with the
    * reason on record:
    *   - joins carrying an explicit broadcast hint on either side —
    *     a broadcast-hash join has NO key-hash exchange at all (the
    *     hot key's probe rows stay spread across map tasks; whether
    *     the broadcast side's SIZE is sane is [[BroadcastGuard]]'s
    *     census, not this one);
    *   - semi/anti/existence joins — per key the output is ≤ the left
    *     multiplicity (a filter, never a pair multiplication), so the
    *     mass is linear in the input at any skew.
    * Boundedness parameters are the shared [[BroadcastGuard.audit]]
    * domain knowledge. */
  def audit(plan: LogicalPlan, entityKeys: Set[String],
      fixedTables: Set[String] = BroadcastGuard.FixedCardTables,
      boundedCardKeys: Set[String] = Set.empty,
      probeKeys: Set[String] = Set.empty): Seq[Finding] = {
    val unb = BroadcastGuard.unboundedLeaves(
      fixedTables, boundedCardKeys, probeKeys) _
    plan.collect {
      case j: Join
          if j.joinType != LeftSemi && j.joinType != LeftAnti &&
            !j.joinType.isInstanceOf[ExistenceJoin] &&
            !isBroadcast(j.hint.leftHint) && !isBroadcast(j.hint.rightHint) =>
        val keys = equiKeys(j)
        // entity test sees through self-join renames: key_a/id_b trace
        // back to the source column whose multiplicity contract holds
        val traced = keys.flatMap { case (a, b) =>
          Seq(resolveSource(j.left, a.name), resolveSource(j.right, b.name))
        }
        val names = keys.flatMap(p => Seq(p._1.name, p._2.name)).distinct
        if (keys.isEmpty ||
            (names ++ traced).exists(entityKeys.contains)) Nil
        else {
          val l = unb(j.left)
          val r = unb(j.right)
          if (l.isEmpty || r.isEmpty) Nil // bounded side -> AQE broadcast
          else {
            val lGrain =
              keyGrain(j.left, keys.map(_._1.name).toSet, boundedCardKeys)
            val rGrain =
              keyGrain(j.right, keys.map(_._2.name).toSet, boundedCardKeys)
            if (lGrain || rGrain) Nil // ladder steps 2-3
            else Seq(Finding(names, l.distinct, r.distinct))
          }
        }
    }.flatten
  }
}

/** The in-optimizer skew lint, completing the guard family's
  * extensions seam alongside [[WindowGuardRule]] / [[BroadcastGuardRule]]
  * / [[WidthGuardRule]] / [[ShuffleKeyGuardRule]]: audits (never
  * rewrites) each plan per `spark.graft.skewGuard` — `warn` logs one
  * line per finding, `fail` throws, `off` (default) disables. Entity
  * and bounded-domain key names are domain knowledge the rule cannot
  * infer, declared once per session via
  * `spark.graft.skewGuard.entityKeys` /
  * `spark.graft.skewGuard.boundedKeys` (comma-separated); with
  * neither declared the rule still lints the domain-free core (every
  * untraceable raw×raw content join). Registered via
  * `injectPreCBORule` for the same once-per-query/post-pushdown
  * reasons as the siblings. */
object SkewGuardRule
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {

  private def mode: String =
    conf.getConfString("spark.graft.skewGuard", "off")

  private def keySet(confKey: String): Set[String] =
    conf.getConfString(confKey, "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val m = mode
    if (m != "off") {
      val findings = SkewGuard.audit(plan,
        keySet("spark.graft.skewGuard.entityKeys"),
        BroadcastGuard.FixedCardTables,
        keySet("spark.graft.skewGuard.boundedKeys"))
      if (findings.nonEmpty && m == "fail")
        throw new IllegalStateException(
          "SkewGuard: " + findings.map(_.describe).mkString("; "))
      findings.foreach(f => logWarning(s"SkewGuard: ${f.describe}"))
    }
    plan
  }
}
