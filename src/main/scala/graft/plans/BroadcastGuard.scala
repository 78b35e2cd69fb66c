package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, InSet, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, BROADCAST, Filter, GlobalLimit, Join, LocalLimit, LocalRelation, LogicalPlan, OneRowRelation, ResolvedHint, Range => LRange}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.columnar.InMemoryRelation
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Plan-time census of the BROADCAST-HINT collapse — the third member
  * of the census family ([[WindowGuard]]: low-parallelism window
  * sorts; [[AggStateGuard]]: value-sized aggregation buffers).
  *
  * A hard `broadcast(df)` hint is a promise that `df` fits in every
  * executor (and transits the driver) AT ANY DATA SCALE — Spark obeys
  * it unconditionally, with no size check and no AQE fallback. The
  * promise is a fact for frames whose cardinality is fixed by the
  * SCHEMA or the MODEL (nation 25 / region 5 rows at every TPC-H SF;
  * a K-row centroid table; a 1-row stats aggregate; a per-group
  * quantile frame over a handful-of-values group) and a forced OOM
  * for frames that merely LOOK small at test scale but grow with the
  * data: customer/part/supplier scale with SF (billions of rows at
  * the 100 TB target — "small relative to lineitem" is not
  * broadcastable), a vocabulary grows with the corpus (Heaps' law).
  * Exactly the window-collapse failure mode relocated from the sort
  * to the broadcast exchange: invisible at sf0.1 — the hinted plan is
  * often FASTER there — and catastrophic at 100 TB. The fix is
  * usually to DROP the hint (AQE broadcasts from runtime sizes at
  * small scale and shuffle-joins at large — the round-11 census fixed
  * q03/q85/q86 that way), to broadcast the other, genuinely bounded
  * side (q62: the 25-doc probe tf, not the vocabulary-sized df
  * table), or to reshape onto a bounded frame (q134: the stoplist —
  * ≤ avg-distinct-tokens-per-doc / 0.79 rows at any corpus size — as
  * a broadcast anti join, instead of the full vocabulary).
  *
  * The census flags each side of a `Join` carrying a BROADCAST hint
  * unless the hinted subtree is bounded BY CONSTRUCTION, established
  * recursively (deliberately stricter than the sibling censuses'
  * any-Aggregate-below escape, which would clear a vocabulary-sized
  * `groupBy(term)` — the exact shape the round-11 hand sweep caught
  * in q62/q134):
  *   - an `Aggregate` is bounded iff every grouping key is in the
  *     caller's bounded-cardinality set (a global aggregate trivially
  *     qualifies; `bkt`-style bucket keys are O(cluster), quantile
  *     group keys are the callers' low-card contract) OR its input is
  *     itself bounded (an aggregate never has more rows than its
  *     input);
  *   - a `Limit` is bounded;
  *   - a `Filter` is bounded if a top-level conjunct POSITIVELY
  *     bounds a caller-declared probe-set key to literals —
  *     `vec_id < 20`, `doc_id = 3`, `term IN (fixed list)` — the
  *     fixed query/anchor/probe-set idiom. Negations (`term != ''`)
  *     and non-probe columns do not clear; the literal's magnitude is
  *     not judged (may-find: `doc_id < 10^9` would clear — reviewed
  *     pins cover what the shape test cannot);
  *   - a leaf is bounded if it is a `LocalRelation` (collected model
  *     state), a small `Range`, `OneRowRelation`, or a scan of a
  *     caller-declared FIXED-cardinality table;
  *   - any other node is bounded iff all its children are (row-count
  *     may-find: a `Generate`/explode can multiply a bounded frame by
  *     per-row array size — reviewed pins again).
  * Remaining hits either get fixed or carry a reviewed pin in
  * `WindowCensusSpec.BcastCleared`, which runs this audit over every
  * registered query's optimized plan alongside the other two. */
object BroadcastGuard {

  /** Tables whose cardinality is fixed by the schema at every scale
    * factor (TPC-H: nation = 25 rows, region = 5 — scale-INdependent,
    * unlike customer/part/supplier, which are "dimensions" only
    * relative to lineitem and grow as SF x 150k/200k/10k). */
  val FixedCardTables: Set[String] = Set("nation", "region")

  /** One flagged broadcast side: the unbounded leaf names feeding the
    * hinted subtree and which join side carried the hint. */
  case class Finding(leaves: Seq[String], side: String) {
    def describe: String =
      s"hard broadcast() of a frame fed by scaling leaf(s) " +
        s"[${leaves.mkString(", ")}] ($side join side) with no " +
        "bounding aggregate/limit/probe-filter on the path: the hint " +
        "forces an every-executor copy of a frame that grows with the " +
        "data — drop the hint (AQE decides from runtime sizes), " +
        "broadcast the bounded side instead, or reshape onto a " +
        "bounded frame (PERF.md round-11 broadcast census)"
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  /** A top-level conjunct that pins `probeKeys` columns to literal
    * values/bounds — the fixed-probe-set idiom. Matched at conjunct
    * top level only, so `Not(term = '')` never clears. */
  private def probeBounds(cond: Expression, probeKeys: Set[String]): Boolean =
    conjuncts(cond).exists {
      case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        probeKeys.contains(a.name)
      case InSet(a: AttributeReference, _) => probeKeys.contains(a.name)
      case EqualTo(a: AttributeReference, _: Literal) => probeKeys.contains(a.name)
      case EqualTo(_: Literal, a: AttributeReference) => probeKeys.contains(a.name)
      case LessThan(a: AttributeReference, _: Literal) => probeKeys.contains(a.name)
      case LessThanOrEqual(a: AttributeReference, _: Literal) => probeKeys.contains(a.name)
      case GreaterThan(_: Literal, a: AttributeReference) => probeKeys.contains(a.name)
      case GreaterThanOrEqual(_: Literal, a: AttributeReference) => probeKeys.contains(a.name)
      case _ => false
    }

  /** Census of `plan`: every hard-broadcast join side whose subtree
    * cannot be shown bounded. `fixedTables` are scan names with
    * schema-fixed cardinality; `boundedCardKeys` are column names
    * with O(1)-or-O(cluster) distinct values (grouping by only these
    * bounds an aggregate); `probeKeys` are columns whose literal
    * filters mark a fixed probe/query set. All three are domain
    * knowledge, like the sibling censuses' `lowCardKeys`. */
  def audit(plan: LogicalPlan,
      fixedTables: Set[String] = FixedCardTables,
      boundedCardKeys: Set[String] = Set.empty,
      probeKeys: Set[String] = Set.empty): Seq[Finding] =
    auditBroadcast(plan,
      unboundedLeaves(fixedTables, boundedCardKeys, probeKeys))

  /** The recursive boundedness test shared by the broadcast,
    * cartesian, and shuffle-key ([[ShuffleKeyGuard]]) censuses: Nil =
    * the subtree is bounded by construction; non-empty = the unbounded
    * leaf names found. */
  private[plans] def unboundedLeaves(fixedTables: Set[String],
      boundedCardKeys: Set[String], probeKeys: Set[String])(
      p: LogicalPlan): Seq[String] = {
    def unb(p: LogicalPlan): Seq[String] = p match {
      case a: Aggregate =>
        val gks = a.groupingExpressions.flatMap(_.references.toSeq.map(_.name))
        if (gks.forall(boundedCardKeys.contains)) Nil else unb(a.child)
      case _: GlobalLimit | _: LocalLimit => Nil
      case f: Filter if probeBounds(f.condition, probeKeys) => Nil
      case lr: LogicalRelation =>
        val names = lr.relation match {
          case h: HadoopFsRelation =>
            h.location.rootPaths
              .map(_.getName.stripSuffix(".parquet")).distinct
          case other => Seq(other.getClass.getSimpleName)
        }
        names.filterNot(fixedTables.contains)
      case _: LocalRelation => Nil
      case _: OneRowRelation => Nil
      // a persist() substitutes an InMemoryRelation LEAF for the
      // cached subtree (CacheManager rewrite — ExactQuantiles'
      // histogram/stats frames hit this), hiding the logical
      // Aggregate; recover the boundedness evidence from the cached
      // PHYSICAL plan's aggregate grouping keys
      case imr: InMemoryRelation =>
        // under AQE the cached plan root is an AdaptiveSparkPlanExec
        // LEAF wrapper — unwrap to its input plan before walking
        val phys = imr.cachedPlan match {
          case a: AdaptiveSparkPlanExec => a.inputPlan
          case p => p
        }
        val boundedAgg = phys.collect { case a: BaseAggregateExec =>
          a.groupingExpressions.flatMap(_.references.toSeq.map(_.name))
        }.exists(g => g.forall(boundedCardKeys.contains))
        if (boundedAgg) Nil else Seq("InMemoryRelation")
      case r: LRange =>
        if (r.numElements.isValidLong && r.numElements.longValue <= 100000) Nil
        else Seq(s"range(${r.numElements})")
      case leaf if leaf.children.isEmpty => Seq(leaf.nodeName)
      case other => other.children.flatMap(unb)
    }
    unb(p)
  }

  /** Census of `plan`: every CROSS join (explicit `crossJoin` /
    * condition-less join) where BOTH sides are unbounded — an
    * O(n·m) row blow-up no partitioning hides. A cross with one
    * bounded side is linear (a spine/epoch/offset fan-out or a
    * 1-row stats attach — the legitimate idiom all 9 of this repo's
    * unhinted crossJoin sites use); a cross of two data-sized frames
    * survives test scale and detonates at 100 TB. Theta joins
    * (condition present, no equi keys) are out of scope here —
    * they reduce to the same physical nested loop but carry
    * intent a shape test cannot judge (q77's is nation x nation,
    * reviewed). */
  def auditCartesian(plan: LogicalPlan,
      fixedTables: Set[String] = FixedCardTables,
      boundedCardKeys: Set[String] = Set.empty,
      probeKeys: Set[String] = Set.empty): Seq[Finding] = {
    val unb = unboundedLeaves(fixedTables, boundedCardKeys, probeKeys) _
    plan.collect {
      case j: Join if j.condition.isEmpty &&
          j.joinType == org.apache.spark.sql.catalyst.plans.Cross =>
        val l = unb(j.left)
        val r = unb(j.right)
        if (l.nonEmpty && r.nonEmpty)
          Some(Finding((l ++ r).distinct, "cartesian"))
        else None
    }.flatten
  }

  private def auditBroadcast(plan: LogicalPlan,
      unb: LogicalPlan => Seq[String]): Seq[Finding] = {
    plan.collect {
      case j: Join =>
        val sides =
          j.hint.leftHint.toSeq.filter(_.strategy.contains(BROADCAST))
            .map(_ => ("left", j.left)) ++
          j.hint.rightHint.toSeq.filter(_.strategy.contains(BROADCAST))
            .map(_ => ("right", j.right))
        sides.flatMap { case (side, sub) =>
          val leaves = unb(sub)
          if (leaves.isEmpty) None else Some(Finding(leaves.distinct, side))
        }
      // analyzed-plan form (optimized plans fold hints into Join.hint)
      case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) =>
        val leaves = unb(h.child)
        if (leaves.isEmpty) Nil else Seq(Finding(leaves.distinct, "hinted"))
    }.flatten
  }

  /** Census of a DataFrame's OPTIMIZED plan (post-pushdown and
    * post-hint-resolution, so the hinted subtree is what the exchange
    * would actually materialize). */
  def audit(df: DataFrame, fixedTables: Set[String],
      boundedCardKeys: Set[String], probeKeys: Set[String]): Seq[Finding] =
    audit(df.queryExecution.optimizedPlan, fixedTables, boundedCardKeys,
      probeKeys)
}

/** The in-optimizer broadcast lint, the exchange-side sibling of
  * [[WindowGuardRule]]: audits (never rewrites) each plan's hard
  * broadcast hints with the domain-knowledge-free defaults (fixed
  * tables = nation/region; no bounded-key or probe-key knowledge) and
  * reports per `spark.graft.broadcastGuard` — `warn` logs one line
  * per finding, `fail` throws, `off` disables.
  *
  * Default is OFF, unlike the window rule's `warn`: a partition-less
  * window over raw data is near-certainly wrong, but a hard broadcast
  * of a non-fixed table is often justified by domain knowledge the
  * session rule cannot have (a genuinely bounded config/model table
  * the caller knows is small at every scale). Turning the lint on is
  * a per-session CI choice; the registered-query census in
  * `WindowCensusSpec` runs the FULL audit (with this repo's bounded
  * keys, probe keys, and reviewed pins) regardless. Registered via
  * `injectPreCBORule` for the same once-per-query/post-pushdown
  * reasons as [[WindowGuardRule]]. */
object BroadcastGuardRule
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {

  private def mode: String =
    conf.getConfString("spark.graft.broadcastGuard", "off")

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val m = mode
    if (m != "off") {
      val findings = BroadcastGuard.audit(plan)
      if (findings.nonEmpty && m == "fail")
        throw new IllegalStateException(
          "BroadcastGuard: " + findings.map(_.describe).mkString("; "))
      findings.foreach(f => logWarning(s"BroadcastGuard: ${f.describe}"))
    }
    plan
  }
}
