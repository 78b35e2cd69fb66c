package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, SessionWindow, TimeWindow}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Deduplicate, DeduplicateWithinWatermark, EventTimeWatermark, FlatMapGroupsWithState, Join, LogicalPlan, TransformWithState}
import org.apache.spark.sql.streaming.GroupStateTimeout

/** STREAMING-STATE width census — the sixth member of the census family
  * ([[WindowGuard]]: low-parallelism window sorts; [[AggStateGuard]]:
  * value-sized aggregation buffers; [[BroadcastGuard]]: scaling
  * broadcast hints / cartesians; [[WidthGuard]]: over-wide
  * materializations and Generate passthroughs).
  *
  * Declarative streaming operators (windowed aggregates, streaming
  * dedup) are column-pruned by Catalyst like any batch plan: only the
  * grouping keys and aggregated inputs reach the shuffle and the state
  * store. The TYPED stateful operators are different in kind: a
  * `flatMapGroupsWithState` / `transformWithState` closure is opaque to
  * the optimizer, and its Row deserializer references every field of
  * the schema it is handed — so Catalyst CANNOT prune through it, and
  * every column of the grouped frame rides the hash shuffle, the
  * per-key grouping sort, and (for buffered rows) the state store at
  * full width. A payload column the closure never reads (the events
  * shape's free-form `props` JSON string — or, on a production bus,
  * kilobytes of envelope) is pure shuffle-and-state waste, invisible at
  * test scale and very much not at 100 TB. The same blindness applies
  * to a stream-stream join, which buffers BOTH sides' full rows in the
  * state store for the watermark-bounded range.
  *
  * Because the closure is a Scala function, no plan walk can compute
  * its true read-set — this census is therefore contract-shaped where
  * the batch censuses are mechanical: [[statefulInputs]] inventories
  * every typed-stateful operator's exact fed column set (the logical
  * nodes carry it as `dataAttributes`) and every stream-stream join's
  * buffered side widths, and the spec pins each head's reviewed
  * read-set. A head that starts feeding an unreviewed column fails the
  * census; the fix is the one the round-12 rework applied to all four
  * event heads — `select()` the closure's exact read-set BEFORE
  * `groupByKey` (the streaming sibling of the width census's
  * select-before-persist discipline). */
object StreamStateGuard {

  /** One typed-stateful operator and the columns it is fed: `grouping`
    * the key attributes, `data` the full per-row schema the closure
    * receives (= what the shuffle and state carry). */
  case class StatefulInput(kind: String, grouping: Seq[String],
      data: Seq[String])

  /** One stream-stream join and the column sets buffered per side in
    * the state store. */
  case class StreamJoin(left: Seq[String], right: Seq[String])

  /** Inventory of typed-stateful operators in `plan` (works on the
    * analyzed plan — `dataAttributes` is fixed at analysis and the
    * optimizer cannot change it, which is exactly the hazard). */
  def statefulInputs(plan: LogicalPlan): Seq[StatefulInput] = plan.collect {
    case f: FlatMapGroupsWithState =>
      StatefulInput("FlatMapGroupsWithState",
        f.groupingAttributes.map(_.name), f.dataAttributes.map(_.name))
    case t: TransformWithState =>
      StatefulInput("TransformWithState",
        t.groupingAttributes.map(_.name), t.dataAttributes.map(_.name))
  }

  /** Inventory of stream-stream joins (both inputs streaming — each
    * side's rows are buffered in the state store until the other
    * side's watermark clears them). */
  def streamJoins(plan: LogicalPlan): Seq[StreamJoin] = plan.collect {
    case j: Join if j.left.isStreaming && j.right.isStreaming =>
      StreamJoin(j.left.output.map(_.name), j.right.output.map(_.name))
  }

  /** One over-fed stateful operator: columns shuffled into state beyond
    * the head's pinned closure read-set. */
  case class Finding(kind: String, excess: Seq[String]) {
    def describe: String =
      s"$kind is fed column(s) [${excess.mkString(", ")}] outside its " +
        "pinned closure read-set: Catalyst cannot prune through a typed " +
        "stateful closure (the Row deserializer references every field), " +
        "so unread columns ride the shuffle, the grouping sort, and the " +
        "state store at full width — select() the closure's exact " +
        "read-set before groupByKey"
  }

  /** Census audit: every typed-stateful operator's fed columns must be
    * inside `needed` (the union of pinned closure read-sets for the
    * head under audit — per-head pins live in the spec). */
  def audit(plan: LogicalPlan, needed: Set[String]): Seq[Finding] =
    statefulInputs(plan).flatMap { si =>
      val excess = si.data.filterNot(needed)
      if (excess.isEmpty) None else Some(Finding(si.kind, excess))
    }

  /** One state-LIFETIME hazard: a stateful streaming operator whose
    * per-key state is never evicted, so the store grows with the
    * key domain forever — bounded at test scale, unbounded on an
    * infinite stream (the width census's other axis: columns × keys
    * = store size; [[audit]] bounds the columns, this bounds the
    * keys). */
  case class LifetimeFinding(kind: String, reason: String) {
    def describe: String =
      s"$kind: $reason — state is never evicted and the store grows " +
        "with the key domain; bound it with a watermark + " +
        "window/session grouping, an event-time/processing-time " +
        "timeout, dropDuplicatesWithinWatermark, or a watermark-range " +
        "join condition"
  }

  private def hasWatermark(p: LogicalPlan): Boolean =
    p.collectFirst { case _: EventTimeWatermark => () }.isDefined

  private def windowed(groupingExprs: Seq[Expression]): Boolean =
    groupingExprs.exists(_.exists {
      case _: TimeWindow | _: SessionWindow => true
      // post-analysis the window expression may already be resolved
      // to its struct output attribute
      case a: Attribute => a.name == "window" || a.name == "session_window"
      case _ => false
    })

  /** A join-condition conjunct that bounds the buffered range: a
    * non-equality comparison whose two sides reference opposite join
    * inputs (the `click_ts BETWEEN view_ts AND view_ts + 30 min`
    * idiom) — with both sides watermarked, Spark derives state
    * eviction bounds from it. */
  private def timeRangeBound(j: Join): Boolean =
    j.condition.toSeq.flatMap(splitConjuncts).exists { c =>
      val sides = c match {
        case GreaterThan(l, r) => Some((l, r))
        case GreaterThanOrEqual(l, r) => Some((l, r))
        case LessThan(l, r) => Some((l, r))
        case LessThanOrEqual(l, r) => Some((l, r))
        case _ => None
      }
      sides.exists { case (l, r) =>
        val (lr, rr) = (l.references, r.references)
        lr.nonEmpty && rr.nonEmpty &&
          ((lr.subsetOf(j.left.outputSet) && rr.subsetOf(j.right.outputSet)) ||
            (lr.subsetOf(j.right.outputSet) && rr.subsetOf(j.left.outputSet)))
      }
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      splitConjuncts(l) ++ splitConjuncts(r)
    case x => Seq(x)
  }

  /** State-lifetime census of a streaming plan (analyzed): flags
    * every stateful operator with no eviction path. Sketch/serving
    * maintenance tables whose state IS the product (bounded by the
    * sketch's own contract, not by time) carry reviewed pins in the
    * spec instead. */
  def auditLifetime(plan: LogicalPlan): Seq[LifetimeFinding] = plan.collect {
    case a: Aggregate if a.child.isStreaming &&
        !(windowed(a.groupingExpressions) && hasWatermark(a.child)) =>
      Seq(LifetimeFinding("streaming Aggregate",
        if (!hasWatermark(a.child)) "no watermark below the aggregate"
        else "grouping has no time/session window — per-key state " +
          "lives forever even under a watermark"))
    case f: FlatMapGroupsWithState if f.child.isStreaming =>
      if (f.timeout == GroupStateTimeout.NoTimeout)
        Seq(LifetimeFinding("FlatMapGroupsWithState",
          "GroupStateTimeout.NoTimeout — idle keys are never expired"))
      else if (f.timeout == GroupStateTimeout.EventTimeTimeout &&
          !hasWatermark(f.child))
        Seq(LifetimeFinding("FlatMapGroupsWithState",
          "EventTimeTimeout with no watermark — timers never fire"))
      else Nil
    case t: TransformWithState if t.child.isStreaming =>
      // TimeMode.None: the processor has no timer surface at all, so
      // nothing inside it can ever expire state; EventTime needs the
      // watermark that drives the timers
      if (t.timeMode == org.apache.spark.sql.streaming.TimeMode.None)
        Seq(LifetimeFinding("TransformWithState",
          "TimeMode.None — the processor has no timers to expire state"))
      else if (t.timeMode == org.apache.spark.sql.streaming.TimeMode.EventTime
          && !hasWatermark(t.child))
        Seq(LifetimeFinding("TransformWithState",
          "EventTime timers with no watermark — timers never fire"))
      else Nil
    case d: Deduplicate if d.child.isStreaming =>
      // plain dropDuplicates buffers every key forever unless an
      // event-time column is part of the dedup key under a watermark
      val eventTimeKey = d.keys.exists(_.metadata.contains(
        EventTimeWatermark.delayKey))
      if (eventTimeKey && hasWatermark(d.child)) Nil
      else Seq(LifetimeFinding("streaming Deduplicate",
        "dropDuplicates without a watermarked event-time key — use " +
          "dropDuplicatesWithinWatermark"))
    case d: DeduplicateWithinWatermark if d.child.isStreaming &&
        !hasWatermark(d.child) =>
      Seq(LifetimeFinding("DeduplicateWithinWatermark",
        "no watermark below — nothing defines the eviction horizon"))
    case j: Join if j.left.isStreaming && j.right.isStreaming &&
        !(hasWatermark(j.left) && hasWatermark(j.right) &&
          timeRangeBound(j)) =>
      Seq(LifetimeFinding("stream-stream Join",
        "both sides buffer in the state store; without watermarks on " +
          "both inputs AND an inter-side time-range condition the " +
          "buffers are never cleared"))
  }.flatten
}
