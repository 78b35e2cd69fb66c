package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{FlatMapGroupsWithState, Join, LogicalPlan, TransformWithState}

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
}
