package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BoundReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** AS-OF JOIN as a first-class operator — the full custom-plan stack
  * (SURVEY.md §7.3 tier (c)): logical node → planner strategy →
  * physical exec, registered via `SparkSessionExtensions`
  * (`graft.functions.GraftExtensions`) or per-session through
  * `spark.experimental.extraStrategies`.
  *
  * Semantics (left as-of join, the time-series standard): for every
  * left row, the single right row with equal join keys and the GREATEST
  * right-time ≤ left-time; left rows with no such match keep NULLs on
  * the right (left-outer). SQL-null key or time never matches.
  *
  * Why a custom operator instead of composing built-ins: Spark has no
  * as-of join — the declarative re-expressions are a union + keyed
  * window carry (`EventOps.q27AsofJoin`, one shuffle of n+m rows, full
  * per-key sort of the merged stream, and only ONE carried right
  * column without widening the window state) or an inequality join
  * (BroadcastNestedLoop — quadratic). This exec is the shape a native
  * engine uses: co-partition both sides on the key (two shuffles that
  * AQE sizes independently), sort each side once, then a single
  * forward-only merge pass per partition — O(n+m) compares, ONE
  * buffered right row of state, and the whole right row is available
  * to the output, not one carried column.
  *
  * 100 TB posture: both shuffles are plain hash-partitioned exchanges
  * (skew-salting and AQE skew handling apply as with any join); the
  * merge holds one right row — memory per task is the sort's, which
  * spills. The exec declares `outputPartitioning`/`outputOrdering`
  * from its left child, so downstream per-key aggregates reuse the
  * exchange.
  */
case class AsofJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    forward: Boolean = false,
    toleranceUnits: Option[Long] = None) extends BinaryNode {

  require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
    "as-of join needs at least one equi-key pair")
  require(toleranceUnits.forall(_ >= 0), "tolerance must be non-negative")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoin]] → [[AsofJoinExec]]. Register through
  * `GraftExtensions` or `spark.experimental.extraStrategies`. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lt, rt, fwd, tol) =>
      AsofJoinExec(lk, rk, lt, rt, planLater(l), planLater(r), fwd, tol) :: Nil
    case _ => Nil
  }
}

/** Filter pushdown through [[AsofJoin]] — the `Rule[LogicalPlan]` tier
  * of the custom-operator stack. Catalyst's own PushDownPredicates
  * cannot see through an unknown node, so without this rule every
  * predicate a user writes above an as-of join sits there and the left
  * scan reads 100% of its data.
  *
  * Safe direction only: each output row derives from exactly ONE left
  * row (the join is 1:1 left-outer), so deterministic predicates over
  * left-side columns commute with the join and move into the left
  * child (then reach the parquet scan via PhysicalOperation).
  * Right-side predicates do NOT move — below the join they would
  * change which right row is "latest" and break the outer semantics —
  * exactly the left-outer pushdown asymmetry Catalyst applies to
  * built-in joins. */
object AsofJoinPushdown extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ org.apache.spark.sql.catalyst.plans.logical.Filter(cond, aj: AsofJoin) =>
      val (pushable, rest) = splitConjunctivePredicates(cond).partition(p =>
        p.deterministic && p.references.subsetOf(aj.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val pushed = aj.copy(left =
          org.apache.spark.sql.catalyst.plans.logical.Filter(
            pushable.reduce(org.apache.spark.sql.catalyst.expressions.And), aj.left))
        rest.reduceOption(org.apache.spark.sql.catalyst.expressions.And)
          .map(org.apache.spark.sql.catalyst.plans.logical.Filter(_, pushed))
          .getOrElse(pushed)
      }
  }
}

/** Sorted-merge as-of join: children co-partitioned on the keys and
  * sorted by (keys, time) — EnsureRequirements inserts the exchanges
  * and sorts — then one forward-only merge per partition.
  *
  * `forward = false` (default): greatest right time ≤ left time —
  * "latest version at or before". `forward = true`: SMALLEST right
  * time ≥ left time — "next event at or after"; the merge still
  * consumes each side once because left times are non-decreasing, so a
  * right row earlier than the current left is dead for every later
  * left too. `toleranceUnits` bounds |right − left| in the time
  * column's PHYSICAL units (microseconds for timestamps, days for
  * dates, the raw value for integral columns); a candidate outside the
  * window degrades to the left-outer NULL row — both knobs identical
  * in shape to pandas `merge_asof(direction=, tolerance=)`. */
case class AsofJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    left: SparkPlan,
    right: SparkPlan,
    forward: Boolean = false,
    toleranceUnits: Option[Long] = None) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  // left rows pass through in place and in order — let downstream
  // per-key operators reuse this exchange + sort
  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val (lk, rk, lt, rt) = (leftKeys, rightKeys, leftTime, rightTime)
    val keyTypes = lk.map(_.dataType)
    val timeType = lt.dataType
    val outAttrs = output
    val fwd = forward
    val tol = toleranceUnits
    // physical-long read of the time column, for the tolerance window
    val timeAsLong: InternalRow => Long = timeType match {
      case _ if tol.isEmpty => _ => 0L // never consulted
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType |
           org.apache.spark.sql.types.LongType => r => r.getLong(0)
      case org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.DateType => r => r.getInt(0).toLong
      case other => throw new IllegalArgumentException(
        s"as-of tolerance unsupported for time type $other")
    }
    left.execute().zipPartitions(right.execute(), preservesPartitioning = true) {
      (lIter, rIter) =>
        val lKeyProj = UnsafeProjection.create(lk, leftOut)
        val rKeyProj = UnsafeProjection.create(rk, rightOut)
        val lTimeProj = UnsafeProjection.create(Seq(lt), leftOut)
        val rTimeProj = UnsafeProjection.create(Seq(rt), rightOut)
        val keyOrd = GenerateOrdering.generate(keyTypes.zipWithIndex.map {
          case (dt, i) => SortOrder(BoundReference(i, dt, nullable = true), Ascending)
        })
        val timeOrd = GenerateOrdering.generate(Seq(
          SortOrder(BoundReference(0, timeType, nullable = true), Ascending)))
        // bind against a nullable view of the right schema: BindReferences
        // takes nullability from the INPUT attribute, and a non-nullable
        // right child would codegen away the null checks that the
        // no-match nullRight row needs
        val outProj = UnsafeProjection.create(outAttrs,
          leftOut ++ rightOut.map(_.withNullability(true)))
        val nullRight = new GenericInternalRow(rightOut.size)
        val joined = new JoinedRow
        val rBuf = rIter.buffered

        new Iterator[InternalRow] {
          // BACKWARD state: the latest time-eligible right row seen,
          // and for which key (rows ahead of the left cursor stay
          // unconsumed, so this is the operator's ENTIRE cross-row
          // state: one row + one key + its physical time)
          private var lastRight: InternalRow = _
          private var lastRightKey: UnsafeRow = _
          private var lastRightTimeU: Long = 0L

          override def hasNext: Boolean = lIter.hasNext

          override def next(): InternalRow = {
            val lrow = lIter.next()
            val lkRow = lKeyProj(lrow)
            val ltRow = lTimeProj(lrow)
            if (lkRow.anyNull || ltRow.isNullAt(0)) {
              // SQL semantics: NULL keys/times never match
              return outProj(joined(lrow, nullRight))
            }
            if (fwd) nextForward(lrow, lkRow, ltRow)
            else nextBackward(lrow, lkRow, ltRow)
          }

          private def nextBackward(lrow: InternalRow, lkRow: UnsafeRow,
              ltRow: InternalRow): InternalRow = {
            var done = false
            while (!done && rBuf.hasNext) {
              val rkRow = rKeyProj(rBuf.head)
              if (rkRow.anyNull) { rBuf.next() } // can never match anything
              else {
                val c = keyOrd.compare(rkRow, lkRow)
                if (c < 0) {
                  // left keys only grow — rights behind the key are dead
                  rBuf.next(); lastRight = null; lastRightKey = null
                } else if (c == 0) {
                  val rtRow = rTimeProj(rBuf.head)
                  if (rtRow.isNullAt(0)) { rBuf.next() }
                  else if (timeOrd.compare(rtRow, ltRow) <= 0) {
                    // newest time-eligible right so far for this key
                    // (lkRow == rkRow here, and lkRow is the stable buffer)
                    lastRightKey = lkRow.copy()
                    lastRightTimeU = timeAsLong(rtRow)
                    lastRight = rBuf.next().copy()
                  } else done = true // right is ahead in time — stop
                } else done = true // right is ahead in key — stop
              }
            }
            val matched = lastRight != null &&
              keyOrd.compare(lastRightKey, lkRow) == 0 &&
              tol.forall(timeAsLong(ltRow) - lastRightTimeU <= _)
            outProj(joined(lrow, if (matched) lastRight else nullRight))
          }

          private def nextForward(lrow: InternalRow, lkRow: UnsafeRow,
              ltRow: InternalRow): InternalRow = {
            // the candidate is rBuf.head, NOT consumed — a future right
            // can match many lefts ("next event at or after" is shared
            // by every left that precedes it)
            var candidate: InternalRow = null
            var candTimeU = 0L
            var done = false
            while (!done && rBuf.hasNext) {
              val rkRow = rKeyProj(rBuf.head)
              if (rkRow.anyNull) { rBuf.next() }
              else {
                val c = keyOrd.compare(rkRow, lkRow)
                if (c < 0) { rBuf.next() } // dead key
                else if (c == 0) {
                  val rtRow = rTimeProj(rBuf.head)
                  if (rtRow.isNullAt(0)) { rBuf.next() }
                  else if (timeOrd.compare(rtRow, ltRow) < 0) {
                    // earlier than this left — left times only grow, so
                    // it can never match a later left either
                    rBuf.next()
                  } else {
                    candidate = rBuf.head
                    candTimeU = timeAsLong(rtRow)
                    done = true
                  }
                } else done = true // right is ahead in key — no match
              }
            }
            val matched = candidate != null &&
              tol.forall(candTimeU - timeAsLong(ltRow) <= _)
            outProj(joined(lrow, if (matched) candidate else nullRight))
          }
        }
    }
  }
}
