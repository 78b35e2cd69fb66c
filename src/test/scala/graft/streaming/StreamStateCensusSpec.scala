package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase
import graft.plans.StreamStateGuard

/** STREAMING-STATE width census (round 12) — the typed-stateful sibling
  * of WindowCensusSpec's width census. Catalyst cannot prune columns
  * through a `flatMapGroupsWithState` / `transformWithState` closure
  * (the Row deserializer references every field it is handed), so
  * whatever the head feeds `groupByKey` rides the shuffle, the per-key
  * grouping sort, and the state store at full width. The round-12
  * rework projected each event head's exact closure read-set before
  * `groupByKey`, dropping the free-form `props` payload (and the unread
  * `event_id`) from the stateful path; this spec pins those read-sets
  * so a head cannot regrow width unreviewed, and pins the stream-stream
  * join's buffered side widths the same way.
  *
  * The audit is contract-shaped where the batch censuses are
  * mechanical, because a closure's true read-set is invisible to any
  * plan walk — the pins below ARE the review. The controls prove the
  * detector sees the pre-fix shape and that declarative streaming heads
  * don't need pins at all (Catalyst prunes them like any batch plan). */
class StreamStateCensusSpec extends SparkTestBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def events(): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    MemoryStream[Ev](spark).toDF()
  }

  /** Reviewed closure read-sets: the only columns each typed-stateful
    * head may feed its closure (grouping key included — it rides the
    * shuffle by definition). */
  private val Pinned: Map[String, (org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame, Set[String])] = Map(
    "statefulUserTotals" ->
      (EventStream.statefulUserTotals _, Set("user_id", "ts", "value")),
    "statefulUserTotalsV2" ->
      (EventStream.statefulUserTotalsV2 _, Set("user_id", "ts", "value")),
    "streamingFunnel" ->
      (EventStream.streamingFunnel _, Set("user_id", "ts", "event_type")),
    "streamingFunnelV2" ->
      (EventStream.streamingFunnelV2 _, Set("user_id", "ts", "event_type")))

  test("streaming-state census: every typed-stateful head feeds its " +
    "closure exactly the pinned read-set — nothing else reaches the " +
    "shuffle or the state store") {
    Pinned.foreach { case (name, (head, needed)) =>
      val plan = head(events()).queryExecution.analyzed
      val inputs = StreamStateGuard.statefulInputs(plan)
      assert(inputs.size == 1, s"$name: expected one stateful op: $inputs")
      // audit is clean against the pin...
      val findings = StreamStateGuard.audit(plan, needed)
      assert(findings.isEmpty,
        s"$name feeds unreviewed column(s) into state:\n" +
          findings.map(_.describe).mkString("\n"))
      // ...and the pin is tight: the head feeds every pinned column (a
      // stale over-wide pin would hide a future regression). Grouping
      // attributes are excluded — groupByKey's serialized key is a
      // synthetic attribute (literally named "value"), not a column.
      assert(inputs.head.data.toSet == needed,
        s"$name: pinned set $needed vs fed ${inputs.head.data}")
    }
  }

  test("streaming-state census: the stream-stream join buffers only " +
    "its projected 3-column sides") {
    val plan = EventStream.viewClickJoin(events(), events())
      .queryExecution.analyzed
    val joins = StreamStateGuard.streamJoins(plan)
    assert(joins.size == 1, s"expected one stream-stream join: $joins")
    assert(joins.head.left.toSet == Set("user_id", "view_id", "view_ts"),
      s"left side buffers ${joins.head.left}")
    assert(joins.head.right.toSet == Set("c_user", "click_id", "click_ts"),
      s"right side buffers ${joins.head.right}")
  }

  test("state-lifetime census: every streaming head has an eviction " +
    "path — watermarked windows, timeouts, watermark dedup, or a " +
    "time-range join bound (width bounds the columns; this bounds " +
    "the keys)") {
    val heads: Map[String, org.apache.spark.sql.DataFrame] = Map(
      "tumblingHourly" -> EventStream.tumblingHourly(events()),
      "slidingCounts" -> EventStream.slidingCounts(events()),
      "sessionCounts" -> EventStream.sessionCounts(events()),
      "dedup" -> EventStream.dedup(events()),
      "statefulUserTotals" -> EventStream.statefulUserTotals(events()),
      "streamingFunnel" -> EventStream.streamingFunnel(events()),
      "statefulUserTotalsV2" -> EventStream.statefulUserTotalsV2(events()),
      "streamingFunnelV2" -> EventStream.streamingFunnelV2(events()),
      "viewClickJoin" -> EventStream.viewClickJoin(events(), events()))
    heads.foreach { case (name, df) =>
      val findings = StreamStateGuard.auditLifetime(
        df.queryExecution.analyzed)
      assert(findings.isEmpty,
        s"$name grows state without bound:\n" +
          findings.map(_.describe).mkString("\n"))
    }
  }

  test("state-lifetime census controls: each unbounded shape fires — " +
    "keyed agg without a window, windowed agg without a watermark, " +
    "plain streaming dropDuplicates, NoTimeout typed state, and a " +
    "stream-stream join with no time-range bound") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode => OM}
    def kinds(df: org.apache.spark.sql.DataFrame): Seq[String] =
      StreamStateGuard.auditLifetime(df.queryExecution.analyzed).map(_.kind)
    // per-user running agg: watermark alone never evicts non-windowed
    // group state — the key domain grows forever
    assert(kinds(events().withWatermark("ts", "10 minutes")
      .groupBy(col("user_id")).count()) == Seq("streaming Aggregate"))
    // windowed agg without a watermark: windows never close
    assert(kinds(events().groupBy(window(col("ts"), "1 hour")).count()) ==
      Seq("streaming Aggregate"))
    // plain dropDuplicates buffers every key forever
    assert(kinds(events().dropDuplicates("event_id")) ==
      Seq("streaming Deduplicate"))
    // typed state with NoTimeout: idle keys are never expired
    val slim = events().select(col("user_id"), col("ts"), col("value"))
    implicit val rowEnc: org.apache.spark.sql.Encoder[Row] =
      Encoders.row(slim.schema)
    val noTimeout = slim.withWatermark("ts", "10 minutes")
      .groupByKey((r: Row) => r.getAs[Long]("user_id"))(Encoders.scalaLong)
      .flatMapGroupsWithState[UserTotal, UserTotal](
        OM.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[Row], state: GroupState[UserTotal]) =>
          Iterator.single(UserTotal(uid, rows.size.toLong, 0.0))
      }(Encoders.product[UserTotal], Encoders.product[UserTotal])
    assert(kinds(noTimeout.toDF()) == Seq("FlatMapGroupsWithState"))
    // equi-only stream-stream join: both watermarked, but no
    // inter-side time-range condition bounds the buffers
    val v = events().withWatermark("ts", "10 minutes")
    val c = events().withWatermark("ts", "10 minutes")
      .select(col("user_id").as("u2"), col("ts").as("ts2"))
    assert(kinds(v.join(c, col("user_id") === col("u2"))) ==
      Seq("stream-stream Join"))
  }

  test("streaming-state census controls: the pre-fix full-width shape " +
    "fires naming the payload; declarative heads self-prune without pins") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode => OM}
    // positive control: groupByKey on the FULL events frame — exactly
    // the shape all four heads carried before round 12
    val full = events()
    implicit val rowEnc: org.apache.spark.sql.Encoder[Row] =
      Encoders.row(full.schema)
    val bad = full.withWatermark("ts", "10 minutes")
      .groupByKey((r: Row) => r.getAs[Long]("user_id"))(Encoders.scalaLong)
      .flatMapGroupsWithState[UserTotal, UserTotal](
        OM.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[Row], state: GroupState[UserTotal]) =>
          Iterator.single(UserTotal(uid, rows.size.toLong, 0.0))
      }(Encoders.product[UserTotal], Encoders.product[UserTotal])
    val hits = StreamStateGuard.audit(bad.queryExecution.analyzed,
      Set("user_id", "ts", "value"))
    assert(hits.size == 1 &&
      hits.head.excess.toSet == Set("event_id", "event_type", "props"),
      s"$hits")
    // negative control: a declarative streaming aggregate needs no pin
    // — Catalyst prunes the unread columns like any batch plan (the
    // incremental planner runs the same optimizer). A streaming frame
    // cannot be optimized without start(), so run the SAME head on the
    // batch twin frame: after optimization no expression references
    // the payload, and the physical scan prunes to the referenced set.
    val agg = EventStream.slidingCounts(graft.Tables.events(spark, Sf))
    val optimized = agg.queryExecution.optimizedPlan
    assert(StreamStateGuard.statefulInputs(optimized).isEmpty)
    // leaves excluded: a relation leaf carries its own output attrs as
    // expression-typed constructor args (the WidthGuard census's
    // documented self-marking gotcha)
    val refs = optimized.collect {
      case n if n.children.nonEmpty =>
        n.expressions.flatMap(_.references.toSeq.map(_.name))
    }.flatten.toSet
    assert(!refs.contains("props") && !refs.contains("value") &&
      !refs.contains("event_id"),
      s"declarative head should prune the payload: $refs")
    assert(agg.queryExecution.executedPlan.toString.contains("ReadSchema") &&
      !agg.queryExecution.executedPlan.toString.contains("props"),
      "payload must not reach the parquet scan")
  }
}
