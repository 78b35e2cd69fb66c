package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}
import org.apache.spark.sql.Row

/** Explicit per-user state for [[EventStream.statefulUserTotals]]. */
case class UserTotal(user_id: Long, n_events: Long, total_value: Double)

/** One funnel-relevant event buffered ahead of the watermark (micros
  * since epoch; kind 0..3 = signup/view/click/purchase). */
case class FunnelBuf(ts_us: Long, kind: Int)

/** Per-user funnel state for [[EventStream.streamingFunnel]]: events
  * not yet finalized by the watermark, plus the folded first-qualifying
  * stage timestamps (-1 = not reached). */
case class FunnelState(buf: Seq[FunnelBuf], s0: Long, v0: Long, c0: Long, p0: Long)

/** Update-mode output of [[EventStream.streamingFunnel]]. */
case class UserStage(user_id: Long, stage: Int)

/** Folded stage marks for the v2 funnel processor (-1 = not reached). */
case class FunnelMarks(s0: Long, v0: Long, c0: Long, p0: Long)

/** Structured Streaming over the `events` shape (event_id, ts, user_id,
  * event_type, value, props). The transforms are shared with the batch
  * twins in [[graft.queries.EventOps]] — the oracle-verified batch
  * results certify exactly the logic the stream runs incrementally.
  *
  * Scale posture: watermark + windowed aggregation keep state bounded
  * (late data beyond 10 min is dropped, closed windows are evicted);
  * streaming dedup keeps only keys inside the watermark horizon. State
  * is hash-partitioned by group key across executors.
  */
object EventStream {

  /** Raw wire schema of the `events` shape (ts = epoch nanos as LONG,
    * exactly as the parquet testdata stores it and as a message-bus
    * payload would carry it). */
  private[streaming] val RawEventsSchema =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType)))

  /** Sources whose frames already carry the events schema (need only
    * the ts normalization); everything else (kafka, kinesis, socket,
    * rate) emits an envelope for a parse stage like [[parseEventsJson]]. */
  private val FileFormats = Set("parquet", "json", "csv", "orc")

  /** Pluggable source seam — the north-star "IoT connectors" head as a
    * (format, options) pair, so switching from the file source to a
    * message bus is a CONFIG change, not a rewrite:
    * `readEventsStreamAs(s, "kafka", Map("kafka.bootstrap.servers" ->
    * …, "subscribe" -> "events"))` then [[parseEventsJson]] on the
    * value column, vs `readEventsStreamAs(s, "parquet", path =
    * Some(dir))`. File formats get the pinned raw schema (streaming
    * file sources require one) and the ns→µs event-time normalization;
    * non-file formats return the connector's native envelope for a
    * parse stage. Offline limitation, stated plainly: this sandbox has
    * no broker and no kafka connector jar, so only file sources (and
    * the built-in `rate` source) are exercisable here — the seam plus
    * [[parseEventsJson]] are the tested surface a kafka deployment
    * plugs into. */
  def readEventsStreamAs(s: SparkSession, format: String,
      options: Map[String, String] = Map.empty,
      path: Option[String] = None): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val reader = s.readStream.format(format).options(options)
    if (FileFormats(format)) {
      val dir = path.orElse(options.get("path")).getOrElse(
        throw new IllegalArgumentException(
          s"file source '$format' needs a path"))
      // TimestampType (not NTZ): EventTimeWatermark requires TIMESTAMP;
      // with the UTC session the instant and wall-clock values coincide.
      // File sources need a pinned schema, and the right one depends on
      // how the generator wrote ts (int64 NANOS — readable only as raw
      // longs — vs native TIMESTAMP(MICROS)): peek at the batch footer
      // once and pin the matching layout (same dual contract as
      // [[graft.Tables.events]]). The peek is an eager batch read and a
      // file-watch source's directory is routinely empty or not yet
      // created at stream-definition time — in that case fall back to
      // the raw nanos/long layout (the generator default), which is
      // what the pre-peek versions of this head always pinned. A layout
      // FLIP mid-stream still needs a restart: the schema is pinned per
      // stream definition, as Structured Streaming requires.
      val tsType =
        try s.read.parquet(dir).schema("ts").dataType
        catch { case _: org.apache.spark.sql.AnalysisException =>
          org.apache.spark.sql.types.LongType }
      if (tsType == org.apache.spark.sql.types.LongType)
        reader.schema(RawEventsSchema).load(dir)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else
        reader.schema(org.apache.spark.sql.types.StructType(
            RawEventsSchema.map(f => if (f.name == "ts") f.copy(dataType = tsType) else f)))
          .load(dir)
          .withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
    } else reader.load()
  }

  /** Message-bus payload parse: a binary/string JSON `value` column
    * (the kafka envelope's payload) → the events schema with the same
    * ts normalization as the file head. Pure expressions — testable
    * offline by feeding ANY frame with a `value` column, which is
    * exactly what the spec does via MemoryStream.
    *
    * Poison posture (PoisonInputSpec): a corrupt/wrong-shape/NULL
    * payload parses to a NULL struct, so every projected field of the
    * poison message is NULL and the ROW SURVIVES — callers filter or
    * quarantine on `event_id IS NULL`; nothing in this stage throws,
    * so one bad message can never wedge the stream. */
  def parseEventsJson(raw: DataFrame): DataFrame =
    raw.select(from_json(col("value").cast("string"), RawEventsSchema).as("e"))
      .select(col("e.event_id").as("event_id"),
        timestamp_micros(expr("e.ts div 1000")).as("ts"),
        col("e.user_id").as("user_id"),
        col("e.event_type").as("event_type"),
        col("e.value").as("value"),
        col("e.props").as("props"))

  /** The well-formed/dead-letter split for [[parseEventsJson]]'s
    * quarantine rows (all-NULL on poison). Measured posture
    * (PoisonInputSpec): a NULL-event-time row reaching a windowed
    * streaming aggregation does NOT leak state — Spark's `window()`
    * rewrite filters null-window rows, so the poison row contributes
    * no output row and no state row. The hazard is the opposite one:
    * the poison VANISHES SILENTLY. A pipeline that must account for
    * every message (audit, replay, loss budgets) splits BEFORE the
    * aggregation — `wellFormed` feeds the window,
    * `df.filter(col("event_id").isNull)` is the dead-letter branch
    * that makes the drop observable. */
  def wellFormed(parsed: DataFrame): DataFrame =
    parsed.filter(col("event_id").isNotNull && col("ts").isNotNull)

  /** Config-driven head (ConfigSession map): `source.format` picks the
    * connector (default parquet), `source.path` the file dir,
    * `source.option.*` passes connector options verbatim — a kafka
    * deployment changes the YAML, not the code. */
  def readEventsStreamConfigured(s: SparkSession,
      cfg: Map[String, String]): DataFrame = {
    val format = cfg.getOrElse("source.format", "parquet")
    val opts = cfg.collect {
      case (k, v) if k.startsWith("source.option.") =>
        k.drop("source.option.".length) -> v
    }
    readEventsStreamAs(s, format, opts, cfg.get("source.path"))
  }

  /** File-source ingest of the `events` parquet shape — the default
    * instantiation of [[readEventsStreamAs]]. New files appearing under
    * `dir` flow through incrementally; `maxFilesPerTrigger` caps batch
    * size. */
  def readEventsStream(s: SparkSession, dir: String): DataFrame =
    readEventsStreamAs(s, "parquet",
      Map("maxFilesPerTrigger" -> "8"), Some(dir))

  /** Tumbling 1-hour aggregate with a 10-minute watermark — the
    * streaming form of [[graft.queries.EventOps.q25TumblingWindow]].
    * Delegates to the SAME function the DuckDB oracle verifies, so the
    * streaming and batch aggregates cannot drift (an earlier hand-
    * copied version did drift to a plain double sum). */
  def tumblingHourly(stream: DataFrame): DataFrame =
    graft.queries.EventOps.tumblingHourly(
      stream.withWatermark("ts", "10 minutes"))

  /** Sliding windows: 1-hour window every 15 minutes. */
  def slidingCounts(stream: DataFrame): DataFrame =
    stream
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"))

  /** Session windows with a 30-minute gap — the streaming equivalent of
    * the batch sessionization in EventOps.q26Sessionize. */
  def sessionCounts(stream: DataFrame): DataFrame =
    stream
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("user_id"), col("n_events"))

  /** Streaming exact dedup on event_id within the watermark horizon —
    * state stays bounded because expired keys are evicted. */
  def dedup(stream: DataFrame): DataFrame =
    stream
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Per-user running aggregate via explicit state
    * (`flatMapGroupsWithState`) — the escape hatch for stateful logic
    * that windowed aggregation can't express (here: emit an updated
    * running count + total value per user on every batch, with an
    * event-time timeout evicting idle users' state so memory stays
    * bounded at scale). State is hash-partitioned by user across
    * executors and checkpointed. */
  def statefulUserTotals(stream: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode => OM}
    import org.apache.spark.sql.{Encoders, Row}
    val enc = Encoders.product[UserTotal]
    // Catalyst cannot prune columns through the typed-state closure
    // (its Row deserializer references every field it is handed), so
    // anything not projected here — notably the free-form `props`
    // payload — would ride the hash shuffle and the per-key grouping
    // sort at full width. Project the closure's exact read-set first
    // (the streaming sibling of the width census's select-before-
    // persist discipline; StreamStateCensusSpec pins this set).
    val slim = stream.select(col("user_id"), col("ts"), col("value"))
    implicit val rowEnc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(slim.schema)
    val withWm = slim.withWatermark("ts", "10 minutes")
    withWm.groupByKey((r: Row) => r.getAs[Long]("user_id"))(Encoders.scalaLong)
      .flatMapGroupsWithState[UserTotal, UserTotal](
        OM.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Row], state: GroupState[UserTotal]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(UserTotal(userId, 0L, 0.0))
            var n = prev.n_events
            var total = prev.total_value
            var maxTsMs = 0L
            rows.foreach { r =>
              n += 1
              total += r.getAs[Double]("value")
              maxTsMs = math.max(maxTsMs,
                r.getAs[java.sql.Timestamp]("ts").getTime)
            }
            val next = UserTotal(userId, n, total)
            state.update(next)
            // evict 1h after the user's last event (event-time, NOT the
            // watermark: in the first batch the watermark is still 0 and
            // watermark-relative timeouts would expire immediately)
            state.setTimeoutTimestamp(
              math.max(maxTsMs, state.getCurrentWatermarkMs()) + 3600000L)
            Iterator.single(next)
          }
      }(enc, enc).toDF()
  }

  /** Incremental conversion funnel — the streaming twin of
    * [[graft.queries.EventOps.q126Funnel]]'s core, whose batch results
    * the DuckDB oracle verifies. Unlike a running total, the funnel is
    * ORDER-SENSITIVE (each stage's first-qualifying timestamp depends
    * on the previous stage's), so out-of-order arrivals cannot be
    * folded on sight. The state machine therefore keeps a per-user
    * sort buffer of funnel events still ahead of the watermark and, on
    * every batch, drains exactly the prefix the watermark has
    * finalized — folding it in event-time order with the SAME
    * inclusive-≥ chain rules as the batch operator. Late rows beyond
    * the watermark are dropped by Spark before reaching the function,
    * so a drained prefix is never reopened; state stays bounded (the
    * buffer shrinks as the watermark advances, and idle users are
    * evicted by event-time timeout two days after their last event —
    * past s0+1day no event can change a user's stage). */
  def streamingFunnel(stream: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode => OM}
    import org.apache.spark.sql.Encoders
    val outEnc = Encoders.product[UserStage]
    val stEnc = Encoders.product[FunnelState]
    // exact closure read-set — see statefulUserTotals' pruning note
    val slim = stream.select(col("user_id"), col("ts"), col("event_type"))
    implicit val rowEnc: org.apache.spark.sql.Encoder[Row] =
      Encoders.row(slim.schema)
    val DayUs = 86400L * 1000000L
    val kinds = Map("signup" -> 0, "view" -> 1, "click" -> 2, "purchase" -> 3)
    slim.withWatermark("ts", "10 minutes")
      .groupByKey((r: Row) => r.getAs[Long]("user_id"))(Encoders.scalaLong)
      .flatMapGroupsWithState[FunnelState, UserStage](
        OM.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[Row], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(FunnelState(Nil, -1L, -1L, -1L, -1L))
            val incoming = rows.flatMap { r =>
              val t = r.getAs[java.sql.Timestamp]("ts")
              val us = t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
              kinds.get(r.getAs[String]("event_type")).map(FunnelBuf(us, _))
            }.toSeq
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            val all = prev.buf ++ incoming
            // the watermark guarantees nothing older than wmUs will
            // ever arrive: that prefix is final and safe to fold
            val (ripe, pending) = all.partition(_.ts_us <= wmUs)
            var s0 = prev.s0; var v0 = prev.v0; var c0 = prev.c0; var p0 = prev.p0
            // equal-ts tiebreak by stage order = the batch operator's
            // inclusive >= comparisons
            ripe.sortBy(e => (e.ts_us, e.kind)).foreach { e =>
              e.kind match {
                case 0 => if (s0 < 0) s0 = e.ts_us
                case 1 => if (v0 < 0 && s0 >= 0 && e.ts_us >= s0 &&
                  e.ts_us <= s0 + DayUs) v0 = e.ts_us
                case 2 => if (c0 < 0 && v0 >= 0 && e.ts_us >= v0 &&
                  e.ts_us <= s0 + DayUs) c0 = e.ts_us
                case _ => if (p0 < 0 && c0 >= 0 && e.ts_us >= c0 &&
                  e.ts_us <= s0 + DayUs) p0 = e.ts_us
              }
            }
            state.update(FunnelState(pending, s0, v0, c0, p0))
            val lastUs = all.foldLeft(0L)((m, e) => math.max(m, e.ts_us))
            state.setTimeoutTimestamp(
              math.max(lastUs / 1000L, state.getCurrentWatermarkMs()) + 2L * 86400000L)
            val stage =
              if (p0 >= 0) 4 else if (c0 >= 0) 3
              else if (v0 >= 0) 2 else if (s0 >= 0) 1 else 0
            Iterator.single(UserStage(uid, stage))
          }
      }(stEnc, outEnc).toDF()
  }

  /** Spark-4 arbitrary-stateful v2 (`transformWithState`): the typed
    * StatefulProcessor API replacing flatMapGroupsWithState — named,
    * composable per-key state cells (Value/List/MapState) with
    * per-state TTL, timers decoupled from output mode, and
    * RocksDB-backed storage (the API REQUIRES the RocksDB provider).
    * This processor keeps the same running per-user totals as
    * [[statefulUserTotals]], as a migration example. */
  private class UserTotalProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Row, UserTotal] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders
    @transient private var state: ValueState[UserTotal] = _
    @transient private var timerState: ValueState[Long] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      state = getHandle.getValueState[UserTotal]("totals",
        Encoders.product[UserTotal], TTLConfig.NONE)
      timerState = getHandle.getValueState[Long]("evict_at",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[Row],
        timerValues: TimerValues): Iterator[UserTotal] = {
      val prev = if (state.exists()) state.get() else UserTotal(key, 0L, 0.0)
      var n = prev.n_events
      var total = prev.total_value
      var maxTsMs = 0L
      rows.foreach { r =>
        n += 1
        total += r.getAs[Double]("value")
        maxTsMs = math.max(maxTsMs, r.getAs[java.sql.Timestamp]("ts").getTime)
      }
      val next = UserTotal(key, n, total)
      state.update(next)
      // bounded state, v1 semantics: evict 1h (event time) after the
      // user's last event — replace the previous timer so exactly one
      // is pending per key
      if (timerState.exists()) getHandle.deleteTimer(timerState.get())
      val evictAt = maxTsMs + 3600000L
      getHandle.registerTimer(evictAt)
      timerState.update(evictAt)
      Iterator.single(next)
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[UserTotal] = {
      state.clear()
      timerState.clear()
      Iterator.empty
    }
  }

  /** [[streamingFunnel]] on the transformWithState API — the
    * order-sensitive migration case: the v1 version keeps the sort
    * buffer inside one monolithic state value, here it maps naturally
    * onto a named ListState cell (cheap per-element appends in
    * RocksDB) beside a ValueState for the folded stage marks. Drain
    * logic and chain rules are byte-for-byte the v1 semantics; the
    * spec asserts both APIs land identical stages on the same
    * out-of-order input. */
  private class FunnelProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Row, UserStage] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders
    private val DayUs = 86400L * 1000000L
    private val kinds = Map("signup" -> 0, "view" -> 1, "click" -> 2, "purchase" -> 3)
    @transient private var buf: ListState[FunnelBuf] = _
    @transient private var marks: ValueState[FunnelMarks] = _
    @transient private var timerState: ValueState[Long] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      buf = getHandle.getListState[FunnelBuf]("buffer",
        Encoders.product[FunnelBuf], TTLConfig.NONE)
      marks = getHandle.getValueState[FunnelMarks]("marks",
        Encoders.product[FunnelMarks], TTLConfig.NONE)
      timerState = getHandle.getValueState[Long]("evict_at",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[Row],
        timerValues: TimerValues): Iterator[UserStage] = {
      val prev = if (marks.exists()) marks.get()
        else FunnelMarks(-1L, -1L, -1L, -1L)
      val incoming = rows.flatMap { r =>
        val t = r.getAs[java.sql.Timestamp]("ts")
        val us = t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
        kinds.get(r.getAs[String]("event_type")).map(FunnelBuf(us, _))
      }.toSeq
      val wmUs = timerValues.getCurrentWatermarkInMs() * 1000L
      val all = {
        val it = buf.get(); val b = Seq.newBuilder[FunnelBuf]
        while (it.hasNext) b += it.next()
        b.result() ++ incoming
      }
      val (ripe, pending) = all.partition(_.ts_us <= wmUs)
      var s0 = prev.s0; var v0 = prev.v0; var c0 = prev.c0; var p0 = prev.p0
      ripe.sortBy(e => (e.ts_us, e.kind)).foreach { e =>
        e.kind match {
          case 0 => if (s0 < 0) s0 = e.ts_us
          case 1 => if (v0 < 0 && s0 >= 0 && e.ts_us >= s0 &&
            e.ts_us <= s0 + DayUs) v0 = e.ts_us
          case 2 => if (c0 < 0 && v0 >= 0 && e.ts_us >= v0 &&
            e.ts_us <= s0 + DayUs) c0 = e.ts_us
          case _ => if (p0 < 0 && c0 >= 0 && e.ts_us >= c0 &&
            e.ts_us <= s0 + DayUs) p0 = e.ts_us
        }
      }
      marks.update(FunnelMarks(s0, v0, c0, p0))
      buf.clear()
      if (pending.nonEmpty) buf.put(pending.toArray)
      if (timerState.exists()) getHandle.deleteTimer(timerState.get())
      val lastUs = all.foldLeft(0L)((m, e) => math.max(m, e.ts_us))
      val evictAt = math.max(lastUs / 1000L,
        timerValues.getCurrentWatermarkInMs()) + 2L * 86400000L
      getHandle.registerTimer(evictAt)
      timerState.update(evictAt)
      val stage =
        if (p0 >= 0) 4 else if (c0 >= 0) 3
        else if (v0 >= 0) 2 else if (s0 >= 0) 1 else 0
      Iterator.single(UserStage(key, stage))
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[UserStage] = {
      buf.clear(); marks.clear(); timerState.clear()
      Iterator.empty
    }
  }

  /** [[streamingFunnel]] on the transformWithState API. */
  def streamingFunnelV2(stream: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.TimeMode
    import org.apache.spark.sql.Encoders
    // exact closure read-set — see statefulUserTotals' pruning note
    val slim = stream.select(col("user_id"), col("ts"), col("event_type"))
    implicit val rowEnc: org.apache.spark.sql.Encoder[Row] =
      Encoders.row(slim.schema)
    implicit val outEnc: org.apache.spark.sql.Encoder[UserStage] =
      Encoders.product[UserStage]
    slim.withWatermark("ts", "10 minutes")
      .groupByKey((r: Row) => r.getAs[Long]("user_id"))(Encoders.scalaLong)
      .transformWithState(new FunnelProcessor, TimeMode.EventTime(),
        OutputMode.Update())
      .toDF()
  }

  /** [[statefulUserTotals]] on the transformWithState API. */
  def statefulUserTotalsV2(stream: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.TimeMode
    import org.apache.spark.sql.Encoders
    // exact closure read-set — see statefulUserTotals' pruning note
    val slim = stream.select(col("user_id"), col("ts"), col("value"))
    implicit val rowEnc: org.apache.spark.sql.Encoder[Row] =
      Encoders.row(slim.schema)
    implicit val outEnc: org.apache.spark.sql.Encoder[UserTotal] =
      Encoders.product[UserTotal]
    slim.withWatermark("ts", "10 minutes")
      .groupByKey((r: Row) => r.getAs[Long]("user_id"))(Encoders.scalaLong)
      // EventTime mode drives the eviction timers off the watermark
      .transformWithState(new UserTotalProcessor, TimeMode.EventTime(),
        OutputMode.Update())
      .toDF()
  }

  /** Stream-stream inner join: views joined to the clicks that follow
    * them within 30 minutes for the same user. BOTH sides carry a
    * watermark and the join condition bounds event-time distance, so
    * each side's buffered state is evictable the moment the other
    * side's watermark passes the range — without the time bound a
    * stream-stream join must buffer forever. State is hash-partitioned
    * by the equi key (user_id) across executors. */
  def viewClickJoin(views: DataFrame, clicks: DataFrame): DataFrame = {
    val v = views.withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
    val c = clicks.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    v.join(c,
      col("user_id") === col("c_user") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr("interval 30 minutes"))
      .select(col("user_id"), col("view_id"), col("click_id"),
        col("view_ts"), col("click_ts"))
  }

  /** `foreachBatch` sink: the arbitrary-logic escape hatch — each
    * micro-batch arrives as a plain DataFrame with its batch id, so any
    * batch writer (multi-table fan-out, JDBC upsert, dedup-merge)
    * becomes a streaming sink. Here: per-batch exact dedup on event_id
    * then parquet append — the file-compaction-friendly landing
    * pattern. Exactly-once comes from the checkpointed batch id: a
    * replayed batch must be idempotent (same dedup key set). */
  def toForeachBatchParquet(df: DataFrame, outDir: String,
      checkpointDir: String): DataStreamWriter[Row] =
    df.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        batch.dropDuplicates("event_id")
          .withColumn("_batch_id", lit(batchId))
          .write.mode("append").parquet(outDir)
      }
      .option("checkpointLocation", checkpointDir)

  /** Convenience sink: append/update to an in-memory table for tests
    * and demos. */
  def toMemorySink(df: DataFrame, queryName: String,
      mode: OutputMode = OutputMode.Update()): DataStreamWriter[Row] =
    df.writeStream.format("memory").queryName(queryName).outputMode(mode)
}
