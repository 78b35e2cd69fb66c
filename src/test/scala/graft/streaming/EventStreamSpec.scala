package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

/** Structured Streaming semantics: tumbling windows close as the
  * watermark passes, late data beyond the watermark is dropped, and
  * streaming dedup suppresses duplicate keys. */
class EventStreamSpec extends SparkTestBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def ev(id: Long, t: String, typ: String = "click"): Ev =
    Ev(id, ts(t), 1L, typ, 1.0, "{}")

  test("tumbling window with watermark drops late data") {
    import spark.implicits._
    val mem = MemoryStream[Ev](spark)
    val q = EventStream.tumblingHourly(mem.toDF())
      .writeStream.format("memory").queryName("tumbling_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // two events in hour 10, then an hour-11 event that advances the
      // watermark past 10:59 (11:30 - 10min = 11:20) closing hour 10
      mem.addData(ev(1, "2024-01-01 10:05:00"), ev(2, "2024-01-01 10:20:00"))
      q.processAllAvailable()
      mem.addData(ev(3, "2024-01-01 11:30:00"))
      q.processAllAvailable()
      // late event for hour 10 — behind the 11:20 watermark — dropped
      mem.addData(ev(4, "2024-01-01 10:45:00"))
      q.processAllAvailable()
      // advance far enough to close hour 11 too
      mem.addData(ev(5, "2024-01-01 12:30:00"))
      q.processAllAvailable()
      val out = spark.table("tumbling_test").collect()
        .map(r => (r.getAs[Timestamp]("hour_start").toString,
          r.getAs[Long]("n_events"))).toMap
      assert(out("2024-01-01 10:00:00.0") == 2L,
        s"late event must be dropped: $out")
      assert(out("2024-01-01 11:00:00.0") == 1L, s"$out")
    } finally q.stop()
  }

  test("file-source stream aggregates the full events table incrementally") {
    val src = java.nio.file.Files.createTempDirectory("graft_stream_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$Sf/events.parquet"),
      src.resolve("events.parquet"))
    val q = EventStream.tumblingHourly(
      EventStream.readEventsStream(spark, src.toString))
      .writeStream.format("memory").queryName("filesrc_test")
      .outputMode(OutputMode.Update()).start()
    try {
      q.processAllAvailable()
      val total = spark.table("filesrc_test").collect()
        .map(_.getAs[Long]("n_events")).sum
      val expected = graft.Tables.events(spark, Sf).count()
      assert(total == expected, s"streamed $total of $expected events")
    } finally q.stop()
  }

  test("streaming dedup suppresses duplicate event ids in-watermark") {
    import spark.implicits._
    val mem = MemoryStream[Ev](spark)
    val q = EventStream.dedup(mem.toDF())
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(ev(1, "2024-01-01 10:00:00"), ev(1, "2024-01-01 10:00:30"),
        ev(2, "2024-01-01 10:01:00"))
      q.processAllAvailable()
      mem.addData(ev(1, "2024-01-01 10:02:00"), ev(3, "2024-01-01 10:03:00"))
      q.processAllAvailable()
      val ids = spark.table("dedup_test").collect()
        .map(_.getAs[Long]("event_id")).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L), s"got $ids")
    } finally q.stop()
  }

  test("flatMapGroupsWithState keeps running per-user totals across batches") {
    import spark.implicits._
    val mem = MemoryStream[Ev](spark)
    val q = EventStream.statefulUserTotals(mem.toDF())
      .writeStream.format("memory").queryName("stateful_test")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData(Ev(1, ts("2024-01-01 10:00:00"), 1L, "click", 2.0, "{}"),
        Ev(2, ts("2024-01-01 10:01:00"), 1L, "view", 3.0, "{}"),
        Ev(3, ts("2024-01-01 10:02:00"), 2L, "click", 5.0, "{}"))
      q.processAllAvailable()
      mem.addData(Ev(4, ts("2024-01-01 10:03:00"), 1L, "click", 4.0, "{}"))
      q.processAllAvailable()
      // memory sink in Update mode appends each update; take the latest
      // row per user
      val latest = spark.table("stateful_test").collect()
        .groupBy(_.getAs[Long]("user_id"))
        .map { case (u, rows) => u -> rows.maxBy(_.getAs[Long]("n_events")) }
      assert(latest(1L).getAs[Long]("n_events") == 3L)
      assert(math.abs(latest(1L).getAs[Double]("total_value") - 9.0) < 1e-9)
      assert(latest(2L).getAs[Long]("n_events") == 1L)
    } finally q.stop()
  }

  test("event-time timeout EVICTS idle users' state — the store " +
    "shrinks once the watermark passes the horizon (v1 fMGWS and v2 " +
    "transformWithState; the behavioral proof behind the lifetime " +
    "census's shape audit)") {
    import spark.implicits._
    def stateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
      q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    def peakRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
      q.recentProgress.flatMap(_.stateOperators.map(_.numRowsTotal)).max
    // rowsPerKey: fMGWS stores one row per key; transformWithState
    // reports one row per state CELL, and UserTotalProcessor keeps
    // two ValueStates (running total + timer bookkeeping) per user
    def run(head: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
        name: String, rowsPerKey: Int): Unit = {
      val mem = MemoryStream[Ev](spark)
      val q = head(mem.toDF())
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update()).start()
      try {
        mem.addData(Ev(1, ts("2024-01-01 10:00:00"), 1L, "click", 2.0, "{}"))
        q.processAllAvailable()
        // user 2 three hours later: the post-batch watermark (12:50)
        // passes user 1's eviction timer (last event + 1h = 11:00)
        mem.addData(Ev(2, ts("2024-01-01 13:00:00"), 2L, "view", 1.0, "{}"))
        q.processAllAvailable()
        mem.addData(Ev(3, ts("2024-01-01 13:01:00"), 2L, "view", 1.0, "{}"))
        q.processAllAvailable()
        assert(peakRows(q) >= 2L * rowsPerKey,
          s"$name: both users' state must coexist before eviction")
        val removed =
          q.recentProgress.flatMap(_.stateOperators.map(_.numRowsRemoved)).sum
        assert(removed >= rowsPerKey,
          s"$name: the expired timer must REMOVE user 1's state rows")
        assert(stateRows(q) == rowsPerKey,
          s"$name: only user 2's state may remain once the watermark " +
            s"passes user 1's timer — store holds ${stateRows(q)} rows")
      } finally q.stop()
    }
    run(EventStream.statefulUserTotals, "evict_v1", rowsPerKey = 1)
    val saved = spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try run(EventStream.statefulUserTotalsV2, "evict_v2", rowsPerKey = 2)
    finally spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass", saved)
  }

  test("stream-stream join matches clicks within 30 min of a view") {
    import spark.implicits._
    val views = MemoryStream[Ev](spark)
    val clicks = MemoryStream[Ev](spark)
    val q = EventStream.viewClickJoin(views.toDF(), clicks.toDF())
      .writeStream.format("memory").queryName("ssjoin_test")
      .outputMode(OutputMode.Append()).start()
    try {
      views.addData(ev(10, "2024-01-01 10:00:00", "view"))
      clicks.addData(
        ev(20, "2024-01-01 10:10:00"),  // inside the 30-min window
        ev(21, "2024-01-01 10:45:00"),  // outside — 45 min after
        ev(22, "2024-01-01 09:50:00"))  // before the view — excluded
      q.processAllAvailable()
      // advance both watermarks so joined results are emittable
      views.addData(ev(11, "2024-01-01 12:00:00", "view"))
      clicks.addData(ev(23, "2024-01-01 12:00:00"))
      q.processAllAvailable()
      val got = spark.table("ssjoin_test").collect()
        .map(r => (r.getAs[Long]("view_id"), r.getAs[Long]("click_id")))
        .toSet
      assert(got.contains((10L, 20L)), s"expected (10,20) in $got")
      assert(!got.exists(_._2 == 21L), s"click 45min later must not join: $got")
      assert(!got.exists(_._2 == 22L), s"click before view must not join: $got")
    } finally q.stop()
  }

  test("foreachBatch sink dedups within batch and lands parquet") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_feb_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_feb_ck").toString
    val mem = MemoryStream[Ev](spark)
    val q = EventStream.toForeachBatchParquet(mem.toDF(), out, ckpt).start()
    try {
      mem.addData(ev(1, "2024-01-01 10:00:00"), ev(1, "2024-01-01 10:00:01"),
        ev(2, "2024-01-01 10:01:00"))
      q.processAllAvailable()
      mem.addData(ev(3, "2024-01-01 10:02:00"))
      q.processAllAvailable()
      val landed = spark.read.parquet(out)
      assert(landed.count() == 3) // in-batch dup of id 1 dropped
      assert(landed.select("_batch_id").distinct().count() == 2)
    } finally q.stop()
  }

  test("transformWithState keeps running totals (stateful v2, RocksDB)") {
    import spark.implicits._
    val saved = spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    // transformWithState requires the RocksDB state store provider
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[Ev](spark)
    val q = EventStream.statefulUserTotalsV2(mem.toDF())
      .writeStream.format("memory").queryName("tws_test")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData(Ev(1, ts("2024-01-01 10:00:00"), 1L, "click", 2.0, "{}"),
        Ev(2, ts("2024-01-01 10:01:00"), 1L, "view", 3.0, "{}"),
        Ev(3, ts("2024-01-01 10:02:00"), 2L, "click", 5.0, "{}"))
      q.processAllAvailable()
      mem.addData(Ev(4, ts("2024-01-01 10:03:00"), 1L, "click", 4.0, "{}"))
      q.processAllAvailable()
      val latest = spark.table("tws_test").collect()
        .groupBy(_.getAs[Long]("user_id"))
        .map { case (u, rows) => u -> rows.maxBy(_.getAs[Long]("n_events")) }
      assert(latest(1L).getAs[Long]("n_events") == 3L)
      assert(math.abs(latest(1L).getAs[Double]("total_value") - 9.0) < 1e-9)
      assert(latest(2L).getAs[Long]("n_events") == 1L)
    } finally {
      q.stop()
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", saved)
    }
  }

  test("windowed aggregation runs on the RocksDB state store provider") {
    import spark.implicits._
    // RocksDB is the production state store at scale: state lives
    // off-heap/on-disk per executor instead of in the JVM heap, so
    // watermarked state survives executor memory pressure
    val saved = spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[Ev](spark)
    val q = EventStream.tumblingHourly(mem.toDF())
      .writeStream.format("memory").queryName("rocksdb_test")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(ev(1, "2024-01-01 10:05:00"), ev(2, "2024-01-01 10:20:00"))
      q.processAllAvailable()
      mem.addData(ev(3, "2024-01-01 12:30:00")) // close hour 10
      q.processAllAvailable()
      val out = spark.table("rocksdb_test").collect()
        .map(r => (r.getAs[Timestamp]("hour_start").toString,
          r.getAs[Long]("n_events"))).toMap
      assert(out("2024-01-01 10:00:00.0") == 2L, s"$out")
    } finally {
      q.stop()
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", saved)
    }
  }

  test("kafka-shaped JSON payloads parse into the events schema (source seam)") {
    import spark.implicits._
    // a MemoryStream[String] yields exactly the message-bus envelope
    // shape (a `value` column) — parseEventsJson is the stage a kafka
    // head plugs in front of every downstream transform
    val mem = MemoryStream[String](spark)
    val parsed = EventStream.parseEventsJson(mem.toDF())
    assert(parsed.schema.fieldNames.toSeq ==
      Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
    val q = EventStream.tumblingHourly(parsed)
      .writeStream.format("memory").queryName("seam_test")
      .outputMode(OutputMode.Update()).start()
    try {
      def j(id: Long, t: String, typ: String) = {
        val ns = ts(t).getTime * 1000000L
        s"""{"event_id":$id,"ts":$ns,"user_id":1,""" +
          s""""event_type":"$typ","value":1.0,"props":"{}"}"""
      }
      mem.addData(j(1, "2024-01-01 10:05:00", "click"),
        j(2, "2024-01-01 10:20:00", "view"))
      q.processAllAvailable()
      val out = spark.table("seam_test").collect()
        .map(_.getAs[Long]("n_events")).sum
      assert(out == 2L, s"parsed-stream aggregate saw $out events")
    } finally q.stop()
  }

  test("config-driven source head reads the parquet file source") {
    val src = java.nio.file.Files.createTempDirectory("graft_cfg_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$Sf/events.parquet"),
      src.resolve("events.parquet"))
    // the YAML a kafka deployment would change: source.format + options
    val cfg = Map("source.format" -> "parquet",
      "source.path" -> src.toString,
      "source.option.maxFilesPerTrigger" -> "8")
    val q = EventStream.tumblingHourly(
      EventStream.readEventsStreamConfigured(spark, cfg))
      .writeStream.format("memory").queryName("cfgsrc_test")
      .outputMode(OutputMode.Update()).start()
    try {
      q.processAllAvailable()
      val total = spark.table("cfgsrc_test").collect()
        .map(_.getAs[Long]("n_events")).sum
      assert(total == graft.Tables.events(spark, Sf).count())
    } finally q.stop()
  }

  test("session windows group by 30-minute gaps") {
    import spark.implicits._
    val mem = MemoryStream[Ev](spark)
    val q = EventStream.sessionCounts(mem.toDF())
      .writeStream.format("memory").queryName("session_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // two sessions for user 1: (10:00, 10:10) then a >30min gap (11:00)
      mem.addData(ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:10:00"),
        ev(3, "2024-01-01 11:00:00"))
      q.processAllAvailable()
      mem.addData(ev(4, "2024-01-01 14:00:00")) // close everything
      q.processAllAvailable()
      val sessions = spark.table("session_test").collect()
        .map(_.getAs[Long]("n_events")).sorted.toSeq
      assert(sessions == Seq(1L, 2L), s"got $sessions")
    } finally q.stop()
  }

  test("streaming funnel folds out-of-order arrivals like the batch core") {
    import spark.implicits._
    val mem = MemoryStream[Ev](spark)
    val q = EventStream.streamingFunnel(mem.toDF())
      .writeStream.format("memory").queryName("funnel_test")
      .outputMode(OutputMode.Update()).start()
    // All of a user's events sit inside one 10-minute span, so
    // cross-batch reordering stays within the watermark slack and
    // nothing is dropped as late.
    val u1 = Seq( // in-order funnel -> stage 4
      Ev(1, ts("2024-01-01 00:00:00"), 1L, "signup", 0, "{}"),
      Ev(2, ts("2024-01-01 00:03:00"), 1L, "view", 0, "{}"),
      Ev(3, ts("2024-01-01 00:06:00"), 1L, "click", 0, "{}"),
      Ev(4, ts("2024-01-01 00:09:00"), 1L, "purchase", 0, "{}"))
    val u2 = Seq( // purchase precedes the first post-view click -> stage 3
      Ev(5, ts("2024-01-01 00:00:00"), 2L, "signup", 0, "{}"),
      Ev(6, ts("2024-01-01 00:02:00"), 2L, "view", 0, "{}"),
      Ev(7, ts("2024-01-01 00:04:00"), 2L, "purchase", 0, "{}"),
      Ev(8, ts("2024-01-01 00:06:00"), 2L, "click", 0, "{}"))
    try {
      // deliver SHUFFLED: later stages arrive before earlier ones
      mem.addData(u1(1), u1(3), u2(2))
      q.processAllAvailable()
      mem.addData(u1(0), u1(2), u2(3), u2(0), u2(1))
      q.processAllAvailable()
      // push the watermark past 00:09 via a third user...
      mem.addData(Ev(90, ts("2024-01-01 01:00:00"), 99L, "signup", 0, "{}"))
      q.processAllAvailable()
      // ...then poke each user with a funnel-neutral event so the
      // now-finalized buffer prefix is drained and the stage emitted
      mem.addData(Ev(91, ts("2024-01-01 01:01:00"), 1L, "error", 0, "{}"),
        Ev(92, ts("2024-01-01 01:01:00"), 2L, "error", 0, "{}"))
      q.processAllAvailable()
      val got = spark.table("funnel_test").collect()
        .groupBy(_.getAs[Long]("user_id"))
        .map { case (u, rows) => u -> rows.map(_.getAs[Int]("stage")).max }
      // the batch core (oracle-verified via q126) on the same events
      val batch = graft.queries.EventOps
        .funnelStages((u1 ++ u2).toDF().withColumn(
          "ts", org.apache.spark.sql.functions.col("ts").cast("timestamp_ntz")))
        .collect() // (stage, n_users) — u1 -> 4, u2 -> 3
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(batch === Map(4 -> 1L, 3 -> 1L))
      assert(got(1L) === 4, s"user 1 stage: $got")
      assert(got(2L) === 3, s"user 2 stage: $got")
    } finally q.stop()
  }

  test("v2 funnel (transformWithState) matches the v1 stages") {
    import spark.implicits._
    val saved = spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[Ev](spark)
    val q = EventStream.streamingFunnelV2(mem.toDF())
      .writeStream.format("memory").queryName("funnel_v2_test")
      .outputMode(OutputMode.Update()).start()
    try {
      // the same out-of-order delivery as the v1 test
      mem.addData(
        Ev(2, ts("2024-01-01 00:03:00"), 1L, "view", 0, "{}"),
        Ev(4, ts("2024-01-01 00:09:00"), 1L, "purchase", 0, "{}"),
        Ev(7, ts("2024-01-01 00:04:00"), 2L, "purchase", 0, "{}"))
      q.processAllAvailable()
      mem.addData(
        Ev(1, ts("2024-01-01 00:00:00"), 1L, "signup", 0, "{}"),
        Ev(3, ts("2024-01-01 00:06:00"), 1L, "click", 0, "{}"),
        Ev(8, ts("2024-01-01 00:06:00"), 2L, "click", 0, "{}"),
        Ev(5, ts("2024-01-01 00:00:00"), 2L, "signup", 0, "{}"),
        Ev(6, ts("2024-01-01 00:02:00"), 2L, "view", 0, "{}"))
      q.processAllAvailable()
      mem.addData(Ev(90, ts("2024-01-01 01:00:00"), 99L, "signup", 0, "{}"))
      q.processAllAvailable()
      mem.addData(Ev(91, ts("2024-01-01 01:01:00"), 1L, "error", 0, "{}"),
        Ev(92, ts("2024-01-01 01:01:00"), 2L, "error", 0, "{}"))
      q.processAllAvailable()
      val got = spark.table("funnel_v2_test").collect()
        .groupBy(_.getAs[Long]("user_id"))
        .map { case (u, rows) => u -> rows.map(_.getAs[Int]("stage")).max }
      assert(got(1L) === 4, s"user 1 stage: $got")
      assert(got(2L) === 3, s"user 2 stage: $got")
    } finally {
      q.stop()
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", saved)
    }
  }

  test("v2 funnel replays the last batch idempotently from the RocksDB checkpoint") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions.lit
    import spark.implicits._
    val saved = spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val src = java.nio.file.Files.createTempDirectory("graft_fv2_src").toString
    val out = java.nio.file.Files.createTempDirectory("graft_fv2_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_fv2_ck").toString
    val schema = Seq.empty[Ev].toDF().schema
    // three appends → three files → three batches (maxFilesPerTrigger=1):
    // buffer the funnel, advance the watermark, drain on the poke — the
    // drain batch is the one the restart will replay, so it must find
    // the buffered events + marks in the RECOVERED RocksDB state
    Seq(Ev(2, ts("2024-01-01 00:03:00"), 1L, "view", 0, "{}"),
      Ev(4, ts("2024-01-01 00:09:00"), 1L, "purchase", 0, "{}"),
      Ev(1, ts("2024-01-01 00:00:00"), 1L, "signup", 0, "{}"),
      Ev(3, ts("2024-01-01 00:06:00"), 1L, "click", 0, "{}"))
      .toDF().repartition(1).write.mode("append").parquet(src)
    Seq(Ev(90, ts("2024-01-01 01:00:00"), 99L, "signup", 0, "{}"))
      .toDF().repartition(1).write.mode("append").parquet(src)
    Seq(Ev(91, ts("2024-01-01 01:01:00"), 1L, "error", 0, "{}"))
      .toDF().repartition(1).write.mode("append").parquet(src)
    def startQ() = EventStream.streamingFunnelV2(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src))
      .writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        df.withColumn("_batch_id", lit(id))
          .write.mode("append").parquet(out)
      }
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Update())
      .start()
    val q1 = startQ()
    try q1.processAllAvailable() finally { q1.stop(); q1.awaitTermination() }
    def rowsByBatch() = spark.read.parquet(out).collect()
      .groupBy(_.getAs[Long]("_batch_id"))
      .map { case (b, rs) =>
        b -> rs.map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("stage")))
          .toSeq.sorted
      }
    val before = rowsByBatch()
    val lastBatch = before.keys.max
    assert(before(lastBatch).contains((1L, 4)),
      s"drain batch must emit stage 4 for user 1: $before")
    // rewind the checkpoint to just before the drain batch: drop its
    // commit marker AND any later offsets/commits (stateful queries run
    // a trailing no-data batch to advance the watermark; recovery only
    // replays the single latest offsets entry, so the logs must be
    // truncated to make the drain batch that entry)
    def truncate(log: String, keepBelow: Long): Unit =
      new java.io.File(s"$ckpt/$log").listFiles()
        .filter(_.getName.matches("\\d+"))
        .filter(_.getName.toLong >= keepBelow)
        .foreach { f =>
          new java.io.File(f.getParentFile, s".${f.getName}.crc").delete()
          f.delete()
        }
    truncate("commits", lastBatch)
    truncate("offsets", lastBatch + 1)
    val q2 = startQ()
    try q2.processAllAvailable() finally {
      q2.stop(); q2.awaitTermination()
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", saved)
    }
    val after = rowsByBatch()
    // the replayed batch re-emits the IDENTICAL rows (appended twice in
    // the non-transactional parquet sink): same (user, stage) set —
    // state recovery, not recomputation from empty state
    assert(after(lastBatch).distinct == before(lastBatch).distinct,
      s"replayed batch diverged: ${after(lastBatch)} vs ${before(lastBatch)}")
    assert(after(lastBatch).count(_ == ((1L, 4))) == 2,
      "drain batch was not actually replayed")
  }
}
