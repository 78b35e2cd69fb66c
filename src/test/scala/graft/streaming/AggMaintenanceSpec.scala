package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Streaming materialized-view maintenance: the delta-log fold must
  * equal the one-shot batch aggregate, and a replayed batch must
  * overwrite its own delta rather than double-count. */
class AggMaintenanceSpec extends SparkTestBase {

  test("maintained view equals the one-shot batch aggregate over all batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("graft_mv_store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_mv_ck").toString
    def ev(id: Long, t: String, typ: String, v: Double) =
      Ev(id, Timestamp.valueOf(t), 1L, typ, v, "{}")
    val b1 = Seq(ev(1, "2024-01-01 10:05:00", "click", 1.25),
      ev(2, "2024-01-01 10:20:00", "view", 2.5),
      ev(3, "2024-01-01 11:30:00", "click", 0.75))
    val b2 = Seq(ev(4, "2024-01-01 10:40:00", "click", 3.0),
      ev(5, "2024-01-01 12:10:00", "view", 1.0))
    val mem = MemoryStream[Ev](spark)
    val q = AggMaintenance.maintain(mem.toDF(), store, ckpt).start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val got = AggMaintenance.view(spark, store).collect()
      .map(r => (r.getAs[Timestamp]("hour_start").toString,
        r.getAs[String]("event_type")) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("sum_fp"))).toMap
    // the one-shot batch aggregate over ALL events — additivity means
    // the incremental fold must land on exactly these numbers
    val expected = (b1 ++ b2).toDF()
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 1e6).cast("long")).as("s"))
      .collect()
      .map(r => (r.getAs[Timestamp]("hour_start").toString,
        r.getAs[String]("event_type")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("s"))).toMap
    assert(got == expected, s"view $got != batch $expected")
    // time travel: as-of the first batch, the view must equal the
    // one-shot aggregate over b1 ALONE — the partition-pruned prefix
    // IS the historical state
    val asOf0 = AggMaintenance.viewAsOf(spark, store, 0L).collect()
      .map(r => (r.getAs[Timestamp]("hour_start").toString,
        r.getAs[String]("event_type")) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("sum_fp"))).toMap
    val b1Only = b1.toDF()
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 1e6).cast("long")).as("s"))
      .collect()
      .map(r => (r.getAs[Timestamp]("hour_start").toString,
        r.getAs[String]("event_type")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("s"))).toMap
    assert(asOf0 == b1Only, s"as-of-0 view $asOf0 != b1 aggregate $b1Only")
    // and the time travel is a PARTITION skip, not a post-scan filter:
    // the _batch_id predicate must land in the scan's PartitionFilters
    val plan = DeltaLog.readAsOf(spark, store, 0L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("_batch_id"),
      s"_batch_id <= 0 must prune partitions, plan: $plan")
    // compaction through the monitor's own fold: collapse both deltas
    // into the folded base — the view must be unchanged and the
    // committed marker + base present. GC is LAZY by one generation:
    // the raw partitions a pre-compaction reader may still reference
    // survive until the NEXT compaction (readers already ignore them
    // via the marker).
    AggMaintenance.compactThrough(spark, store, 1L)
    val compacted = AggMaintenance.view(spark, store).collect()
      .map(r => (r.getAs[Timestamp]("hour_start").toString,
        r.getAs[String]("event_type")) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("sum_fp"))).toMap
    assert(compacted == expected,
      s"compaction changed the view: $compacted != $expected")
    val names = new java.io.File(store).listFiles().map(_.getName)
    assert(names.contains("_compact_hwm_1"), "committed marker missing")
    assert(new java.io.File(s"$store/_compacted/1").isDirectory,
      "folded base missing")
    assert(names.count(_.startsWith("_batch_id=")) === 2,
      "first-generation GC must RETAIN raw partitions for in-flight " +
        s"readers, found ${names.mkString(",")}")
  }

  test("compaction crash windows never double-count or drop a batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("graft_mv_cw").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_mv_cwck").toString
    def ev(id: Long, t: String, typ: String, v: Double) =
      Ev(id, Timestamp.valueOf(t), 1L, typ, v, "{}")
    val mem = MemoryStream[Ev](spark)
    val q = AggMaintenance.maintain(mem.toDF(), store, ckpt).start()
    try {
      mem.addData(ev(1, "2024-01-01 10:05:00", "click", 1.0))
      q.processAllAvailable()
      mem.addData(ev(2, "2024-01-01 10:10:00", "click", 2.0))
      q.processAllAvailable()
      mem.addData(ev(3, "2024-01-01 10:15:00", "click", 4.0))
      q.processAllAvailable()
    } finally q.stop()
    def viewCounts() = AggMaintenance.view(spark, store).collect()
      .map(r => r.getAs[Long]("n_events") -> r.getAs[Long]("sum_fp")).toSeq
    val before = viewCounts()
    assert(before === Seq(3L -> 7000000L))
    // crash window A: folded base staged for upTo=1 but NO marker —
    // readers must keep using the intact raw log (no double count,
    // since the orphan _compacted dir is invisible without its marker)
    spark.read.parquet(s"$store/_batch_id=0")
      .withColumn("_batch_id", lit(0L))
      .unionByName(spark.read.parquet(s"$store/_batch_id=1")
        .withColumn("_batch_id", lit(1L)))
      .groupBy("hour_start", "event_type")
      .agg(sum(col("n_events")).as("n_events"),
        sum(col("sum_fp")).as("sum_fp"))
      .withColumn("_batch_id", lit(1L))
      .write.mode("overwrite").parquet(s"$store/_compacted/1")
    assert(viewCounts() === before,
      "a staged-but-uncommitted compaction changed the view")
    // crash window B: marker committed but GC never ran — raw
    // partitions 0/1 coexist with the folded base; readers must fold
    // base ∪ suffix(>1) only (no double count of batches 0/1)
    new java.io.File(s"$store/_compact_hwm_1").createNewFile()
    assert(viewCounts() === before,
      "committed-marker-with-pending-GC double-counted raw deltas")
    // recovery: the next compaction commits gen 2 and settles gen 1's
    // GC debt (raw <= 1 go), while RETAINING gen 1's base + marker +
    // the raw suffix for any reader that resolved hwm=1 (lazy GC)
    AggMaintenance.compactThrough(spark, store, 2L)
    assert(viewCounts() === before,
      "compaction after a crashed predecessor changed the view")
    def names() = new java.io.File(store).listFiles().map(_.getName).toSet
    val n2 = names()
    assert(!n2.contains("_batch_id=0") && !n2.contains("_batch_id=1"),
      s"gen-1 debt (raw <= prev) must be collected: ${n2.mkString(",")}")
    assert(n2.contains("_batch_id=2") && n2.contains("_compact_hwm_1") &&
      new java.io.File(s"$store/_compacted/1").isDirectory,
      s"the superseded generation must survive one cycle for " +
        s"in-flight hwm=1 readers: ${n2.mkString(",")}")
    // a crashed commit attempt's orphan `.tmp` marker is settled by
    // the next compaction's GC (r10 ADVICE: it previously leaked
    // forever)
    new java.io.File(s"$store/._compact_hwm_9.tmp").createNewFile()
    // one more generation retires gen 1 entirely
    AggMaintenance.compactThrough(spark, store, 3L)
    assert(viewCounts() === before)
    val n3 = names()
    assert(!n3.exists(_.startsWith("_batch_id=")) &&
      !n3.contains("_compact_hwm_1") &&
      !new java.io.File(s"$store/_compacted/1").exists() &&
      n3.contains("_compact_hwm_2") && n3.contains("_compact_hwm_3"),
      s"second-cycle GC incomplete: ${n3.mkString(",")}")
    assert(!n3.contains("._compact_hwm_9.tmp"),
      "stale crashed-commit tmp marker must be collected")
    // time travel below the committed hwm must FAIL, not silently
    // answer with the newer compacted state (r10 ADVICE); the hwm is
    // discoverable so callers can clamp deliberately
    assert(DeltaLog.committedHighWaterMark(spark, store) === 3L)
    intercept[IllegalArgumentException] {
      DeltaLog.readAsOf(spark, store, 1L)
    }
    // as-of exactly the hwm is the exact compacted state — still fine
    assert(AggMaintenance.viewAsOf(spark, store, 3L).collect()
      .map(r => r.getAs[Long]("n_events") -> r.getAs[Long]("sum_fp"))
      .toSeq === before)
  }

  test("a replayed batch overwrites its own delta (no double count)") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_mv_src").toString
    val store = java.nio.file.Files.createTempDirectory("graft_mv_store2").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_mv_ck2").toString
    Seq(Ev(1, Timestamp.valueOf("2024-01-01 10:05:00"), 1L, "click", 2.0, "{}"),
      Ev(2, Timestamp.valueOf("2024-01-01 10:20:00"), 1L, "view", 3.0, "{}"))
      .toDF().write.mode("overwrite").parquet(src)
    def stream = spark.readStream
      .schema(Seq.empty[Ev].toDF().schema).parquet(src)
    val q1 = AggMaintenance.maintain(stream, store, ckpt).start()
    try q1.processAllAvailable() finally { q1.stop(); q1.awaitTermination() }
    val before = AggMaintenance.view(spark, store).collect().map(_.toString).sorted.toSeq
    // wipe the last commit marker so restart REPLAYS the batch
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.matches("\\d+")).sortBy(_.getName.toLong)
    val last = commits.last
    new java.io.File(last.getParentFile, s".${last.getName}.crc").delete()
    last.delete()
    val q2 = AggMaintenance.maintain(stream, store, ckpt).start()
    try q2.processAllAvailable() finally { q2.stop(); q2.awaitTermination() }
    val after = AggMaintenance.view(spark, store).collect().map(_.toString).sorted.toSeq
    assert(after == before, s"replay double-counted: $after vs $before")
  }
}
