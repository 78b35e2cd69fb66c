package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Source/sink format coverage beyond the pipeline's native CSV and
  * Parquet: ORC and JSON-lines round-trips with schema fidelity, and
  * Hive-style partitioned layout with partition pruning reaching the
  * scan — the interchange surface a 100 TB lake actually exercises. */
class FormatsSpec extends SparkTestBase {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/out"

  private lazy val sample = Tables.events(spark, Sf)
    .select("event_id", "user_id", "event_type", "value")

  test("ORC round-trip preserves schema and values") {
    val out = tmp("graft_orc")
    sample.write.orc(out)
    val back = spark.read.orc(out)
    assert(back.schema === sample.schema)
    assert(back.count() === sample.count())
    val a = sample.orderBy("event_id").collect()
    val b = back.orderBy("event_id").collect()
    assert(a.sameElements(b))
  }

  test("JSON-lines round-trip with a pinned schema preserves values") {
    val out = tmp("graft_jsonl")
    sample.write.json(out)
    // production ingest pins the schema (inference is a full extra
    // pass over 100 TB and infers long/double unpredictably)
    val back = spark.read.schema(sample.schema).json(out)
    assert(back.schema === sample.schema)
    val a = sample.orderBy("event_id").collect()
    val b = back.orderBy("event_id").collect()
    assert(a.sameElements(b))
  }

  test("Tables.events accepts both ts layouts and mutates no session conf") {
    // the loader dispatches on the footer type: int64 (the NANOS layout
    // read raw under the bootstrap-set nanosAsLong conf) is floor-div'd
    // to micros; native TIMESTAMP passes through. Pin BOTH branches by
    // rewriting the same rows in each layout and asserting identical
    // results — and assert the loader itself no longer sets session
    // conf (r8 smell: a table loader with a global side effect).
    import org.apache.spark.sql.types.TimestampNTZType
    val native = Tables.events(spark, Sf).orderBy("event_id").limit(50)
      .select("event_id", "ts", "user_id")
    val rows = native.collect()
    val base = Files.createTempDirectory("graft_evt").toString
    // micros layout: write ts as TIMESTAMP_NTZ (annotated MICROS)
    native.write.parquet(s"$base/micros/events.parquet")
    // nanos-as-long layout: what the NANOS files look like to Spark
    // under the legacy conf — a raw int64 nanosecond column
    native.withColumn("ts",
        unix_micros(col("ts").cast("timestamp")) * 1000L)
      .write.parquet(s"$base/longs/events.parquet")
    val confBefore = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    val viaMicros = Tables.events(spark, s"$base/micros").orderBy("event_id").collect()
    val viaLongs = Tables.events(spark, s"$base/longs").orderBy("event_id").collect()
    assert(spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong") === confBefore)
    assert(Tables.events(spark, s"$base/micros").schema("ts").dataType === TimestampNTZType)
    assert(viaMicros.sameElements(rows))
    assert(viaLongs.sameElements(rows))
  }

  test("partitionBy layout prunes non-matching partitions at the scan") {
    val out = tmp("graft_part")
    Tables.events(spark, Sf)
      .select("event_id", "event_type", "value")
      .write.partitionBy("event_type").parquet(out)
    val q = spark.read.parquet(out).filter(col("event_type") === "click")
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    // the partition filter must be handled by the FILE LISTING
    // (PartitionFilters), not a post-scan Filter over all rows
    assert(scan.contains("PartitionFilters") &&
      scan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("event_type"),
      s"partition filter not pushed: $scan")
    val expected = Tables.events(spark, Sf)
      .filter(col("event_type") === "click").count()
    assert(q.count() === expected)
  }
}
