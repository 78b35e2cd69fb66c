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
