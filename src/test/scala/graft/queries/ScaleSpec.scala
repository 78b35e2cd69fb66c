package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Scale-posture checks: plans that must hold at 100 TB. */
class ScaleSpec extends SparkTestBase {

  test("bucketed fact-fact join is co-located (no shuffle exchange)") {
    val s = spark
    val threshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      graft.Tables.orders(s, Sf).write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_bucketed")
      graft.Tables.lineitem(s, Sf).write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("lineitem_bucketed")
      val joined = s.table("lineitem_bucketed")
        .join(s.table("orders_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_quantity", "o_totalprice")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        plan.take(2000))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n${plan.take(3000)}")
      assert(joined.count() > 0)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      s.sql("DROP TABLE IF EXISTS orders_bucketed")
      s.sql("DROP TABLE IF EXISTS lineitem_bucketed")
    }
  }

  test("partitioned write prunes partitions on a partition-key filter") {
    val out = java.nio.file.Files.createTempDirectory("graft_part").toString
    graft.Tables.documents(spark, Sf).write.mode("overwrite")
      .partitionBy("lang").parquet(out)
    val pruned = spark.read.parquet(out).filter(col("lang") === "en")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      plan.take(3000))
    val expected = graft.Tables.documents(spark, Sf)
      .filter(col("lang") === "en").count()
    assert(pruned.count() == expected)
  }

  test("sorted-store write produces non-overlapping uid ranges") {
    val out = java.nio.file.Files.createTempDirectory("graft_sorted").toString
    val df = graft.iot.Transforms.transform(
      graft.iot.IotPipeline.readCsv(spark, "/root/repo/fixtures/iot_conn.csv"))
    graft.iot.IotPipeline.writeSortedByUid(df, out)
    val back = spark.read.parquet(out)
    assert(back.count() == 8)
    // uids within each output file are sorted (MergeTree ORDER BY parity)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(input_file_name())
      .orderBy(monotonically_increasing_id())
    val unsorted = back.select(col("uid"),
      lag("uid", 1).over(w).as("prev")).filter(col("prev") > col("uid"))
    assert(unsorted.count() == 0)
  }
}
