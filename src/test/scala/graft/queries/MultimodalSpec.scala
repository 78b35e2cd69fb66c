package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Multimodal plumbing: the partition-wise decode path and its
  * agreement with the expression-based stub. */
class MultimodalSpec extends SparkTestBase {

  test("mapPartitions decode covers every document exactly once") {
    val decoded = MultimodalOps.decodePartitions(spark, Sf, numPartitions = 7)
    val n = graft.Tables.documents(spark, Sf).count()
    assert(decoded.count() == n)
    assert(decoded.select("doc_id").distinct().count() == n)
  }

  test("decode output is deterministic and within stub ranges") {
    val a = MultimodalOps.decodePartitions(spark, Sf, numPartitions = 3)
      .collect().map(d => d.doc_id -> d).toMap
    val b = MultimodalOps.decodePartitions(spark, Sf, numPartitions = 11)
      .collect().map(d => d.doc_id -> d).toMap
    // partitioning must not change per-row results (decoder is pure)
    assert(a == b)
    a.values.foreach { d =>
      assert(d.width >= 1 && d.width <= 1280)
      assert(d.height >= 1 && d.height <= 720)
      assert(d.n_frames >= 1)
    }
  }

  test("decode fields agree with the expression-based q43 stub") {
    val fromExpr = MultimodalOps.q43DecodeStub(spark, Sf)
      .select("doc_id", "n_bytes", "width", "height").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    val fromPartitions = MultimodalOps.decodePartitions(spark, Sf)
      .collect().map(d => d.doc_id -> (d.n_bytes, d.width, d.height)).toMap
    assert(fromExpr == fromPartitions)
  }
}
