package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.queries.TextOps

/** Streaming HLL maintenance: the max-folded registers must be
  * identical to the batch registers over the concatenated corpus, the
  * estimate must match the batch estimate bit-for-bit, and replay must
  * leave the registers unchanged. */
class HllMaintenanceSpec extends SparkTestBase {

  private val b1 = Seq(
    Doc(1, "alpha beta gamma delta epsilon", "en"),
    Doc(2, "zeta eta theta iota kappa", "en"))
  private val b2 = Seq(
    Doc(3, "alpha beta lambda mu nu", "en"),     // overlaps b1
    Doc(4, "xi omicron pi rho sigma tau", "en"))

  private def toks(docs: Seq[Doc]) = {
    import spark.implicits._
    docs.toDF().select(explode(TextOps.tokens(lower(col("text"))))
      .as("token")).filter(col("token") =!= "")
  }

  test("folded registers and estimate equal the batch sketch over all " +
    "batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("graft_hll").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_hll_ck").toString
    val mem = MemoryStream[Doc](spark)
    val q = HllMaintenance.maintain(mem.toDF(), store, ckpt).start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val got = HllMaintenance.registers(spark, store).collect()
      .map(r => r.getAs[Long]("bucket") -> r.getAs[Int]("m_j")).toMap
    val all = toks(b1 ++ b2)
    val spine = spark.range(0, 64).select(col("id").as("bucket"))
    val want = spine.join(TextOps.hllRegistersOf(all), Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("m_j"), lit(0)).as("m_j"))
      .collect().map(r => r.getAs[Long]("bucket") -> r.getAs[Int]("m_j"))
      .toMap
    assert(got === want)
    val gotEst = HllMaintenance.estimate(spark, store).collect()(0)
    val wantEst = TextOps.hllTableOf(all).collect()(0)
    assert(gotEst.getAs[Double]("est") === wantEst.getAs[Double]("est"))
    assert(gotEst.getAs[Long]("s_scaled") ===
      wantEst.getAs[Long]("s_scaled"))
  }

  test("a replayed batch leaves the registers unchanged") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_hll_src").toString
    val store = java.nio.file.Files.createTempDirectory("graft_hll2").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_hll2_ck").toString
    b1.toDF().write.mode("overwrite").parquet(src)
    def stream = spark.readStream
      .schema(Seq.empty[Doc].toDF().schema).parquet(src)
    val q1 = HllMaintenance.maintain(stream, store, ckpt).start()
    try q1.processAllAvailable() finally { q1.stop(); q1.awaitTermination() }
    val before = HllMaintenance.registers(spark, store).collect()
      .map(_.toString).sorted.toSeq
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.matches("\\d+")).sortBy(_.getName.toLong)
    val last = commits.last
    new java.io.File(last.getParentFile, s".${last.getName}.crc").delete()
    last.delete()
    val q2 = HllMaintenance.maintain(stream, store, ckpt).start()
    try q2.processAllAvailable() finally { q2.stop(); q2.awaitTermination() }
    val after = HllMaintenance.registers(spark, store).collect()
      .map(_.toString).sorted.toSeq
    assert(after === before, "replay changed the HLL registers")
  }
}
