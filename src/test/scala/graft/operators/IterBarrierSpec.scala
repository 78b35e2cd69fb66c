package graft.operators

import java.nio.file.{Files, Paths}

import graft.SparkTestBase

/** [[IterBarrier]] — the conf-selected per-round barrier of the
  * iterative family: `localCheckpoint` by default, RELIABLE
  * `checkpoint()` when `spark.graft.checkpointDir` is set. The value
  * of the reliable mode is fault-tolerance on a real cluster
  * (executor loss does not kill truncated lineage), which a
  * single-JVM test cannot exercise directly — what it CAN pin is
  * that the mode switch changes only the storage, never the answer,
  * and that reliable checkpoints really land in the configured
  * directory. */
class IterBarrierSpec extends SparkTestBase {

  test("reliable mode is answer-identical to the default and writes " +
    "checkpoints into the configured directory") {
    import graft.queries.WarehouseOps
    val (defRanks, defIters) =
      WarehouseOps.pageRankFixpoint(spark, Sf, maxIters = 2)
    val expected = defRanks.orderBy("id").collect().toSeq

    val dir = Files.createTempDirectory("graft_ckpt_").toString
    spark.conf.set(IterBarrier.ConfKey, dir)
    try {
      val (relRanks, relIters) =
        WarehouseOps.pageRankFixpoint(spark, Sf, maxIters = 2)
      assert(relIters == defIters)
      assert(relRanks.orderBy("id").collect().toSeq == expected,
        "the barrier mode must never change the answer")
      // the reliable run must have materialized into the store
      val files = Files.walk(Paths.get(dir)).filter(Files.isRegularFile(_))
        .count()
      assert(files > 0, s"no reliable checkpoint files written under $dir")
    } finally {
      spark.conf.unset(IterBarrier.ConfKey)
      // best-effort cleanup (the caller-owns-lifecycle contract)
      Files.walk(Paths.get(dir)).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
    }
  }

  test("default mode stays localCheckpoint (no checkpoint dir required)") {
    // would throw SparkException("Checkpoint directory has not been
    // set") if the default path ever called reliable checkpoint()
    val df = IterBarrier(Tables.nation(spark, Sf))
    assert(df.count() == 25)
  }

  private def Tables = graft.Tables
}
