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

  test("stale-dir detection compares the resolved dir's parent — a " +
    "configured path that is a path-SUFFIX of a stale root must not " +
    "false-match (round-11 ADVICE)") {
    val base = Files.createTempDirectory("graft_ckpt_sfx_")
    val configured = base.resolve("A/ck")
    // stale root embeds the configured path as a strict suffix:
    // ".../B<configured>" — resolved stale checkpoints live at
    // ".../B<configured>/<uuid>", which CONTAINS "<configured>/" and
    // so defeated the old substring test
    val stale = Paths.get(base.toString + "/B" + configured.toString)
    Files.createDirectories(configured)
    Files.createDirectories(stale)
    val sc = spark.sparkContext
    sc.setCheckpointDir(stale.toString)
    val staleResolved = sc.getCheckpointDir.get
    assert(staleResolved.contains(configured.toString + "/"),
      "fixture must reproduce the substring false-match shape")
    spark.conf.set(IterBarrier.ConfKey, configured.toString)
    try {
      IterBarrier(Tables.nation(spark, Sf)).count()
      val resolved = sc.getCheckpointDir.get
      assert(resolved != staleResolved,
        "the stale dir must not capture this loop's checkpoints")
      assert(new org.apache.hadoop.fs.Path(resolved).getParent
        .toUri.getPath == configured.toString,
        s"checkpoints must land under the configured dir: $resolved")
      // and a matching dir is NOT re-pointed (each setCheckpointDir
      // mints a fresh UUID subdir — pointless churn between rounds)
      IterBarrier(Tables.nation(spark, Sf)).count()
      assert(sc.getCheckpointDir.get == resolved)
    } finally {
      spark.conf.unset(IterBarrier.ConfKey)
      Files.walk(base).sorted(java.util.Comparator.reverseOrder())
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
