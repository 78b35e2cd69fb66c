package graft.operators

import org.apache.spark.sql.DataFrame

/** The per-frame materialization barrier for driver-side fixpoint
  * loops (PageRank/HITS/k-core/label-prop/BFS/SSSP/k-means and the
  * connected-components engine): every round must cut lineage — an
  * uncut loop re-plans a tree that GROWS per round (q113's recursive
  * lesson: planning cost, not data, becomes the bottleneck) — and
  * every materialized frame a loop reads (edge lists, degree tables,
  * the quantized k-means corpus) must survive to the last round.
  *
  * Two modes, selected by `spark.graft.checkpointDir`:
  *   - UNSET (default): `localCheckpoint()` — executor-local blocks,
  *     no distributed-store round trip, the fastest barrier and the
  *     right one single-node. Its truncated lineage DIES WITH AN
  *     EXECUTOR: on a 1000-executor 100 TB run, where executor loss
  *     is routine, a mid-loop loss fails the whole query.
  *   - SET to a reliable store path (HDFS/object storage):
  *     `checkpoint()` — each barrier frame is written to the store,
  *     so the loop resumes reading surviving copies after any
  *     executor loss, at the cost of one write+read per frame per
  *     round (label/rank tables are node-sized, edge frames
  *     edge-sized — both linear, never more than the loop already
  *     shuffles). The session's checkpoint dir is set on first use if
  *     the caller hasn't; the CALLER owns the directory lifecycle
  *     (delete after consuming results, or run with
  *     `spark.cleaner.referenceTracking.cleanCheckpoints=true`).
  *
  * `connectedComponents`' explicit `checkpointDir` parameter predates
  * this conf and keeps working (the parameter wins for that call);
  * this object is the same seam for the rest of the iterative family,
  * reachable on REGISTERED queries (whose `(session, dir)` signature
  * cannot thread a parameter) via session conf. persist() is NOT a
  * substitute here: it keeps lineage (good) but does not truncate it,
  * so per-round plans still grow — the one-shot multi-consumer
  * materializations elsewhere in the repo (BM25 postings, MinHash
  * signatures) face the opposite trade, documented at those sites. */
object IterBarrier {

  val ConfKey = "spark.graft.checkpointDir"

  def apply(df: DataFrame): DataFrame =
    df.sparkSession.conf.getOption(ConfKey) match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        // (re)point the context at the configured store unless it
        // already resolves there — a stale dir from an earlier caller
        // must not capture this loop's checkpoints. setCheckpointDir
        // appends a UUID subdir, so the resolved dir is exactly
        // "<configured-qualified>/<uuid>": compare the resolved dir's
        // PARENT against the scheme-qualified configured path (a
        // substring test false-matches whenever the configured path is
        // a path-suffix of a different root — "/data/ck" inside a
        // stale "file:/backup/data/ck/<uuid>" — and misreads relative
        // configured paths; qualifying both sides through the
        // configured path's FileSystem resolves scheme, authority,
        // and working directory the same way setCheckpointDir does)
        val p = new org.apache.hadoop.fs.Path(dir)
        val fs = p.getFileSystem(sc.hadoopConfiguration)
        val qualified = fs.makeQualified(p)
        val already = sc.getCheckpointDir.exists { resolved =>
          val parent = new org.apache.hadoop.fs.Path(resolved).getParent
          parent != null && fs.makeQualified(parent) == qualified
        }
        if (!already) sc.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint()
    }
}

/** `.iterBarrier()` postfix syntax for the loop call sites. */
object IterBarrierSyntax {
  implicit class BarrierOps(private val df: DataFrame) extends AnyVal {
    def iterBarrier(): DataFrame = IterBarrier(df)
  }
}
