package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** The delta-log discipline shared by every fold-on-read streaming
  * monitor in this package ([[AggMaintenance]], [[DriftMonitor]],
  * [[SprtMonitor]]): each micro-batch writes its derived rows into its
  * OWN `_batch_id` partition with dynamic-partition overwrite, and
  * readers fold the accumulated log.
  *
  * Why this one seam carries exactly-once on plain parquet: a replayed
  * batch (restart between sink write and checkpoint commit) re-writes
  * the SAME `_batch_id` partition, overwriting its half-write instead
  * of appending a duplicate — idempotence without a transactional
  * table format. State lives in the log, not the streaming state
  * store, so restarts need no state recovery; the trade is that reads
  * fold the log, so production compacts old deltas periodically
  * ([[compact]]).
  *
  * Compaction is CRASH-ATOMIC via a marker protocol (all file ops on
  * the Hadoop `FileSystem` API). The commit point is a RENAME, so the
  * protocol's atomicity holds exactly where rename is atomic:
  * `file://` and HDFS. S3A's rename is client-side copy+delete — NOT
  * atomic — so on S3A a crash mid-commit can leave both the tmp and
  * the marker visible; the marker content is empty and its NAME is
  * the commit, so the worst case there is a committed marker plus a
  * stale `.tmp` (cleaned by the next compaction's GC), but the
  * one-shot commit guarantee itself needs a conditional-put object
  * store or an HDFS-class filesystem:
  *
  *   1. the folded prefix is written to the side directory
  *      `_compacted/<upTo>/` — invisible to the partitioned raw scan
  *      (Spark ignores `_`-prefixed paths), so readers still see the
  *      intact raw log;
  *   2. the marker file `_compact_hwm_<upTo>` is committed by an
  *      atomic rename — THIS is the commit point: readers resolve the
  *      high-water mark as max over marker files and switch to
  *      (folded base ∪ raw suffix > hwm) the instant it appears;
  *   3. GC runs ONE GENERATION BEHIND (lazy): only files superseded
  *      as of the PREVIOUS high-water mark are deleted (raw
  *      partitions ≤ prev, compacted bases and markers < prev). The
  *      just-superseded generation — prev's base, prev's marker, and
  *      the raw suffix (prev, upTo] — survives until the NEXT
  *      compaction, so any reader that resolved a high-water mark at
  *      or after prev still has every file its plan references: the
  *      concurrent-reader race of eager GC (plan formed against
  *      files, files deleted mid-read) cannot happen inside one
  *      compaction cycle. The retention window is exactly one
  *      compaction generation — run compactions no more often than
  *      the longest reader.
  *
  * A crash before step 2 leaves an orphan `_compacted` dir the next
  * attempt overwrites; a crash after step 2 is a completed compaction
  * whose GC debt the next compaction settles. No window double-counts
  * or drops a batch.
  *
  * The DOMAIN folds stay with their monitors — this seam owns only the
  * mechanics every monitor was re-implementing: the batch-id stamp,
  * the overwrite mode, the partition layout, and the read-side type
  * restoration. */
object DeltaLog {

  private val MarkerPrefix = "_compact_hwm_"
  private val CompactedDir = "_compacted"

  private def fileSystem(s: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(s.sessionState.newHadoopConf()), p)
  }

  /** Committed compaction high-water mark of a store: max over marker
    * files, -1 if never compacted. Public so as-of callers (sketch
    * audits, time-travel reads) can check whether a historical batch
    * is still below the retention horizon BEFORE asking [[readAsOf]],
    * which throws below it. */
  def committedHighWaterMark(s: SparkSession, storeDir: String): Long = {
    val (fs, root) = fileSystem(s, storeDir)
    committedHwm(fs, root)
  }

  /** Committed compaction high-water mark: max over marker files, -1
    * if never compacted. Markers are monotone — a new one is committed
    * before old ones are deleted, so max is correct in every crash
    * window. */
  private def committedHwm(fs: FileSystem, root: Path): Long =
    if (!fs.exists(root)) -1L
    else fs.listStatus(root).iterator.map(_.getPath.getName)
      .filter(_.startsWith(MarkerPrefix))
      .map { name =>
        // the protocol can never leave a malformed marker (staged
        // names don't share the prefix; rename is atomic), so one can
        // only mean external interference — fail LOUDLY with the
        // offending name rather than a bare NumberFormatException or,
        // worse, skipping it and silently reading a stale hwm
        try name.stripPrefix(MarkerPrefix).toLong
        catch { case _: NumberFormatException =>
          throw new IllegalStateException(
            s"malformed compaction marker '$name' in $root — the " +
              "store's integrity metadata has been tampered with or " +
              "corrupted; refusing to guess the high-water mark")
        }
      }
      .foldLeft(-1L)(math.max)

  /** Raw `_batch_id=<n>` partition ids currently on disk. */
  private def rawIds(fs: FileSystem, root: Path): Seq[Long] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).iterator.map(_.getPath.getName)
      .filter(_.startsWith("_batch_id="))
      .map(_.stripPrefix("_batch_id=").toLong).toSeq

  /** Write one batch's delta rows into their `_batch_id` partition.
    * `singleFile` collapses model-sized deltas (one audit row, K arms)
    * to one file; leave it false for data-sized partials. */
  def writeBatch(delta: DataFrame, batchId: Long, storeDir: String,
      singleFile: Boolean = false): Unit = {
    val stamped = delta.withColumn("_batch_id", lit(batchId))
    (if (singleFile) stamped.coalesce(1) else stamped)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_batch_id")
      .parquet(storeDir)
  }

  /** foreachBatch sink: apply the monitor's per-batch derivation, then
    * [[writeBatch]] it. The derivation sees the raw micro-batch and the
    * batch id (some monitors fold the id into their rows). Start the
    * returned writer with `.start()`. */
  def sink(stream: DataFrame, storeDir: String, checkpointDir: String,
      singleFile: Boolean = false)(
      derive: (DataFrame, Long) => DataFrame): DataStreamWriter[Row] =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(derive(batch, batchId), batchId, storeDir, singleFile)
      }
      .option("checkpointLocation", checkpointDir)

  /** True iff the store holds no committed data at all — the directory
    * is absent, or exists with neither a raw `_batch_id=` partition nor
    * a committed compaction. Callers that want "empty store reads as
    * empty" semantics ([[ChunkStoreIngest]]) must gate on THIS rather
    * than catching read failures: a corrupt footer or filesystem error
    * on a non-empty store has to propagate and fail the batch, not
    * masquerade as emptiness. */
  def isEmpty(s: SparkSession, storeDir: String): Boolean = {
    val (fs, root) = fileSystem(s, storeDir)
    rawIds(fs, root).isEmpty && committedHwm(fs, root) < 0
  }

  /** The raw partitioned log with `_batch_id` restored to LONG
    * (partition-column inference reads the directory value back as
    * INT, which would silently change fold/window types). */
  private def rawRead(s: SparkSession, storeDir: String): DataFrame =
    s.read.parquet(storeDir)
      .withColumn("_batch_id", col("_batch_id").cast("long"))

  /** Read the accumulated log: the compacted base (if any) unioned
    * with raw deltas above the high-water mark. */
  def read(s: SparkSession, storeDir: String): DataFrame =
    readAsOf(s, storeDir, Long.MaxValue)

  /** Time travel: the log as it stood after batch `batchId` committed.
    * Because every batch owns exactly its `_batch_id` partition and
    * partition pruning turns the predicate into a directory skip, any
    * monitor's fold over [[readAsOf]] IS its historical state — no
    * snapshot files, no extra bookkeeping; the log's layout already
    * encodes its own history.
    *
    * Batches BELOW the compaction high-water mark are gone — folded
    * into the base (the usual table-format retention trade) — so
    * asking for them THROWS rather than silently answering with the
    * newer hwm state (an as-of audit quietly reading the wrong
    * snapshot is strictly worse than failing). Callers that prefer
    * clamp-to-oldest semantics can check [[committedHighWaterMark]]
    * first. `batchId == hwm` is exact and fine. */
  def readAsOf(s: SparkSession, storeDir: String, batchId: Long): DataFrame = {
    val (fs, root) = fileSystem(s, storeDir)
    val hwm = committedHwm(fs, root)
    if (batchId < hwm)
      throw new IllegalArgumentException(
        s"readAsOf($batchId): state below the committed compaction " +
          s"high-water mark $hwm was folded away (one-generation " +
          "retention); check committedHighWaterMark before time-traveling")
    if (hwm < 0)
      rawRead(s, storeDir).filter(col("_batch_id") <= batchId)
    else {
      val base = s.read.parquet(new Path(root,
        s"$CompactedDir/$hwm").toString)
      if (batchId <= hwm) base
      else if (!rawIds(fs, root).exists(id => id > hwm && id <= batchId)) base
      else base.unionByName(rawRead(s, storeDir)
        .filter(col("_batch_id") > hwm && col("_batch_id") <= batchId))
    }
  }

  /** Compact: collapse the log up to `upTo` (inclusive) into ONE
    * folded base, using the monitor's own fold (counts sum, registers
    * max, top-ks merge — compaction MUST go through the same fold the
    * reader uses, which is why it lives on this seam and takes the
    * fold as an argument). Read-side results are unchanged:
    * fold(folded prefix ∪ suffix) ≡ fold(all deltas) for any
    * associative fold. Crash-atomic per the marker protocol in the
    * object doc. Only compact batches the checkpoint has committed: a
    * replay of an uncommitted batch would re-write a raw partition the
    * GC already claimed. */
  def compact(s: SparkSession, storeDir: String, upTo: Long,
      singleFile: Boolean = true)(
      fold: DataFrame => DataFrame): Unit = {
    val (fs, root) = fileSystem(s, storeDir)
    val prev = committedHwm(fs, root)
    require(upTo > prev, s"compact($upTo) at or below committed hwm $prev")
    // 1. fold the prefix and stage it to the side dir (invisible to
    //    the raw scan; overwrite tolerates a crashed prior attempt).
    //    `singleFile` collapses MODEL-sized folds (aggregate cells,
    //    registers) to one file; pass false for DATA-sized folded
    //    state (a chunk store's content table) so the base keeps its
    //    parallel layout.
    val folded = fold(readAsOf(s, storeDir, upTo))
      .withColumn("_batch_id", lit(upTo))
    (if (singleFile) folded.coalesce(1) else folded)
      .write.mode("overwrite")
      .parquet(new Path(root, s"$CompactedDir/$upTo").toString)
    // 2. commit: atomic marker rename — the instant this lands,
    //    readers resolve hwm=upTo and ignore everything below it
    val tmp = new Path(root, s".${MarkerPrefix}$upTo.tmp")
    fs.create(tmp, true).close()
    if (!fs.rename(tmp, new Path(root, s"$MarkerPrefix$upTo")))
      throw new java.io.IOException(
        s"failed to commit compaction marker $MarkerPrefix$upTo")
    // 3. LAZY GC — collect only what the PREVIOUS generation already
    //    superseded, so every reader that resolved hwm >= prev keeps a
    //    consistent file set; this generation's leftovers are the next
    //    compaction's debt. A crash mid-delete just leaves garbage
    //    that readers ignore.
    rawIds(fs, root).filter(_ <= prev).foreach { id =>
      fs.delete(new Path(root, s"_batch_id=$id"), true)
    }
    // stale `.{marker}.tmp` files from CRASHED commit attempts (ours
    // renamed away above; any survivor is an orphan no reader looks at)
    fs.listStatus(root).iterator.map(_.getPath)
      .filter { p =>
        p.getName.startsWith(s".$MarkerPrefix") && p.getName.endsWith(".tmp")
      }
      .foreach(p => fs.delete(p, false))
    if (prev >= 0) {
      fs.listStatus(new Path(root, CompactedDir)).iterator
        .map(_.getPath).filter(_.getName.toLong < prev)
        .foreach(p => fs.delete(p, true))
      fs.listStatus(root).iterator.map(_.getPath)
        .filter(p => p.getName.startsWith(MarkerPrefix) &&
          p.getName.stripPrefix(MarkerPrefix).toLong < prev)
        .foreach(p => fs.delete(p, false))
    }
  }
}
