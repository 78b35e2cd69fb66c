package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.queries.{ExtendedOps, TextOps}

/** Continuous corpus ingest with CROSS-BATCH NEAR-duplicate dedup —
  * the SimHash upgrade of [[CorpusIngest]] (which drops exact dups
  * only): each micro-batch
  *
  *   1. signs every incoming doc with a 64-bit SimHash;
  *   2. collapses EXACT-signature duplicates (min doc_id wins) — this
  *      bounds every band bucket by signature diversity, so the
  *      boilerplate-burst case (thousands of identical docs in one
  *      batch) never meets the pair stage's bucket cap;
  *   3. near-dedups the signature reps WITHIN the batch:
  *      pigeonhole-sized band buckets → exact Hamming verify →
  *      connected-components clustering, keep min-id reps — the same
  *      principled keep-one-per-cluster decision as q67, so
  *      transitive chains collapse to one survivor;
  *   4. drops reps within `maxHamming` of ANY stored doc (batch bands
  *      join the store's bands bucket-equi, exact verify);
  *   5. appends the survivors (with their signatures) to the store.
  *      Docs with NULL/empty text get no signature and bypass the
  *      near-dup stages, but are RETAINED (same as the exact-dedup
  *      ingest) — dedup must never silently lose data.
  *
  * Band count is derived from `maxHamming` (pigeonhole), so the
  * threshold is honored exactly at ANY value — a pair within the
  * threshold always shares a band.
  *
  * The parquet store is the dedup state: the per-batch match reads
  * ONLY (doc_id, simhash) — 16 bytes/doc after columnar pruning. At
  * 100 TB the standard upgrade is a persisted band-index side table
  * (bucket-partitioned, so a batch probes matching buckets instead of
  * re-deriving bands from every stored signature); the batch logic is
  * unchanged by it.
  *
  * Exactly-once: the store is partitioned by `_batch_id` and written
  * with DYNAMIC partition overwrite (the [[AsofEnrich]] pattern), so a
  * checkpoint-replayed batch overwrites its own partition instead of
  * appending duplicates — this covers unsigned (null-text) docs too,
  * which never match anything in the dedup stages. The cross-batch
  * match reads the store MINUS the current batch's partition;
  * otherwise a replayed doc would Hamming-0-match its own half-written
  * copy and be dropped by the overwrite.
  */
object NearDupIngest {

  /** Hash basis of the persisted signatures. The store is STATE — a
    * Hamming comparison between signatures from two different token
    * hashes is meaningless — so the basis is stamped into the store
    * (`_sig_basis` marker file) and every batch refuses a mismatched
    * or unstamped store LOUDLY instead of silently missing (or
    * falsely matching) near-dups against history. r16 switched the
    * basis xxhash64 → md5 (simhash64 → md5_simhash64, the
    * oracle-pairable kernel); any store written before that switch
    * has no marker and fails the check — rebuild it from the source
    * corpus (drop the store dir + checkpoint) rather than mixing
    * bases. Bump the version suffix on ANY future change to the
    * signature derivation (tokenization, vote rule, hash). */
  val SigBasis = "md5_simhash64/v1"
  private val BasisMarker = "_sig_basis"

  private def fsOf(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val path = new org.apache.hadoop.fs.Path(dir)
    (path.getFileSystem(s.sparkContext.hadoopConfiguration), path)
  }

  /** Read the store's stamped basis; None = no marker (empty dir or a
    * pre-stamp store). */
  private[streaming] def storedBasis(s: org.apache.spark.sql.SparkSession,
      storeDir: String): Option[String] = {
    val (fs, path) = fsOf(s, storeDir)
    val marker = new org.apache.hadoop.fs.Path(path, BasisMarker)
    if (!fs.exists(marker)) None
    else {
      val in = fs.open(marker)
      try {
        val buf = new Array[Byte](256)
        val n = in.read(buf)
        Some(new String(buf, 0, math.max(n, 0),
          java.nio.charset.StandardCharsets.UTF_8).trim)
      } finally in.close()
    }
  }

  private def stampBasis(s: org.apache.spark.sql.SparkSession,
      storeDir: String): Unit = {
    val (fs, path) = fsOf(s, storeDir)
    val out = fs.create(new org.apache.hadoop.fs.Path(path, BasisMarker), true)
    try out.write(SigBasis.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Loud-fail gate: an EXISTING store must carry this code's basis
    * stamp. Idempotent under checkpoint replay (marker rewrite is a
    * same-bytes overwrite). */
  private def requireBasis(s: org.apache.spark.sql.SparkSession,
      storeDir: String): Unit =
    if (CorpusIngest.storeExists(s, storeDir)) {
      val found = storedBasis(s, storeDir)
      require(found.contains(SigBasis),
        s"near-dup store $storeDir signature basis mismatch: store=" +
          s"${found.getOrElse("<unstamped pre-r16 store>")}, code=$SigBasis" +
          " — Hamming distances across bases are meaningless; rebuild the" +
          " store (delete it and its checkpoint, replay the corpus)")
    }

  /** Streaming writer: docs (doc_id, text, …) → near-dedup'd parquet
    * store carrying a `simhash` column. */
  def ingest(docs: DataFrame, storeDir: String, checkpointDir: String,
      maxHamming: Int = 3): DataStreamWriter[Row] =
    docs.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        val s = batch.sparkSession
        requireBasis(s, storeDir)
        // source re-delivery can duplicate ids within one batch — keep
        // one row per id before the signature join multiplies them
        val b0 = batch.dropDuplicates("doc_id")
        // left join: docs with no tokens (null/empty text) have no
        // signature row; they skip dedup but are never dropped
        val withSig = b0
          .join(TextOps.simhashOf(b0.select(col("doc_id"), col("text"))),
            Seq("doc_id"), "left_outer")
          .localCheckpoint() // feeds pair stages (×2 sides) + survivors
        val signed = withSig.filter(col("simhash").isNotNull)
        // exact-signature collapse: min doc_id per signature
        val sigReps = signed.groupBy("simhash")
          .agg(min(col("doc_id")).as("doc_id"))
          .select("doc_id", "simhash")
        // in-batch: cluster near-dups among the reps, keep min-id rep
        val pairs = TextOps
          .simhashNearPairs(sigReps, sigReps, maxHamming, selfJoin = true)
          .select("id_a", "id_b")
        val nonReps = ExtendedOps.connectedComponents(pairs)
          .filter(col("id") =!= col("cluster_id"))
          .select(col("id").as("doc_id"))
        val reps = sigReps.join(nonReps, Seq("doc_id"), "left_anti")
        // cross-batch: drop reps near any stored doc
        val fresh =
          if (CorpusIngest.storeExists(s, storeDir)) {
            val stored = s.read.parquet(storeDir)
              .filter(col("_batch_id") =!= batchId) // replay: not our own half-write
              .select("doc_id", "simhash").filter(col("simhash").isNotNull)
            val hits = TextOps
              .simhashNearPairs(reps, stored, maxHamming, selfJoin = false)
              .select(col("id_a").as("doc_id")).distinct()
            reps.join(hits, Seq("doc_id"), "left_anti")
          } else reps
        val unsigned = withSig.filter(col("simhash").isNull)
        withSig.join(fresh.select("doc_id"), Seq("doc_id"), "left_semi")
          .unionByName(unsigned)
          .withColumn("_batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("_batch_id")
          .parquet(storeDir)
        stampBasis(s, storeDir)
      }
      .option("checkpointLocation", checkpointDir)
}
