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
  *   2. near-dedups WITHIN the batch: band-bucketed candidate pairs
  *      (never all-pairs), exact `bit_count(xor) <= maxHamming`
  *      verify, connected-components clustering, keep min-id reps —
  *      the same principled keep-one-per-cluster decision as q67, so
  *      transitive chains collapse to one survivor, not a greedy
  *      prefix;
  *   3. drops reps within `maxHamming` of ANY stored doc: batch bands
  *      join the store's bands bucket-equi, then exact verify;
  *   4. appends the survivors (with their signatures) to the store.
  *
  * The parquet store is the dedup state: the per-batch match reads
  * ONLY (doc_id, simhash) — 16 bytes/doc after columnar pruning. At
  * 100 TB the standard upgrade is a persisted band-index side table
  * (4 rows/doc, bucket-partitioned, so a batch probes matching
  * buckets instead of re-deriving bands from every stored signature);
  * the batch logic is unchanged by it.
  *
  * Exactly-once: checkpoint replay is idempotent — a replayed doc is
  * Hamming-0 from its own stored copy and drops in step 3.
  */
object NearDupIngest {

  /** Verified near-dup pairs between two (doc_id, simhash, …) frames:
    * band-bucket candidates, exact Hamming verify. `selfJoin = true`
    * orders ids (a < b); false keeps every (left, right) hit. */
  private def nearPairs(a: DataFrame, b: DataFrame, maxHamming: Int,
      selfJoin: Boolean): DataFrame = {
    val ab = TextOps.simhashBands(a.select("doc_id", "simhash"))
      .withColumnRenamed("doc_id", "id_a")
    val bb = TextOps.simhashBands(b.select("doc_id", "simhash"))
      .withColumnRenamed("doc_id", "id_b")
    val cands = ab.join(bb, Seq("band", "bucket"))
    val filtered =
      if (selfJoin) cands.filter(col("id_a") < col("id_b")) else cands
    filtered
      .dropDuplicates("id_a", "id_b")
      .join(a.select(col("doc_id").as("id_a"), col("simhash").as("sig_a")), Seq("id_a"))
      .join(b.select(col("doc_id").as("id_b"), col("simhash").as("sig_b")), Seq("id_b"))
      .filter(bit_count(col("sig_a").bitwiseXOR(col("sig_b"))) <= maxHamming)
      .select("id_a", "id_b")
  }

  /** Streaming writer: docs (doc_id, text, …) → near-dedup'd parquet
    * store carrying a `simhash` column. */
  def ingest(docs: DataFrame, storeDir: String, checkpointDir: String,
      maxHamming: Int = 3): DataStreamWriter[Row] =
    docs.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        val s = batch.sparkSession
        // source re-delivery can duplicate ids within one batch — keep
        // one row per id before the signature join multiplies them
        val b0 = batch.dropDuplicates("doc_id")
        val withSig = b0
          .join(TextOps.simhashOf(b0.select(col("doc_id"), col("text"))),
            Seq("doc_id"))
          .localCheckpoint() // three consumers: pairs (×2 sides) + survivors
        // in-batch: cluster near-dups, keep the min-id representative
        val pairs = nearPairs(withSig, withSig, maxHamming, selfJoin = true)
        val nonReps = ExtendedOps.connectedComponents(pairs)
          .filter(col("id") =!= col("cluster_id"))
          .select(col("id").as("doc_id"))
        val reps = withSig.join(nonReps, Seq("doc_id"), "left_anti")
        // cross-batch: drop reps near any stored doc
        val fresh =
          if (CorpusIngest.storeExists(s, storeDir)) {
            val stored = s.read.parquet(storeDir).select("doc_id", "simhash")
            val hits = nearPairs(reps, stored, maxHamming, selfJoin = false)
              .select(col("id_a").as("doc_id")).distinct()
            reps.join(hits, Seq("doc_id"), "left_anti")
          } else reps
        fresh.withColumn("_batch_id", lit(batchId))
          .write.mode("append").parquet(storeDir)
      }
      .option("checkpointLocation", checkpointDir)
}
