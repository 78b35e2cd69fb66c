package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.queries.CorpusOps

/** Streaming content-addressed chunk store — the ingest twin of the
  * q215 CDC chunking audit, and the write path every dedup blob store
  * runs: each micro-batch of documents is content-defined-chunked
  * (identical boundary rule to the batch query), and ONLY chunks whose
  * hash is not already in the store are appended. Identical text
  * arriving in later batches — re-crawls, retries, boilerplate —
  * costs zero stored bytes.
  *
  * Exactly-once on plain parquet via the [[DeltaLog]] discipline with
  * one extra rule: the novelty anti-join reads the store EXCLUDING the
  * current batch id, so a replayed batch re-derives its delta against
  * the same "prior chunks" view it saw the first time and re-overwrites
  * its own partition with identical rows (spec kills the commit marker
  * and proves it).
  *
  * Scale shape: chunking is the embarrassingly-parallel q215 stage;
  * the novelty join is hash-keyed (16-byte md5 keys, uniform); the
  * store grows with DISTINCT content, not ingest volume. Production
  * compacts old deltas periodically like every DeltaLog consumer here.
  */
object ChunkStoreIngest {

  /** Chunk a document micro-batch to (h, clen) rows, one per DISTINCT
    * chunk within the batch (the within-batch dedup). */
  private def batchChunks(docs: DataFrame): DataFrame =
    CorpusOps.cdcChunkFrame(docs)
      .select(md5(col("chunk")).as("h"), length(col("chunk")).as("clen"))
      .groupBy("h").agg(max(col("clen")).as("clen"))

  /** The store's chunk hashes as seen by batch `excludeBatch` — all
    * partitions except its own (replay safety), empty before the first
    * batch commits. Emptiness is decided by an explicit store probe
    * ([[DeltaLog.isEmpty]]), NEVER by catching read failures: a
    * transient read error (corrupt footer, FS hiccup) on a non-empty
    * store must fail the batch so the checkpoint retries — swallowing
    * it would present an empty prior view, re-append every chunk, and
    * permanently break the store's distinct-by-construction
    * invariant. */
  private def priorChunks(s: SparkSession, storeDir: String,
      excludeBatch: Long): DataFrame =
    if (DeltaLog.isEmpty(s, storeDir)) {
      import s.implicits._
      Seq.empty[String].toDF("h")
    } else DeltaLog.read(s, storeDir)
      .filter(col("_batch_id") =!= excludeBatch).select("h")

  /** Start with `.start()`: maintains the chunk store under
    * `storeDir`. */
  def ingest(docStream: DataFrame, storeDir: String,
      checkpointDir: String): DataStreamWriter[Row] =
    DeltaLog.sink(docStream, storeDir, checkpointDir) { (batch, batchId) =>
      batchChunks(batch.select(col("doc_id"),
          coalesce(col("lang"), lit("?")).as("source"), col("text")))
        .join(priorChunks(batch.sparkSession, storeDir, batchId),
          Seq("h"), "left_anti")
    }

  /** Every stored chunk (h, clen) — distinct by construction. */
  def chunks(s: SparkSession, storeDir: String): DataFrame =
    DeltaLog.read(s, storeDir).select("h", "clen")

  /** Collapse committed deltas ≤ `upTo` into one folded base —
    * [[DeltaLog.compact]] through THIS store's fold. The fold is a
    * hash-keyed max (idempotent + associative: hashes are distinct by
    * the ingest anti-join, so max(clen) is just "keep the row" —
    * stated as an aggregate so a replay-raced duplicate could never
    * double a byte count). `singleFile = false`: the folded base is a
    * DATA-sized content table, not a model — it keeps its parallel
    * file layout. */
  def compactThrough(s: SparkSession, storeDir: String, upTo: Long): Unit =
    DeltaLog.compact(s, storeDir, upTo, singleFile = false) { deltas =>
      deltas.groupBy("h").agg(max(col("clen")).as("clen"))
    }

  /** Total bytes the store holds — the dedup'd footprint of everything
    * ever ingested. */
  def bytesStored(s: SparkSession, storeDir: String): Long =
    chunks(s, storeDir).agg(coalesce(sum(col("clen")), lit(0L)))
      .head().getLong(0)
}
