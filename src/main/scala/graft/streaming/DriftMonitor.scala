package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming distribution-drift monitor — the incremental form of the
  * batch PSI audit (`CorpusOps.q145`): every micro-batch of incoming
  * documents is binned by text length (8 fixed 256-char buckets, the
  * q145 binning) and scored against a REFERENCE distribution with the
  * population stability index, appending one audit row per batch. The
  * alarm a continuous ingest raises when a source starts shipping
  * different-shaped data.
  *
  * Scale posture: the reference distribution is 8 counts (model-sized,
  * captured once on the driver); per batch the only distributed work is
  * one 8-group count aggregate — the PSI arithmetic is 8 terms of
  * driver math, exactly the q145 formula (add-one smoothing, ln over
  * integer products floor-quantized to 1e-6) so batch and streaming
  * scores are comparable digit-for-digit. Replay-idempotent via the
  * `_batch_id` dynamic-partition-overwrite discipline
  * ([[NearDupIngest]]): a replayed batch overwrites its own half-write
  * instead of duplicating audit rows. */
object DriftMonitor {

  private val NBins = 8

  /** 8-bucket length histogram of a (…, text) frame — one aggregate. */
  private[streaming] def binCounts(df: DataFrame): Map[Int, Long] =
    df.filter(col("text").isNotNull)
      .select(least(floor(length(col("text")) / 256), lit(7))
        .cast("int").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

  /** PSI × 1e6 between two 8-bin count maps — the q145 formula on the
    * driver (8 integer terms; ln floor-quantized so the streaming score
    * matches the batch oracle's discipline exactly). */
  private[streaming] def psiScaled(ref: Map[Int, Long],
      cur: Map[Int, Long]): Long = {
    val totR = ref.values.sum
    val totC = cur.values.sum
    (0 until NBins).map { b =>
      val a = ref.getOrElse(b, 0L)
      val c = cur.getOrElse(b, 0L)
      val p = (a + 1).toDouble / (totR + NBins)
      val q = (c + 1).toDouble / (totC + NBins)
      val lnNum =
        math.floor(math.log(((a + 1) * (totC + NBins)).toDouble) * 1e6).toLong
      val lnDen =
        math.floor(math.log(((c + 1) * (totR + NBins)).toDouble) * 1e6).toLong
      math.floor((p - q) * (lnNum - lnDen)).toLong
    }.sum
  }

  /** foreachBatch sink: per batch, bin → PSI vs `reference` → one audit
    * row (batch id, doc count, psi), written through the [[DeltaLog]]
    * exactly-once seam (single-file: the delta is ONE audit row).
    * Start with `.start()`. */
  def monitor(stream: DataFrame, reference: DataFrame, outDir: String,
      checkpointDir: String): DataStreamWriter[Row] = {
    val refCounts = binCounts(reference)
    DeltaLog.sink(stream, outDir, checkpointDir, singleFile = true) {
      (batch, _) =>
        val s = batch.sparkSession
        import s.implicits._
        val cur = binCounts(batch)
        val ps = psiScaled(refCounts, cur)
        Seq((cur.values.sum, ps, ps / 1e6))
          .toDF("n_docs", "psi_scaled", "psi")
    }
  }
}
