package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.queries.EventOps

/** Streaming SPRT experiment monitor — the incremental form of the
  * batch sequential test (`EventOps.q194Sprt`): every micro-batch of
  * events appends one delta row per experiment arm (trials n, successes
  * x), and `decisions` folds the accumulated delta log in batch order
  * into the cumulative log-likelihood ratio, reporting each arm's first
  * boundary crossing — the monitor an experimentation platform runs so
  * a decided test stops burning traffic the moment the evidence is in,
  * instead of at the nightly batch job.
  *
  * Scale posture: per batch the only distributed work is one 2-group
  * conditional count; state lives in the append-only delta log, not the
  * streaming state store, so restarts need no state recovery and the
  * fold-on-read is a 2-partition window over batches×arms rows (the
  * [[AggMaintenance]] delta-log discipline). The LLR uses the SAME
  * precomputed fixed-point constants as q194 — one spelling, so the
  * streaming decision is digit-for-digit the batch decision on the same
  * prefix of data. Replay-idempotent via `_batch_id`
  * dynamic-partition-overwrite ([[NearDupIngest]]): a replayed batch
  * overwrites its own half-write instead of double-counting trials. */
object SprtMonitor {

  /** foreachBatch sink: per batch, one (arm, n, x) delta row per arm,
    * through the [[DeltaLog]] exactly-once seam (single-file: the
    * delta is two arm rows). Start with `.start()`. */
  def deltas(stream: DataFrame, outDir: String,
      checkpointDir: String): DataStreamWriter[Row] =
    DeltaLog.sink(stream, outDir, checkpointDir, singleFile = true) {
      (batch, _) =>
        batch.filter(col("event_type").isin("click", "view"))
          .groupBy((col("user_id") % 2).as("arm"))
          .agg(count(lit(1)).as("n"),
            count(when(col("event_type") === "click", 1)).as("x"))
    }

  /** Fold-on-read: cumulative LLR per arm in batch order, plus the
    * first crossing (if any) — q194's decision semantics over the
    * delta log. One row per (arm, batch) with the running state, so a
    * dashboard reads the full trajectory and the latest row per arm is
    * the current verdict. */
  def decisions(s: SparkSession, deltaDir: String): DataFrame = {
    val byArm = Window.partitionBy("arm").orderBy("_batch_id")
    val cum = DeltaLog.read(s, deltaDir)
      .withColumn("cum_llr", sum(
        col("x") * EventOps.SprtLnP + (col("n") - col("x")) * EventOps.SprtLnQ)
        .over(byArm))
      .withColumn("crossed",
        col("cum_llr") >= EventOps.SprtBound ||
          col("cum_llr") <= -EventOps.SprtBound)
    cum
      // decision is sticky: the FIRST crossing's direction carries
      // forward even if later evidence drifts back inside the bounds
      .withColumn("decision", coalesce(
        first(when(col("crossed"),
          when(col("cum_llr") >= EventOps.SprtBound, "reject_h0")
            .otherwise("accept_h0")), ignoreNulls = true).over(byArm),
        lit("continue")))
      .select(col("arm"), col("_batch_id"), col("n"), col("x"),
        col("cum_llr"), col("decision"))
      .orderBy("arm", "_batch_id")
  }
}
