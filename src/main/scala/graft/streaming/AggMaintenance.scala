package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Incremental materialized-view maintenance — the streaming upkeep of
  * a batch aggregate (here: the hourly per-type count/sum the
  * oracle-verified `EventOps.q25TumblingWindow` computes), done as a
  * DELTA LOG: each micro-batch appends its own partial aggregate
  * partitioned by `_batch_id`, and the view is the fold over all
  * deltas. Counts and fixed-point sums are ADDITIVE, so
  * Σ per-batch partials ≡ the one-shot batch aggregate — asserted
  * against the real batch twin in the spec.
  *
  * Why a delta log instead of read-modify-write on the aggregate:
  * exactly-once. A replayed batch dynamic-overwrites its OWN partition
  * (the [[NearDupIngest]] discipline) instead of double-adding into a
  * merged table — idempotence holds with a plain parquet store, no
  * transactional table format needed. The trade: reads fold the log, so
  * a production deployment compacts old deltas periodically
  * ([[graft.operators.Compaction]] is that mechanism); the fold itself
  * is a map-side-combined sum over (hour, type)-keyed rows — partials
  * per batch are window-count-sized, never event-sized. */
object AggMaintenance {

  /** Per-batch partial aggregate of the events shape: one row per
    * (hour_start, event_type) with count + exact fixed-point sum.
    * Exposed inside the library so the oracle-paired batch twin
    * (`EventOps.q163MvMaintenance`) runs the IDENTICAL partial. */
  private[graft] def partial(batch: DataFrame): DataFrame =
    batch.groupBy(date_trunc("hour", col("ts")).as("hour_start"),
      col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 1e6).cast("long")).as("sum_fp"))

  /** Start with `.start()`: maintains the delta log under `storeDir`
    * ([[DeltaLog]] exactly-once discipline; partials are data-derived,
    * so no single-file collapse). */
  def maintain(stream: DataFrame, storeDir: String,
      checkpointDir: String): DataStreamWriter[Row] =
    DeltaLog.sink(stream, storeDir, checkpointDir) {
      (batch, _) => partial(batch)
    }

  /** The fold-on-read over a delta-log frame — factored out so the
    * batch twin (q163) aggregates through the same code path. */
  private[graft] def fold(deltas: DataFrame): DataFrame =
    deltas.groupBy("hour_start", "event_type")
      .agg(sum(col("n_events")).as("n_events"),
        sum(col("sum_fp")).as("sum_fp"))
      .orderBy("hour_start", "event_type")

  /** The maintained view: fold the delta log. Identical schema and
    * values to the one-shot batch aggregate over the same events. */
  def view(s: SparkSession, storeDir: String): DataFrame =
    fold(DeltaLog.read(s, storeDir))

  /** Time travel: the view as it stood after `batchId` committed —
    * the fold over [[DeltaLog.readAsOf]]'s partition-pruned prefix. */
  def viewAsOf(s: SparkSession, storeDir: String, batchId: Long): DataFrame =
    fold(DeltaLog.readAsOf(s, storeDir, batchId))

  /** Collapse committed deltas ≤ `upTo` into one folded delta —
    * [[DeltaLog.compact]] through THIS monitor's fold (partial rows
    * stay (hour, type)-grain so later deltas keep summing into them;
    * the ORDER BY in [[fold]] is read-side only, dropped here). */
  def compactThrough(s: SparkSession, storeDir: String, upTo: Long): Unit =
    DeltaLog.compact(s, storeDir, upTo) { deltas =>
      deltas.groupBy("hour_start", "event_type")
        .agg(sum(col("n_events")).as("n_events"),
          sum(col("sum_fp")).as("sum_fp"))
    }
}
