package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

/** Loaders for the driver-provided testdata star schema (TESTDATA.md):
  * TPC-H-ish tables plus `events` (stream twin), `documents` (text),
  * `embeddings` (similarity). One parquet file per table under a
  * scale-factor directory, e.g. /root/testdata/sf0.01.
  *
  * Scale posture: these are plain parquet scans — Catalyst handles
  * column pruning and predicate pushdown, so callers should express
  * filters/projections declaratively and let them reach the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Per-session memo of the RESOLVED scan DataFrame per path (r17).
    *
    * `spark.read.parquet(path)` pays driver-side footer schema
    * inference + file-index construction on EVERY call — measured
    * ~88 ms per call on this box (`tools.SchemaCost`: 200 warm reads
    * = 17.6 s). A bench pass resolves the same ten immutable tables
    * hundreds of times, so the engine now resolves each (session,
    * path) ONCE and reuses the logical plan — exactly what a catalog
    * table (HMS/Iceberg metadata cache) gives a production deployment,
    * and the guide's §6 file-listing-cache prescription applied at the
    * API seam we own. This memoizes PLANS, not results: every action
    * still scans parquet.
    *
    * Contract: paths handed to this loader are immutable for the
    * session's lifetime (driver testdata is). Code that overwrites
    * and re-reads its own output (IotPipeline sinks, RunDag) calls
    * `spark.read` directly and is unaffected. Keyed weakly by session
    * so stopped sessions don't pin plans. */
  private val planCache =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val perSession = planCache.synchronized {
      planCache.computeIfAbsent(spark,
        _ => new java.util.concurrent.ConcurrentHashMap[String, DataFrame]())
    }
    perSession.computeIfAbsent(s"$dir/$name.parquet",
      p => spark.read.parquet(p))
  }

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  /** `events.ts` arrives in either of two generator layouts, and the
    * loader must accept both (the driver regenerates testdata between
    * rounds and has switched annotation):
    *   - parquet TIMESTAMP(NANOS): Spark's schema converter rejects it
    *     outright (PARQUET_TYPE_ILLEGAL), so read the raw int64 nanos
    *     (`nanosAsLong`) and floor-divide to micros — the same
    *     truncation DuckDB applies casting TIMESTAMP_NS → TIMESTAMP,
    *     keeping oracle comparisons bit-exact;
    *   - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads
    *     it natively as TIMESTAMP_NTZ — pass through.
    * Either way the column lands as NTZ (wall-clock), matching the
    * files' isAdjustedToUTC=false.
    *
    * The `spark.sql.legacy.parquet.nanosAsLong` conf the NANOS layout
    * needs is session bootstrap's responsibility (Verify / Bench /
    * SparkTestBase set it at build time) — a table loader must not
    * mutate session state as a side effect. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = apply(s, d, "events")
    val ts = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts div 1000"))
      case _ => col("ts")
    }
    raw.withColumn("ts", ts.cast(TimestampNTZType))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
