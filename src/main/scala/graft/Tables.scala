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

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark's schema
    * converter rejects outright (PARQUET_TYPE_ILLEGAL). Read the raw
    * int64 nanos (`nanosAsLong`) and floor-divide to micros — the same
    * truncation DuckDB applies when casting TIMESTAMP_NS → TIMESTAMP, so
    * oracle comparisons stay bit-exact. NTZ (wall-clock) semantics match
    * the file's isAdjustedToUTC=false. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
