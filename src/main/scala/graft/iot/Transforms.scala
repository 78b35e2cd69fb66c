package graft.iot

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, FloatType}

/** The reference's entire transformation program, re-expressed as
  * composable `DataFrame => DataFrame` stages of pure Catalyst
  * expressions (the reference uses zero UDFs; so do we — everything
  * below stays inside whole-stage codegen).
  *
  * Semantics are bit-exact with `src/jobs/process_iot_data.py:105-187`
  * including the deliberate quirks:
  *   - five SEPARATE regexes pull the timedelta components (not one
  *     anchored five-group pattern) — each component that fails to
  *     match yields `""`, whose Float cast is NULL, nulling the sum;
  *   - each component is cast to Float32 first, then multiplied by a
  *     DOUBLE literal (`* 86400.0`), so `duration_sec` is DoubleType;
  *   - the plain-numeric fallback casts through Float32 (so e.g.
  *     "3.139211" becomes 3.1392109394073486 after promotion);
  *   - the presence→boolean coercion is lossy (`"F"` ⇒ `true`);
  *   - `duration_parsed` (full-pattern match) is computed then dropped
  *     unused — a dead intermediate, reproduced for fidelity (Catalyst
  *     eliminates it, so it costs nothing).
  */
object Transforms {

  /** P1 — identifier cleaning: `.`→`_`, `-`→`_` in every column name
    * (`process_iot_data.py:105-111`). Affects `id.orig_h`,
    * `id.orig_p`, `id.resp_h`, `id.resp_p`, `detailed-label`. */
  def cleanColumnNames(df: DataFrame): DataFrame =
    df.toDF(df.columns.toIndexedSeq.map(_.replace(".", "_").replace("-", "_")): _*)

  /** Pandas-Timedelta-style full pattern, e.g. `0 days 00:00:03.148000`
    * (`process_iot_data.py:121`). */
  val TimedeltaPattern: String =
    "(\\d+)\\s+days\\s+(\\d{2}):(\\d{2}):(\\d{2})\\.(\\d+)"

  /** P2+P3+P4 — duration-string → seconds
    * (`process_iot_data.py:118-154`).
    *
    * Component regexes are the reference's own, applied independently:
    * days `(\d+)\s+days`, hours `days\s+(\d{2}):`, minutes `:(\d{2}):`,
    * seconds `:(\d{2})\.`, micros `\.(\d+)`. Any non-match ⇒ NULL sum;
    * the fallback then treats inputs containing `"days"` as malformed
    * (NULL) and anything else as raw float seconds. Source columns
    * dropped (P7). */
  def parseDuration(df: DataFrame): DataFrame = {
    // ANSI-safe: Spark 4.x has spark.sql.ansi.enabled=true by default, so
    // a plain `"".cast(FloatType)` (the PySpark-3.5/ANSI-off no-match
    // behavior the reference relies on) would throw CAST_INVALID_INPUT.
    // `""` ⇒ NULL first, then cast — identical semantics under both modes.
    def comp(pat: String) = {
      val m = regexp_extract(col("duration"), pat, 1)
      when(m === "", lit(null)).otherwise(m).cast(FloatType)
    }
    val summed =
      comp("(\\d+)\\s+days") * lit(86400.0) +
        comp("days\\s+(\\d{2}):") * lit(3600.0) +
        comp(":(\\d{2}):") * lit(60.0) +
        comp(":(\\d{2})\\.") +
        comp("\\.(\\d+)") / lit(1000000.0)
    df.withColumn("duration_parsed",
        regexp_extract(col("duration"), TimedeltaPattern, 0))
      .withColumn("duration_sec", summed)
      .withColumn("duration_sec",
        when(col("duration_sec").isNull,
          when(col("duration").contains("days"), lit(null))
            // try_cast, not cast: malformed plain strings must yield NULL
            // (reference behavior under ANSI-off) instead of throwing
            // CAST_INVALID_INPUT under Spark 4.x ANSI mode.
            .otherwise(expr("try_cast(duration AS FLOAT)")))
          .otherwise(col("duration_sec")))
      .drop("duration", "duration_parsed")
  }

  /** P5 — presence→boolean coercion for `local_orig` / `local_resp`
    * (`process_iot_data.py:161-175`): NULL or `""` ⇒ false, ANY other
    * value ⇒ true — lossy by design (a literal `"F"` becomes `true`);
    * replicated exactly. Source columns dropped. */
  def coerceLocalFlags(df: DataFrame): DataFrame = {
    def flag(d: DataFrame, src: String, dst: String) =
      d.withColumn(dst,
        when(col(src).isNull || col(src) === "", lit(false))
          .otherwise(lit(true)).cast(BooleanType))
    flag(flag(df, "local_orig", "local_orig_bool"),
      "local_resp", "local_resp_bool")
      .drop("local_orig", "local_resp")
  }

  /** P6 — `""` ⇒ NULL for `service` only (`process_iot_data.py:179-181`),
    * complementing the scan-level `nullValue="-"`. */
  def normalizeService(df: DataFrame): DataFrame =
    df.withColumn("service",
      when(col("service") === "", lit(null)).otherwise(col("service")))

  /** The full transform program in reference order
    * (`process_iot_data.py:114-184`): clean names → duration → local
    * flags → service. The resulting column order is exactly
    * [[IotSchema.outputColumns]] (positional serving-store contract);
    * asserted via `require` on the analyzed schema — metadata-only (no
    * job), so any drift fails loudly at plan-build time. */
  def transform(df: DataFrame): DataFrame = {
    val out = normalizeService(
      coerceLocalFlags(parseDuration(cleanColumnNames(df))))
    require(out.columns.toSeq == IotSchema.outputColumns,
      s"output column order drifted: ${out.columns.mkString(",")}")
    out
  }
}
