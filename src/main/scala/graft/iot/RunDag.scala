package graft.iot

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The reference DAG end-to-end as ONE orchestrated main — the same
  * five tasks, same order, same semantics as
  * `dags/iot_processing_dag.py:79-86`:
  *
  *   start
  *   >> cleanup_previous_parquet     (rm -rf of the parquet dir)
  *   >> run_spark_to_parquet_job     (CSV → transform → parquet)
  *   >> truncate_clickhouse_table    (TRUNCATE IF EXISTS)
  *   >> load_parquet_to_clickhouse   (positional INSERT … SELECT *
  *                                    FROM file(parquet dir))
  *   >> end                          (ALL_SUCCESS; count as the check)
  *
  * Every piece already exists and is individually spec'd
  * (`IotPipelineSpec`, `ScaleSpec`, `ServingDdl`); this main wires
  * them at the DAG's task granularity so the whole refresh cycle runs
  * — and re-runs — as one command. Fidelity notes:
  *   - the load task reads the parquet FILES back (the reference's
  *     ClickHouse `file()` table function), NOT the in-memory frame —
  *     a schema drift between writer and store surfaces here, exactly
  *     as it would in production;
  *   - the insert binds columns BY POSITION (`insertInto`), matching
  *     ClickHouse's `INSERT … SELECT *` resolution;
  *   - TRUNCATE-then-load is non-transactional, like the reference's
  *     two-task cycle (see [[IotPipeline.refreshServing]]'s scaladoc
  *     for the visibility contract); the cycle is IDEMPOTENT across
  *     completed reruns — `RunDagSpec` runs it twice and pins the
  *     equal-table property the DAG's safe daily re-run relies on.
  *
  * Scale: the transform is one narrow codegen'd pass (P1–P7); the
  * sorted write repartitions by range on uid (the K3 store layout);
  * the reload is a scan + positional insert — nothing here holds
  * driver-side state beyond the 1-row metrics aggregate. */
object RunDag {

  final case class DagReport(cleanedPrevious: Boolean, rowsWritten: Long,
      nullDurations: Long, maliciousRows: Long, servingCount: Long)

  /** One full DAG cycle. Returns the per-task observability the
    * reference DAG lacks (its validation is printSchema-only). */
  def runDag(spark: SparkSession, csvPath: String, parquetDir: String,
      table: String): DagReport = {
    // -- cleanup_previous_parquet ------------------------------------
    val outPath = new org.apache.hadoop.fs.Path(parquetDir)
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cleanedPrevious = fs.delete(outPath, true)

    // -- run_spark_to_parquet_job ------------------------------------
    // NOTE: runWithMetrics' observe() idiom cannot ride the SORTED
    // write — repartitionByRange runs a sampling pass over the input
    // before the real one, so an Observation below the range exchange
    // fires twice (measured: doubled counts). The DAG validates what
    // LANDED instead: one aggregate over the written store (stronger
    // than counting the in-flight frame — a write-side loss would
    // show here).
    val out = Transforms.transform(IotPipeline.readCsv(spark, csvPath))
    IotPipeline.writeSortedByUid(out, parquetDir)

    // -- truncate_clickhouse_table (IF EXISTS semantics: create from
    // the STORE's schema on first run, so the table is always present
    // to truncate — ServingDdl holds the real ClickHouse DDL twin) ---
    val stored = spark.read.parquet(parquetDir)
    val m = stored.agg(
      count(lit(1)).as("rows"),
      coalesce(sum(when(col("duration_sec").isNull, 1L).otherwise(0L)),
        lit(0L)).as("null_durations"),
      coalesce(sum(when(col("label") === "Malicious", 1L).otherwise(0L)),
        lit(0L)).as("malicious_rows")).head()
    // Fresh-JVM rerun hazard (r13 ADVICE): with the default in-memory
    // catalog a JVM restart loses the table's METADATA while its
    // spark-warehouse directory persists, so tableExists=false and ANY
    // managed-table creation — saveAsTable or CREATE TABLE DDL alike
    // (RunDagSpec measured both) — throws LOCATION_ALREADY_EXISTS.
    // When the catalog lacks the table, whatever sits at its managed
    // location is last cycle's data from a dead incarnation; the cycle
    // TRUNCATEs the table before loading anyway, so deleting the stale
    // location first is semantics-preserving — the reference DAG's
    // truncate-then-load daily rerun, made restart-safe.
    if (!spark.catalog.tableExists(table)) {
      val staleLoc = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.defaultTablePath(
          org.apache.spark.sql.catalyst.TableIdentifier(table)))
      val fs = staleLoc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // Deletion guard (r15 ADVICE): the location should only ever
      // hold a dead incarnation's parquet parts — anything else means
      // some other process parked data there, and silently destroying
      // it would be wrong. Warn LOUDLY with the listing (the cycle
      // still needs the location clear to proceed).
      if (fs.exists(staleLoc)) {
        val entries = fs.listStatus(staleLoc).map(_.getPath.getName)
        val foreign = entries.filterNot(n =>
          n.endsWith(".parquet") || n.startsWith("_SUCCESS") ||
            n.startsWith("_committed") || n.startsWith("_started") ||
            n.startsWith("."))
        if (foreign.nonEmpty)
          System.err.println(s"[runDag] WARNING: stale managed location " +
            s"$staleLoc holds NON-TABLE entries ${foreign.mkString(", ")} " +
            "— removing them with the dead incarnation's files")
        fs.delete(staleLoc, true)
      }
      spark.sql(
        s"CREATE TABLE $table (${stored.schema.toDDL}) USING parquet")
    }
    spark.sql(s"TRUNCATE TABLE $table")

    // -- load_parquet_to_clickhouse (positional, from the files) -----
    stored.write.insertInto(table)

    // -- end: the success check the DAG leaves implicit --------------
    val servingCount =
      spark.sql(s"SELECT count(*) FROM $table").head().getLong(0)
    DagReport(cleanedPrevious,
      m.getLong(0), // rows
      m.getLong(1), // null_durations
      m.getLong(2), // malicious_rows
      servingCount)
  }

  def main(args: Array[String]): Unit = {
    val csvPath = args.lift(0)
      .getOrElse("/root/repo/fixtures/iot_conn.csv")
    val parquetDir = args.lift(1).getOrElse("/tmp/graft_iot_dag/parquet")
    val table = args.lift(2).getOrElse("iot_conn_serving")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val r = runDag(spark, csvPath, parquetDir, table)
    println(s"""{"dag":"iot_data_processing_pipeline_parquet",""" +
      s""""cleaned_previous":${r.cleanedPrevious},""" +
      s""""rows_written":${r.rowsWritten},""" +
      s""""null_durations":${r.nullDurations},""" +
      s""""malicious_rows":${r.maliciousRows},""" +
      s""""serving_count":${r.servingCount}}""")
    spark.stop()
  }
}
