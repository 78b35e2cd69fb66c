package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated name prefixes — local targeted
    // runs only; the driver always invokes with exactly 2 args
    val only: Option[Array[String]] = args.lift(2).map(_.split(","))
    def keep(name: String): Boolean = only.forall(_.exists(name.startsWith))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.ts ships as either TIMESTAMP(NANOS) or TIMESTAMP(MICROS)
      // depending on the generator (TESTDATA layout flip, r8); the NANOS
      // layout is only readable as raw int64 with this legacy conf.
      // Session-level by design: Tables.events stays side-effect-free.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // AQE partition sizing for CACHED plans (r17, guide §2.2/§5):
      // by default Spark pins a cached plan's output partitioning
      // (canChangeCachedPlanOutputPartitioning=false), so every
      // persist() materializes and every cache scan re-reads the full
      // pre-AQE shuffle partition count however small the frame.
      // Enabling it gives cached plans the SAME adaptive coalescing
      // as uncached ones — partition count follows data size at every
      // scale (advisory-size-driven), not a fixed constant. Measured
      // on the persist-heavy quantile family at sf0.1: q160 7.6→4.3 s,
      // q50 2.4→2.0 s (min-of-4 paired A/B); results identical (full
      // oracle gate green under the flag).
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Census #10 at GATE SCALE (r17): per oracle-paired query, the
    // ORDER-BY totality verdict over the materialized output — the
    // sf10 tie-order class (duplicate lineitem PKs) is invisible at
    // small scale, so the data half of the law must travel with every
    // Verify run (sf0.01 driver gate, sf0.1/sf1/sf10 replays), not
    // only with the sf0.001 spec. check.py asserts on this file.
    val totality = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries.filter(kv => keep(kv._1)).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        if (SparkEntry.oracleSql.contains(name)) {
          val verdict = plans.SortGuard.topSortKeys(df.queryExecution.analyzed) match {
            case plans.SortGuard.Keys(keys) =>
              val out = spark.read.parquet(s"$outDir/$name")
              val v = plans.SortGuard.violations(out, keys)
              s"""{"status":"keys","violations":$v,"keys":[${keys.map("\"" + _ + "\"").mkString(",")}]}"""
            case plans.SortGuard.SingleRow =>
              val n = spark.read.parquet(s"$outDir/$name").count()
              s"""{"status":"single_row","rows":$n}"""
            case plans.SortGuard.Breach(d) =>
              val pinned = plans.SortGuard.Pinned.contains(name)
              s"""{"status":"breach","pinned":$pinned,"detail":"${d.replace("\"", "'")}"}"""
          }
          totality += name -> verdict
        }
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // drop localCheckpoint blocks so earlier queries never tax later ones
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.sharedState.cacheManager.clearCache()
    }
    Files.writeString(Paths.get(s"$outDir/sort_totality.json"),
      totality.map { case (k, v) => s""""$k": $v""" }
        .mkString("{", ",\n ", "}"))
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => keep(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
