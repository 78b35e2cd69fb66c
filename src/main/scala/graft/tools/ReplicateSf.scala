package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-replicator for the testdata star schema: writes
  * N key-shifted copies of every table (default 10 × sf0.1 ≈ sf1) so
  * the FULL oracle gate — not just the invariant specs — can replay at
  * a decade above the driver's bench scale (r13 verdict item 3).
  *
  * Every key column (primary AND the foreign keys that reference it)
  * shifts by `replica · (max(key) + 1)`, so the output is N disjoint,
  * referentially-intact copies of the source database: joins fan out
  * exactly as at the source scale (no cross-replica key collisions
  * that would square the join mass), group counts scale ×N, and both
  * engines read the identical parquet bytes. The same recipe as
  * `Sf1StressSpec`'s in-test replicas, promoted to a reusable main
  * covering ALL tables.
  *
  * Usage: sbt "runMain graft.tools.ReplicateSf <srcDir> <outDir> [n]"
  */
object ReplicateSf {

  def replicate(spark: SparkSession, src: String, out: String,
      n: Int): Unit = {
    val reps = spark.range(n).select(col("id").as("rep"))

    def load(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")

    // span = max+1 per LOGICAL key (shared by the pk and every fk
    // that references it, so the shifted copies stay joined)
    def span(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head() match {
        case r if r.isNullAt(0) => 1L
        case r => r.get(0) match {
          case i: Int => i.toLong + 1L
          case l: Long => l + 1L
          case other => sys.error(s"unsupported key type for $key: $other")
        }
      }

    val region = load("region"); val nation = load("nation")
    val customer = load("customer"); val supplier = load("supplier")
    val part = load("part"); val orders = load("orders")
    val lineitem = load("lineitem"); val events = load("events")
    val documents = load("documents"); val embeddings = load("embeddings")

    val regS = span(region, "r_regionkey")
    val natS = span(nation, "n_nationkey")
    val custS = span(customer, "c_custkey")
    val suppS = span(supplier, "s_suppkey")
    val partS = span(part, "p_partkey")
    val ordS = span(orders, "o_orderkey")
    val evS = span(events, "event_id")
    val userS = span(events, "user_id")
    val docS = span(documents, "doc_id")
    val vecS = span(embeddings, "vec_id")

    /** Cross with the replica index, shift each (column, span) by
      * rep·span keeping the column's original type, drop the index,
      * restore the source column order, write. */
    def ship(df: DataFrame, table: String, shifts: (String, Long)*): Unit = {
      val srcCols = df.columns
      var d = df.crossJoin(reps)
      shifts.foreach { case (c, s) =>
        val t = df.schema(c).dataType
        d = d.withColumn(c, (col(c) + col("rep") * s).cast(t))
      }
      d.select(srcCols.map(col).toIndexedSeq: _*)
        .write.mode("overwrite").parquet(s"$out/$table.parquet")
    }

    ship(region, "region", "r_regionkey" -> regS)
    ship(nation, "nation", "n_nationkey" -> natS, "n_regionkey" -> regS)
    ship(customer, "customer",
      "c_custkey" -> custS, "c_nationkey" -> natS)
    ship(supplier, "supplier",
      "s_suppkey" -> suppS, "s_nationkey" -> natS)
    ship(part, "part", "p_partkey" -> partS)
    ship(orders, "orders", "o_orderkey" -> ordS, "o_custkey" -> custS)
    ship(lineitem, "lineitem", "l_orderkey" -> ordS,
      "l_partkey" -> partS, "l_suppkey" -> suppS)
    ship(events, "events", "event_id" -> evS, "user_id" -> userS)
    ship(documents, "documents", "doc_id" -> docS)
    ship(embeddings, "embeddings", "vec_id" -> vecS)
  }

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_sf1")
    val n = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    replicate(spark, src, out, n)
    println(s"""{"replicated":"$out","from":"$src","n":$n}""")
    spark.stop()
  }
}
