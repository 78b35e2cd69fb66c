package graft.tools
import org.apache.spark.sql.SparkSession
/** Throwaway micro-measure: per-`read.parquet` driver cost (schema
  * inference + file index) on the bench tables. */
object SchemaCost {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    (1 to 3).foreach(_ => spark.read.parquet(s"$d/lineitem.parquet").schema)
    val t0 = System.nanoTime()
    (1 to 100).foreach { _ =>
      spark.read.parquet(s"$d/lineitem.parquet").schema
      spark.read.parquet(s"$d/events.parquet").schema
    }
    println(f"200 reads: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    spark.stop()
  }
}
