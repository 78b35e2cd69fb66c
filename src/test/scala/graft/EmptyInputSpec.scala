package graft

import java.nio.file.Files

/** Robustness sweep: every registered query must EXECUTE (not just
  * plan) against schema-identical EMPTY tables without throwing. At
  * 100 TB "empty" is an everyday input — a fresh day's partition, a
  * filter that matched nothing, a replayed shard — and an operator
  * that crashes on zero rows (driver-side first() on an empty stats
  * frame, a seed row that does not exist, min/max nulls feeding ANSI
  * arithmetic) is a production outage, not an edge case. */
class EmptyInputSpec extends SparkTestBase {

  private lazy val emptyDir: String = {
    val dir = Files.createTempDirectory("graft_empty").toString
    Tables.names.foreach { t =>
      // events: keep the RAW int64-nanos ts column (Tables.events
      // re-applies the ns→µs conversion on read)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      Tables(spark, Sf, t).limit(0).write.parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every registered query runs on empty tables without throwing") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          fn(spark, emptyDir).collect()
          None
        } catch {
          case e: Throwable =>
            Some(s"$name: ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString.take(120)}")
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries crash on empty input:\n${failures.mkString("\n")}")
  }
}
