package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Robustness sweep #2: NULL text, empty text, and NULL embeddings.
  * A real crawl always contains them (failed extractions, truncated
  * uploads), and under ANSI mode a null flowing into the wrong cast
  * or an explode of a null array silently changing row counts are the
  * classic corpus-pipeline bugs. Every text/vector/corpus query must
  * execute; queries keyed by doc must not COUNT null-text docs into
  * token statistics. */
class NullRowSpec extends SparkTestBase {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_nullrows").toString
    Tables.names.foreach { t =>
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val base = Tables(spark, Sf, t)
      val doctored = t match {
        case "documents" =>
          // ids are shifted so nulls ADD to the corpus instead of
          // replacing existing docs
          val nulls = base.limit(3)
            .withColumn("doc_id", col("doc_id") + lit(1000000))
            .withColumn("text", lit(null).cast("string"))
          val empties = base.limit(2)
            .withColumn("doc_id", col("doc_id") + lit(2000000))
            .withColumn("text", lit(""))
          base.union(nulls).union(empties)
        case "embeddings" =>
          base.union(base.limit(2)
            .withColumn("vec_id", col("vec_id") + lit(1000000))
            .withColumn("embedding", lit(null).cast("array<float>")))
        case _ => base
      }
      doctored.write.parquet(s"$d/$t.parquet")
    }
    d
  }

  private def inScope(name: String): Boolean = {
    val num = name.drop(1).takeWhile(_.isDigit).toInt
    (num >= 30 && num <= 53) || (num >= 61 && num <= 74) ||
      (num >= 80 && num <= 88) || (num >= 100 && num <= 110) ||
      num == 131 || num == 134 || (num >= 135 && num <= 140)
  }

  test("text/vector/corpus queries execute with null and empty rows") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => inScope(n) }
      .flatMap { case (name, fn) =>
        try { fn(spark, dir).collect(); None }
        catch {
          case e: Throwable =>
            Some(s"$name: ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString.take(120)}")
        }
      }
    assert(failures.isEmpty,
      s"${failures.size} queries crash on null rows:\n${failures.mkString("\n")}")
  }

  test("null-text docs never get a positive token count") {
    val out = graft.queries.TextOps.queries("q35_token_count")(spark, dir)
      .collect()
    val schema = graft.queries.TextOps.queries("q35_token_count")(spark, dir).schema
    val idIdx = schema.fieldIndex("doc_id")
    val cntIdx = schema.fields.indexWhere(f =>
      f.name.contains("token") || f.name.contains("n_"))
    out.filter(r => r.getLong(idIdx) >= 1000000L && r.getLong(idIdx) < 2000000L)
      .foreach { r =>
        assert(r.isNullAt(cntIdx) || r.getLong(cntIdx) == 0L,
          s"null-text doc counted tokens: $r")
      }
  }
}
