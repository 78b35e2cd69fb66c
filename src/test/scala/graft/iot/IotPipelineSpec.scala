package graft.iot

import java.nio.file.Files

import graft.SparkTestBase

/** Malformed-input semantics of the S1 CSV scan — the contract a 39 GB
  * (or 100 TB) crawl of real Zeek logs depends on: one corrupt cell
  * must never fail the job NOR silently drop the whole row.
  * (PERMISSIVE is Spark's default; these tests pin it against
  * regression, since a stray `mode` option would change ingest
  * semantics silently.) */
class IotPipelineSpec extends SparkTestBase {

  private def writeCsv(lines: String*): String = {
    val dir = Files.createTempDirectory("graft_csv").toString
    Files.write(java.nio.file.Paths.get(dir, "conn.log.labeled.csv"),
      lines.mkString("\n").getBytes)
    dir
  }

  private val header = IotSchema.raw.fields.map(_.name).mkString(",")
  // a fully well-formed row (22 cols, matching types)
  private val good =
    "C1,192.168.1.1,1024,10.0.0.1,80,tcp,http,1.5,100,200,SF,T,F,0,Dd,2,140,2,240,-,Benign,-"

  test("an unparseable numeric cell nulls the CELL, not the row") {
    // orig_bytes (col 9, LongType) = "garbage"
    val bad =
      "C2,192.168.1.2,1024,10.0.0.1,80,tcp,http,1.5,garbage,200,SF,T,F,0,Dd,2,140,2,240,-,Benign,-"
    val df = IotPipeline.readCsv(spark, writeCsv(header, good, bad))
    val rows = df.collect().map(r => r.getAs[String]("uid") ->
      Option(r.getAs[java.lang.Long]("orig_bytes"))).toMap
    assert(rows("C1") === Some(100L))
    assert(rows("C2") === None) // cell nulled, row kept
  }

  test("a short row fills missing trailing columns with NULL") {
    val short = "C3,192.168.1.3,1024,10.0.0.1,80,tcp" // 6 of 22 cols
    val df = IotPipeline.readCsv(spark, writeCsv(header, good, short))
    val r = df.filter(df("uid") === "C3").collect().head
    assert(r.getAs[String]("proto") === "tcp")
    assert(r.getAs[String]("label") == null)
    assert(Option(r.getAs[java.lang.Long]("orig_bytes")).isEmpty)
  }

  test("the Zeek '-' unset marker maps to NULL in every column type") {
    val dashes =
      "C4,-,-,-,-,-,-,-,-,-,-,-,-,-,-,-,-,-,-,-,-,-"
    val df = IotPipeline.readCsv(spark, writeCsv(header, dashes))
    val r = df.collect().head
    assert(r.getAs[String]("uid") === "C4")
    IotSchema.raw.fields.drop(1).foreach { f =>
      assert(r.isNullAt(df.schema.fieldIndex(f.name)), s"${f.name} not null")
    }
  }

  test("malformed rows still flow through the full transform program") {
    val bad =
      "C5,192.168.1.5,notaport,10.0.0.1,80,tcp,http,bogus,100,200,SF,T,F,0,Dd,2,140,2,240,-,Benign,-"
    val dir = writeCsv(header, good, bad)
    val out = Transforms.transform(IotPipeline.readCsv(spark, dir))
    assert(out.count() === 2) // neither row dropped
    val r = out.filter(out("uid") === "C5").collect().head
    assert(r.isNullAt(out.schema.fieldIndex("id_orig_p")))
    // the 5-regex duration parser's fallback: unparseable -> NULL
    assert(r.isNullAt(out.schema.fieldIndex("duration_sec")))
  }
}
