package graft.iot

import java.nio.file.Files

import graft.SparkTestBase

/** The generated serving-store DDL must reproduce the reference's
  * static table (`clickhouse_scripts/init_db.sql:8-31`) column by
  * column, FROM the schema the transform actually emits — so any
  * drift between the Spark job's output and the serving table is a
  * red spec here, not a positional-insert corruption at load time. */
class ServingDdlSpec extends SparkTestBase {

  private def writeCsv(lines: String*): String = {
    val dir = Files.createTempDirectory("graft_ddl_csv").toString
    Files.write(java.nio.file.Paths.get(dir, "conn.log.labeled.csv"),
      lines.mkString("\n").getBytes)
    dir
  }

  private val header = IotSchema.raw.fields.map(_.name).mkString(",")
  private val good =
    "C1,192.168.1.1,1024,10.0.0.1,80,tcp,http,1.5,100,200,SF,T,F,0,Dd,2,140,2,240,-,Benign,-"

  /** Transcribed from `clickhouse_scripts/init_db.sql:8-29` — the
    * reference table's 22 (name, type) pairs in declaration order. */
  private val ReferenceTable = Seq(
    "uid" -> "String",
    "id_orig_h" -> "String",
    "id_orig_p" -> "Nullable(Int32)",
    "id_resp_h" -> "String",
    "id_resp_p" -> "Nullable(Int32)",
    "proto" -> "String",
    "service" -> "Nullable(String)",
    "orig_bytes" -> "Nullable(Int64)",
    "resp_bytes" -> "Nullable(Int64)",
    "conn_state" -> "String",
    "missed_bytes" -> "Nullable(Int64)",
    "history" -> "String",
    "orig_pkts" -> "Nullable(Int64)",
    "orig_ip_bytes" -> "Nullable(Int64)",
    "resp_pkts" -> "Nullable(Int64)",
    "resp_ip_bytes" -> "Nullable(Int64)",
    "tunnel_parents" -> "String",
    "label" -> "String",
    "detailed_label" -> "String",
    "duration_sec" -> "Nullable(Float64)",
    "local_orig_bool" -> "Nullable(UInt8)",
    "local_resp_bool" -> "Nullable(UInt8)")

  test("DDL generated from the ACTUAL transform output schema equals " +
    "the reference init_db.sql table, column for column, in order") {
    val out = Transforms.transform(
      IotPipeline.readCsv(spark, writeCsv(header, good)))
    val generated = out.schema.fields
      .map(f => f.name -> ServingDdl.clickhouseType(f)).toSeq
    assert(generated === ReferenceTable,
      "serving DDL drifted from the reference table — positional " +
        "loads would corrupt")
    // the full statement carries the reference's engine + sort key
    val ddl = ServingDdl.createTable(out.schema)
    assert(ddl.startsWith("CREATE TABLE IF NOT EXISTS default.iot_data"))
    assert(ddl.contains("ENGINE = MergeTree()") &&
      ddl.endsWith("ORDER BY uid"))
    // one line per column, reference order
    ReferenceTable.foreach { case (n, t) =>
      assert(ddl.contains(s"    $n $t"), s"missing column line: $n $t")
    }
  }

  test("unmappable column types fail loudly, never silently skipped") {
    import org.apache.spark.sql.types._
    intercept[IllegalArgumentException] {
      ServingDdl.clickhouseType(
        StructField("arr", ArrayType(StringType)))
    }
  }
}
