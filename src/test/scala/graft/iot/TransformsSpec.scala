package graft.iot

import org.apache.spark.sql.Row

import graft.SparkTestBase

/** The reference transform program's truth tables
  * (`process_iot_data.py:107-187`), exercised end-to-end through the
  * CSV reader + transform over the checked-in fixture. */
class TransformsSpec extends SparkTestBase {

  lazy val out: Map[String, Row] = {
    val df = Transforms.transform(
      IotPipeline.readCsv(spark, "/root/repo/fixtures/iot_conn.csv"))
    df.collect().map(r => r.getAs[String]("uid") -> r).toMap
  }

  private def dur(uid: String): Option[Double] = {
    val r = out(uid)
    val i = r.fieldIndex("duration_sec")
    if (r.isNullAt(i)) None else Some(r.getDouble(i))
  }

  test("fixture loads all 8 rows") { assert(out.size == 8) }

  test("output column order is the exact 22-column serving contract") {
    val df = Transforms.transform(
      IotPipeline.readCsv(spark, "/root/repo/fixtures/iot_conn.csv"))
    assert(df.columns.toSeq == IotSchema.outputColumns)
  }

  // ---- duration parser: the four input classes (process_iot_data.py:118-154)

  test("timedelta string parses to seconds") {
    assert(math.abs(dur("C1a2b3").get - 3.148) < 1e-9)
  }

  test("timedelta with days and micros") {
    // 2*86400 + 1*3600 + 2*60 + 3 + 0.5
    assert(math.abs(dur("Cab1c2").get - 176523.5) < 1e-9)
  }

  test("micros=000001 contributes exactly 1e-6") {
    assert(math.abs(dur("Cmn9o0").get - 37230.000001) < 1e-9)
  }

  test("plain float seconds falls back through Float32 (reference quirk)") {
    // float32("3.139211") promoted to double — NOT 3.139211
    assert(dur("C4d5e6").get == 3.139211f.toDouble)
    assert(math.abs(dur("C4d5e6").get - 3.1392109394073486) < 1e-15)
  }

  test("float seconds near day boundary rounds through Float32") {
    assert(dur("Cjk7l8").get == 86399.999999f.toDouble)
    assert(dur("Cjk7l8").get == 86400.0)
  }

  test("'-' null marker yields NULL duration") { assert(dur("C7g8h9").isEmpty) }

  test("malformed 'days' string yields NULL (not a crash under ANSI)") {
    assert(dur("Cde3f4").isEmpty)
  }

  // ---- presence→bool coercion truth table (process_iot_data.py:161-175)

  test("local flag 'T' => true") {
    assert(out("C1a2b3").getAs[Boolean]("local_orig_bool"))
  }

  test("local flag literal 'F' => true (lossy by design)") {
    assert(out("C4d5e6").getAs[Boolean]("local_orig_bool"))
    assert(out("C4d5e6").getAs[Boolean]("local_resp_bool"))
  }

  test("empty local flag => false") {
    assert(!out("C7g8h9").getAs[Boolean]("local_orig_bool"))
  }

  test("mixed presence: absent orig with present resp") {
    assert(!out("Cgh5i6").getAs[Boolean]("local_orig_bool"))
    assert(out("Cgh5i6").getAs[Boolean]("local_resp_bool"))
  }

  // ---- null normalization (process_iot_data.py:179-181 + scan nullValue)

  test("empty-string service becomes NULL") {
    assert(out("Cab1c2").isNullAt(out("Cab1c2").fieldIndex("service")))
  }

  test("'-' service becomes NULL at scan") {
    assert(out("Cjk7l8").isNullAt(out("Cjk7l8").fieldIndex("service")))
  }

  test("identifier cleaning renames dotted/dashed columns") {
    val renamed = Transforms.cleanColumnNames(
      IotPipeline.readCsv(spark, "/root/repo/fixtures/iot_conn.csv"))
    assert(renamed.columns.contains("id_orig_h"))
    assert(renamed.columns.contains("detailed_label"))
    assert(!renamed.columns.exists(c => c.contains(".") || c.contains("-")))
  }

  test("malformed CSV rows degrade to nulls, not failures (PERMISSIVE)") {
    // the reference reads with Spark's default PERMISSIVE mode: a row
    // whose typed field doesn't parse yields NULL in that field
    val dir = java.nio.file.Files.createTempDirectory("graft_badcsv")
    val header = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get("/root/repo/fixtures/iot_conn.csv")).get(0)
    java.nio.file.Files.writeString(dir.resolve("bad.csv"),
      header + "\n" +
        // id.orig_p 'notaport' is unparseable as int; rest intact
        "Cbad01,1.2.3.4,notaport,5.6.7.8,80,tcp,http,1.5,1,2,SF,T,,0,S,1,2,3,4,-,Benign,-\n")
    val out = Transforms.transform(IotPipeline.readCsv(spark, dir.toString))
    val row = out.collect().head
    assert(row.getAs[String]("uid") == "Cbad01")
    assert(row.isNullAt(row.fieldIndex("id_orig_p")))
    assert(math.abs(row.getDouble(row.fieldIndex("duration_sec")) - 1.5) < 1e-6)
  }

  test("duration parser property: 100 random timedeltas round-trip") {
    val rnd = new scala.util.Random(42)
    val cases = (1 to 100).map { _ =>
      val (d, h, m, sec, us) = (rnd.nextInt(30), rnd.nextInt(24),
        rnd.nextInt(60), rnd.nextInt(60), rnd.nextInt(1000000))
      (f"$d days $h%02d:$m%02d:$sec%02d.$us%06d",
        d * 86400.0 + h * 3600.0 + m * 60.0 + sec +
          us.toFloat.toDouble / 1000000.0)
    }
    import spark.implicits._
    val df = cases.map(_._1).toDF("duration")
    val parsed = Transforms.parseDuration(df).collect().map(_.getDouble(0))
    cases.map(_._2).zip(parsed).foreach { case (exp, got) =>
      assert(math.abs(exp - got) < 1e-6, s"expected $exp got $got")
    }
  }
}
