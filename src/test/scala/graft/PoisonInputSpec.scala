package graft

import org.apache.spark.sql.functions._

/** Poison-input posture of the ingest seams (round 12).
  *
  * At 100 TB a single malformed record MUST NOT kill the job: every
  * boundary where uncontrolled bytes enter the engine needs a
  * documented null-and-continue (or zero-stats) posture, pinned here
  * so a refactor that turns one into a throw fails loudly. The three
  * seams where external bytes arrive:
  *
  *   1. the IoT CSV scan (S1) — Spark's CSV default PERMISSIVE mode is
  *      load-bearing: unparseable fields and short rows become NULLs,
  *      long rows drop the excess, and the downstream transform
  *      program must stay total over those NULLs (its try_/nullif
  *      guards exist for ANSI mode, which would otherwise throw);
  *   2. the message-bus JSON envelope parse — from_json yields a NULL
  *      struct on corrupt payloads, so every projected field of a
  *      poison message is NULL and the row survives to be filtered or
  *      quarantined by the caller (documented contract, not accident);
  *   3. the binary media decoders — the native kernels return NULL
  *      (BmpStats: header checks) or empty stats (PcmStats: zero
  *      samples) on garbage, and the declarative substr/hex/conv byte
  *      readers read past-end bytes as empty-hex → NULL, never a range
  *      error.
  */
class PoisonInputSpec extends SparkTestBase {

  test("S1 CSV: unparseable numerics, short rows, long rows, and " +
    "binary junk survive as NULL-padded rows (PERMISSIVE posture) and " +
    "the full transform program stays total over them") {
    val dir = java.nio.file.Files.createTempDirectory("poison_csv")
    // header straight from the enforced schema (22 original CSV names)
    val header = iot.IotSchema.raw.fields.map(_.name).mkString(",")
    val good = "Cu0/1,10.0.0.1,1024,10.0.0.2,80,tcp,http," +
      "0 days 00:00:03.148000,10,20,SF,T,F,0,ShADad,5,500,4,400,-," +
      "Benign,-"
    val poison = Seq(
      // unparseable numerics in the int/long columns
      "CuX,z,NOTANUM,z,yy,tcp,-,gibberish,xx,yy,SF,T,F,zz,h,a,b,c,d,-," +
        "Malicious,PartOfAHorizontalPortScan",
      // far too short
      "CuShort,10.0.0.9",
      // far too long (extra columns must drop, not shift)
      good + ",EXTRA1,EXTRA2,EXTRA3",
      // raw binary junk
      new String(Array[Byte](0, 1, 2, -1, -2, 66, 77, 10, 13, 0), "ISO-8859-1").replace("\n", "").replace("\r", ""))
    java.nio.file.Files.writeString(dir.resolve("conn.csv"),
      (Seq(header, good) ++ poison).mkString("\n"))
    val raw = iot.IotPipeline.readCsv(spark, dir.toString)
    val rows = raw.collect() // must not throw
    assert(rows.length == 5, s"got ${rows.length}")
    // the short row parses its present prefix and NULL-pads the rest
    val short = rows.find(r => Option(r.getAs[String]("uid"))
      .contains("CuShort")).get
    assert(short.isNullAt(short.fieldIndex("proto")))
    // the junk-numeric row keeps its parseable strings, nulls the rest
    val junk = rows.find(r => Option(r.getAs[String]("uid"))
      .contains("CuX")).get
    assert(junk.isNullAt(junk.fieldIndex("id.orig_p")))
    assert(junk.getAs[String]("conn_state") == "SF")
    // the long row (good + 3 extra fields) must DROP the excess, not
    // shift: its label column still reads Benign like the good row's
    // (a shift would push EXTRA1 into label on one of them)
    assert(rows.count(_.getAs[String]("label") == "Benign") == 2)
    // and the full reference transform program stays total over all 5
    val out = iot.Transforms.transform(raw)
    assert(out.count() == 5)
    val spark2 = spark; import spark2.implicits._
    assert(out.filter($"uid" === "Cu0/1").count() == 2) // good + long row
  }

  test("JSON envelope seam: corrupt payloads, empty objects, and NULL " +
    "values become NULL-field rows — never an exception (the " +
    "quarantine-by-filter contract)") {
    val spark2 = spark; import spark2.implicits._
    val raw = Seq(
      """{"event_id": 1, "ts": 1700000000000000, "user_id": 7,""" +
        """ "event_type": "click", "value": 1.5, "props": "{}"}""",
      "this is not json at all",
      "{\"unterminated\": ",
      "{}",
      null.asInstanceOf[String],
      "[1,2,3]" // valid JSON, wrong shape
    ).toDF("value")
    val parsed = streaming.EventStream.parseEventsJson(raw).collect()
    assert(parsed.length == 6) // every poison row SURVIVES
    val ok = parsed.filter(r => !r.isNullAt(0))
    assert(ok.length == 1 && ok.head.getAs[Long]("event_id") == 1L)
    // every other row is all-NULL — filterable, never throwing
    assert(parsed.count(r => r.isNullAt(0) && r.isNullAt(1)) == 5)
  }

  test("streaming: a poison row reaching a windowed aggregation is " +
    "DROPPED SILENTLY (the window() rewrite filters null windows — " +
    "measured: no state leak, no output row), so accounting for every " +
    "message requires the wellFormed/dead-letter split BEFORE the agg") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    val spark2 = spark; import spark2.implicits._
    def envelope(id: Long, tsMs: Long): String =
      s"""{"event_id": $id, "ts": ${tsMs * 1000000}, "user_id": 1,""" +
        s""" "event_type": "click", "value": 1.0, "props": "{}"}"""
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime
    def run(gate: Boolean, name: String): (Long, Long) = {
      val mem = MemoryStream[String](spark)
      val parsed = streaming.EventStream.parseEventsJson(mem.toDF())
      val head = if (gate) streaming.EventStream.wellFormed(parsed)
        else parsed
      val q = head.withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour")).count()
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update()).start()
      try {
        // batch 1: one poison + one real event at 10:00
        mem.addData("totally not json", envelope(1, t0))
        q.processAllAvailable()
        // batches 2+3: real events 3h later — watermark passes the
        // 10:00 window, which evicts in the batch AFTER the advance
        mem.addData(envelope(2, t0 + 3 * 3600 * 1000))
        q.processAllAvailable()
        mem.addData(envelope(3, t0 + 3 * 3600 * 1000 + 60000))
        q.processAllAvailable()
        val state = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
        val nullWins = spark.sql(s"SELECT * FROM $name")
          .filter(col("window").isNull).count()
        (state, nullWins)
      } finally q.stop()
    }
    // ungated: the poison row leaves NO state row (only the live
    // 13:00 window remains — real windows still evict) and NO
    // null-window output row: dropped without a trace
    assert(run(gate = false, "poison_drop") == ((1L, 0L)))
    // the gate changes nothing numerically — its value is making the
    // dead-letter branch (filter event_id IS NULL) observable
    assert(run(gate = true, "poison_gated") == ((1L, 0L)))
    // the same drop happens in BATCH windowed aggs: null ts rows
    // vanish from window groups rather than forming a null group
    val batch = Seq(("2024-01-01 10:00:00", 1),
      (null.asInstanceOf[String], 2))
      .toDF("s", "v").select(col("v"), col("s").cast("timestamp").as("ts"))
      .groupBy(window(col("ts"), "1 hour")).count().collect()
    assert(batch.length == 1 && !batch.head.isNullAt(0))
  }

  test("JDBC sink type-edge posture: unicode identifiers, extreme " +
    "longs, and an all-null row round-trip EXACTLY through the " +
    "embedded database; a smuggled NaN fails LOUDLY (no silent " +
    "coercion) — the egress side of the poison matrix") {
    System.setProperty("derby.system.home",
      java.nio.file.Files.createTempDirectory("graft_derby_edge").toString)
    val cfg = Map(
      "clickhouse.jdbc_url" -> "jdbc:derby:memory:graftedge;create=true",
      "clickhouse.driver" -> "org.apache.derby.jdbc.EmbeddedDriver",
      "clickhouse.table" -> "IOT_EDGE",
      "clickhouse.batchsize" -> "2")
    val dir = java.nio.file.Files.createTempDirectory("poison_jdbc")
    val header = iot.IotSchema.raw.fields.map(_.name).mkString(",")
    def row(uid: String, missed: String): String =
      s"$uid,10.0.0.1,1024,10.0.0.2,80,tcp,http," +
        s"0 days 00:00:03.148000,10,20,SF,T,F,$missed,ShADad,5,500,4," +
        "400,-,Benign,-"
    val rows = Seq(
      row("C-日本-𝒜-é", "9223372036854775807"), // unicode uid, Long.Max
      row("C-neg", "-9223372036854775807"),
      ",,,,,,,,,,,,,,,,,,,,,") // every column null
    java.nio.file.Files.writeString(dir.resolve("conn.csv"),
      (header +: rows).mkString("\n"))
    val out = iot.Transforms.transform(
      iot.IotPipeline.readCsv(spark, dir.toString))
    assert(iot.IotPipeline.writeJdbc(out, cfg))
    val back = spark.read.format("jdbc")
      .option("url", "jdbc:derby:memory:graftedge;create=true")
      .option("user", "default").option("dbtable", "IOT_EDGE").load()
    // exact fidelity: same canonical row set, unicode and extremes intact
    def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select(out.columns.map(org.apache.spark.sql.functions.col): _*)
        .collect().map(_.toString).toSet
    assert(canon(back) == canon(out))
    assert(back.collect().exists(r =>
      Option(r.getAs[String]("uid")).contains("C-日本-𝒜-é") &&
        r.getAs[Long]("missed_bytes") == Long.MaxValue))
    // float specials: Derby (like most ANSI stores) REJECTS NaN — the
    // sink must fail loudly, never coerce; the shipped transform can't
    // produce NaN (regex-anchored parse → finite or NULL), so the
    // throw is the correct posture for a smuggled one
    val poisoned = out.limit(1).withColumn("duration_sec",
      org.apache.spark.sql.functions.lit(Double.NaN).cast("float"))
    val thrown = intercept[Exception] {
      iot.IotPipeline.writeJdbc(poisoned, cfg.updated(
        "clickhouse.table", "IOT_EDGE_NAN"))
    }
    assert(thrown != null)
  }

  test("internal state integrity: a corrupted store file FAILS LOUDLY " +
    "— a truncated parquet propagates a read error (and never " +
    "masquerades as an empty store), and a malformed compaction " +
    "marker refuses with a named error instead of a guessed " +
    "high-water mark") {
    val spark2 = spark; import spark2.implicits._
    // corrupt-data posture: truncate one committed parquet file
    val store = java.nio.file.Files.createTempDirectory("poison_dl").toString
    streaming.DeltaLog.writeBatch(
      Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), 0L, store)
    streaming.DeltaLog.writeBatch(
      Seq((3L, 30L)).toDF("k", "v"), 1L, store)
    assert(streaming.DeltaLog.read(spark, store).count() == 3)
    val part = new java.io.File(s"$store/_batch_id=0").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.write(part.toPath, Array.fill[Byte](10)(0))
    // ...the store is NOT "empty" (emptiness must never absorb
    // corruption — the ChunkStoreIngest gating contract)
    assert(!streaming.DeltaLog.isEmpty(spark, store))
    // ...and reading it propagates a failure instead of partial state
    intercept[Exception] {
      streaming.DeltaLog.read(spark, store).collect()
    }
    // malformed-marker posture: external interference in the
    // integrity metadata names itself in the error
    val store2 = java.nio.file.Files.createTempDirectory("poison_dl2").toString
    streaming.DeltaLog.writeBatch(
      Seq((1L, 10L)).toDF("k", "v"), 0L, store2)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(store2, "_compact_hwm_junk"), "")
    val e = intercept[IllegalStateException] {
      streaming.DeltaLog.read(spark, store2).collect()
    }
    assert(e.getMessage.contains("_compact_hwm_junk"))
  }

  test("media decoders: garbage, truncated, and empty blobs yield " +
    "NULL (BMP header checks) or zero-stats (PCM past-header scan) " +
    "or NULL byte-reads (substr/hex/conv past end) — never a throw") {
    val spark2 = spark; import spark2.implicits._
    val blobs = Seq(
      Array.empty[Byte],
      Array[Byte](1, 2, 3),
      "BM".getBytes ++ Array.fill[Byte](10)(0), // BMP magic, truncated
      Array.fill[Byte](1024)(-86), // 0xAA junk
      "RIFF1234WAVE".getBytes // WAV-ish prefix, no data
    ).toDF("bin")
    // native kernels via their registered SQL names
    functions.GraftFunctions.register(spark)
    val kern = blobs.select(
      expr("bmp_stats(bin)").as("bmp"),
      expr("pcm16_stats(bin)").as("pcm")).collect()
    assert(kern.length == 5) // no kernel threw
    assert(kern.forall(r => r.isNullAt(0) || r.getAs[Any]("bmp") != null))
    // BMP: all five are malformed -> NULL
    assert(kern.forall(_.isNullAt(0)))
    // PCM: shorter than the 44-byte header -> zero samples, not a throw
    val pcmEmpty = kern.head.getSeq[Long](1)
    assert(pcmEmpty.head == 0L)
    // declarative byte reader: reading past a short blob's end is
    // NULL (conv(hex('')) -> NULL), never a range error; the one blob
    // long enough (the 1 KiB 0xAA junk) reads its true byte — the
    // positive control proving the reader actually read
    val r = blobs.select(
      conv(hex(col("bin").substr(lit(100), lit(1))), 16, 10)
        .cast("long").as("b100")).collect()
    assert(r.length == 5)
    assert(r.count(_.isNullAt(0)) == 4)
    assert(r.exists(x => !x.isNullAt(0) && x.getLong(0) == 0xAAL))
  }
}
