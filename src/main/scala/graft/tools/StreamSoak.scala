package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.streaming._

/** Input shapes for the soak (top level: MemoryStream needs a stable
  * case-class encoder). */
case class SoakEv(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)
case class SoakDoc(doc_id: Long, text: String, lang: String)

/** Streaming SOAK (round 16, r15 verdict item 4): drive ≥500
  * MemoryStream micro-batches through the stateful pipelines and the
  * DeltaLog maintenance sinks and MEASURE, not assert-by-construction,
  * that (a) streaming-state size PLATEAUS and (b) per-batch latency
  * stays flat. The state-width census (StreamStateGuard) is static —
  * it proves the state SCHEMA is bounded per key; only a long run
  * proves the runtime row count and latency curves hold under
  * watermark eviction, timer churn, RocksDB compaction, and a delta
  * log hundreds of batches deep.
  *
  * Pipelines:
  *   - `user_totals_v2` — transformWithState (RocksDB REQUIRED),
  *     ValueState totals + one pending timer per key over a FIXED
  *     key universe: state rows must plateau at ~2·keys.
  *   - `tumbling_window` — windowed agg with a 10-min watermark;
  *     event time advances each batch, so closed windows are
  *     EVICTED: state rows plateau at the windows inside the
  *     watermark horizon.
  *   - `dedup_wm` — dropDuplicatesWithinWatermark: expired event_ids
  *     evicted; plateau at the horizon's id count.
  *   - `cms` / `hll` / `agg` / `topk` / `sprt` — DeltaLog maintenance
  *     sinks: per-batch sink latency must stay flat as the log deepens
  *     (the sink writes ONE batch's delta — depth-independent), and
  *     the fold-on-read stays a bounded-group aggregate.
  *
  * Usage: runMain graft.tools.StreamSoak [outJson]
  *   SPARK_GRAFT_SOAK_BATCHES (default 500), _KEYS (default 200),
  *   _SAMPLE (progress sample stride, default 25).
  * Emits one JSON line per sampled batch per pipeline plus a final
  * verdict line per pipeline; exit 1 if any verdict fails. */
object StreamSoak {

  final case class Sample(batch: Int, wallMs: Long, stateRows: Long)

  // ------------------------------------------------------------------
  // Kill-restart mode (r17, r16 verdict item 4): the 500-batch soak
  // proves plateaus; the per-pipeline replay specs prove restart
  // correctness on tiny runs. This composes them: drive the SAME
  // pipeline over IDENTICAL batch files twice — uninterrupted, and
  // CRASHED mid-soak (stop + delete the newest commit marker, the
  // harshest replay point: the batch's effects are already in the
  // sink/state store but the batch is uncommitted, so restart REPLAYS
  // it against RocksDB state and the sink's idempotence discipline) —
  // then assert the two final readbacks are byte-equal. File-sourced
  // (MemoryStream offsets are not recoverable across restarts) with
  // one file per micro-batch so both twins see the identical batch
  // sequence. Run via SPARK_GRAFT_SOAK_KILL=1; asserted per-pipeline
  // in StreamSoakSpec.
  // ------------------------------------------------------------------

  /** One kill-restart pipeline: how to start it over a file-sourced
    * stream (ckpt + out dirs owned by the twin driver) and how to read
    * its queryable end state. `doc` picks the document input shape. */
  final case class KrPipeline(
      name: String,
      doc: Boolean,
      start: (SparkSession, DataFrame, String, String) => StreamingQuery,
      readFinal: (SparkSession, String) => Array[String])

  /** Write `df` into `srcDir` as exactly one parquet file named and
    * timestamped by `idx` — deterministic listing order for the file
    * source, identical for both twins. */
  private def writeBatchFile(df: DataFrame, srcDir: String, idx: Int): Unit = {
    val tmpd = java.nio.file.Files.createTempDirectory("graft_kr_w").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmpd)
    val part = new java.io.File(tmpd).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val dst = new java.io.File(srcDir, f"batch-$idx%05d.parquet")
    java.nio.file.Files.move(part.toPath, dst.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    dst.setLastModified(1700000000000L + idx * 60000L)
  }

  /** Crash semantics: delete the newest commit marker so the last
    * completed batch is REPLAYED on restart. */
  private def dropLastCommit(ckptDir: String): Unit = {
    val commits = new java.io.File(s"$ckptDir/commits").listFiles()
      .filter(_.getName.matches("\\d+")).sortBy(_.getName.toLong)
    require(commits.nonEmpty, s"no commits under $ckptDir to crash")
    val last = commits.last
    new java.io.File(last.getParentFile, s".${last.getName}.crc").delete()
    require(last.delete(), s"could not delete commit marker $last")
  }

  /** Run `p` twice over the same `batches` batch frames and return
    * (uninterrupted readback, crash-restarted readback). */
  def killRestartTwin(spark: SparkSession, p: KrPipeline, batches: Int,
      frame: Int => DataFrame): (Array[String], Array[String]) = {
    def tmp(t: String) =
      java.nio.file.Files.createTempDirectory(s"graft_kr_$t").toString
    def fileStream(srcDir: String) = spark.readStream
      .schema(frame(0).schema).option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    def run(srcDir: String, ckpt: String, out: String): Unit = {
      val q = p.start(spark, fileStream(srcDir), ckpt, out)
      try q.processAllAvailable() finally { q.stop(); q.awaitTermination() }
    }
    // twin A: all files upfront, one uninterrupted run
    val (srcA, ckA, outA) = (tmp("srcA"), tmp("ckA"), tmp("outA"))
    (0 until batches).foreach(b => writeBatchFile(frame(b), srcA, b))
    run(srcA, ckA, outA)
    // twin B: half the files, crash (uncommit the newest batch),
    // stage the rest, restart from the same checkpoint
    val (srcB, ckB, outB) = (tmp("srcB"), tmp("ckB"), tmp("outB"))
    (0 until batches / 2).foreach(b => writeBatchFile(frame(b), srcB, b))
    run(srcB, ckB, outB)
    dropLastCommit(ckB)
    (batches / 2 until batches).foreach(b => writeBatchFile(frame(b), srcB, b))
    run(srcB, ckB, outB)
    (p.readFinal(spark, outA), p.readFinal(spark, outB))
  }

  /** Canonical sorted readback for equality assertions. */
  private def canon(df: DataFrame): Array[String] =
    df.collect().map(_.toString).sorted

  /** The eight soaked pipelines, in kill-restart form. Update-mode
    * transformWithState gets a batch-id-partitioned dynamic-overwrite
    * parquet sink (replay overwrites its own partition); append-mode
    * pipelines use the exactly-once FileStreamSink; the maintenance
    * sinks are their own idempotence discipline (DeltaLog). */
  def krPipelines: Seq[KrPipeline] = {
    import org.apache.spark.sql.functions.{col, lit, max, struct}
    def parquetSink(df: DataFrame, ckpt: String, out: String) =
      df.writeStream.format("parquet").option("path", out)
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt).start()
    Seq(
      KrPipeline("user_totals_v2", doc = false,
        start = (_, src, ckpt, out) =>
          EventStream.statefulUserTotalsV2(src).writeStream
            .outputMode(OutputMode.Update())
            .option("checkpointLocation", ckpt)
            .foreachBatch {
              (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
               id: Long) =>
                b.withColumn("_b", lit(id)).write.mode("overwrite")
                  .option("partitionOverwriteMode", "dynamic")
                  .partitionBy("_b").parquet(out)
            }.start(),
        readFinal = (s, out) => {
          // final total per user = its emission at the newest batch
          // that touched it (Update mode re-emits the running total)
          val df = s.read.parquet(out)
          canon(df.groupBy("user_id")
            .agg(max(struct(col("_b"), col("n_events"),
              col("total_value"))).as("m"))
            .select(col("user_id"), col("m.n_events"),
              col("m.total_value")))
        }),
      KrPipeline("tumbling_window", doc = false,
        start = (_, src, ckpt, out) =>
          parquetSink(EventStream.tumblingHourly(src), ckpt, out),
        readFinal = (s, out) => canon(s.read.parquet(out))),
      KrPipeline("dedup_wm", doc = false,
        start = (_, src, ckpt, out) =>
          parquetSink(EventStream.dedup(src), ckpt, out),
        readFinal = (s, out) => canon(s.read.parquet(out))),
      KrPipeline("agg_maintenance", doc = false,
        start = (_, src, ckpt, out) =>
          AggMaintenance.maintain(src, out, ckpt).start(),
        readFinal = (s, out) => canon(AggMaintenance.view(s, out))),
      KrPipeline("sprt_monitor", doc = false,
        start = (_, src, ckpt, out) =>
          SprtMonitor.deltas(src, out, ckpt).start(),
        readFinal = (s, out) => canon(SprtMonitor.decisions(s, out))),
      KrPipeline("cms_maintenance", doc = true,
        start = (_, src, ckpt, out) =>
          CmsMaintenance.maintain(src, out, ckpt).start(),
        readFinal = (s, out) => canon(CmsMaintenance.sketch(s, out))),
      KrPipeline("hll_maintenance", doc = true,
        start = (_, src, ckpt, out) =>
          HllMaintenance.maintain(src, out, ckpt).start(),
        readFinal = (s, out) => canon(HllMaintenance.registers(s, out))),
      KrPipeline("topk_maintenance", doc = true,
        start = (_, src, ckpt, out) =>
          TopKMaintenance.maintain(src, out, ckpt).start(),
        readFinal = (s, out) => canon(TopKMaintenance.leaderboard(s, out))))
  }

  /** Flat-latency + plateau verdicts over a sampled curve. Warmup
    * (first fifth) is excluded from the latency verdict; the plateau
    * verdict compares the state-row count at 40% depth with the end
    * (equal-or-shrinking = plateau; windowed state may breathe by one
    * horizon's worth, allowed via the 1.25 band). */
  def verdict(samples: Seq[Sample]): (Boolean, Boolean, String) = {
    require(samples.size >= 10, s"soak too short: ${samples.size} samples")
    val n = samples.size
    val warm = samples.drop(n / 5)
    def median(xs: Seq[Long]): Long = xs.sorted.apply(xs.size / 2)
    val firstHalfLat = median(warm.take(warm.size / 2).map(_.wallMs))
    val lastHalfLat = median(warm.drop(warm.size / 2).map(_.wallMs))
    // flat = the post-warmup median does not trend up by more than
    // 50% between halves (RocksDB compaction jitter stays under this;
    // a state leak or per-batch O(log-depth) cost does not)
    val flat = lastHalfLat <= math.max(firstHalfLat, 1L) * 3 / 2
    val at40 = samples(math.min(2 * n / 5, n - 1)).stateRows
    val atEnd = samples.last.stateRows
    val plateau = atEnd <= math.max(at40, 1L) * 5 / 4
    (flat, plateau,
      s"latMedMs first=$firstHalfLat last=$lastHalfLat flat=$flat; " +
        s"stateRows at40%=$at40 end=$atEnd plateau=$plateau")
  }

  private def stateRows(q: StreamingQuery): Long = {
    val p = q.lastProgress
    if (p == null || p.stateOperators == null || p.stateOperators.isEmpty) 0L
    else p.stateOperators.map(_.numRowsTotal).sum
  }

  def main(args: Array[String]): Unit = {
    val batches = sys.env.getOrElse("SPARK_GRAFT_SOAK_BATCHES", "500").toInt
    val keys = sys.env.getOrElse("SPARK_GRAFT_SOAK_KEYS", "200").toInt
    val stride = sys.env.getOrElse("SPARK_GRAFT_SOAK_SAMPLE", "25").toInt
    val outPath = args.headOption.getOrElse("stream_soak.json")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val out = new StringBuilder
    var anyFail = false

    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(s"graft_soak_$p").toString

    /** Drive one pipeline for `batches` micro-batches. `feed` returns
      * the rows for batch b; `started` is the running query to sample. */
    def soakEv(name: String, mkQuery: DataFrame => StreamingQuery)(
        feed: Int => Seq[SoakEv]): Unit = {
      val mem = MemoryStream[SoakEv](spark)
      val q = mkQuery(mem.toDF())
      val samples = Vector.newBuilder[Sample]
      try {
        var b = 0
        while (b < batches) {
          mem.addData(feed(b): _*)
          val t0 = System.nanoTime()
          q.processAllAvailable()
          val ms = (System.nanoTime() - t0) / 1000000L
          if (b % stride == 0 || b == batches - 1) {
            val s = Sample(b, ms, stateRows(q))
            samples += s
            out.append(s"""{"pipeline":"$name","batch":$b,"wall_ms":$ms,""" +
              s""""state_rows":${s.stateRows}}""").append('\n')
          }
          b += 1
        }
      } finally q.stop()
      val (flat, plateau, detail) = verdict(samples.result())
      if (!flat || !plateau) anyFail = true
      val v = s"""{"pipeline":"$name","verdict":{"flat":$flat,""" +
        s""""plateau":$plateau},"detail":"$detail"}"""
      out.append(v).append('\n')
      println(v)
    }

    def soakDoc(name: String, mkQuery: DataFrame => StreamingQuery)(
        feed: Int => Seq[SoakDoc]): Unit = {
      val mem = MemoryStream[SoakDoc](spark)
      val q = mkQuery(mem.toDF())
      val samples = Vector.newBuilder[Sample]
      try {
        var b = 0
        while (b < batches) {
          mem.addData(feed(b): _*)
          val t0 = System.nanoTime()
          q.processAllAvailable()
          val ms = (System.nanoTime() - t0) / 1000000L
          if (b % stride == 0 || b == batches - 1) {
            val s = Sample(b, ms, stateRows(q))
            samples += s
            out.append(s"""{"pipeline":"$name","batch":$b,"wall_ms":$ms,""" +
              s""""state_rows":${s.stateRows}}""").append('\n')
          }
          b += 1
        }
      } finally q.stop()
      val (flat, plateau, detail) = verdict(samples.result())
      if (!flat || !plateau) anyFail = true
      val v = s"""{"pipeline":"$name","verdict":{"flat":$flat,""" +
        s""""plateau":$plateau},"detail":"$detail"}"""
      out.append(v).append('\n')
      println(v)
    }

    // ---- kill-restart mode (SPARK_GRAFT_SOAK_KILL=1) ------------------
    if (sys.env.get("SPARK_GRAFT_SOAK_KILL").contains("1")) {
      val krBatches = sys.env.getOrElse("SPARK_GRAFT_KR_BATCHES", "24").toInt
      val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
      def evFrame(b: Int): DataFrame = (0 until keys).map { k =>
        SoakEv(b.toLong * keys + k, new Timestamp(t0 + b * 60000L),
          k.toLong, if ((b + k) % 3 == 0) "click" else "view",
          (k % 10) * 0.5, "{}")
      }.toDF()
      val w = Vector("alpha", "beta", "gamma", "delta", "epsilon",
        "zeta", "eta", "theta", "iota", "kappa")
      def docFrame(b: Int): DataFrame = (0 until 16).map { k =>
        SoakDoc(b.toLong * 16 + k,
          s"${w(k % 10)} ${w((b + k) % 10)} ${w((b * 3 + k) % 10)}",
          Seq("en", "es", "de")(k % 3))
      }.toDF()
      var krFail = false
      krPipelines.foreach { p =>
        // 1-hour windows need >70 min of event time before Append emits
        val n = if (p.name == "tumbling_window") math.max(krBatches, 90)
          else krBatches
        val (a, b) = killRestartTwin(spark, p, n,
          if (p.doc) docFrame else evFrame)
        val equal = a.sameElements(b) && a.nonEmpty
        if (!equal) krFail = true
        val line = s"""{"pipeline":"${p.name}","kill_restart_equal":$equal,""" +
          s""""rows":${a.length}}"""
        out.append(line).append('\n')
        println(line)
      }
      java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        out.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      spark.stop()
      sys.exit(if (krFail) 1 else 0)
    }

    // event time advances one minute per batch; every key active in
    // every batch (worst-case steady state for per-key pipelines)
    val t0ms = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def evBatch(b: Int): Seq[SoakEv] = (0 until keys).map { k =>
      SoakEv(b.toLong * keys + k, new Timestamp(t0ms + b * 60000L),
        k.toLong, if ((b + k) % 3 == 0) "click" else "view",
        (k % 10) * 0.5, "{}")
    }
    // a small doc batch per tick (vocab fixed → CMS/HLL deltas bounded)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    def docBatch(b: Int): Seq[SoakDoc] = (0 until 16).map { k =>
      SoakDoc(b.toLong * 16 + k,
        s"${words(k % 10)} ${words((b + k) % 10)} ${words((b * 3 + k) % 10)}",
        Seq("en", "es", "de")(k % 3))
    }

    soakEv("user_totals_v2", df =>
      EventStream.statefulUserTotalsV2(df)
        .writeStream.format("noop").outputMode(OutputMode.Update())
        .option("checkpointLocation", tmp("utv2_ck")).start())(evBatch)

    soakEv("tumbling_window", df =>
      EventStream.tumblingHourly(df)
        .writeStream.format("noop").outputMode(OutputMode.Append())
        .option("checkpointLocation", tmp("tw_ck")).start())(evBatch)

    soakEv("dedup_wm", df =>
      EventStream.dedup(df)
        .writeStream.format("noop").outputMode(OutputMode.Append())
        .option("checkpointLocation", tmp("dd_ck")).start())(evBatch)

    soakEv("agg_maintenance", df =>
      AggMaintenance.maintain(df, tmp("agg_store"), tmp("agg_ck")).start())(
      evBatch)

    soakEv("sprt_monitor", df =>
      SprtMonitor.deltas(df, tmp("sprt_store"), tmp("sprt_ck")).start())(
      evBatch)

    soakDoc("cms_maintenance", df =>
      CmsMaintenance.maintain(df, tmp("cms_store"), tmp("cms_ck")).start())(
      docBatch)

    soakDoc("hll_maintenance", df =>
      HllMaintenance.maintain(df, tmp("hll_store"), tmp("hll_ck")).start())(
      docBatch)

    soakDoc("topk_maintenance", df =>
      TopKMaintenance.maintain(df, tmp("topk_store"), tmp("topk_ck"))
        .start())(docBatch)

    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      out.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    if (anyFail) sys.exit(1)
  }
}
