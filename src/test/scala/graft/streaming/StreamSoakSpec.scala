package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase
import graft.tools.{SoakEv, StreamSoak}

/** Mini-soak (60 batches — the full 500-batch curve is
  * `graft.tools.StreamSoak`, run per round for PERF): the stateful
  * pipelines' RUNTIME state-row count must plateau under watermark /
  * timer eviction, and the verdict helper itself must reject a
  * linearly-growing curve. The state-width census proves bounded
  * state PER KEY statically; this proves the key population is
  * actually evicted at runtime. */
class StreamSoakSpec extends SparkTestBase {

  private val t0ms = Timestamp.valueOf("2024-01-01 00:00:00").getTime
  private val keys = 20

  private def evBatch(b: Int): Seq[SoakEv] = (0 until keys).map { k =>
    SoakEv(b.toLong * keys + k, new Timestamp(t0ms + b * 60000L),
      k.toLong, if ((b + k) % 3 == 0) "click" else "view", 0.5, "{}")
  }

  private def runSoak(mk: org.apache.spark.sql.DataFrame =>
      org.apache.spark.sql.streaming.StreamingQuery,
      batches: Int = 60): Seq[StreamSoak.Sample] = {
    import spark.implicits._
    val mem = MemoryStream[SoakEv](spark)
    val q = mk(mem.toDF())
    val samples = Vector.newBuilder[StreamSoak.Sample]
    try {
      (0 until batches).foreach { b =>
        mem.addData(evBatch(b): _*)
        val t0 = System.nanoTime()
        q.processAllAvailable()
        val ms = (System.nanoTime() - t0) / 1000000L
        if (b % 5 == 0 || b == batches - 1) {
          val rows = Option(q.lastProgress)
            .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)
          samples += StreamSoak.Sample(b, ms, rows)
        }
      }
    } finally q.stop()
    samples.result()
  }

  private def ck() =
    java.nio.file.Files.createTempDirectory("graft_soak_spec").toString

  test("dedup-within-watermark state plateaus (expired ids evicted)") {
    withRocksDb {
      val samples = runSoak(df => EventStream.dedup(df)
        .writeStream.format("noop").outputMode(OutputMode.Append())
        .option("checkpointLocation", ck()).start())
      val (_, plateau, detail) = StreamSoak.verdict(samples)
      assert(plateau, s"dedup state grew without bound: $detail")
      // the horizon holds ~10 batches x keys ids; 60 batches ingested
      // 60 x keys — a plateau must sit well under the total
      assert(samples.last.stateRows < 60L * keys,
        s"state ${samples.last.stateRows} ~ total ingested (no eviction)")
    }
  }

  test("transformWithState totals plateau at the fixed key universe") {
    withRocksDb {
      val samples = runSoak(df => EventStream.statefulUserTotalsV2(df)
        .writeStream.format("noop").outputMode(OutputMode.Update())
        .option("checkpointLocation", ck()).start())
      val (_, plateau, detail) = StreamSoak.verdict(samples)
      assert(plateau, s"per-user state grew without bound: $detail")
      assert(samples.last.stateRows <= 4L * keys,
        s"state ${samples.last.stateRows} >> key universe $keys")
    }
  }

  test("windowed aggregate state plateaus as the watermark closes windows") {
    withRocksDb {
      val samples = runSoak(df => EventStream.tumblingHourly(df)
        .writeStream.format("noop").outputMode(OutputMode.Append())
        .option("checkpointLocation", ck()).start(), batches = 150)
      val (_, plateau, detail) = StreamSoak.verdict(samples)
      assert(plateau, s"window state grew without bound: $detail")
    }
  }

  // ---- kill-restart twins (r17, r16 verdict item 4) -------------------
  // Crash each pipeline mid-soak (delete the newest commit marker so
  // the batch REPLAYS against RocksDB state + the sink's idempotence
  // discipline) and assert the final readback equals the uninterrupted
  // twin's. One test per pipeline so a regression names its pipeline.
  private val t1 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
  private def evFrame(b: Int) = {
    import spark.implicits._
    (0 until keys).map { k =>
      SoakEv(b.toLong * keys + k, new Timestamp(t1 + b * 60000L),
        k.toLong, if ((b + k) % 3 == 0) "click" else "view",
        (k % 10) * 0.5, "{}")
    }.toDF()
  }
  private val krWords = Vector("alpha", "beta", "gamma", "delta",
    "epsilon", "zeta", "eta", "theta", "iota", "kappa")
  private def docFrame(b: Int) = {
    import spark.implicits._
    (0 until 16).map { k =>
      graft.tools.SoakDoc(b.toLong * 16 + k,
        s"${krWords(k % 10)} ${krWords((b + k) % 10)} " +
          krWords((b * 3 + k) % 10),
        Seq("en", "es", "de")(k % 3))
    }.toDF()
  }

  StreamSoak.krPipelines.foreach { p =>
    test(s"kill-restart: ${p.name} — a crash-replayed run converges to " +
      "the uninterrupted twin's final state") {
      withRocksDb {
        // the 1-hour tumbling window needs >70 min of event time (1 min
        // per batch) before the watermark CLOSES a window and Append
        // emits anything; the other pipelines emit from batch 1
        val n = if (p.name == "tumbling_window") 90 else 24
        val (a, b) = StreamSoak.killRestartTwin(spark, p, batches = n,
          if (p.doc) docFrame else evFrame)
        assert(a.nonEmpty, s"${p.name}: uninterrupted twin read back empty")
        assert(a.sameElements(b),
          s"${p.name}: crash-restarted end state diverged from the " +
            s"uninterrupted twin (${a.length} vs ${b.length} rows; " +
            s"first diff: ${a.zipAll(b, "<none>", "<none>")
              .find(x => x._1 != x._2)})")
      }
    }
  }

  test("the verdict helper itself flags a leak and a latency trend") {
    val leak = (0 until 20).map(i =>
      StreamSoak.Sample(i, 10L, 100L + 50L * i))
    assert(!StreamSoak.verdict(leak)._2, "linear state growth must fail")
    val slow = (0 until 20).map(i =>
      StreamSoak.Sample(i, if (i < 10) 10L else 40L, 100L))
    assert(!StreamSoak.verdict(slow)._1, "latency doubling must fail")
    val good = (0 until 20).map(i => StreamSoak.Sample(i, 10L, 100L))
    val (f, p, _) = StreamSoak.verdict(good)
    assert(f && p)
  }

  /** Run `body` with the RocksDB state-store provider set, restoring
    * the previous provider after (other tests share the session). */
  private def withRocksDb(body: => Unit): Unit = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
