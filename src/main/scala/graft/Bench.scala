package graft
import org.apache.spark.sql.SparkSession

object Bench {

  /** One complete measurement pass over all registered queries, with
    * its canary series and steal verdicts. `value` is the headline
    * total (sum of successful query times, min-of-2 + backoff rules
    * applied inside the pass). */
  final case class Attempt(
      results: Seq[(String, Double)],
      failed: Seq[String],
      canaryBase: Double,
      canaryWideBase: Double,
      canarySeries: Seq[Double],
      canaryWideSeries: Seq[Double],
      stillContended: Boolean,
      runStealChecked: Boolean,
      runSteal: Boolean,
      phaseChecked: Boolean,
      phaseSteal: Boolean) {
    def total: Double = results.filter(_._2 >= 0).map(_._2).sum
    def contended: Boolean = stillContended || runSteal || phaseSteal
    /** Clean = every steal verdict that COULD be checked came back
      * negative. An unchecked verdict never counts as clean-by-silence
      * for the retry loop — but with no calibration at all there is
      * nothing to retry toward, so the loop also stops. */
    def clean: Boolean = !contended
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // dual events.ts layout support (see Tables.events / Verify)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // AQE partition sizing for CACHED plans (r17, guide §2.2/§5):
      // by default Spark pins a cached plan's output partitioning
      // (canChangeCachedPlanOutputPartitioning=false), so every
      // persist() materializes and every cache scan re-reads the full
      // pre-AQE shuffle partition count however small the frame.
      // Enabling it gives cached plans the SAME adaptive coalescing
      // as uncached ones — partition count follows data size at every
      // scale (advisory-size-driven), not a fixed constant. Measured
      // on the persist-heavy quantile family at sf0.1: q160 7.6→4.3 s,
      // q50 2.4→2.0 s (min-of-4 paired A/B); results identical (full
      // oracle gate green under the flag).
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: initialize parquet reader, codegen, shuffle machinery,
    // broadcast infra and the noop sink so the first timed queries
    // aren't charged for JVM session start-up
    locally {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000)
      li.groupBy("l_returnflag").count()
        .join(broadcast(li.select("l_returnflag").distinct()), "l_returnflag")
        .orderBy("l_returnflag")
        .write.format("noop").mode("overwrite").save()
      // also JIT the window, generator and higher-order/regex paths the
      // first timed queries would otherwise pay for
      val w = Window.partitionBy("l_returnflag").orderBy("l_orderkey")
      li.select(col("l_returnflag"), col("l_orderkey"),
        row_number().over(w).as("rn"),
        sum(col("l_quantity")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("rs"))
        .write.format("noop").mode("overwrite").save()
      li.select(explode(split(regexp_replace(
        concat_ws(" ", col("l_returnflag"), col("l_orderkey").cast("string")),
        "\\s+", " "), " ")).as("t"))
        .groupBy("t").count()
        .select(col("t"), col("count"),
          aggregate(sequence(lit(1), lit(4)), lit(0L), (a, x) => a + x).as("s"))
        .write.format("noop").mode("overwrite").save()
    }
    // ---- contention canaries ------------------------------------------
    // A saturated host inflates wall-clock times of queries that did not
    // change (r7 and r8 both recorded windows where a static projection
    // ran 100× its clean time). min-of-2 inside the same window cannot
    // detect that — both measures share the contention. So we interleave
    // FIXED probes through the run and compare each against its own
    // start-of-run baseline: the probes' code never changes, hence any
    // inflation is the host's, not ours. Two probes, because they see
    // different failure modes (see BenchCanary's scaladoc): a 1-task
    // scalar probe for whole-host saturation, and a 32-partition shuffle
    // probe for wide-core hypervisor steal, which r12 proved the scalar
    // probe is blind to. Queries timed inside a window either probe
    // flags get re-measured after a backoff once both probes recover; if
    // they never recover the JSON carries `contended:true` plus both
    // series so a reader can discount the window mechanically.
    // probe code lives in BenchProbes, shared verbatim with
    // BenchCalibrate — the recorded idle constants are only valid for
    // the exact probe that produced them
    def canaryOnce(): Double = BenchProbes.scalarOnce(spark, sfDir)
    def canaryWideOnce(): Double = BenchProbes.wideOnce(spark)
    val inflateFactor = sys.env.getOrElse("SPARK_GRAFT_INFLATE",
      BenchCanary.ScalarFactorDefault.toString).toDouble
    val wideInflateFactor = sys.env.getOrElse("SPARK_GRAFT_WIDE_INFLATE",
      BenchCanary.WideWindowFactorDefault.toString).toDouble
    // the box's recorded idle wide-probe median — the run-level steal
    // reference (see BenchCanary's scaladoc; a uniform steal leaves no
    // clean reference inside the run). The constant is a (box, cpus)
    // pair MEASURED by `graft.BenchCalibrate` and read from
    // bench_calibration.properties — not a source-coded number (r13
    // verdict item 4: it was hand-recalibrated twice in one round).
    // Resolution: explicit SPARK_GRAFT_WIDE_IDLE > recorded entry for
    // this run's cpus > off (run_steal:null — e.g. the r13 sf0.001
    // smoke at cpus=8, where median 1.31 is the legitimate 8-thread
    // time, not steal).
    val wideIdleMedian = sys.env.get("SPARK_GRAFT_WIDE_IDLE")
      .map(_.toDouble)
      .orElse(BenchCalibrate.recordedWideIdleMedian(cpus))
      .getOrElse(Double.MaxValue)
    // the phase-steal band: the recorded idle p90 (r15 — this box's
    // steal arrives in multi-minute phases that inflate totals while
    // keeping the series MEDIAN under the 2.2x band; see BenchCanary's
    // phase-steal block)
    val wideIdleP90 = sys.env.get("SPARK_GRAFT_WIDE_IDLE_P90")
      .map(_.toDouble)
      .orElse(BenchCalibrate.recordedWideIdleP90(cpus))
      .getOrElse(Double.MaxValue)
    val retryAbove = sys.env.getOrElse("SPARK_GRAFT_RETRY_SEC", "2.0").toDouble

    // ---- one full measurement pass -------------------------------------
    def runAttempt(): Attempt = {
      val failed = scala.collection.mutable.ListBuffer.empty[String]
      val canaryBase = (1 to 5).map(_ => canaryOnce()).min
      val canaryWideBase = (1 to 3).map(_ => canaryWideOnce()).min
      val canarySeries = scala.collection.mutable.ListBuffer.empty[Double]
      val canaryWideSeries = scala.collection.mutable.ListBuffer.empty[Double]
      def sampleCanaries(): Unit = {
        canarySeries += canaryOnce()
        canaryWideSeries += canaryWideOnce()
      }
      // canary reading associated with each query (index into the series)
      val canaryAt = scala.collection.mutable.Map.empty[String, Int]
      def timeOne(name: String,
          fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
          recordFailure: Boolean): Double = {
        val t0 = System.nanoTime()
        // noop sink: materializes every output column (unlike count(),
        // which lets column pruning skip most of the work) without any
        // write-side cost — honest per-query timings.
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            if (recordFailure) failed += name
            false
          }
        // a failed query reports -1, never a flattering tiny elapsed time
        val elapsed = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
        // localCheckpoint() blocks (PageRank, CC, k-means, …) persist RDDs
        // that nothing unpersists; in a single-session name-sorted run the
        // q1xx queries execute first and their blocks would squeeze the
        // BlockManager for every later query. Drop them between queries so
        // each timing reflects the query alone. (Unpersist cost is excluded
        // from the recorded time — it is harness hygiene, not query work.)
        // blocking = true: the async variant races the next query's block
        // lookups, and its "Block rdd_N_M does not exist" error output
        // interleaved with — and corrupted — the harness's JSON capture in
        // r12 (BENCH_r12.json parsed:null). The synchronous removal costs
        // milliseconds outside the timed region and keeps stdout clean.
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        spark.sharedState.cacheManager.clearCache()
        elapsed
      }
      val sorted = SparkEntry.queries.toSeq.sortBy(_._1)
      val canaryEvery = 8
      val firstPass = sorted.zipWithIndex.map { case ((name, fn), i) =>
        if (i % canaryEvery == 0) sampleCanaries()
        canaryAt(name) = canarySeries.length - 1
        name -> timeOne(name, fn, recordFailure = true)
      }
      sampleCanaries() // close the last window
      // Contention hardening, layer 1 (r7): a busy host can inflate
      // individual queries 2-10×. Re-measure queries whose first measure
      // exceeds a threshold and report the min. Failures are not retried:
      // a red query stays red.
      val minOf2 = firstPass.map { case (name, t1) =>
        if (t1 >= retryAbove) {
          val t2 = timeOne(name, SparkEntry.queries(name), recordFailure = false)
          name -> (if (t2 >= 0) math.min(t1, t2) else t1)
        } else name -> t1
      }
      // Layer 2 (r9, extended r13): min-of-2 fails when BOTH measures sit
      // inside one contended window (happened in r7 and r8). Detect
      // inflated windows via the canaries, wait out the contention with
      // bounded backoff, and re-run only the queries whose windows were
      // inflated. Scalar effective base = the LOWEST reading ever
      // observed (a start-of-run base measured inside a contended window
      // would otherwise raise the threshold and mask later saturation);
      // wide effective base = the 25th percentile (the wide probe's solo
      // variance makes its minimum an outlier — min-based thresholds
      // flagged 90% of a measured solo run; see BenchCanary's scaladoc
      // for the per-window vs run-level split).
      val effBase = math.min(canaryBase, canarySeries.min)
      val effWideBase = BenchCanary.robustBase(canaryWideBase,
        canaryWideSeries.toSeq)
      def windowInflated(i: Int): Boolean =
        BenchCanary.windowContended(
          canarySeries(i), effBase, inflateFactor,
          canaryWideSeries(i), effWideBase, wideInflateFactor)
      val contendedNames = minOf2.collect { case (name, t) if t >= 0 &&
        (windowInflated(canaryAt(name)) ||
         windowInflated(math.min(canaryAt(name) + 1, canarySeries.length - 1)))
        => name }.toSet
      var stillContended = false
      val results =
        if (contendedNames.isEmpty) minOf2
        else {
          // wait for the host to quiet down: up to 5 × 30 s probes; both
          // canaries must be back in band before re-measuring
          var tries = 0
          var recovered = false
          while (tries < 5 && !recovered) {
            Thread.sleep(30000)
            recovered = !BenchCanary.windowContended(
              canaryOnce(), effBase, inflateFactor,
              canaryWideOnce(), effWideBase, wideInflateFactor)
            tries += 1
          }
          stillContended = !recovered
          if (recovered) minOf2.map { case (name, t) =>
            if (contendedNames(name) && t >= 0) {
              val t2 = timeOne(name, SparkEntry.queries(name), recordFailure = false)
              sampleCanaries()
              name -> (if (t2 >= 0) math.min(t, t2) else t)
            } else name -> t
          } else minOf2
        }
      // Run-level steal verdict (the r12 blind mode — a uniform 1.2-1.5x
      // inflation no per-window test can see): the wide series' median
      // against the box's recorded idle median. Nothing to re-measure —
      // the whole run is inflated — so it flags `contended` directly.
      // run_steal is a THREE-state verdict: true/false only when an idle
      // wide-probe reference applies (local[32] default or an explicit
      // SPARK_GRAFT_WIDE_IDLE); otherwise it is null — "not checked" —
      // so a false can never be read as a clean bill on an unchecked run
      // (r13 ADVICE: the default cpus=4 smoke printed run_steal:false
      // with the verdict silently off).
      val runStealChecked = wideIdleMedian != Double.MaxValue
      if (!runStealChecked)
        System.err.println("[bench] run-level steal verdict OFF: no idle " +
          s"wide-probe reference for cpus=$cpus (set SPARK_GRAFT_WIDE_IDLE)")
      val runSteal = runStealChecked &&
        BenchCanary.runContended(canaryWideSeries.toSeq, wideIdleMedian)
      // phase-steal verdict (r15): same three-state contract, banded on
      // the recorded idle p90 — catches the multi-minute steal phases
      // the median test is structurally blind to (r14 driver run:
      // median ratio 1.18 yet totals +14%, 7.18 s spikes, a 5-long run
      // above the band)
      val phaseChecked = wideIdleP90 != Double.MaxValue
      val phaseSteal = phaseChecked &&
        BenchCanary.phaseContended(canaryWideSeries.toSeq, wideIdleP90)
      Attempt(results, failed.toList, canaryBase, canaryWideBase,
        canarySeries.toList, canaryWideSeries.toList,
        stillContended, runStealChecked, runSteal, phaseChecked, phaseSteal)
    }

    // ---- retry-until-clean (r16, r15 verdict item 1) --------------------
    // The r15 phase detector flagged EVERY r15 run — detection without a
    // retry policy left the round with no clean number, and the ledger
    // had to normalize by a derived box factor. Policy: re-run the full
    // pass (bounded attempts, default 3) until the steal verdicts come
    // back clean; steal phases on this box last minutes, so a fresh
    // ~4-minute pass naturally lands in a different phase window, plus a
    // bounded idle gap between attempts to let an active phase drain.
    // If no attempt is clean, keep the MINIMUM-total attempt (a steal
    // phase only ever inflates) and say so: the JSON embeds a per-attempt
    // verdict table either way, so a reader compares clean-raw to
    // clean-raw — never arithmetic on a correction factor. With steal
    // verdicts unchecked (no calibration for this cpus count) there is
    // no signal to retry on: single attempt, verdicts null, as before.
    // Default 3 (r17, verdict item 2): the box has been in a sustained
    // steal mode for two full rounds, so the unattended path now
    // formalizes min-of-N as the measurement standard — min-of-2 is a
    // weak minimum estimator under steal. ~3.3× wall-time is still
    // bounded (the r12/r13 parsed:null history says a bench that DIES
    // on a harness timeout is worse than a flagged one that reports);
    // solo runs chasing a clean number raise it via the env.
    val maxAttempts = sys.env.getOrElse("SPARK_GRAFT_BENCH_ATTEMPTS", "3").toInt
    val attemptGapSec =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_ATTEMPT_GAP_SEC", "45").toInt
    val attempts = scala.collection.mutable.ListBuffer.empty[Attempt]
    var done = false
    while (!done) {
      val a = runAttempt()
      attempts += a
      val checkable = a.runStealChecked || a.phaseChecked
      done = a.clean || !checkable || attempts.size >= maxAttempts
      if (!done) {
        System.err.println(s"[bench] attempt ${attempts.size} contended " +
          s"(run_steal=${a.runSteal} phase_steal=${a.phaseSteal} " +
          s"backoff_exhausted=${a.stillContended}); retrying after " +
          s"$attemptGapSec s idle gap")
        Thread.sleep(attemptGapSec * 1000L)
      }
    }
    // Selection law (r16 ADVICE): fewest FAILURES first — `total`
    // excludes failed (-1) queries, so a crashed-query attempt reports
    // a smaller total and must never beat a fully-successful one (the
    // clean-first rule had the same blind spot). Among equal failure
    // counts: clean before contended, then minimum total. Pinned in
    // BenchAttemptSpec.
    val picked = attempts
      .sortBy(a => (a.failed.size, if (a.clean) 0 else 1, a.total)).head
    val pickedIdx = attempts.indexOf(picked)

    val results = picked.results
    val failed = picked.failed
    val runStealJson =
      if (picked.runStealChecked) picked.runSteal.toString else "null"
    val phaseStealJson =
      if (picked.phaseChecked) picked.phaseSteal.toString else "null"
    val contendedFinal = picked.contended
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = picked.total
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val canaryJson =
      picked.canarySeries.map(c => f"$c%.4f").mkString("[", ",", "]")
    val canaryWideJson =
      picked.canaryWideSeries.map(c => f"$c%.4f").mkString("[", ",", "]")
    val wideMed = BenchCanary.median(picked.canaryWideSeries)
    val idleRefJson = // -1 = no applicable reference (non-32-cpu run)
      if (wideIdleMedian == Double.MaxValue) "-1"
      else f"$wideIdleMedian%.4f"
    val idleP90Json =
      if (wideIdleP90 == Double.MaxValue) "-1" else f"$wideIdleP90%.4f"
    // which calibration this run was judged against (epoch seconds;
    // -1 = unstamped file) — makes cross-round normalization cite a
    // concrete calibration instead of a PERF.md derivation
    val calibTsJson = BenchCalibrate.recordedCalibratedAt(cpus)
      .map(_.toLong.toString).getOrElse("-1")
    // calibration age in days (r17, verdict item 2): the r15-epoch
    // constants were kept deliberately (the box never went idle to
    // recalibrate), but that staleness must be visible in the JSON
    // itself, not recoverable only by epoch archaeology. -1 = no
    // recorded calibration for this cpus count.
    val calibAgeJson = BenchCalibrate.recordedCalibratedAt(cpus)
      .map(ts => f"${(System.currentTimeMillis() / 1000.0 - ts) / 86400.0}%.1f")
      .getOrElse("-1")
    // per-attempt verdict table: every attempt's total and steal
    // verdicts, plus which one the headline value came from — the
    // audit trail the retry policy owes the ledger
    def attemptJson(a: Attempt): String = {
      val rs = if (a.runStealChecked) a.runSteal.toString else "null"
      val ps = if (a.phaseChecked) a.phaseSteal.toString else "null"
      s"""{"value":${f"${a.total}%.3f"},"contended":${a.contended},""" +
        s""""run_steal":$rs,"run_phase_steal":$ps}"""
    }
    val attemptsJson = attempts.map(attemptJson).mkString("[", ",", "]")
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"contended":$contendedFinal,"run_steal":$runStealJson,"run_steal_checked":${picked.runStealChecked},"run_phase_steal":$phaseStealJson,"attempt_n":${attempts.size},"attempt_picked":$pickedIdx,"attempts":$attemptsJson,"canary_base":${f"${picked.canaryBase}%.4f"},"canary":$canaryJson,"canary_wide_base":${f"${picked.canaryWideBase}%.4f"},"canary_wide_med":${f"$wideMed%.4f"},"canary_wide_idle_ref":$idleRefJson,"canary_wide_idle_p90":$idleP90Json,"calib_ts":$calibTsJson,"calib_age_days":$calibAgeJson,"canary_wide":$canaryWideJson,"sf":"$sfDir"}"""
    // The stdout line must be COMPACT: the full per-query JSON is ~8 KB
    // on one line and the driver's tail capture keeps only the last
    // 2000 chars, so it can never parse a complete object from it
    // (BENCH_r12/r13 parsed:null — two different mechanisms, same
    // symptom). Stdout carries the contract keys plus a 5-slowest
    // queries map (bounded: 5 entries ≤ ~250 chars); the complete
    // per-query map lives ONLY in the file.
    val top5 = results.filter(_._2 >= 0).sortBy(-_._2).take(5)
      .map { case (k, v) => s"\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    // failed list capped at 10 names so a catastrophic run can't push
    // the compact line past the tail window either; failed_n is exact
    val failedCompact = failed.take(10).map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    val compact = s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$top5,"queries_n":${results.size},"failed_n":${failed.size},"failed":$failedCompact,"contended":$contendedFinal,"run_steal":$runStealJson,"run_steal_checked":${picked.runStealChecked},"run_phase_steal":$phaseStealJson,"attempt_n":${attempts.size},"attempt_picked":$pickedIdx,"attempts":$attemptsJson,"canary_wide_med":${f"$wideMed%.4f"},"canary_wide_idle_ref":$idleRefJson,"canary_wide_idle_p90":$idleP90Json,"calib_ts":$calibTsJson,"sf":"$sfDir","full":"bench_out.json"}"""
    // Output hygiene (r13, after r12's parsed:null): persist the line to
    // a file FIRST (log tails get truncated — r3's total was lost that
    // way), then print it as the LAST stdout line before shutdown, with
    // stderr flushed ahead of it so late async executor/BlockManager
    // output cannot interleave with the harness's JSON capture.
    // best-effort: an unwritable path must not fail a successful bench
    // (the JSON still goes to stdout) or skip spark.stop()
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: java.io.IOException =>
      System.err.println(s"[bench] could not write $out: ${e.getMessage}")
    }
    // Shutdown BEFORE the final print (r15): with sbt's outputStrategy
    // set to StdoutOutput the forked stdout/stderr reach the harness
    // unwrapped, so any post-print shutdown logging on stderr could
    // land AFTER the JSON in a merged capture. Silence the logger,
    // stop Spark, flush stderr — then the compact line is the true
    // last byte of the run.
    spark.sparkContext.setLogLevel("ERROR")
    spark.stop()
    System.err.flush()
    println(compact)
    System.out.flush()
  }
}
