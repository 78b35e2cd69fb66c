package graft

/** Pure decision logic for the bench contention canaries.
  *
  * Two canaries run interleaved with the benchmark:
  *
  *  - the SCALAR canary (a 1-task nation groupBy) detects whole-host
  *    saturation — the r7/r8 failure mode where a static query ran
  *    100× its clean time;
  *  - the WIDE canary (a fixed 32-partition shuffle probe) detects
  *    wide-core contention, which the r12 bench ledger proved the
  *    scalar canary is blind to: a run whose 1-task canary stayed in
  *    the idle band the whole series while query totals inflated 18%
  *    (PERF.md round-12 ledger, "canary-blind ambient mode").
  *
  * The wide probe's detection is split in two, because its SOLO
  * variance is large (measured r13, idle machine: p25 0.47 / median
  * 0.47–0.51 / p90 0.89 / occasional 1.0+ — GC and page-cache phases
  * after heavy queries inflate single readings ~2× routinely):
  *
  *  - PER-WINDOW (drives re-measurement of the window's queries):
  *    only GROSS events clear the noise — factor 2.5 against a ROBUST
  *    base (the 25th percentile of all readings; the minimum is an
  *    outlier that would flag 90% of a solo run, and single solo
  *    readings reach ~2× the p25 after heavy queries — both
  *    measured). The concurrent-sbt case (readings 2.8×/2.1× base)
  *    fires correctly; a rare solo ~1.9× spike costs at most one
  *    spurious re-measure.
  *  - RUN-LEVEL (drives the `contended` verdict — nothing to
  *    re-measure when the WHOLE run is inflated): the series MEDIAN
  *    against the box's RECORDED idle median (a constant like the
  *    scalar canary's documented idle band; env-overridable). A
  *    uniform steal leaves no clean reference INSIDE the run, so a
  *    cross-run constant is the only honest baseline. Factor 2.2,
  *    calibrated on the three recorded sf0.1 runs: probe-median
  *    inflation AMPLIFIES relative to query-time inflation — a run
  *    with probe median ×2.45 had totals ×1.15 (the flagged r13c
  *    steal window), while a run with probe median ×2.0 had the
  *    round's BEST totals (probe-local scheduling effects the queries
  *    never felt) — so the threshold sits between those two measured
  *    points and still catches ~15%-level query steal through its
  *    ~2× probe amplification.
  *
  * The scalar canary keeps its r9 semantics: factor 3.0 per window
  * against the lowest reading ever observed (saturation inflates it by
  * integer factors; its solo variance is small).
  *
  * Kept free of SparkSession so BenchCanarySpec can exercise the
  * blind-mode case (scalar idle, wide inflated) with synthetic series.
  */
object BenchCanary {
  val ScalarFactorDefault = 3.0
  /** Per-window wide factor: gross events only (see class doc). */
  val WideWindowFactorDefault = 2.5
  /** Run-level wide factor vs the recorded idle median (see the
    * class doc's calibration — between the ×2.0 clean-totals run and
    * the ×2.45 inflated-totals run). */
  val WideRunFactorDefault = 2.2
  // The box's idle wide-probe median is NOT a source constant: it is
  // a (box, cpus) measurement — the probe's work is fixed, so its
  // idle time scales with the thread count (measured: ~0.5 s at 32
  // cpus, ~1.31 s at 8, both legitimate). `graft.BenchCalibrate`
  // measures and records it in bench_calibration.properties; Bench
  // reads it from there (env SPARK_GRAFT_WIDE_IDLE overrides; no
  // entry for the run's cpus ⇒ run_steal:null). r14, after the r13
  // hand-recalibrated-twice episode.

  def inflated(reading: Double, base: Double, factor: Double): Boolean =
    reading > base * factor

  /** Robust per-window base for a noisy probe: the 25th percentile of
    * all observed readings (start-of-run base included) — central-low
    * without being an outlier. */
  def robustBase(startBase: Double, series: Seq[Double]): Double = {
    val all = (startBase +: series).sorted
    all(all.length / 4)
  }

  def median(series: Seq[Double]): Double = {
    require(series.nonEmpty, "median of empty canary series")
    val s = series.sorted
    if (s.length % 2 == 1) s(s.length / 2)
    else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
  }

  /** A bench window is contended iff the scalar probe crosses its
    * factor OR the wide probe crosses the GROSS per-window factor. */
  def windowContended(
      scalar: Double, scalarBase: Double, scalarFactor: Double,
      wide: Double, wideBase: Double, wideFactor: Double): Boolean =
    inflated(scalar, scalarBase, scalarFactor) ||
      inflated(wide, wideBase, wideFactor)

  /** Indices of per-window contended windows given full series (same
    * length). `wideBase` should be [[robustBase]] of the wide series. */
  def contendedWindows(
      scalarSeries: Seq[Double], scalarBase: Double, scalarFactor: Double,
      wideSeries: Seq[Double], wideBase: Double, wideFactor: Double): Set[Int] = {
    require(scalarSeries.length == wideSeries.length,
      s"canary series lengths differ: ${scalarSeries.length} vs ${wideSeries.length}")
    scalarSeries.indices.filter { i =>
      windowContended(scalarSeries(i), scalarBase, scalarFactor,
        wideSeries(i), wideBase, wideFactor)
    }.toSet
  }

  /** Run-level steal verdict — the r12 blind mode: the whole wide
    * series uniformly inflated over the box's recorded idle median
    * while the scalar canary reads clean. Nothing can be re-measured
    * (the run has no clean window); the verdict marks the totals as
    * discountable. */
  def runContended(wideSeries: Seq[Double], idleMedian: Double,
      runFactor: Double = WideRunFactorDefault): Boolean =
    wideSeries.nonEmpty && median(wideSeries) > idleMedian * runFactor

  // ---- phase steal (r15) -------------------------------------------
  // This box's steal arrives in MULTI-MINUTE PHASES (BenchCalibrate's
  // measured batch medians 1.03/1.15/4.24/1.34): a mode that inflates
  // a contiguous minority of probes can add ~14% to the run total
  // while leaving the series MEDIAN under the 2.2× band — exactly the
  // r14 driver run (median ratio 1.18, total +14% vs solo, 7.18 s
  // spikes). The median test CANNOT see it; two phase statistics can:
  //
  //  - the FRACTION of probes above the recorded idle p90: on an idle
  //    box ~10% sit above p90 BY DEFINITION; the r14 phase-contended
  //    driver run measured 0.204, the clean solo run 0.021 — 0.15
  //    splits them with margin on both sides;
  //  - the LONGEST CONSECUTIVE RUN above p90: iid 10%-tail noise makes
  //    a 4-run with probability ~n·10⁻⁴ (~1% at n≈100 probes), but a
  //    steal PHASE inflates consecutive probes — the r14 driver series
  //    held a 5-run, the clean solo series a 1-run.
  /** Fraction-above-p90 threshold (see phase-steal block). */
  val PhaseFracDefault = 0.15
  /** Longest-run-above-p90 threshold (see phase-steal block). */
  val PhaseRunDefault = 4

  def fracAbove(series: Seq[Double], band: Double): Double =
    if (series.isEmpty) 0.0
    else series.count(_ > band).toDouble / series.length

  def longestRunAbove(series: Seq[Double], band: Double): Int = {
    var best = 0; var cur = 0
    series.foreach { x =>
      cur = if (x > band) cur + 1 else 0
      if (cur > best) best = cur
    }
    best
  }

  /** Run-level PHASE steal verdict (fires alongside [[runContended]];
    * either marks the run's totals as discountable). */
  def phaseContended(wideSeries: Seq[Double], idleP90: Double,
      fracThreshold: Double = PhaseFracDefault,
      runThreshold: Int = PhaseRunDefault): Boolean =
    wideSeries.nonEmpty &&
      (fracAbove(wideSeries, idleP90) >= fracThreshold ||
        longestRunAbove(wideSeries, idleP90) >= runThreshold)
}
