package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench contention detector must catch BOTH host failure modes:
  * whole-host saturation (scalar canary inflates, r7/r8) and wide-core
  * steal (scalar canary stays idle-band while multi-core work inflates
  * 1.2–1.5×, measured in the r12 bench ledger — the "canary-blind
  * ambient mode") — WITHOUT false-flagging the wide probe's large solo
  * variance (measured r13: p25 0.47 / median 0.51 / p90 0.89 on an
  * idle machine — GC/page-cache phases after heavy queries). Hence the
  * split: gross per-window events re-measure their windows; uniform
  * run-level steal flags the verdict against the box's recorded idle
  * median (no clean in-run reference exists for a uniform steal).
  * Pure-logic spec: synthetic series shaped like the measured runs. */
class BenchCanarySpec extends AnyFunSuite {
  private val sBase = 0.17 // idle 1-task canary on this box (PERF.md)
  private val sF = BenchCanary.ScalarFactorDefault
  private val wF = BenchCanary.WideWindowFactorDefault
  // the RECORDED calibration, not a source constant (r13 verdict item
  // 4): the file must exist in-repo, carry a local[32] entry, and sit
  // in the band every measured idle run has occupied — a drifted
  // re-calibration or a deleted file fails loudly here
  private val idleMed = BenchCalibrate.recordedWideIdleMedian("32")
    .getOrElse(fail("bench_calibration.properties must record the " +
      "local[32] idle wide-probe median — run graft.BenchCalibrate"))

  test("recorded calibration shape is sane: local[32] idle median in " +
    "the measured idle band") {
    // measured clean-phase medians so far: 0.51 (r13 box), 0.78-1.03
    // (r14 box) — a reading outside [0.2, 2.0] means the calibration
    // ran inside a steal phase or the probe changed
    assert(idleMed > 0.2 && idleMed < 2.0,
      s"recorded idle median $idleMed outside every measured idle band")
  }

  // the measured solo-run wide shape: readings 0.36–0.95 around a
  // ~0.47 p25 — realistic noise the detector must NOT flag
  private val soloWide = Seq(0.55, 0.47, 0.44, 0.36, 0.51, 0.89, 0.46,
    0.48, 0.95, 0.47, 0.44, 0.52)

  test("clean run: neither per-window nor run-level flags fire on the " +
    "measured solo-run wide variance") {
    val scalar = Seq.fill(soloWide.size)(0.17)
    val wb = BenchCanary.robustBase(0.53, soloWide)
    assert(wb >= 0.4 && wb <= 0.5, s"robust base off: $wb")
    assert(BenchCanary.contendedWindows(scalar, sBase, sF, soloWide, wb, wF)
      === Set.empty[Int])
    assert(!BenchCanary.runContended(soloWide, idleMed))
  }

  test("whole-host saturation: scalar canary flags the window") {
    val scalar = Seq(0.17, 2.4, 0.18) // 14x inflation in window 1
    val wide = Seq(0.50, 0.52, 0.48) // wide probe may be noise-masked
    val wb = BenchCanary.robustBase(0.53, wide)
    assert(BenchCanary.contendedWindows(scalar, sBase, sF, wide, wb, wF)
      === Set(1))
  }

  test("gross wide-core event (concurrent build, measured 2.1-2.8x): " +
    "the per-window wide detector flags exactly those windows") {
    val wide = Seq(0.50, 2.80, 2.10, 0.52, 0.47, 0.49)
    val scalar = Seq.fill(6)(0.17) // 1-task probe blind to it
    val wb = BenchCanary.robustBase(0.53, wide)
    assert(BenchCanary.contendedWindows(scalar, sBase, sF, wide, wb, wF)
      === Set(1, 2))
  }

  test("blind mode (r13c, measured): scalar idle-band, wide series " +
    "UNIFORMLY ~2.5x — per-window sees nothing (correct: no clean " +
    "window to re-measure against), the run-level median verdict " +
    "fires; the measured clean-totals ~2.0x run stays quiet") {
    // the steal shape is RELATIVE to the box's idle median (the r13c
    // run measured ×2.45 over ITS box's 0.51) — scale the measured
    // solo shape so its median sits at exactly that ratio over the
    // RECORDED calibration, whatever this box's value is
    val toIdle = idleMed / BenchCanary.median(soloWide)
    val wide = soloWide.map(_ * toIdle * 2.45)
    val scalar = soloWide.map(_ => 0.158) // BELOW its own base — r12/r13c
    // per-window: a uniform steal inflates the robust base with the
    // readings, so no window stands out — by design
    val wb = BenchCanary.robustBase(0.53 * toIdle * 2.45, wide)
    assert(BenchCanary.contendedWindows(scalar, sBase, sF, wide, wb, wF)
      === Set.empty[Int])
    // negative control: the scalar canary alone really is blind
    assert(soloWide.indices.forall(i =>
      !BenchCanary.inflated(scalar(i), sBase, sF)))
    // the run-level verdict catches it against the recorded idle median
    assert(BenchCanary.runContended(wide, idleMed))
    // ...and stays quiet on the measured ~2.0x probe median whose
    // query totals were the round's BEST (probe-local effects, r13d)
    assert(!BenchCanary.runContended(soloWide.map(_ * toIdle * 2.0), idleMed))
  }

  // the r14 DRIVER run's measured wide-canary series (bench_out.json,
  // 07:11): median ratio 1.18 — UNDER the 2.2x run-level band — yet
  // totals ran ~14% over the solo snapshot, with steal arriving in
  // phases (3.3-7.2 s spikes, a 5-long run above the idle p90). The
  // median verdict is structurally blind to this shape; the phase
  // statistics are not.
  private val r14DriverWide = Seq(
    0.61, 0.83, 2.19, 3.66, 2.59, 3.32, 3.76, 1.71, 1.83, 2.08, 1.57,
    1.94, 1.47, 1.36, 1.43, 1.46, 1.35, 1.89, 1.38, 2.04, 1.44, 1.71,
    1.41, 3.95, 1.49, 1.69, 1.52, 1.67, 0.89, 2.21, 1.42, 2.20, 0.80,
    1.45, 1.76, 1.51, 1.02, 0.81, 0.77, 1.85, 0.94, 0.81, 1.51, 1.36,
    0.94, 0.82, 0.88, 0.74, 0.62, 0.67, 0.76, 2.19, 1.21, 0.70, 0.82,
    0.78, 0.77, 0.64, 0.62, 1.18, 0.70, 0.82, 0.84, 0.78, 0.95, 0.83,
    0.67, 1.64, 0.93, 0.69, 0.82, 0.68, 0.65, 0.71, 0.76, 0.85, 0.80,
    0.78, 2.98, 2.03, 1.21, 1.54, 7.18, 1.04, 1.11, 1.22, 1.26, 1.26,
    2.61, 0.80, 2.70, 0.85, 0.72, 0.85, 0.78, 0.86, 6.37, 1.64, 1.33,
    1.44, 1.33, 0.59, 0.76)
  // the r14 SOLO run's measured series (bench_local_r14.json, 202.1 s
  // clean snapshot): one 1.90 GC reading, everything else in band
  private val r14SoloWide = Seq(
    0.54, 1.00, 1.90, 1.43, 1.28, 1.44, 1.35, 1.28, 1.20, 1.14, 1.17,
    1.17, 1.27, 1.15, 1.08, 1.09, 0.91, 1.12, 1.08, 1.10, 0.87, 0.83,
    0.81, 1.23, 1.51, 1.10, 1.38, 1.30, 1.13, 1.51, 0.71, 0.68, 0.66,
    0.51, 0.55, 0.54, 0.60, 0.54, 0.42, 0.55, 0.56, 0.47, 0.52, 0.50,
    0.51, 0.55, 0.54)
  // The calibration THAT JUDGED the r14 series (r14's recorded idle
  // shape) — pinned as literals, NOT read from the live properties
  // file: a series must be replayed against its own epoch's
  // calibration (the box drifts round to round — r15's fresh
  // calibration reads idle median 0.61 / p90 0.76, and judging r14's
  // slower-box series against it would flag the clean run too).
  private val r14IdleMed = 1.0306
  private val r14IdleP90 = 1.7723
  // live-file sanity only: a p90 entry must exist for local[32].
  // Lazy + asserted INSIDE the test (r15 ADVICE): a missing/relocated
  // calibration file (SPARK_GRAFT_CALIBRATION elsewhere, non-repo-root
  // CWD) must fail the one test that needs it with a clear message,
  // not abort the whole suite at construction.
  private lazy val idleP90 = BenchCalibrate.recordedWideIdleP90("32")

  test("phase steal (r14 driver run, measured): the median verdict is " +
    "blind, the phase statistics flag it; the clean solo series and " +
    "the iid idle expectation both stay green") {
    val p90 = idleP90.getOrElse(fail("bench_calibration.properties must " +
      "record the local[32] idle wide-probe p90 — run graft.BenchCalibrate " +
      "(or point SPARK_GRAFT_CALIBRATION at the repo-root file)"))
    assert(p90 > 0.2 && p90 < 4.0,
      s"recorded p90 $p90 outside any measured idle band")
    // the blindness being fixed: the r14 driver run passed the median
    // test even though its totals were ~14% inflated
    assert(!BenchCanary.runContended(r14DriverWide, r14IdleMed))
    // both phase statistics separate the two measured runs with margin
    assert(BenchCanary.fracAbove(r14DriverWide, r14IdleP90) > 0.19)
    assert(BenchCanary.fracAbove(r14SoloWide, r14IdleP90) < 0.05)
    assert(BenchCanary.longestRunAbove(r14DriverWide, r14IdleP90) >= 5)
    assert(BenchCanary.longestRunAbove(r14SoloWide, r14IdleP90) <= 1)
    assert(BenchCanary.phaseContended(r14DriverWide, r14IdleP90),
      "the r14 driver series must flag as phase-contended")
    assert(!BenchCanary.phaseContended(r14SoloWide, r14IdleP90),
      "the clean 202.1 s solo series must stay green")
    // threshold sanity: ~10% of idle probes sit above p90 BY
    // DEFINITION, so the fraction threshold must hold headroom over
    // 0.10 and the run threshold must be improbable under iid noise
    // (P(4-run) ~ n*1e-4 at 10% tail)
    assert(BenchCanary.PhaseFracDefault >= 0.15)
    assert(BenchCanary.PhaseRunDefault >= 4)
  }

  test("mismatched series lengths are a harness bug, not a silent pass") {
    intercept[IllegalArgumentException] {
      BenchCanary.contendedWindows(Seq(0.17), sBase, sF, Seq.empty, 0.5, wF)
    }
    intercept[IllegalArgumentException] {
      BenchCanary.median(Seq.empty)
    }
  }
}
