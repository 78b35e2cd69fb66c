package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench contention detector must catch BOTH host failure modes:
  * whole-host saturation (scalar canary inflates, r7/r8) and wide-core
  * hypervisor steal (scalar canary stays idle-band while 32-way work
  * inflates 1.2–1.5×, measured in the r12 bench ledger — the
  * "canary-blind ambient mode"). Pure-logic spec: synthetic series.
  */
class BenchCanarySpec extends AnyFunSuite {
  private val sBase = 0.17 // idle 1-task canary on this box (PERF.md)
  private val wBase = 0.30 // wide probe sized to ~0.3 s
  private val sF = BenchCanary.ScalarFactorDefault
  private val wF = BenchCanary.WideFactorDefault

  test("clean run: no window flagged") {
    val scalar = Seq(0.17, 0.18, 0.169, 0.175)
    val wide = Seq(0.30, 0.31, 0.295, 0.305)
    assert(BenchCanary.contendedWindows(scalar, sBase, sF, wide, wBase, wF)
      === Set.empty[Int])
  }

  test("whole-host saturation: scalar canary flags the window") {
    val scalar = Seq(0.17, 2.4, 0.18) // 14× inflation in window 1
    val wide = Seq(0.30, 0.31, 0.30) // wide probe may be noise-masked
    assert(BenchCanary.contendedWindows(scalar, sBase, sF, wide, wBase, wF)
      === Set(1))
  }

  test("blind mode (r12): scalar idle-band, wide steal 1.4× — flagged") {
    // exactly the r12 ledger shape: 1-task canary median 0.164 (BELOW
    // its own base) while totals inflated 18% — the old single-canary
    // detector returned no windows here
    val scalar = Seq(0.17, 0.164, 0.168, 0.166)
    val wide = Seq(0.30, 0.42, 0.44, 0.31) // 1.4–1.47× steal
    val got = BenchCanary.contendedWindows(scalar, sBase, sF, wide, wBase, wF)
    assert(got === Set(1, 2))
    // negative control: the scalar canary alone really is blind to this
    val scalarOnly = scalar.indices.filter(i =>
      BenchCanary.inflated(scalar(i), sBase, sF)).toSet
    assert(scalarOnly === Set.empty[Int])
  }

  test("wide factor sits above run noise: ±10% readings do not flag") {
    val wide = Seq(0.27, 0.33, 0.30, 0.329)
    val scalar = Seq.fill(4)(0.17)
    assert(BenchCanary.contendedWindows(scalar, sBase, sF, wide, wBase, wF)
      === Set.empty[Int])
  }

  test("mismatched series lengths are a harness bug, not a silent pass") {
    intercept[IllegalArgumentException] {
      BenchCanary.contendedWindows(Seq(0.17), sBase, sF, Seq.empty, wBase, wF)
    }
  }
}
