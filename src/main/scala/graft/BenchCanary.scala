package graft

/** Pure decision logic for the bench contention canaries.
  *
  * Two canaries run interleaved with the benchmark:
  *
  *  - the SCALAR canary (a 1-task nation groupBy) detects whole-host
  *    saturation — the r7/r8 failure mode where a static query ran
  *    100× its clean time;
  *  - the WIDE canary (a fixed 32-partition shuffle probe) detects
  *    wide-core hypervisor steal, which the r12 bench ledger proved the
  *    scalar canary is blind to: a run whose 1-task canary stayed in the
  *    idle band the whole series while query totals inflated 18%
  *    (PERF.md round-12 ledger, "canary-blind ambient mode"). Steal that
  *    shaves a fraction of every core barely moves a 1-task probe but
  *    stretches anything that needs all cores at once — i.e. both the
  *    wide probe and the benchmark queries themselves.
  *
  * The thresholds differ because the failure modes differ: saturation
  * inflates the scalar probe by integer factors (3× is conservative),
  * while steal inflates the wide probe by 1.2–1.5× (measured r12), so
  * the wide factor must sit below that band's floor but above run noise
  * (~±10% on a 0.3 s 32-way shuffle, measured while building this).
  *
  * Kept free of SparkSession so BenchCanarySpec can exercise the
  * blind-mode case (scalar idle, wide inflated) with synthetic series.
  */
object BenchCanary {
  val ScalarFactorDefault = 3.0
  val WideFactorDefault = 1.25

  def inflated(reading: Double, base: Double, factor: Double): Boolean =
    reading > base * factor

  /** A bench window is contended iff EITHER canary's reading for that
    * window crosses its own inflation factor. `scalar` and `wide` are
    * the two probes' readings taken at the same window boundary.
    */
  def windowContended(
      scalar: Double, scalarBase: Double, scalarFactor: Double,
      wide: Double, wideBase: Double, wideFactor: Double): Boolean =
    inflated(scalar, scalarBase, scalarFactor) ||
      inflated(wide, wideBase, wideFactor)

  /** Indices of contended windows given full series (same length). */
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
}
