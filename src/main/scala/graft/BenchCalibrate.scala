package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Records the (box, cpus) canary constants by MEASURING them — the
  * r13 verdict's "mechanize canary calibration" item: the run-level
  * steal verdict compares the wide probe's in-run median against the
  * box's idle median, and that constant was previously hand-edited
  * into source per round. This main runs the exact probes [[Bench]]
  * interleaves ([[BenchProbes]] — shared code, not a copy), on an
  * OTHERWISE-IDLE box, and writes the distribution to
  * `bench_calibration.properties`, which [[Bench]] reads at startup
  * (env `SPARK_GRAFT_WIDE_IDLE` still overrides; no recorded entry
  * for the run's cpus ⇒ the run-level verdict reports `null`).
  *
  * Keyed by cpus because the probe's WORK is fixed: its idle
  * wall-clock scales with the thread count (measured r13: wide median
  * ~0.5 s at local[32], ~1.31 s at local[8] — legitimately, not
  * steal), so one box needs one entry per thread shape it benches at.
  *
  * Usage: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.BenchCalibrate"`
  * on an idle box; commit the updated properties file. Re-run
  * whenever the box, the JVM, or the probe itself changes.
  */
object BenchCalibrate {

  val CalibrationPath = "bench_calibration.properties"

  /** Calibration file path: SPARK_GRAFT_CALIBRATION, else the repo
    * default — honored by BOTH the writer (main) and the readers
    * below, so a non-repo-root CWD can still point Bench at the
    * recorded constants (r15, ADVICE: read side used to hard-code the
    * relative default). */
  def resolvedPath: String =
    sys.env.getOrElse("SPARK_GRAFT_CALIBRATION", CalibrationPath)

  /** Recorded calibration value for a thread count, if this box has
    * been calibrated at it. Missing/unreadable file or absent key
    * → None (Bench then reports run_steal:null rather than inventing
    * a reference). */
  def recordedKey(key: String, cpus: String,
      path: String): Option[Double] = {
    val p = Paths.get(path)
    if (!Files.isReadable(p)) None
    else {
      val props = new java.util.Properties()
      val in = Files.newInputStream(p)
      try props.load(in) finally in.close()
      Option(props.getProperty(s"$key.$cpus"))
        .flatMap(v => scala.util.Try(v.toDouble).toOption)
    }
  }

  def recordedWideIdleMedian(cpus: String,
      path: String = resolvedPath): Option[Double] =
    recordedKey("wide_idle_median", cpus, path)

  /** Recorded idle wide-probe p90 — the phase-steal band (r15). */
  def recordedWideIdleP90(cpus: String,
      path: String = resolvedPath): Option[Double] =
    recordedKey("wide_idle_p90", cpus, path)

  /** Recorded calibration wall-clock (epoch seconds) — echoed into the
    * bench line so cross-round normalization can cite WHICH
    * calibration a run was judged against. Keyed per-cpus (r15
    * ADVICE: a single global stamp could cite a calibration epoch at
    * a DIFFERENT cpus count than the wide_idle_* constants actually
    * used); the legacy global `.s` key is the fallback for files
    * written before the per-cpus stamp existed. */
  def recordedCalibratedAt(cpus: String,
      path: String = resolvedPath): Option[Double] =
    recordedKey("calibrated_at_epoch", cpus, path)
      .orElse(recordedKey("calibrated_at_epoch", "s", path))

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val samples = sys.env.getOrElse("SPARK_GRAFT_CAL_SAMPLES", "21").toInt
    val batches = sys.env.getOrElse("SPARK_GRAFT_CAL_BATCHES", "3").toInt
    val gapSec = sys.env.getOrElse("SPARK_GRAFT_CAL_GAP_SEC", "60").toInt
    val path = sys.env.getOrElse("SPARK_GRAFT_CALIBRATION", CalibrationPath)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // discard warm-ups: the first probes pay codegen/JIT/shuffle-infra
    // start-up that Bench's own warm-up section absorbs before ITS
    // first probe, so including them here would bias the idle median up
    (1 to 3).foreach(_ => BenchProbes.wideOnce(spark))
    // MIN of per-batch MEDIANS, batches separated by idle gaps: this
    // box's steal arrives in MULTI-MINUTE PHASES (measured r14: two
    // 31-sample runs 3 minutes apart had medians 0.78 and 9.57 — a
    // whole batch can sit inside a steal phase). The within-batch
    // median absorbs per-sample GC/page-cache outliers; the min across
    // time-separated batches picks the clean phase — the reference the
    // run-level verdict NEEDS, because a steal-phase "idle" median
    // would silently disable the verdict (threshold 2.2× a 9.57
    // reference is never crossed).
    val batchSeries = (1 to batches).map { b =>
      if (b > 1) Thread.sleep(gapSec * 1000L)
      (1 to samples).map(_ => BenchProbes.wideOnce(spark))
    }
    val batchMedians = batchSeries.map(s => BenchCanary.median(s))
    val med = batchMedians.min
    // p25/p90/samples describe the shape of the batch whose median was
    // the MIN — the clean phase just identified — not a freshly-run
    // extra batch, which is not guaranteed clean and costs `samples`
    // extra probes (r15 ADVICE: a steal-phase extra batch would commit
    // a misleading p90 band for the phase-steal verdict)
    val cleanBatch = batchSeries(batchMedians.indexOf(med))
    val sorted = cleanBatch.sorted
    val p25 = sorted(sorted.length / 4)
    val p90 = sorted(math.min(sorted.length - 1, (sorted.length * 9) / 10))
    val series = cleanBatch

    // merge-write: preserve other cpus shapes' entries
    val props = new java.util.Properties()
    val p = Paths.get(path)
    if (Files.isReadable(p)) {
      val in = Files.newInputStream(p)
      try props.load(in) finally in.close()
    }
    props.setProperty(s"wide_idle_median.$cpus", f"$med%.4f")
    props.setProperty(s"wide_idle_p25.$cpus", f"$p25%.4f")
    props.setProperty(s"wide_idle_p90.$cpus", f"$p90%.4f")
    props.setProperty(s"wide_idle_batch_medians.$cpus",
      batchMedians.map(m => f"$m%.4f").mkString(","))
    props.setProperty(s"wide_idle_samples.$cpus",
      series.map(s => f"$s%.4f").mkString(","))
    // wall-clock stamp so a bench run can cite WHICH calibration it
    // was judged against (echoed into the compact bench line) —
    // keyed per-cpus so the stamp always corresponds to the
    // wide_idle_* constants a run at THIS thread count reads
    props.setProperty(s"calibrated_at_epoch.$cpus",
      (System.currentTimeMillis() / 1000L).toString)
    // deterministic key order so the committed file diffs cleanly
    val lines = ("# Canary calibration — produced by graft.BenchCalibrate " +
      "on an idle box; read by graft.Bench. Re-run when the box, JVM, " +
      "or probe changes. Keys are per-cpus (probe work is fixed; idle " +
      "time scales with thread count).") +:
      props.stringPropertyNames().toArray.map(_.asInstanceOf[String])
        .sorted.map(k => s"$k=${props.getProperty(k)}").toSeq
    Files.write(p, lines.mkString("", "\n", "\n")
      .getBytes(StandardCharsets.UTF_8))
    println(s"""{"calibrated":"$path","cpus":$cpus,"wide_idle_median":${f"$med%.4f"},"p25":${f"$p25%.4f"},"p90":${f"$p90%.4f"},"samples":$samples}""")
    spark.stop()
  }
}
