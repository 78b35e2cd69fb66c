package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** EXACT interpolated quantiles at scale — the two-phase replacement
  * for Spark's sort-based `percentile(col, p)` / `median(col)`.
  *
  * Why this exists: Spark's exact `Percentile` is an imperative
  * aggregate whose buffer is an in-memory map of EVERY DISTINCT VALUE
  * in the group (plus its count). That state is invisible at test
  * scale and catastrophic at 100 TB — `df.agg(percentile(x, 0.5))`
  * funnels every distinct double in the dataset into one aggregation
  * buffer on one task; `groupBy(status).agg(percentile(price, p))`
  * does the same per handful-of-values group. It is the
  * aggregation-BUFFER analog of the low-parallelism window collapse
  * the round-10 census convicted (see `plans/WindowGuard.scala` and
  * PERF.md "Round-11 notes"): correct, fast on a laptop, and the
  * worst plan on a cluster. `approx_percentile` fixes the state but
  * changes the answer; this operator keeps the answer bit-for-bit and
  * fixes the state.
  *
  * Shape (every step data-parallel, no value-sized task state; the
  * input is scanned exactly ONCE):
  *   1. value histogram: `groupBy(group, value).count()` — key
  *      cardinality GROWS with data, so this shuffle parallelizes;
  *      per-task state after map-side combine is the task's distinct
  *      values, not the group's. Cached (persist): five consumers
  *      with differing prunings would otherwise each re-scan the
  *      input (exchange reuse never fires across them — measured 12
  *      scans on the global-median shape); the cache keeps lineage,
  *      so executor loss recomputes rather than fails.
  *   2. per-group span stats (min/max/counts) — one tiny aggregated
  *      frame (≤|groups| rows, also materialized), broadcast back
  *      in-plan, so every consumer sees the identical bucket map.
  *   3. two-phase global rank of each distinct value inside its
  *      group: deterministic equal-width value buckets (equal values
  *      always share a bucket), per-(group, bucket) counts → exclusive
  *      offsets via a window over that AGGREGATED frame, then a
  *      per-(group, bucket) cumulative count. offset + local cum is
  *      exactly the global 0-based rank span `[start, start+cnt)` of
  *      each distinct value — the same recipe PERF.md documents for
  *      the round-11 two-phase rank reworks.
  *   4. bracket + interpolate: Spark computes
  *      `pos = p * (n - 1); lo = floor(pos); hi = ceil(pos)` and
  *      returns `v_lo` when `lo == hi` OR when both positions land in
  *      one distinct value's tie span (no self-interpolation — it can
  *      be 1 ULP off v), else
  *      `(hi - pos) * v_lo + (pos - lo) * v_hi` — replicated here
  *      term-for-term in the same IEEE doubles, so results are
  *      BIT-IDENTICAL to the built-in (pinned by
  *      `ExactQuantilesSpec`, including ties, n = 1, and the
  *      interpolation-free grid points). The bracket rows (≤ 2 per
  *      group × quantile) come from one broadcast join against the
  *      rank spans.
  *
  * Group identity rides ONE struct column (`exq_k = struct(group
  * cols)`) through every internal join/aggregate/window: Spark's
  * struct equality compares fields with null-safe ORDERING semantics
  * (a null field equals a null field), so a NULL-keyed group — which
  * `groupBy` keeps, like the built-in — survives the joins too. Plain
  * multi-column `join(..., groupCols)` equality is null-UNSAFE and
  * would silently drop that group from the output (the round-11
  * ADVICE finding); parity with the built-in on NULL group keys is
  * pinned in `ExactQuantilesSpec`.
  *
  * Differences from the built-in, by design:
  *   - empty input yields ZERO rows (a global `.agg(percentile)`
  *     yields one NULL row); callers here consume the result via
  *     broadcast joins, where the two are equivalent downstream.
  *   - values are ranked as doubles (the built-in buffers the native
  *     type and converts at the end) — exact for longs |v| < 2^53,
  *     which every call site satisfies. NaN and -0.0/0.0 mixtures are
  *     out of contract (the built-in's map treats -0.0 != 0.0; plan
  *     grouping normalizes them — no caller produces either).
  *
  * Cache lifecycle: [[quantiles]]/[[quantilesDisc]]/[[quantilesOfHist]]
  * leave their internal frames persisted — a lazily consumed plan
  * cannot know when its last action ran, and the Bench/Verify
  * harnesses clear the cache between queries anyway. A LIBRARY caller
  * running many quantile passes in one long session accumulates one
  * input-sized histogram InMemoryRelation (plus a group-sized stats
  * one) per call until storage pressure evicts them; such callers
  * should use [[quantilesReleased]] / [[quantilesOfHistReleased]],
  * which pay one blocking job to materialize the group-sized result
  * and drop the internal caches before returning. The five registered
  * quantile queries (q50/q132/q154/q159/q160) all ride the released
  * variants — after their build returns, only group-sized snapshots
  * remain cached (the r12 verdict's lifecycle item).
  *
  * Group-cardinality contract: the per-group stats and bucket-offset
  * frames (steps 2-3) are |groups| and |groups|·buckets rows and ride
  * hard broadcast() hints — sized for the LOW-cardinality/global
  * groups this operator exists for (the agg-state census's collapse
  * is precisely a value-sized buffer over such groups; see
  * `plans/AggStateGuard`). For DATA-sized group keys the built-in
  * `percentile` is already scale-safe — each group's buffer holds
  * only that group's few values — and is the right call; this
  * operator's broadcasts would become data-sized there (the
  * broadcast census, `plans/BroadcastGuard`, judges its internal
  * frames by exactly this contract via the `exq_*` key names).
  *
  * Skew note: equal-width value buckets degrade (not collapse) under
  * extreme value concentration — the floor is one task per
  * (group, distinct-value-dense bucket), still histogram-grain, never
  * row-grain. Sampled quantile boundaries would equalize buckets at
  * the cost of a nondeterministic bucket map; deterministic wins here
  * because the bucket map must be identical across the plan's
  * branches and across reruns (oracle + replay discipline).
  */
object ExactQuantiles {

  /** One row per group present in `df` (group columns preserved,
    * including a NULL-keyed group if present — see class doc), with
    * one DoubleType column per `(name, p)` in `ps` — each
    * bit-identical to `percentile(valueCol, p)` within the group —
    * plus `exq_rows` (= `count(*)`, nulls included; rename or drop).
    * `p` values must lie in [0, 1]; `valueCol` must be numeric.
    *
    * For a GLOBAL quantile pass `groupCols = Nil` — the result is one
    * row (zero on empty input, see class doc). */
  def quantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
      ps: Seq[(String, Double)]): DataFrame =
    build(df, groupCols, valueCol, ps, discrete = false,
      mutable.Buffer.empty[DataFrame])

  /** The `percentile_disc` sibling: each quantile column is the
    * smallest group value whose cumulative distribution reaches `p` —
    * the value at 1-based rank `max(ceil(p * n), 1)`, an ACTUAL data
    * value, never interpolated (verified against the built-in's
    * observed semantics incl. tie runs and grid points in
    * `ExactQuantilesSpec`). Same two-phase shape, same `exq_rows`. */
  def quantilesDisc(df: DataFrame, groupCols: Seq[String],
      valueCol: String, ps: Seq[(String, Double)]): DataFrame =
    build(df, groupCols, valueCol, ps, discrete = true,
      mutable.Buffer.empty[DataFrame])

  /** As [[quantiles]] (`discrete = false`) / [[quantilesDisc]]
    * (`true`), but EAGERLY materializes the group-sized result and
    * releases the operator's internal caches before returning — the
    * long-session variant (class doc, "Cache lifecycle"). Costs one
    * blocking job; the returned frame is itself persisted (≤|groups|
    * rows — never data-sized under the group-cardinality contract)
    * and is the caller's to unpersist when consumed. Lineage is
    * intact either way: a lost cached block of the result recomputes
    * from the input. */
  /** `keep` (both released variants): the column subset the CALLER
    * will read — the eager snapshot materializes exactly those (a
    * persist stores every column it is handed; lineage truncation
    * hides unused ones from column pruning — the width census's
    * barrier rule). Nil keeps everything (callers that read
    * `exq_rows`, like q50). */
  def quantilesReleased(df: DataFrame, groupCols: Seq[String],
      valueCol: String, ps: Seq[(String, Double)],
      discrete: Boolean = false, keep: Seq[String] = Nil): DataFrame =
    released(build(df, groupCols, valueCol, ps, discrete, _), keep)

  /** As [[quantilesOfHist]], but with the [[quantilesReleased]]
    * lifecycle: the group-sized result is materialized eagerly and the
    * operator's internal stats cache is dropped before returning (the
    * r12 ADVICE gap — the histogram path had no per-call release).
    * The HISTOGRAM argument's own persistence is still the caller's:
    * this call materializes it as a side effect (the eager job scans
    * it), so the caller can unpersist it right after. */
  def quantilesOfHistReleased(hist: DataFrame, groupCols: Seq[String],
      valueCol: String, countCol: String, ps: Seq[(String, Double)],
      discrete: Boolean = false, keep: Seq[String] = Nil): DataFrame =
    released(quantilesOfHist(hist, groupCols, valueCol, countCol, ps,
      discrete, _), keep)

  private def released(build: mutable.Buffer[DataFrame] => DataFrame,
      keep: Seq[String]): DataFrame = {
    val caches = mutable.Buffer.empty[DataFrame]
    val out0 = build(caches)
    val out = if (keep.isEmpty) out0 else out0.select(keep.map(col): _*)
    val snap = out.persist()
    snap.count()
    caches.foreach(_.unpersist(blocking = false))
    snap
  }

  /** For inputs ALREADY reduced to a (group, value, count) histogram —
    * one row per distinct (group, value), `countCol` its multiplicity.
    * Lets a caller that needs several quantile passes over derived
    * value spaces (q160: the deviation histogram is a fold of the
    * value histogram — counts at med±d merge) pay for ONE scan of the
    * data and stay in histogram space for everything after. Null
    * `valueCol` rows are allowed and count toward `exq_rows` only.
    * Callers should `persist()` a histogram they also consume
    * elsewhere — this path adds no caching of the histogram, but the
    * internal group-sized stats frame IS persisted and stays so
    * (class doc, "Cache lifecycle"). */
  def quantilesOfHist(hist: DataFrame, groupCols: Seq[String],
      valueCol: String, countCol: String, ps: Seq[(String, Double)],
      discrete: Boolean = false,
      caches: mutable.Buffer[DataFrame] =
        mutable.Buffer.empty[DataFrame]): DataFrame = {
    val g = if (groupCols.isEmpty) Seq("exq_g") else groupCols
    val base = if (groupCols.isEmpty) hist.withColumn("exq_g", lit(1))
      else hist
    core(base.select((g.map(col) :+
      col(valueCol).cast(DoubleType).as("exq_v") :+
      col(countCol).cast("long").as("exq_c")): _*),
      groupCols, g, ps, discrete, caches)
  }

  private def build(df: DataFrame, groupCols: Seq[String], valueCol: String,
      ps: Seq[(String, Double)], discrete: Boolean,
      caches: mutable.Buffer[DataFrame]): DataFrame = {
    // global quantiles ride a constant group key (dropped at the end)
    // so one code path serves both; the key is a literal, so the extra
    // column never shuffles wider than the row it annotates
    val g = if (groupCols.isEmpty) Seq("exq_g") else groupCols
    val base0 = if (groupCols.isEmpty) df.withColumn("exq_g", lit(1)) else df

    // 1. value histogram — nulls kept as their own row so exq_rows can
    // be count(*) while ranks use the non-null count, like the built-in.
    // CACHED (persist, not localCheckpoint): the histogram feeds five
    // consumers below (span stats, bucket join, offsets, ranks) whose
    // prunings differ, so exchange reuse never fires — uncached, Spark
    // re-scans the INPUT once per consumer (measured 12 scans on
    // q159's shape). The CacheManager substitutes the one in-memory
    // histogram into every branch lazily (no blocking side job, one
    // scan of the data), and unlike localCheckpoint the lineage
    // survives executor loss — on a real cluster a lost block
    // recomputes instead of failing the query. Callers' harnesses
    // clear the cache between queries (Bench/Verify discipline);
    // long-session library callers: see quantilesReleased.
    val hist = base0
      .groupBy((g.map(col) :+ col(valueCol).cast(DoubleType).as("exq_v")): _*)
      .agg(count(lit(1)).as("exq_c"))
      .persist()
    caches += hist
    core(hist, groupCols, g, ps, discrete, caches)
  }

  private def core(hist0: DataFrame, groupCols: Seq[String], g: Seq[String],
      ps: Seq[(String, Double)], discrete: Boolean,
      caches: mutable.Buffer[DataFrame]): DataFrame = {
    require(ps.nonEmpty, "at least one (name, p) quantile required")
    require(ps.forall { case (_, p) => p >= 0.0 && p <= 1.0 },
      s"quantile fractions must be in [0, 1]: $ps")
    // bucket count scales with the cluster, like every two-phase rework
    val nBuckets =
      hist0.sparkSession.sparkContext.defaultParallelism.max(16) * 2

    // group identity as ONE struct column from here on: struct
    // equality is null-safe per field (class doc), so NULL-keyed
    // groups flow through the joins below exactly like the built-in
    val hist = hist0.withColumn("exq_k", struct(g.map(col): _*))

    // 2. per-group span + counts (aggregated frame, broadcast back;
    // cached too — ≤|groups| rows, consumed twice)
    val st = hist.groupBy(col("exq_k"))
      .agg(sum(col("exq_c")).as("exq_rows"),
        sum(when(col("exq_v").isNotNull, col("exq_c"))
          .otherwise(lit(0L))).as("exq_n"),
        min(col("exq_v")).as("exq_mn"), max(col("exq_v")).as("exq_mx"))
      .persist()
    caches += st

    // per-quantile target ranks, computed INLINE from the joined
    // group stats (r17): klo/khi/pos are group constants derived from
    // exq_n, so they ride the early join's projection instead of a
    // second, differently-pruned broadcast of the stats frame at the
    // bracket step — one broadcast build + one join per pass removed
    // (guide §2.4; the quantile family q50/q112/q132/q153/q154/q159/
    // q160 all pay this shape)
    val kcols = ps.zipWithIndex.flatMap { case ((_, p), i) =>
      val pos = lit(p) * (col("exq_n") - 1L).cast(DoubleType)
      val kd = greatest(ceil(lit(p) * col("exq_n").cast(DoubleType)),
        lit(1L)) - 1L
      if (discrete)
        Seq(kd.as(s"exq_klo_$i"), kd.as(s"exq_khi_$i"),
          lit(0.0).as(s"exq_pos_$i"))
      else
        Seq(floor(pos).as(s"exq_klo_$i"), ceil(pos).as(s"exq_khi_$i"),
          pos.as(s"exq_pos_$i"))
    }

    // 3. two-phase global rank span of each distinct value; the ONE
    // stats join also attaches exq_rows and the target-rank columns,
    // which flow through the bucket rank to the bracket filter below
    val vals = hist.filter(col("exq_v").isNotNull)
      .join(broadcast(st), "exq_k")
      .withColumn("exq_bkt", when(col("exq_mx") > col("exq_mn"),
        least(greatest(floor((col("exq_v") - col("exq_mn")) * nBuckets /
          (col("exq_mx") - col("exq_mn"))), lit(0L)), lit(nBuckets - 1L)))
        .otherwise(lit(0L)))
      .select((Seq(col("exq_k"), col("exq_v"), col("exq_c"),
        col("exq_bkt"), col("exq_rows")) ++ kcols.map(c => c)): _*)
    val offs = vals.groupBy(col("exq_k"), col("exq_bkt"))
      .agg(sum(col("exq_c")).as("exq_bc"))
      .withColumn("exq_off", coalesce(sum(col("exq_bc")).over(
        Window.partitionBy(col("exq_k")).orderBy("exq_bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("exq_k"), col("exq_bkt"), col("exq_off"))
    val wLocal = Window.partitionBy(col("exq_k"), col("exq_bkt"))
      .orderBy("exq_v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = vals.join(broadcast(offs), Seq("exq_k", "exq_bkt"))
      .withColumn("exq_cum", col("exq_off") + sum(col("exq_c")).over(wLocal))
      .withColumn("exq_start", col("exq_cum") - col("exq_c"))

    // 4. bracket + interpolate — Spark's formula, term for term.
    // All per-quantile target ranks ride as COLUMNS attached at the
    // stats join above (no explode, so rank rows are never multiplied
    // |ps|-fold), the bracket filter keeps rows holding ANY target
    // rank (≤ 2|ps| per group), and ONE conditional aggregation per
    // group yields every bracket value — no per-quantile shuffle, no
    // pivot. Discrete mode targets ONE 0-based rank —
    // max(ceil(p*n), 1) - 1, the smallest value whose cume_dist
    // reaches p — so lo == hi and the interpolation short-circuit
    // returns the actual data value.
    def holds(k: Column) =
      k.between(col("exq_start"), col("exq_cum") - 1L)
    val anyHold = ps.indices
      .map(i => holds(col(s"exq_klo_$i")) || holds(col(s"exq_khi_$i")))
      .reduce(_ || _)
    // targets/positions are group constants — min() re-emits them
    val aggs = ps.indices.flatMap { i => Seq(
      min(when(holds(col(s"exq_klo_$i")), col("exq_v"))).as(s"exq_vlo_$i"),
      min(when(holds(col(s"exq_khi_$i")), col("exq_v"))).as(s"exq_vhi_$i"),
      min(col(s"exq_klo_$i")).as(s"exq_klo_$i"),
      min(col(s"exq_khi_$i")).as(s"exq_khi_$i"),
      min(col(s"exq_pos_$i")).as(s"exq_pos_$i")) }
    def interp(i: Int): Column =
      when(col(s"exq_klo_$i") === col(s"exq_khi_$i"), col(s"exq_vlo_$i"))
        // the built-in also skips interpolation when both bracket
        // positions land inside ONE distinct value's tie span —
        // interpolating v with itself can differ from v by 1 ULP
        .when(col(s"exq_vlo_$i") === col(s"exq_vhi_$i"), col(s"exq_vlo_$i"))
        .otherwise(
          (col(s"exq_khi_$i").cast(DoubleType) - col(s"exq_pos_$i"))
            * col(s"exq_vlo_$i")
            + (col(s"exq_pos_$i") - col(s"exq_klo_$i").cast(DoubleType))
            * col(s"exq_vhi_$i"))
    val out = ranked
      .filter(anyHold)
      .groupBy(col("exq_k"), col("exq_rows"))
      .agg(aggs.head, aggs.tail: _*)
      .select((g.map(n => col("exq_k").getField(n).as(n)) :+
        col("exq_rows")) ++
        ps.zipWithIndex.map { case ((name, _), i) =>
          interp(i).as(name) }: _*)
    if (groupCols.isEmpty) out.drop("exq_g") else out
  }
}
