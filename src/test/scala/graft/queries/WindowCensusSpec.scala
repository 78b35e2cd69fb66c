package graft.queries

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}

import graft.SparkTestBase

/** The window-partition census as a GUARD (r10 verdict item 4): the
  * q228 precedent says a registered query must not ride a
  * low-parallelism window — `X OVER (PARTITION BY k ...)` where k has
  * a handful of values hash-partitions the whole frame into that many
  * single-task sorts, and a partition-less window moves ALL data to
  * one partition. Round 10's census convicted six queries
  * (q195/q105/q210/q104/q72/q161 — all reworked in round 11); this
  * spec mechanizes the census over EVERY registered query's optimized
  * plan so the pattern cannot come back unaudited.
  *
  * Rule, per logical Window node:
  *   - OK if any partition column is entity/bucket-grain (not in the
  *     known low-cardinality name set) — the frame splits O(data) ways;
  *   - OK if an Aggregate (or a bounded Range/LocalRelation) sits
  *     below the window — the frame is aggregated/report-sized, the
  *     same class as a distributed sort's phase-2 boundary metadata;
  *   - otherwise the query must carry an explicit entry in
  *     [[WindowCensusSpec.Cleared]], which pins the r10 verdict's
  *     reviewed exceptions. A NEW offender fails this spec.
  *
  * (The aggregate-below check is a may-find — an Aggregate anywhere
  * under the window passes — so it is a census heuristic, not a
  * proof; the per-query plan specs below pin the six reworked shapes
  * exactly.)
  *
  * The same walk now also runs the AGG-STATE census
  * (`plans/AggStateGuard`): value-sized aggregation buffers — exact
  * percentile/median/mode/collect_* — over low-card/global groups are
  * the same collapse relocated from the sort to the hash-aggregate
  * buffer; q50/q154/q159/q160 reworked onto
  * `operators/ExactQuantiles`, bounded-domain survivors pinned in
  * [[WindowCensusSpec.AggCleared]]. */
class WindowCensusSpec extends SparkTestBase {

  /** Partition-key names with O(1) distinct values at any data scale.
    * A window partitioned ONLY by these collapses to O(1) tasks.
    * query_id/anchor_id/tok_id joined the set late in round 11: the
    * ANN family's FIXED query/anchor sets (5–20 ids) partition
    * corpus-sized scored-candidate frames — nine rank windows were
    * convicted and reworked onto the bounded-heap family
    * (q40/q41/q51/q110×2/q148/q207/q213/q229). */
  private val LowCard = Set(
    "lang", "epoch", "fold", "arm", "flag", "event_type",
    "o_orderpriority", "p_brand", "source", "i", "dow", "m",
    "layout", "pred", "l_returnflag", "l_linestatus", "rep", "split",
    "band", "query_id", "anchor_id", "tok_id")

  /** r10-verdict-reviewed exceptions: low-card windows whose frames
    * were judged acceptable (dimension-/metadata-/showcase-sized), each
    * with the reviewed reason. Adding a query here requires the same
    * review the verdict applied — see PERF.md round-11 census table. */
  private val Cleared: Map[String, String] = Map(
    "q56_window_distribution" ->
      ("SQL-surface showcase of distribution window fns; the frame is " +
        "the FIXED 100-customer cohort's orders (1,009 rows at sf0.01 " +
        "- see WINDOW_CENSUS.md), a cohort report, not the orders " +
        "table; an unfiltered form would need the two-phase rank"),
    "q175_compaction_plan" ->
      ("per-source greedy bin-pack over the FILE INVENTORY (metadata " +
        "frame, ~data/target_file_size rows — 3+ orders below data)"),
    "q180_skyline" ->
      ("per-brand Pareto frontier over the part DIMENSION table (25 " +
        "brands of a catalog-bounded frame)"))

  /** Reviewed exceptions for the AGG-STATE census (the window
    * collapse's aggregation-buffer sibling, round-11 follow-through):
    * value-sized-state aggregates over low-card/global groups whose
    * buffered VALUE DOMAIN is itself O(1), or whose point is the SQL
    * surface. Exact quantiles over unbounded domains get NO pin —
    * they rework onto `ExactQuantiles` (q50/q154/q159/q160 did). */
  private val AggCleared: Map[String, String] = Map(
    "q74_decontaminate" ->
      ("global collect_set of the BENCHMARK's distinct gram hashes " +
        "(~8 bytes/gram): the collected domain is benchmark-suite-" +
        "sized by definition, not corpus-sized — the corpus side " +
        "never aggregates; TextOps.decontaminateAgainst documents " +
        "the join-shape fallback for 100M+-gram benchmarks"),
    "q64_collect_agg" ->
      ("collection-aggregate capability row; the collected domain is " +
        "the 3-value o_orderstatus enum — set state is O(|domain|), " +
        "not O(rows), at any scale"),
    "q112_mode_pdisc" ->
      ("ordered-set/inverse-distribution SQL-surface showcase (mode + " +
        "percentile_disc WITHIN GROUP, identical SQL both engines); " +
        "mode's domain is the 3-value status enum; the scalable exact- " +
        "quantile form is ExactQuantiles (q50), kept distinct so the " +
        "SQL surface stays a registered capability"))

  /** Column names with O(1)-or-O(cluster) distinct values for the
    * BROADCAST census: grouping an aggregate by only these bounds its
    * output. A superset of [[LowCard]] — bucket keys (`bkt`, 2x
    * parallelism values) are deliberately data-sized for the WINDOW
    * census (a window over them is the scalable shape) yet bounded
    * for broadcast purposes, and ExactQuantiles' internal keys
    * (`exq_k` null-safe struct group key, `exq_g` literal group,
    * `exq_bkt` buckets, `exq_rows` per-group
    * scalar) ride its per-group broadcast frames. */
  private val BcastBounded = LowCard ++ Set(
    "bkt", "exq_bkt", "exq_rows", "exq_g", "exq_k", "b", "cent_id",
    "cluster_id", "k", "digit", "o_orderstatus",
    // round-12 skew census additions — all O(1) domains the earlier
    // censuses never needed named: embedding class labels, the 0..63
    // dimension index, and q203's event_type renames
    "label", "dim", "prev_type", "next_type",
    // round 13: q148's Hamming distance over 64-bit signatures is a
    // 0..64 domain — its (query, hamming, bkt) shortlist-offset
    // aggregate is queries·65·O(cluster) rows, broadcastable at any
    // corpus size
    "hamming")

  /** Probe-set key columns for the broadcast census: a literal
    * equality/range/IN filter on one of these marks a fixed
    * query/anchor/report probe set (`vec_id < 20`, `doc_id < 25`,
    * `term IN (fixed BM25 list)`). `cand_id` joined in round 12:
    * q162's PQ codebook seeds (`cand_id < 21`) filter the persisted
    * inverted-list cache, whose boundary stops the filter from
    * pushing down to the scan where the column is still `vec_id`. */
  private val BcastProbe = Set(
    "vec_id", "cand_id", "doc_id", "term", "query_id", "anchor_id")

  /** Reviewed exceptions for the BROADCAST census
    * (`plans/BroadcastGuard`, round-11 follow-through): hard
    * broadcast() hints whose frames ARE bounded, but by evidence the
    * recursive shape test cannot see. The census already fixed five
    * registered queries (q03/q85/q86 dropped scaling-dim hints for
    * AQE; q62 broadcasts the 25-doc probe tf instead of the
    * vocabulary-sized df table; q51 capped its quantizer sample with
    * orderBy+limit; q134 reshaped the vocabulary broadcast onto the
    * stoplist) — these three carry proofs instead: */
  private val BcastCleared: Map[String, String] = Map(
    "q131_bm25" ->
      ("the broadcast df frame groups by term over postings ALREADY " +
        "filtered to the fixed Bm25Terms probe list; the persisted " +
        "frame (InMemoryRelation — its cached plan is a filter, not " +
        "an aggregate) hides that bounding filter from the census"),
    "q134_stopword_prune" ->
      ("the broadcast stoplist is bounded by MATH, not shape: " +
        "sum_w df_w = sum_docs |distinct tokens per doc|, so #{w : " +
        "df_w >= 0.79 N} <= avg-distinct-tokens-per-doc / 0.79 at " +
        "any corpus size (see q134StopwordPrune scaladoc)"),
    "q209_bpe_fertility" ->
      ("the three broadcast frames are q149's 1-row best-pair " +
        "merge rules, localCheckpointed (LogicalRDD) between BPE " +
        "rounds — each is limit(1)-shaped upstream of the checkpoint"))

  /** Reviewed exceptions for the WIDTH census (`plans/WidthGuard`,
    * round 12): materialized columns the final plan cannot SEE being
    * used because the use happened inside an earlier EAGER
    * materialization (a checkpoint built at query-construction time
    * consumes its inputs through plans the final tree no longer
    * contains) — the census's documented nested-materialization
    * may-find. Both pins verified by reading the producing code: */
  private val WidthCleared: Map[String, String] = Map(
    "q80_curation_pipeline" ->
      ("the survivor cache's n_chars column is consumed by the n-gram " +
        "pair stage (size blocking key), which the final plan hides " +
        "behind the connected-components loop's checkpoint barrier; " +
        "the cache is already pruned to the consumers' union " +
        "(doc_id, lang, n_chars, norm) — round 12 dropped text+source"),
    "q209_bpe_fertility" ->
      ("vocab0's cnt weights the three build-time bestPair argmaxes " +
        "(eager checkpoints — invisible to the final plan, which only " +
        "tokenizes); the three flagged pair frames are limit(1) 1-ROW " +
        "merge rules whose pair_cnt column exists for sibling q149's " +
        "output — zero width at any scale"))

  /** Reviewed exceptions for the GENERATE-payload census
    * (`plans/WidthGuard.auditGenerate`, round 12): container columns
    * that DO ride an explode, but over a bounded frame where the
    * multiplier is a constant, not the data. */
  private val GenCleared: Map[String, String] = Map(
    "q41_ann_lsh" ->
      ("q_emb (64 floats) rides the probe-mask explode of the FIXED " +
        "5-query frame (vec_id < 5 probe filter) x 9 Hamming-1 masks " +
        "= 45 rows total at any corpus scale — the multiplied side is " +
        "the bounded probe set, never the corpus"))

  /** Reviewed exceptions for the SHUFFLE-KEY census
    * (`plans/ShuffleKeyGuard`, round 12): equi-joins/repartitions
    * keyed only on O(1)-cardinality columns over two data-scaling
    * sides, or typed mapGroups/cogroup (whose serialized closure key
    * hides its grain from any plan walk). The round-12 sweep found
    * ZERO sites — every low-card join in the repo has a bounded
    * (aggregated/fixed-dim) side that AQE broadcasts; the map stays
    * as the pin mechanism should a future query need one. */
  private val ShuffleCleared: Map[String, String] = Map.empty

  /** Synthetic per-entity identifiers for the SKEW census
    * (`plans/SkewGuard`, round 12): join keys whose per-key row
    * multiplicity is bounded by the DATA CONTRACT rather than the
    * distribution — TPC-H primary/foreign keys (an orderkey holds ≤ 7
    * lineitems, a custkey's orders are generator-uniform), unique
    * document/vector/event ids, and the id_a/id_b pair-output columns
    * (distinct-pair grain). A key set containing any of these inherits
    * the finest component's bound. */
  private val EntityKeys = Set(
    "l_orderkey", "o_orderkey", "c_custkey", "o_custkey", "s_suppkey",
    "l_suppkey", "p_partkey", "l_partkey", "c_nationkey", "s_nationkey",
    "n_nationkey", "n_regionkey", "r_regionkey",
    "doc_id", "vec_id", "event_id", "id_a", "id_b")

  /** Reviewed exceptions for the SKEW census: raw×raw equi-joins on
    * content-derived keys where a hot key's output is quadratic in its
    * multiplicity — each pin names the IN-PLAN or BY-CONTRACT
    * multiplicity bound (SKEW_CENSUS.md holds the measurements). The
    * census cleared the rest of the repo mechanically: entity-keyed
    * self-joins, enrichment joins onto key-grain aggregates (AQE
    * skew-split handles the raw side), bounded sides, semi/anti
    * (linear), and broadcast-hinted joins (no key exchange at all). */
  private val SkewCleared: Map[String, String] = Map(
    "q37_minhash_pairs" ->
      ("the pair join rides ONLY cap-pruned buckets: okBuckets " +
        "(bsz <= 64) bounds per-(band,bucket) multiplicity in-plan, so " +
        "hot-bucket pair mass <= 64^2; cap MEASURED firing at 10x " +
        "(3 -> 142 capped buckets, ScaleSpec)"),
    "q87_simhash_pairs" ->
      ("same in-plan 64-doc bucket cap (simhashNearPairs maxBucket) " +
        "as q37 — degenerate boilerplate buckets are carved out " +
        "before the pair join"),
    "q47_embedding_neardup" ->
      ("adaptive signature width (bits = max(8, ceil(log2(n/64)))) " +
        "keeps E[bucket] <= 64 so expected pair mass is O(64n); " +
        "NeardupMaxBucket = 1024 carves adversarial dense buckets " +
        "in-plan (worst-case per-key mass <= cap^2) — both round-12 " +
        "skew-census fixes, behavior pinned in SkewCensusSpec"),
    "q197_winnowing" ->
      ("fingerprints with df > WinnowMaxDf(100) drop before the pair " +
        "join — per-fh multiplicity capped in-plan; measured at " +
        "sf0.1: hottest fh in 3889/5000 docs, pair multiplicity 296M " +
        "uncapped -> 146k capped (WinnowMaxDf scaladoc)"),
    "q198_prefix_join" ->
      ("PPJoin prefix keys are each doc's RAREST tokens (ascending " +
        "global frequency order), excluding hot tokens from the key " +
        "domain by construction; 10x funnel measured 90.1M -> 328.6k " +
        "candidate multiplicity (ScaleSpec)"),
    "q45_ngram_jaccard" ->
      ("the exact-Jaccard tier is quadratic within its " +
        "(lang, szbucket) length-block BY CONTRACT — blocks prune " +
        "(J >= 0.8 bounds the size ratio), they are not the scale " +
        "path; corpus-scale near-dup composes the q37 LSH / q198 " +
        "PPJoin tiers (block mass measured in SkewCensusSpec)"),
    "q219_split_leakage" ->
      ("same ngramJaccardPairsOf block contract as q45 (the leakage " +
        "matrix reuses the pair stage across split boundaries)"),
    "q211_semdedup" ->
      ("cluster-local pairwise IS SemDeDup's algorithm: sum of " +
        "|cluster|^2 with upstream clustering sized (~sqrt(n) " +
        "clusters) to keep it near-linear; label stands in for the " +
        "k-means cluster id (q135/q139 hold that machinery) — " +
        "documented in the query scaladoc"),
    "q165_jaro_winkler" ->
      ("record-linkage blocking contract (the q63/q143 posture): " +
        "candidates only within (brand, size) catalog blocks; " +
        "narrower blocking keys (name prefix) are the documented " +
        "scale knob — block mass measured in SkewCensusSpec"),
    "q231_geo_grid_join" ->
      ("spatial grid-cell join: per-cell mass = density x cell area; " +
        "the query REPORTS max_cell as its own skew diagnostic, and " +
        "GeoBins IS corpus-derived (ceil(sqrt(n/8)), r15) so expected " +
        "occupancy is a constant at any scale; adaptive cell " +
        "splitting is the escalation for non-uniform density"),
    "q121_binned_range_join" ->
      ("bin = calendar DAY: per-bin mass is the uniform date share " +
        "of lineitem plus the sampled windows covering that day — " +
        "binning IS the rewrite that turned an interval nested-loop " +
        "into a balanced equi-join; bin granularity is the knob"),
    "q122_triangles" ->
      ("the 2-path stage's per-key mass is deg(b)^2 — the documented " +
        "sum-deg^2 contract of distributed triangle counting; the " +
        "query runs on the degree-bounded sampled co-purchase graph " +
        "(sampling is part of the definition, shared with the " +
        "oracle) and the closer is a semi join (linear)"),
    "q178_link_predict" ->
      ("common-neighbor generation shares q122's sum-deg^2 contract " +
        "on the same degree-bounded graph; the deg attach joins are " +
        "census-cleared mechanically (n-grain aggregates)"),
    "q192_hits" ->
      ("hub/auth score frames are ONE row per node by construction " +
        "(the fixpoint-twin-proven iteration invariant) behind the " +
        "iterBarrier checkpoints the grain walk cannot cross — the " +
        "enrichment shape; per-key mass = node degree, " +
        "AQE-skew-splittable (q114's identical shape clears " +
        "mechanically because its rank frames expose their " +
        "aggregates to the walk)"))

  /** All eight censuses off ONE plan walk per query (optimizing 235
    * plans dominates; the audits are collect()s over the same tree). */
  private lazy val census: (Seq[String], Seq[String], Seq[String],
      Seq[String], Seq[String], Seq[String]) = {
    val results = graft.SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val plan = fn(spark, Sf).queryExecution.optimizedPlan
        val w = if (Cleared.contains(name)) Nil
          else graft.plans.WindowGuard.audit(plan, LowCard)
            .map(f => s"$name: ${f.describe}")
        val ag = if (AggCleared.contains(name)) Nil
          else graft.plans.AggStateGuard.audit(plan, LowCard)
            .map(f => s"$name: ${f.describe}")
        val bc = if (BcastCleared.contains(name)) Nil
          else graft.plans.BroadcastGuard.audit(plan,
            graft.plans.BroadcastGuard.FixedCardTables, BcastBounded,
            BcastProbe).map(f => s"$name: ${f.describe}")
        // the cartesian census shares BcastCleared: both audits run
        // the same boundedness test, so a checkpoint-hidden bounded
        // frame (q209's 1-row best-pair LogicalRDDs) blinds both the
        // same way and one reviewed proof covers both readings
        val cx = if (BcastCleared.contains(name)) Nil
          else graft.plans.BroadcastGuard.auditCartesian(plan,
            graft.plans.BroadcastGuard.FixedCardTables, BcastBounded,
            BcastProbe).map(f => s"$name: ${f.describe}")
        val wd = if (WidthCleared.contains(name)) Nil
          else graft.plans.WidthGuard.audit(plan)
            .map(f => s"$name: ${f.describe}")
        // the Generate-payload census shares the width family's walk:
        // materialized width and multiplied width are the same waste
        val gn = if (GenCleared.contains(name)) Nil
          else graft.plans.WidthGuard.auditGenerate(plan)
            .map(f => s"$name: ${f.describe}")
        val sk = if (ShuffleCleared.contains(name)) Nil
          else graft.plans.ShuffleKeyGuard.audit(plan, LowCard,
            graft.plans.BroadcastGuard.FixedCardTables, BcastBounded,
            BcastProbe).map(f => s"$name: ${f.describe}")
        val sw = if (SkewCleared.contains(name)) Nil
          else graft.plans.SkewGuard.audit(plan, EntityKeys,
            graft.plans.BroadcastGuard.FixedCardTables, BcastBounded,
            BcastProbe).map(f => s"$name: ${f.describe}")
        (w, ag, bc ++ cx, wd ++ gn, sk, sw)
    }
    (results.flatMap(_._1), results.flatMap(_._2), results.flatMap(_._3),
      results.flatMap(_._4), results.flatMap(_._5), results.flatMap(_._6))
  }

  test("window census: every registered query is free of " +
    "low-parallelism window shapes (q228 precedent, r10 verdict)") {
    // same detector the runtime WindowGuardRule runs — the test-time
    // census and the in-optimizer guard cannot drift
    val offenders = census._1
    assert(offenders.isEmpty,
      "low-parallelism window(s) reintroduced — rework per the q228 " +
        "precedent (bounded-heap top-k / two-phase prefix) or review + " +
        s"add to Cleared with a reason:\n${offenders.mkString("\n")}")
  }

  test("agg-state census: every registered query is free of value-sized " +
    "aggregation buffers over low-card/global groups (round-11 " +
    "follow-through on the q228 precedent)") {
    val offenders = census._2
    assert(offenders.isEmpty,
      "value-sized aggregation buffer(s) reintroduced — rework exact " +
        "quantiles onto ExactQuantiles.quantiles (two-phase histogram " +
        "ranks) or review + add to AggCleared with a bounded-domain " +
        s"reason:\n${offenders.mkString("\n")}")
  }

  test("broadcast census: every registered query is free of hard " +
    "broadcast() hints over data-scaling frames (round-11 " +
    "follow-through — the exchange-side sibling of the q228 collapse)") {
    val offenders = census._3
    assert(offenders.isEmpty,
      "scaling broadcast hint(s) reintroduced — drop the hint (AQE " +
        "decides from runtime sizes), broadcast the bounded side, " +
        "reshape onto a bounded frame, or review + add to " +
        s"BcastCleared with a boundedness proof:\n${offenders.mkString("\n")}")
  }

  test("broadcast census controls: the detector still fires on the " +
    "pre-fix q03/q62 shapes and stays quiet on fixed-card dims") {
    import org.apache.spark.sql.functions._
    // positive control 1: hard broadcast of an SF-scaling dim (the
    // exact shape q03 carried before round 11)
    val dim = graft.Tables.customer(spark, Sf)
    val bad = graft.Tables.orders(spark, Sf)
      .join(broadcast(dim), col("o_custkey") === col("c_custkey"))
    val hits = graft.plans.BroadcastGuard.audit(
      bad.queryExecution.optimizedPlan,
      graft.plans.BroadcastGuard.FixedCardTables, BcastBounded, BcastProbe)
    assert(hits.size == 1 && hits.head.leaves == Seq("customer"), s"$hits")
    // positive control 2: broadcast of a vocabulary-sized aggregate
    // (pre-fix q62 shape) — the blanket any-Aggregate-below escape
    // would clear this; the recursive grouping-key test must not
    val td = graft.Tables.documents(spark, Sf)
      .select(col("doc_id"),
        explode(split(lower(col("text")), "\\s+")).as("term"))
      .filter(col("term") =!= "")
    val dfreq = td.groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
    val bad2 = td.join(broadcast(dfreq.filter(col("df") >= 25)), Seq("term"))
    val hits2 = graft.plans.BroadcastGuard.audit(
      bad2.queryExecution.optimizedPlan,
      graft.plans.BroadcastGuard.FixedCardTables, BcastBounded, BcastProbe)
    assert(hits2.size == 1 && hits2.head.leaves == Seq("documents"), s"$hits2")
    // negative control: nation (fixed 25 rows) broadcast is clear
    val good = graft.Tables.orders(spark, Sf)
      .join(graft.Tables.customer(spark, Sf),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(graft.Tables.nation(spark, Sf)),
        col("c_nationkey") === col("n_nationkey"))
    assert(graft.plans.BroadcastGuard.audit(
      good.queryExecution.optimizedPlan,
      graft.plans.BroadcastGuard.FixedCardTables, BcastBounded,
      BcastProbe).isEmpty)
  }

  test("width census: every registered query materializes only columns " +
    "some consumer reads — checkpoints/caches store every column they " +
    "are handed (round 12; the barrier-width blind spot of the " +
    "declarative-pruning discipline)") {
    val offenders = census._4
    assert(offenders.isEmpty,
      "over-wide materialization(s) introduced — select() the " +
        "consumers' column union before the persist/checkpoint (round-12 " +
        "fixes: q80 dropped the corpus text body from the survivor " +
        "cache, q179 halved the postings cache, q202/q206 shed dead " +
        "keys), or review + add to WidthCleared with a " +
        s"nested-materialization proof:\n${offenders.mkString("\n")}")
  }

  test("width census controls: the detector fires on an over-wide " +
    "checkpoint, an over-wide cache, and a container payload riding an " +
    "explode; stays quiet when columns are read, spans are built " +
    "in-generator, or usage unions across self-join branches") {
    import org.apache.spark.sql.functions._
    val base = spark.range(8).selectExpr("id", "id*2 AS a", "id*3 AS b")
    // positive: checkpointed frame whose a/b nobody reads
    val ck = base.localCheckpoint()
    val h1 = graft.plans.WidthGuard.audit(ck.select("id"))
    assert(h1.map(_.unused) == Seq(Seq("a", "b")), s"$h1")
    // positive: cached frame read through a pruning projection
    val p = base.persist()
    try {
      val h2 = graft.plans.WidthGuard.audit(p.select((col("a") + 1).as("x")))
      assert(h2.map(_.unused.toSet) == Seq(Set("id", "b")), s"$h2")
      // negative: two branches that TOGETHER read every column — usage
      // must union positionally across DeduplicateRelations' re-aliased
      // occurrences of the one materialization
      val both = ck.select("id")
        .union(ck.selectExpr("a + b AS id"))
      assert(graft.plans.WidthGuard.audit(both).isEmpty)
    } finally p.unpersist()
    // Generate census controls: the pre-fix q136 shape (token array
    // riding its own position explode) fires; the in-generator
    // transform form is quiet
    // toks must be data-DEPENDENT: a literal array constant-folds
    // into the generator and nothing rides the explode at all
    val docs = spark.range(4).selectExpr("id",
      "transform(sequence(1, 9), x -> concat('t', x, '_', id)) AS toks")
    val carried = docs
      .select(col("id"), col("toks"),
        explode(expr("sequence(1, size(toks) - 7)")).as("i"))
      .select(col("id"),
        expr("concat_ws(' ', slice(toks, i, 8))").as("span"))
    val gh = graft.plans.WidthGuard.auditGenerate(
      carried.queryExecution.optimizedPlan)
    assert(gh.map(_.carried) == Seq(Seq("toks")), s"$gh")
    val inGen = docs.select(col("id"), explode(expr(
      "transform(sequence(1, size(toks) - 7), " +
        "i -> concat_ws(' ', slice(toks, i, 8)))")).as("span"))
    assert(graft.plans.WidthGuard.auditGenerate(
      inGen.queryExecution.optimizedPlan).isEmpty)
  }

  test("shuffle-key census: every registered query is free of " +
    "equi-joins/repartitions keyed only on O(1)-cardinality columns " +
    "over scaling sides, and of opaque typed group ops (round 12 — " +
    "the exchange-key sibling of the q228 collapse)") {
    val offenders = census._5
    assert(offenders.isEmpty,
      "collapsed shuffle key(s) introduced — broadcast the bounded " +
        "side, aggregate before joining, add an entity/bucket key, or " +
        "review + add to ShuffleCleared with the key-grain " +
        s"proof:\n${offenders.mkString("\n")}")
  }

  test("shuffle-key census controls: the detector fires on a " +
    "lang-only corpus self-join, a lang repartition, and a typed " +
    "mapGroups; stays quiet on bounded-side and entity-keyed joins") {
    import org.apache.spark.sql.functions._
    def audit(df: org.apache.spark.sql.DataFrame) =
      graft.plans.ShuffleKeyGuard.audit(df.queryExecution.optimizedPlan,
        LowCard, graft.plans.BroadcastGuard.FixedCardTables, BcastBounded,
        BcastProbe)
    val d = graft.Tables.documents(spark, Sf)
    // positive 1: two corpus-sized sides equi-joined on lang alone —
    // the full corpus funnels through a ~5-task exchange
    val h1 = audit(d.select(col("doc_id"), col("lang"))
      .join(d.select(col("doc_id").as("d2"), col("lang")), Seq("lang")))
    assert(h1.map(f => (f.kind, f.keys)) ==
      Seq(("Inner equi-join", Seq("lang"))), s"$h1")
    // positive 2: explicit low-card repartition of a scaling frame
    val h2 = audit(d.repartition(col("lang")))
    assert(h2.map(_.kind) == Seq("repartition"), s"$h2")
    // positive 3: typed mapGroups — the serialized closure key hides
    // its grain, so scaling input alone convicts (pin-or-rework rule)
    import spark.implicits._
    val h3 = audit(d.select(col("lang"), col("n_chars"))
      .as[(String, Long)].groupByKey(_._1)
      .mapGroups((k, it) => (k, it.size)).toDF())
    assert(h3.map(_.kind) == Seq("typed mapGroups"), s"$h3")
    // negative 1: per-lang stats joined back — the aggregated side is
    // bounded (lang ∈ BcastBounded), AQE broadcasts it at any scale
    val st = d.groupBy("lang").agg(avg("n_chars").as("mu"))
    assert(audit(d.join(st, Seq("lang"))).isEmpty)
    // negative 2: entity key present — O(data) exchange partitions
    assert(audit(d.select(col("doc_id"), col("lang"))
      .join(d.select(col("doc_id"), col("lang").as("l2")),
        Seq("doc_id"))).isEmpty)
  }

  test("skew census: every registered query is free of UNPINNED " +
    "raw×raw equi-joins on content-derived keys (round 12 — the " +
    "multiplicity axis: a hot key's pair mass is quadratic and AQE " +
    "cannot split a raw×raw explosion)") {
    val offenders = census._6
    assert(offenders.isEmpty,
      "unreviewed content-keyed raw×raw join(s) introduced — cap the " +
        "per-key bucket (q37/q197 pattern), join at distinct grain " +
        "carrying counts (q230), prefix-filter to rare keys (q198), " +
        "compose an entity/bucket key, or review + add to SkewCleared " +
        s"with the multiplicity bound:\n${offenders.mkString("\n")}")
  }

  test("skew census controls: the detector fires on a raw token " +
    "self-join; stays quiet on entity-traced renames, key-grain " +
    "aggregates (incl. pulled-out grouping aliases), bounded-domain " +
    "extra grouping keys, broadcast hints, and semi joins") {
    import org.apache.spark.sql.functions._
    def audit(df: org.apache.spark.sql.DataFrame) =
      graft.plans.SkewGuard.audit(df.queryExecution.optimizedPlan,
        EntityKeys, graft.plans.BroadcastGuard.FixedCardTables,
        BcastBounded, BcastProbe)
    val toks = graft.Tables.documents(spark, Sf)
      .select(col("doc_id"), explode(split(lower(col("text")), "\\s+"))
        .as("token")).filter(col("token") =!= "")
    // positive: raw x raw on a Zipf-distributed content key — the
    // hottest token's pair mass is its multiplicity squared
    val h1 = audit(toks.select(col("token"), col("doc_id").as("d_a"))
      .join(toks.select(col("token"), col("doc_id").as("d_b")),
        Seq("token")))
    assert(h1.map(_.keys) == Seq(Seq("token")), s"$h1")
    // negative 1: the same join with an entity column composed into
    // the key — per-key multiplicity inherits doc_id's uniqueness
    assert(audit(toks.join(
      toks.select(col("doc_id"), col("token").as("t2")),
      Seq("doc_id"))).isEmpty)
    // negative 2: entity tracing through self-join renames (id_a/id_b
    // resolve to doc_id through the Projects)
    val d = graft.Tables.documents(spark, Sf)
    assert(audit(d.select(col("doc_id").as("id_a"), col("lang"))
      .join(d.select(col("doc_id").as("id_b"), col("n_chars")),
        col("id_a") === col("id_b"))).isEmpty)
    // negative 3: enrichment — one side aggregated to join-key grain
    // (mult <= 1), AQE splits the raw side's hot partitions by size
    val cnt = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
    assert(audit(toks.join(cnt, Seq("token"))).isEmpty)
    // negative 4: the pulled-out grouping-alias shape (q120) — both
    // sides grouped by an EXPRESSION aliased to the join key, whose
    // public name only the aggregate output carries
    val g1 = d.groupBy(nullif(col("doc_id") % 50, lit(17)).as("gk"))
      .agg(count(lit(1)).as("n1"))
    val g2 = d.groupBy(nullif(col("doc_id") % 50, lit(17)).as("gk2"))
      .agg(count(lit(1)).as("n2"))
    assert(audit(g1.join(g2, g1("gk") <=> g2("gk2"))).isEmpty)
    // negative 5: extra grouping keys with bounded domains keep the
    // grain bounded (q203's model side: group by join key + lang)
    val perLang = toks.join(d.select("doc_id", "lang"), Seq("doc_id"))
      .groupBy("token", "lang").agg(count(lit(1)).as("c"))
    assert(audit(toks.join(perLang, Seq("token"))).isEmpty)
    // negative 6: a broadcast hint removes the key exchange entirely;
    // a semi join never multiplies
    assert(audit(toks.join(broadcast(toks.select(col("token"),
      col("doc_id").as("d2"))), Seq("token"))).isEmpty)
    assert(audit(toks.join(toks.select(col("token"), col("doc_id")
      .as("d2")), Seq("token"), "left_semi")).isEmpty)
  }

  test("cleared lists carry no stale entries") {
    val names = graft.SparkEntry.queries.keySet
    val stale = (Cleared.keySet ++ AggCleared.keySet ++
      BcastCleared.keySet ++ WidthCleared.keySet ++
      GenCleared.keySet ++ ShuffleCleared.keySet ++
      SkewCleared.keySet).diff(names)
    assert(stale.isEmpty, s"Cleared entries for unregistered queries: $stale")
  }

  // ---- the six round-11 reworks, pinned exactly (q228 spec pattern)

  private def executed(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q104/q105/q210 rank through bounded-heap aggregates — no " +
    "window operator anywhere in the plan") {
    val plans = Map(
      "q104" -> executed(CorpusOps.q104ZipfFit(spark, Sf)),
      "q105" -> executed(CorpusOps.q105WeightedSample(spark, Sf)),
      "q210" -> executed(TextOps.q210HeavyHittersExact(spark, Sf)))
    plans.foreach { case (n, p) =>
      assert(!p.contains("Window"), s"$n must not rank via a window: $p")
      assert(p.contains("ObjectHashAggregate"),
        s"$n must aggregate through the typed heap udaf: $p")
    }
    assert(plans("q104").contains("topkbyscorekey"))
    assert(plans("q210").contains("topkbyscorekey"))
    assert(plans("q105").contains("bottomkbyscore"))
  }

  test("q195/q72 window shapes: data-sized windows ride the bucket " +
    "key; partition-less/low-card windows ride aggregated frames only") {
    def census(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collect { case w: LWindow =>
        (w.partitionSpec.flatMap(_.references.toSeq.map(_.name)),
          w.child.collectFirst { case a: Aggregate => a }.isDefined)
      }
    val z = census(WarehouseOps.q195Zonemap(spark, Sf))
    assert(z.size == 4, s"q195: expected 2 layouts x (offsets+rank): $z")
    z.foreach { case (parts, aggBelow) =>
      if (parts.isEmpty) assert(aggBelow,
        s"q195: partition-less window must ride the bucket-count frame")
      else assert(parts == Seq("bkt"),
        s"q195: the data-sized rank window must partition by bkt: $parts")
    }
    val p = census(TextOps.q72SequencePacking(spark, Sf))
    assert(p.size == 2, s"q72: expected offsets + local-cumsum windows: $p")
    p.foreach { case (parts, aggBelow) =>
      if (parts == Seq("lang")) assert(aggBelow,
        "q72: the lang-only offsets window must ride the partials frame")
      else assert(parts.contains("bkt"),
        s"q72: the per-document cumsum window must partition by bkt: $parts")
    }
    val g = census(CorpusOps.q161GiniLengths(spark, Sf))
    assert(g.nonEmpty && g.forall(_._2),
      s"q161: every window must ride the (lang, distinct-length) " +
        s"aggregated frame: $g")
    // q155 and q153 (reworked in round 11 after the census pinned them
    // as the Cleared entries with a known fix shape — the q195 bucketed
    // two-phase rank): data-sized rank windows ride (group, bkt) or
    // score grain; offsets windows ride aggregated bucket-count frames
    val a = census(MlOps.q155RocAuc(spark, Sf))
    assert(a.size == 3, s"q155: expected offsets + rank + ties: $a")
    a.foreach { case (parts, aggBelow) =>
      if (parts == Seq("fold")) assert(aggBelow,
        "q155: the fold-only offsets window must ride the bucket counts")
      else assert(parts.contains("bkt") || parts.contains("x"),
        s"q155: data-sized windows must ride bucket/score grain: $parts")
    }
    val qn = census(VectorOps.q153QuantileNorm(spark, Sf))
    assert(qn.size == 2, s"q153: expected offsets + rank windows: $qn")
    qn.foreach { case (parts, aggBelow) =>
      if (parts == Seq("i")) assert(aggBelow,
        "q153: the dim-only offsets window must ride the bucket counts")
      else assert(parts.contains("bkt"),
        s"q153: the per-dim rank window must ride the bucket grain: $parts")
    }
  }

  test("ANN-family rankings ride bounded heaps — no window operator " +
    "anywhere in their plans (round-11 addendum)") {
    val plans = Map(
      "q40" -> executed(VectorOps.q40CosineTopK(spark, Sf)),
      "q41" -> executed(VectorOps.q41AnnLsh(spark, Sf)),
      "q51" -> executed(VectorOps.q51AnnIvf(spark, Sf)),
      "q110" -> executed(VectorOps.q110AnnPca(spark, Sf)),
      "q207" -> executed(VectorOps.q207MatryoshkaRecall(spark, Sf)),
      "q213" -> executed(VectorOps.q213Ndcg(spark, Sf)),
      "q229" -> executed(CorpusOps.q229NegativeSampling(spark, Sf)))
    plans.foreach { case (n, p) =>
      assert(!p.contains("Window"), s"$n must not rank via a window: $p")
      assert(p.contains("ObjectHashAggregate"),
        s"$n must aggregate through a typed heap udaf: $p")
    }
    assert(plans("q40").contains("topkbyscorerow"))
    assert(plans("q229").contains("bottomkbykeyrow"))
    // q148 since round 13 is the composed shortlist+rerank tier: its
    // final top-10 rides the heap, but the CORPUS-SCALED shortlist
    // (nCand grows with n — a heap would hold O(n) aggregator state)
    // legitimately rides the two-phase window recipe; assert exactly
    // the sanctioned shapes (offsets over the aggregated count frame,
    // rank on the (hamming, bkt)-bucketed grain)
    val h148 = executed(VectorOps.q148HammingTopK(spark, Sf))
    assert(h148.contains("topkbyscorerow"),
      s"q148 final top-10 must ride the heap: $h148")
    val w148 = VectorOps.q148HammingTopK(spark, Sf)
      .queryExecution.optimizedPlan.collect { case w: LWindow =>
        (w.partitionSpec.flatMap(_.references.toSeq.map(_.name)),
          w.child.collectFirst { case a: Aggregate => a }.isDefined)
      }
    assert(w148.size == 2, s"q148: expected offsets + rank windows: $w148")
    w148.foreach { case (parts, aggBelow) =>
      if (parts == Seq("query_id")) assert(aggBelow,
        "q148: the query-only offsets window must ride the bucket counts")
      else assert(parts.contains("bkt") && parts.contains("hamming"),
        s"q148: the shortlist rank window must ride the bucket grain: $parts")
    }
    // r13 ADVICE regression pin: bkt must be INTEGRAL. Spark's `/` on
    // integral operands returns DOUBLE, and a double bkt is
    // near-unique per candidate — the window shapes above still pass
    // (the bug shipped through this census) while the offsets frame
    // silently degenerates to ~one row per scored candidate and gets
    // broadcast. The type is the bug's signature.
    val bktAttrs = VectorOps.q148HammingTopK(spark, Sf).queryExecution
      .optimizedPlan.collect { case p => p.output.filter(_.name == "bkt") }
      .flatten
    assert(bktAttrs.nonEmpty && bktAttrs.forall(
      _.dataType == org.apache.spark.sql.types.LongType),
      s"q148 bkt must be integral, got ${bktAttrs.map(_.dataType).distinct}")
    // the trained-IVF/PQ tier: data-sized rankings (re-rank, ADC
    // top-k, ADC shortlist) ride heaps; the one window q139/q162 keep
    // is the probe rank over the K=8 MODEL-SIZED centroid
    // LocalRelation — bounded below, which the main census verifies
    val pq = Map(
      "q139" -> executed(MlOps.q139AnnIvfTrained(spark, Sf)),
      "q150" -> executed(VectorOps.q150PqAnn(spark, Sf)),
      "q162" -> executed(MlOps.q162IvfPqAnn(spark, Sf)))
    assert(pq("q139").contains("topkbyscorerow"))
    assert(pq("q150").contains("bottomkbyscore"))
    assert(pq("q162").contains("bottomkbyscore") &&
      pq("q162").contains("topkbyscorerow"))
  }

  test("new heap aggregators are physical-partitioning-invariant " +
    "end-to-end (the q228 run(1)===run(7) pattern)") {
    import org.apache.spark.sql.functions._
    val counts = graft.Tables.documents(spark, Sf)
      .select(col("lang"),
        explode(split(lower(col("text")), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("lang", "token").agg(count(lit(1)).as("cnt"))
    val topk = udaf(graft.functions.TopKByScoreKey(8),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[graft.functions.ScoredKey]())
    def runTop(parts: Int) = counts.repartition(parts)
      .groupBy("lang").agg(topk(col("cnt"), col("token")).as("top"))
      .collect().map(r => r.getAs[String]("lang") ->
        r.getSeq[org.apache.spark.sql.Row](1).map(_.toString).mkString(","))
      .toMap
    assert(runTop(1) === runTop(7))
    val bottomk = udaf(graft.functions.BottomKByScore(5),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[graft.functions.ScoredRow]())
    def runBottom(parts: Int) = graft.Tables.documents(spark, Sf)
      .select(col("lang"), col("doc_id"), col("n_chars"),
        (col("n_chars") % 97).cast("double").as("k")) // tie-heavy scores
      .repartition(parts)
      .groupBy("lang")
      .agg(bottomk(col("k"), col("doc_id"), col("n_chars")).as("bot"))
      .collect().map(r => r.getAs[String]("lang") ->
        r.getSeq[org.apache.spark.sql.Row](1).map(_.toString).mkString(","))
      .toMap
    assert(runBottom(1) === runBottom(7))
  }
}
