package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

import graft.Tables

/** Corpus-curation extras beyond the TextOps dedup core: deterministic
  * content-addressed sharding, PII redaction, per-document token
  * entropy, int8 embedding quantization, Zipf vocabulary fit, and
  * weighted sampling — the remaining operations a training-data
  * pipeline runs between dedup and shard writing. (The reference
  * pipeline — see `/root/reference/src/jobs/process_iot_data.py` — has
  * no corpus surface at all; this module is part of the
  * beyond-the-reference LLM-data mandate.)
  *
  * Every query here is DuckDB-oracle-verified. Cross-engine
  * determinism rules used throughout:
  *
  *   - "randomness" is md5-derived: the first 8 hex chars of
  *     `md5(normalized text)` parsed as a base-16 integer. Spark uses
  *     the native `conv`; DuckDB (no `conv`) evaluates an unrolled
  *     strpos-polynomial over the same 8 chars — same value, different
  *     spelling (values are compared, not SQL text).
  *   - transcendentals (`ln`) never feed a raw double output: each ln
  *     is floor-quantized to an exact BIGINT (`floor(ln(x)·1e6)`) so
  *     sums are order-independent integers and any derived double is a
  *     deterministic function of integers (a 1-ulp engine difference in
  *     `ln` flips a floor only within ~1e-10 of a boundary).
  *   - int/int → double division, float → double casts, and double
  *     `+ − × ÷ floor abs` are exact IEEE ops — identical bits in both
  *     engines, safe to emit raw.
  */
object CorpusOps {

  /** First 8 md5 hex chars of the column as a non-negative BIGINT in
    * [0, 2^32) — the deterministic "random" source shared by q100/q105. */
  private[queries] def md5Hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast(LongType)

  /** DuckDB spelling of [[md5Hash32]]: unrolled hex polynomial (DuckDB
    * has no `conv`). `h` is a SQL expression yielding the md5 hex string. */
  private[queries] def hexPoly(h: String): String =
    "(" + (0 until 8).map(i =>
      s"(strpos('0123456789abcdef', substr($h, ${i + 1}, 1))-1)" +
        s"*${math.pow(16, 7 - i).toLong}").mkString(" + ") + ")"

  private def normSql(col: String = "text"): String =
    s"trim(regexp_replace(lower($col), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))"

  private def norm(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  // ------------------------------------------------------- q100 sharding

  /** q100 — content-addressed training-shard assignment + balance
    * report: shard = md5-hash of the normalized text mod 64, so the
    * same document lands in the same shard on every run, on any
    * cluster, regardless of input order or partitioning (byte-identical
    * re-sharding is what makes incremental corpus rebuilds diffable).
    * One shuffle on the 64-value shard key; the report is 64 rows.
    * At 100 TB the same expression feeds `write.partitionBy("shard")`
    * — the report here is the balance audit of that layout. */
  def q100ShardAssign(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(pmod(md5Hash32(norm(col("text"))), lit(64L)).as("shard"),
        col("doc_id"), col("n_chars"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
      .orderBy("shard")

  // ---------------------------------------------------- q101 PII redact

  private val EmailPat = "[a-z0-9.]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val PhonePat = "\\b\\d{3}-555-\\d{4}\\b"
  private val IpPat = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** q101 — PII redaction: emails, phone numbers, and IPv4 addresses
    * replaced by type tags, with per-class match counts for the audit
    * log. Pure per-row regex projection — codegen'd, no shuffle, scales
    * linearly. Like q88's media headers, the PII-bearing text is
    * CONSTRUCTED deterministically (from customer keys) then redacted,
    * so the oracle can verify the roundtrip closed-form; the redaction
    * program itself is exactly what runs on real text. Patterns are
    * written in the common Java-regex/RE2 subset (no backrefs, no
    * lookaround) so both engines match identically. */
  def q101PiiRedact(s: SparkSession, dir: String): DataFrame = {
    val msg = concat(
      lit("contact "),
      regexp_replace(lower(col("c_name")), "[^a-z0-9]", "."),
      lit("@corp.example.com"), lit(" tel "),
      lpad((col("c_custkey") % 1000).cast("string"), 3, "0"),
      lit("-555-"),
      lpad((col("c_custkey") % 10000).cast("string"), 4, "0"),
      lit(" ip "),
      (col("c_custkey") % 256).cast("string"), lit("."),
      (col("c_nationkey") % 256).cast("string"), lit("."),
      expr("(c_custkey DIV 256) % 256").cast("string"), lit("."),
      ((col("c_custkey") * 7) % 256).cast("string"),
      lit(" segment "), col("c_mktsegment"))
    Tables.customer(s, dir)
      .select(col("c_custkey"), msg.as("msg"))
      .select(col("c_custkey"),
        length(col("msg")).as("msg_len"),
        size(regexp_extract_all(col("msg"), lit(EmailPat), lit(0))).as("n_emails"),
        size(regexp_extract_all(col("msg"), lit(PhonePat), lit(0))).as("n_phones"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col("msg"), EmailPat, "<EMAIL>"),
            PhonePat, "<PHONE>"),
          IpPat, "<IP>").as("redacted"))
      .orderBy("c_custkey")
  }

  // -------------------------------------------------- q102 token entropy

  /** q102 — per-document Shannon token entropy (nats) + type-token
    * ratio: the standard "natural text vs boilerplate/spam" quality
    * signals (low entropy = repetitive text; low TTR = small
    * vocabulary). entropy = ln(n) − (Σ c·ln c)/n over per-token counts
    * c. Shape: explode → two hash aggs keyed by doc_id — partial
    * aggregation absorbs the explode map-side, and the doc_id keys are
    * uniform, so the shuffle is skew-free at any corpus size. Both ln
    * terms are floor-quantized to BIGINTs (see object doc), making
    * `entropy_scaled` exact and `entropy`/`ttr` deterministic doubles. */
  def q102TokenEntropy(s: SparkSession, dir: String): DataFrame = {
    val d = (c: Column) => c.cast(DoubleType)
    val lnQ = (c: Column) => floor(log(d(c)) * 1e6).cast(LongType)
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        explode(split(norm(col("text")), " ")).as("t"))
      .groupBy("doc_id", "lang", "t").agg(count(lit(1)).as("c"))
      .groupBy("doc_id", "lang")
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_types"),
        sum(floor(d(col("c")) * log(d(col("c"))) * 1e6).cast(LongType)).as("sclnc"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("n_types"),
        (d(col("n_types")) / col("n_tokens")).as("ttr"),
        (col("n_tokens") * lnQ(col("n_tokens")) - col("sclnc")).as("entropy_scaled"),
        ((col("n_tokens") * lnQ(col("n_tokens")) - col("sclnc")) /
          (lit(1e6) * col("n_tokens"))).as("entropy"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------- q103 int8 quantization

  /** q103 — symmetric int8 embedding quantization report: per-vector
    * max-abs, quantized checksum Σq, and the total reconstruction error
    * Σ|x − q/scale| (scale = 127/max_abs, q = floor(x·scale + ½) ∈
    * [−127, 127] by construction — `floor(x+½)` instead of `round`
    * because both engines floor identically while their `round`s
    * differ at rendering-boundary halves). Everything is per-row
    * higher-order `aggregate` over the embedding array — no explode, no
    * shuffle, linear scan; the report is the audit a quantized-index
    * build logs. All-zero vectors get NULL scale/error (nullif guard). */
  def q103EmbedQuant(s: SparkSession, dir: String): DataFrame = {
    val e = col("embedding")
    val maxAbs = array_max(transform(e, x => abs(x.cast(DoubleType))))
    val scale = lit(127.0) / nullif(maxAbs, lit(0.0))
    val qv = (x: Column) => floor(x.cast(DoubleType) * scale + lit(0.5))
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"), size(e).as("n_dims"),
        maxAbs.as("max_abs"),
        aggregate(e, lit(0L), (acc, x) => acc + qv(x).cast(LongType)).as("sum_q"),
        aggregate(e, lit(0L), (acc, x) =>
          acc + floor(abs(x.cast(DoubleType) - qv(x) / scale) * 1e9)
            .cast(LongType)).as("err_scaled"))
      .orderBy("vec_id")
  }

  // ------------------------------------------------------- q104 Zipf fit

  /** q104 — Zipf law fit per language: least-squares regression of
    * ln(frequency) on ln(rank) over the top-1000 vocabulary terms.
    * Natural corpora run slope ≈ −1; a flat slope flags synthetic or
    * templated text, a cliff flags boilerplate domination — a one-row-
    * per-language corpus-health gauge. Shape: word count (map-side
    * combined) → per-lang top-1000 via the
    * [[graft.functions.TopKByScoreKey]] bounded-heap aggregate →
    * closed-form regression from integer sufficient statistics (the
    * quantized-ln idiom, same shape as q97).
    *
    * The heap, not a `row_number OVER (PARTITION BY lang)` window: a
    * ~5-value partition key hashes the whole vocabulary-sized count
    * frame (billions of rows at 100 TB) into ~5 single-task sorts,
    * while the aggregate ships ≤1000 rows per lang per map task and
    * merges associatively — exact under the (c DESC, t ASC UTF-8)
    * total order, so rank = explode position + 1 is bit-identical to
    * the window form the oracle runs. */
  def q104ZipfFit(s: SparkSession, dir: String): DataFrame = {
    val d = (c: Column) => c.cast(DoubleType)
    val lnQ = (c: Column) => floor(log(d(c)) * 1e6).cast(LongType)
    val topk = udaf(graft.functions.TopKByScoreKey(1000),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[graft.functions.ScoredKey]())
    val ranked = Tables.documents(s, dir)
      .select(col("lang"), explode(split(norm(col("text")), " ")).as("t"))
      .groupBy("lang", "t").agg(count(lit(1)).as("c"))
      .groupBy("lang")
      .agg(topk(col("c"), col("t")).as("top"))
      .select(col("lang"), posexplode(col("top")).as(Seq("pos0", "e")))
      .select(col("lang"), lnQ(col("pos0") + 1).as("x"),
        lnQ(col("e.score")).as("y"))
    val det = d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))
    val cov = d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))
    ranked.groupBy("lang")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("lang"), col("n").as("n_terms"),
        (cov / nullif(det, lit(0.0))).as("slope"),
        ((d(col("sy")) - (cov / nullif(det, lit(0.0))) * d(col("sx"))) /
          d(col("n"))).as("intercept"),
        ((cov * cov) / nullif(det *
          (d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy"))),
          lit(0.0))).as("r2"))
      .orderBy("lang")
  }

  // ------------------------------------------------ q105 weighted sample

  /** q105 — deterministic weighted sampling (Efraimidis–Spirakis A-ES):
    * each document gets key = −ln(u)/w with u ∈ (0,1] md5-derived and
    * w = n_chars, and the k smallest keys per language win — longer
    * documents proportionally more likely, yet the sample is a pure
    * function of content (reproducible across runs/clusters, stable
    * under repartitioning — the property `sample(fraction)` cannot
    * give).
    *
    * The per-lang smallest-5 cut is the
    * [[graft.functions.BottomKByScore]] bounded-heap aggregate, NOT a
    * `row_number OVER (PARTITION BY lang)` window — a ~5-value
    * partition key would hash ALL documents into ~5 single-task
    * sorts, while the heap ships ≤5 rows per lang per map task and
    * merges associatively (exact under the (key ASC, doc_id ASC)
    * total order, so the DuckDB window oracle is unchanged). NULL
    * keys (n_chars = 0) map to −∞, reproducing Spark's NULLS FIRST
    * ascending window order; n_chars rides the heap entry as payload
    * so no join back to documents is needed. The heap's entry fields
    * are primitive, and a NULL slot crossing the udaf boundary is
    * silently read as 0 (see [[graft.functions.ScoredRow]]'s null
    * contract) — so the payload crosses behind a Long.MinValue
    * sentinel and NULL is restored on output, making a NULL n_chars
    * row rank and surface exactly as the superseded window form
    * passed it through (n_chars is never Long.MinValue; pinned in
    * CorpusOpsSpec). */
  def q105WeightedSample(s: SparkSession, dir: String): DataFrame = {
    val u = (md5Hash32(norm(col("text"))) + 1).cast(DoubleType) / lit(4294967296.0)
    val key = -log(u) / nullif(col("n_chars"), lit(0L)).cast(DoubleType)
    val bottomk = udaf(graft.functions.BottomKByScore(5),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[graft.functions.ScoredRow]())
    Tables.documents(s, dir)
      .select(col("lang"), col("doc_id"), col("n_chars"), key.as("k"))
      .groupBy("lang")
      .agg(bottomk(coalesce(col("k"), lit(Double.NegativeInfinity)),
        col("doc_id"),
        coalesce(col("n_chars"), lit(Long.MinValue))).as("top"))
      .select(col("lang"), posexplode(col("top")).as(Seq("pos0", "e")))
      .select(col("lang"), (col("pos0") + 1).as("rank"),
        col("e.id").as("doc_id"),
        nullif(col("e.payload"), lit(Long.MinValue)).as("n_chars"))
      .orderBy("lang", "rank")
  }

  // ------------------------------------------------- q107 LM quality score

  /** q107 — bigram-LM quality scoring (the CCNet/perplexity-filter
    * shape): score each document by its per-bigram cross-entropy under
    * the corpus's OWN bigram MLE model, xent = avg −ln(c(w1,w2)/c(w1)).
    * Repetitive/templated text scores near 0, natural prose higher —
    * the standard "train a cheap LM on the corpus, filter by
    * perplexity" curation signal, self-contained (no external model).
    *
    * Shape: per-row bigram explode (zip_with over two slices, no
    * window) → two count aggregates → two joins back → per-doc
    * aggregate. The count tables and join keys are Zipf-skewed by
    * construction ("the …" dominates) — at 100 TB that's AQE skew-join
    * territory, or salt c1's hot prefixes; the aggregates themselves
    * combine map-side. The bigram frame feeds three consumers, so it
    * is checkpointed once. No smoothing is needed: the model is
    * trained on the scored corpus itself, so every scored bigram has
    * count ≥ 1. Both ln terms are floor-quantized (object doc) —
    * `xent_scaled` is an exact BIGINT. */
  def q107BigramLm(s: SparkSession, dir: String): DataFrame = {
    val lnQ = (c: Column) => floor(log(c.cast(DoubleType)) * 1e6).cast(LongType)
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), split(norm(col("text")), " ").as("t"))
      .filter(size(col("t")) >= 2)
    val bi = docs.select(col("doc_id"), col("lang"),
        explode(zip_with(
          slice(col("t"), lit(1), size(col("t")) - 1),
          slice(col("t"), lit(2), size(col("t")) - 1),
          (x, y) => struct(x.as("w1"), y.as("w2")))).as("p"))
      .select(col("doc_id"), col("lang"),
        col("p.w1").as("w1"), col("p.w2").as("w2"))
      .persist()
    val c12 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = bi.groupBy("w1").agg(count(lit(1)).as("c1"))
    bi.join(c12, Seq("w1", "w2")).join(c1, Seq("w1"))
      .select(col("doc_id"), col("lang"),
        (lnQ(col("c1")) - lnQ(col("c12"))).as("q"))
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("q")).as("xent_scaled"))
      .select(col("doc_id"), col("lang"), col("n_bigrams"), col("xent_scaled"),
        (col("xent_scaled") / (lit(1e6) * col("n_bigrams"))).as("xent"))
      .orderBy("doc_id")
  }

  // -------------------------------------------------- q156 collocations

  /** Pairs with lift below this are noise; the support floor is the
    * standard collocation-mining discipline (rare pairs have huge
    * unstable lift). Part of the query definition, shared with the
    * oracle. */
  private val CollocMinSupport = 5L

  /** q156 — collocation mining: adjacent-token pairs ranked by LIFT
    * (c₁₂·N / (c₁·c₂) — the e^PMI of the pair under the bigram
    * contingency table, kept as a RATIO so every input to the single
    * double division is an exact integer; ln() of it would re-order
    * nothing). This is the phrase-detection pass a tokenizer/corpus
    * pipeline runs before merging multiword units. Marginals are
    * position-specific (c₁ = count as left word, c₂ = count as right
    * word) — the standard 2×2 contingency marginals. Scale shape:
    * identical to q107's bigram build (one explode, pair/marginal
    * counts are vocabulary-sized keyed aggregates, map-side combined);
    * the two marginal joins are vocabulary-sized (AQE broadcasts at
    * this SF, shuffles co-keyed beyond), and the support floor prunes
    * the pair frame BEFORE any join. Products stay < 2⁵³ (pair and
    * marginal counts are ≤ corpus token count), so the lift doubles
    * are bit-identical cross-engine; ties break on (w1, w2). */
  def q156Collocations(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(split(norm(col("text")), " ").as("t"))
      .filter(size(col("t")) >= 2)
    val bi = docs.select(explode(zip_with(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1),
        (x, y) => struct(x.as("w1"), y.as("w2")))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .persist() // 4 consumers: N + pair counts + both marginals
    val n = bi.agg(count(lit(1)).as("n_pairs"))
    val c12 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= CollocMinSupport)
    val c1 = bi.groupBy("w1").agg(count(lit(1)).as("c1"))
    val c2 = bi.groupBy("w2").agg(count(lit(1)).as("c2"))
    c12.join(c1, "w1").join(c2, "w2")
      .crossJoin(broadcast(n))
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"),
        ((col("c12") * col("n_pairs")).cast(DoubleType)
          / (col("c1") * col("c2"))).as("lift"))
      .orderBy(col("lift").desc, col("w1"), col("w2"))
      .limit(50)
  }

  // ------------------------------------------------------------- q161

  /** q161 — per-language Gini concentration of document lengths: the
    * Lorenz-curve inequality of `n_chars` within each language,
    * gini = (2·Σᵢ rankᵢ·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) with ranks 1..n
    * ascending — the corpus-balance audit that tells a curation
    * pipeline whether a language's token budget is concentrated in a
    * few giant documents (gini→1) or spread evenly (gini→0). Ranks
    * tie-break on doc_id, but tied lengths contribute the same Σr·x
    * under any tie order, so the value is tie-order-independent —
    * and that independence makes the rank window REMOVABLE: for the
    * c tied rows at length x starting at rank s, Σ r·x =
    * x·(c·s + c(c−1)/2), so Σ rank·x aggregates from the per-(lang,
    * length) histogram alone.
    *
    * Scale shape: one (lang, n_chars) count aggregate (map-side
    * combined — the only pass over the corpus), then a running-count
    * window over THAT frame, whose size is bounded by the distinct
    * document lengths per language (value-domain-sized, orders of
    * magnitude below the corpus) — never a per-language sort of every
    * document, which with a ~5-value partition key would collapse to
    * ~5 single-task corpus-sized sorts. Every sum is an exact BIGINT
    * (Σ rank·x overflows only past ~10¹⁸ — beyond any per-language
    * corpus at 100 TB with chunked docs), and the one double division
    * runs on integer totals; the oracle keeps the per-document window
    * spelling, which this equals bit-for-bit. */
  def q161GiniLengths(s: SparkSession, dir: String): DataFrame = {
    val byLen = Tables.documents(s, dir)
      .select(col("lang"), col("n_chars").cast(LongType).as("x"))
      .groupBy("lang", "x").agg(count(lit(1)).as("c"))
    val wRun = Window.partitionBy("lang").orderBy("x")
      .rowsBetween(Window.unboundedPreceding, -1)
    byLen
      .withColumn("s", coalesce(sum(col("c")).over(wRun), lit(0L)) + 1L)
      .groupBy("lang")
      .agg(sum(col("c")).as("n_docs"),
        sum(col("x") * col("c")).as("total_chars"),
        sum(col("x") * (col("c") * col("s")
          + expr("(c * (c - 1)) div 2"))).as("srx"))
      .select(col("lang"), col("n_docs"), col("total_chars"),
        ((lit(2L) * col("srx")
          - (col("n_docs") + 1L) * col("total_chars")).cast(DoubleType)
          / (col("n_docs") * col("total_chars"))).as("gini"))
      .orderBy("lang")
  }

  // ------------------------------------------------------------ q131 BM25

  /** q131 — BM25 relevance scoring (k1 = 1.2, b = 0.75) of every
    * document against a fixed 3-term query — the retrieval primitive a
    * corpus-curation stack uses for search-based filtering. The
    * Robertson idf ln() is floor-quantized to an exact BIGINT (q107's
    * discipline) and per-term contributions are floor-quantized before
    * the per-doc sum, so the cross-engine compare is bit-exact despite
    * the transcendental. b = 0.75 and the ½ offsets are binary-exact
    * constants; dl/avgdl is computed as dl·N/Σdl so every operand
    * stays an exactly-converted integer.
    *
    * Shape at scale: the explode filters to the query's terms BEFORE
    * any aggregate (the IN-list prunes at the scan of the token
    * stream), df and the corpus stats are term-count-sized broadcasts,
    * and the only big shuffles are the (doc, term in query) tf
    * aggregate and the doc-length join — both keyed on doc_id. */
  def q131Bm25(s: SparkSession, dir: String): DataFrame =
    bm25PerTerm(s, dir)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum(col("contrib_fp")).as("score_fp"))
      .select(col("doc_id"), col("n_terms"), col("score_fp"),
        (col("score_fp").cast(DoubleType) / 1e6).as("bm25"))
      .orderBy("doc_id")

  /** Per-(doc, query-term) BM25 contribution frame — the shared scoring
    * core of q131 (plain BM25) and q179 (rank fusion). Carries `tf`,
    * `df`, `n_docs` alongside `contrib_fp` so callers can derive other
    * lexical scores (q179's tf-idf ranker) without re-scanning. */
  private def bm25PerTerm(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), split(norm(col("text")), " ").as("t"))
    // both derived frames are tiny relative to the corpus (dl is two
    // columns, td only the query's terms) and each has 2 consumers
    // whose aggregate shapes differ (no exchange reuse possible) —
    // one materialization cuts 4 corpus scans+explodes to 2 (persist,
    // not localCheckpoint: measured faster and lineage-safe — PERF.md
    // round-11 addendum 5). q134 makes the OPPOSITE call: its token
    // stream is corpus-sized, so re-scanning columnar parquet beats
    // materializing it.
    val dl = docs.select(col("doc_id"), size(col("t")).as("dl"))
      .persist()
    val td = docs.select(col("doc_id"), explode(col("t")).as("term"))
      .filter(col("term").isin(Bm25Terms: _*))
      .persist()
    val tf = td.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfr = td.groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    tf.join(broadcast(dfr), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf_fp", floor(log(
        (col("n_docs").cast(DoubleType) - col("df") + lit(0.5)) /
          (col("df").cast(DoubleType) + lit(0.5)) + lit(1.0)) * 1e6)
        .cast(LongType))
      .withColumn("tfn",
        (col("tf").cast(DoubleType) * lit(2.2)) /
          (col("tf").cast(DoubleType) + lit(1.2) *
            (lit(0.25) + lit(0.75) * col("dl").cast(DoubleType) *
              col("n_docs").cast(DoubleType) / col("sum_dl").cast(DoubleType))))
      .withColumn("contrib_fp",
        floor(col("idf_fp").cast(DoubleType) * col("tfn")).cast(LongType))
  }

  private val Bm25Terms = Seq("data", "join", "scan")

  // ------------------------------------------------- q179 rank fusion

  private val RrfK = 60L
  private val RrfDepth = 200

  /** q179 — reciprocal-rank fusion of two lexical retrievers over the
    * same fixed query (q131's terms): ranker A is BM25, ranker B plain
    * tf·idf (tf · ⌊ln(N/df)·10⁶⌋ — deliberately NOT length-normalized,
    * so the two lists genuinely disagree). Each retriever contributes
    * its top-200 list; fused score = Σ ⌊10⁹/(60+rank)⌋ with a missing
    * rank contributing 0 — the standard RRF over per-retriever top-K
    * lists (Cormack et al.), which is exactly how production hybrid
    * search fuses BM25 with a vector ranker.
    *
    * Scale shape: each ranker reduces to its top-K via a distributed
    * TakeOrderedAndProject (never a global sort of the corpus), and
    * the only window runs over a K-row frame — single-partition by
    * construction and K-bounded regardless of corpus size. The fusion
    * join is K-vs-K. All ranks and contributions are integers → exact
    * cross-engine; ties break on doc_id inside each ranker. */
  def q179RankFusion(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // pruned to the two rankers' column union before the persist (the
    // width census, plans/WidthGuard): the raw per-term frame carries
    // 5 more columns (term, dl, sum_dl, idf_fp, tfn) that neither
    // ranker reads — the cache would store them anyway
    val perTerm = bm25PerTerm(s, dir)
      .select("doc_id", "tf", "df", "n_docs", "contrib_fp")
      .persist() // 2 rankers
    val topA = perTerm.groupBy("doc_id")
      .agg(sum(col("contrib_fp")).as("score_a"))
      .orderBy(col("score_a").desc, col("doc_id")).limit(RrfDepth)
    val topB = perTerm
      .select(col("doc_id"), (col("tf") *
        floor(log(col("n_docs").cast(DoubleType) / col("df")) * 1e6)
          .cast(LongType)).as("c"))
      .groupBy("doc_id").agg(sum(col("c")).as("score_b"))
      .orderBy(col("score_b").desc, col("doc_id")).limit(RrfDepth)
    val ra = topA.select(col("doc_id"), row_number()
      .over(Window.orderBy(col("score_a").desc, col("doc_id")))
      .cast(LongType).as("r_bm25"))
    val rb = topB.select(col("doc_id"), row_number()
      .over(Window.orderBy(col("score_b").desc, col("doc_id")))
      .cast(LongType).as("r_tfidf"))
    ra.join(rb, Seq("doc_id"), "full_outer")
      .withColumn("rrf_fp",
        expr(s"coalesce(${1000000000L} div ($RrfK + r_bm25), 0) + " +
          s"coalesce(${1000000000L} div ($RrfK + r_tfidf), 0)"))
      .orderBy(col("rrf_fp").desc, col("doc_id"))
      .limit(50)
  }

  private val RankFusionSql: String = s"""
    |WITH docs AS (SELECT doc_id, string_split(${normSql()}, ' ') AS t
    |              FROM documents),
    |dl AS (SELECT doc_id, len(t) AS dl FROM docs),
    |tdq AS (SELECT doc_id, term FROM (SELECT doc_id, unnest(t) AS term FROM docs)
    |        WHERE term IN ('data', 'join', 'scan')),
    |tf AS (SELECT doc_id, term, count(*) AS tf FROM tdq GROUP BY 1, 2),
    |dfr AS (SELECT term, count(DISTINCT doc_id) AS df FROM tdq GROUP BY 1),
    |stats AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl
    |          FROM dl),
    |sc AS (SELECT tf.doc_id, tf, df, n_docs,
    |  CAST(floor(ln((CAST(n_docs AS DOUBLE) - df + 5e-1)
    |               / (CAST(df AS DOUBLE) + 5e-1) + 1e0) * 1e6) AS BIGINT)
    |    AS idf_fp,
    |  (CAST(tf AS DOUBLE) * 22e-1)
    |    / (CAST(tf AS DOUBLE) + 12e-1 * (25e-2 + 75e-2 * CAST(dl AS DOUBLE)
    |       * CAST(n_docs AS DOUBLE) / CAST(sum_dl AS DOUBLE))) AS tfn
    |  FROM tf JOIN dfr USING (term) JOIN dl ON tf.doc_id = dl.doc_id
    |  CROSS JOIN stats),
    |a0 AS (SELECT doc_id,
    |    CAST(sum(CAST(floor(idf_fp * tfn) AS BIGINT)) AS BIGINT) AS score_a
    |  FROM sc GROUP BY doc_id ORDER BY score_a DESC, doc_id LIMIT $RrfDepth),
    |ra AS (SELECT doc_id, CAST(row_number() OVER
    |    (ORDER BY score_a DESC, doc_id) AS BIGINT) AS r_bm25 FROM a0),
    |b0 AS (SELECT doc_id, CAST(sum(tf *
    |      CAST(floor(ln(CAST(n_docs AS DOUBLE) / df) * 1e6) AS BIGINT))
    |    AS BIGINT) AS score_b
    |  FROM sc GROUP BY doc_id ORDER BY score_b DESC, doc_id LIMIT $RrfDepth),
    |rb AS (SELECT doc_id, CAST(row_number() OVER
    |    (ORDER BY score_b DESC, doc_id) AS BIGINT) AS r_tfidf FROM b0)
    |SELECT COALESCE(ra.doc_id, rb.doc_id) AS doc_id, r_bm25, r_tfidf,
    |  COALESCE(1000000000 // ($RrfK + r_bm25), 0)
    |    + COALESCE(1000000000 // ($RrfK + r_tfidf), 0) AS rrf_fp
    |FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
    |ORDER BY rrf_fp DESC, doc_id LIMIT 50""".stripMargin

  // ------------------------------------------- q134 stopword pruning

  /** q134 — corpus-adaptive stopword pruning (the boilerplate-removal
    * shape of C4/CCNet line filtering, at token granularity since the
    * synthetic corpus has no line structure): tokens present in ≥ 79%
    * of documents are dropped and each document is REASSEMBLED in
    * original token order. The integer threshold compare (df·100 vs
    * n·79) avoids float thresholds entirely, and reassembly sorts the
    * collected (pos, token) structs — collect_list's arrival order
    * never matters. Docs pruned to nothing survive via the left join.
    *
    * Shape at scale: one posexplode → a vocabulary-sized df aggregate
    * → the STOPLIST (words with df ≥ 79% of docs) broadcast back as a
    * LEFT ANTI join → one doc_id-keyed regroup. The stoplist — unlike
    * the full vocabulary, which GROWS with the corpus and must never
    * carry a hard broadcast() (round-11 broadcast census;
    * `plans/BroadcastGuard`) — is PROVABLY bounded at any scale:
    * Σ_w df_w = Σ_docs |distinct tokens in doc|, so
    * #{w : df_w ≥ 0.79·N} ≤ avg-distinct-tokens-per-doc / 0.79,
    * a per-document quantity independent of corpus size. The anti
    * join is equivalent to the inner-join-plus-keep filter because
    * dfreq is computed FROM toks — every token has a df row — and it
    * keeps the corpus-sized token stream stationary (no shuffle for
    * the join; two shuffles total however large the corpus). */
  def q134StopwordPrune(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), split(norm(col("text")), " ").as("t"))
      // one-shot multi-consumer persist: the doc count, the token
      // explode (itself read by the df aggregate AND the prune
      // regroup) and the final n_tokens projection otherwise
      // re-tokenize text once each — 3 text scans in the executed
      // plan (round-12 scan audit). Caching at ARRAY grain wins
      // (sf0.1 A/B min-of-3: 1.01 s vs 1.41 un-cached); caching the
      // exploded token grain instead measured neutral (1.43) — the
      // per-row overhead of corpus x tokens rows eats the saving
      .persist()
    val toks = docs.select(col("doc_id"),
      posexplode(col("t")).as(Seq("pos", "w")))
    val dfreq = toks.groupBy("w").agg(countDistinct(col("doc_id")).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val stop = dfreq.crossJoin(broadcast(n))
      .filter(col("df") * 100 >= col("n_docs") * 79).select("w")
    val pruned = toks.join(broadcast(stop), Seq("w"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("w")))),
          x => x.getField("w"))).as("text_pruned"))
    docs.select(col("doc_id"), size(col("t")).as("n_tokens"))
      .join(pruned, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_pruned"), lit("")).as("text_pruned"))
      .orderBy("doc_id")
  }

  // ----------------------------------------------------- q136 span dedup

  /** q136 — substring-level duplication audit: the fixed-width-window
    * flavor of suffix-array substring dedup (Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better" — the
    * window form is what distributes): every 8-token window of every
    * normalized document, grouped; windows occurring in ≥ 2 distinct
    * documents are emitted with document/occurrence counts. Sits
    * between q30's document-level and q134's token-level dedup —
    * span-level boilerplate detection. One explode (~1 window per
    * token), then the two-stage distinct aggregate: a partial
    * (span, doc_id) aggregate collapses within-document repeats
    * MAP-SIDE before either shuffle, so the wire carries one row per
    * (span, doc) — at 100 TB the span would additionally be
    * xxhash64-compressed pre-shuffle and the report written
    * partitioned; md5 here keeps the oracle engine-neutral. */
  def q136SpanDedup(s: SparkSession, dir: String): DataFrame = {
    val W = 8
    Tables.documents(s, dir)
      .select(col("doc_id"), split(norm(col("text")), " ").as("toks"))
      .filter(size(col("toks")) >= W)
      // spans are built INSIDE the generator (transform over the
      // position sequence), so the token array never rides the
      // explode as a passthrough payload — Generate copies carried
      // columns into every output row, which is quadratic in document
      // length (the round-10 q215 lesson, mechanized by the round-12
      // Generate-payload census in plans/WidthGuard); the per-doc
      // intermediate is the linear span array, and measured at sf0.1
      // this form is also slightly faster (0.19 vs 0.23 s)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(toks) - ${W - 1}), " +
          s"i -> concat_ws(' ', slice(toks, i, $W)))")).as("span"))
      .groupBy("span")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"), min(col("doc_id")).as("min_doc"))
      .filter(col("n_docs") >= 2)
      .select(md5(col("span")).as("span_md5"), col("n_docs"),
        col("n_occ"), col("min_doc"))
      .orderBy("span_md5")
  }

  // ---------------------------------------------------- q137 k-anonymity

  /** q137 — k-anonymity audit over the (nation, market-segment)
    * quasi-identifier pair, k = 5: per-combination group size, risk
    * flag, and the dataset-wide k-anonymity (min group size) — the
    * privacy gate a user-derived training corpus passes before
    * release. One 2-key aggregate; the global min is a scalar window
    * over the (tiny) group report, not the data. */
  def q137KAnonymity(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("grp_n"))
      .withColumn("is_risky", (col("grp_n") < 5).cast(IntegerType))
      .withColumn("k_anonymity",
        min(col("grp_n")).over(Window.partitionBy()))
      .orderBy("c_nationkey", "c_mktsegment")

  // --------------------------------------------- q219 split leakage

  /** q219 — near-duplicate leakage across the train/val/test split:
    * join q45's exact n-gram-Jaccard near-dup pairs (θ=0.5) against
    * q146's salted-md5 split assignment and count pairs per
    * (split_a, split_b) cell. Off-diagonal cells are CONTAMINATION —
    * a test document with a train-side near-twin inflates every eval
    * number (the Lee et al. dedup-before-split finding); the audit
    * every serious pretraining pipeline runs before trusting held-out
    * loss. Same-split duplicate mass (the diagonal) is wasted epochs,
    * reported alongside.
    *
    * Scale shape: the pair set is LSH/size-bucket-bounded (q45's
    * machinery — never all-pairs), the split rule is two hashes per
    * doc computed inline, and the two id-keyed joins attach a
    * doc-count-sized frame to a pair-count-sized frame — AQE
    * broadcasts whichever side is small. Nothing here outgrows the
    * near-dup pair volume itself at 100 TB. */
  def q219SplitLeakage(s: SparkSession, dir: String): DataFrame = {
    val fp = md5(norm(col("text")))
    val h = md5Hash32(concat(lit("split:"), fp)) % 100L
    val split = Tables.documents(s, dir).filter(col("text").isNotNull)
      .select(col("doc_id"),
        when(h < 80, "train").when(h < 90, "val").otherwise("test")
          .as("split"))
      // both pair-side joins consume the assignment — un-cached, each
      // re-scans text and re-runs the double md5 (round-12 scan audit)
      .persist()
    val pairs = TextOps.ngramJaccardPairs(s, dir, 0.5)
      .select(col("id_a"), col("id_b"))
    pairs
      .join(split.select(col("doc_id").as("id_a"),
        col("split").as("split_a")), Seq("id_a"))
      .join(split.select(col("doc_id").as("id_b"),
        col("split").as("split_b")), Seq("id_b"))
      .groupBy("split_a", "split_b")
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("leaked",
        (col("split_a") =!= col("split_b")).cast(IntegerType))
      .orderBy("split_a", "split_b")
  }

  /** q146's bucket rule in the compact hex-cast spelling (DuckDB
    * parses '0x…'-prefixed hex straight to BIGINT — same value as the
    * strpos polynomial, one line instead of eight). */
  private def SplitHexSql: String =
    """CAST(('0x' || substr(md5('split:' ||
      |  md5(trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g')))), 1, 8))
      |  AS BIGINT) % 100""".stripMargin

  private def SplitLeakageSql: String =
    s"""WITH sp AS (
       |  SELECT doc_id,
       |    CASE WHEN ($SplitHexSql) < 80 THEN 'train'
       |      WHEN ($SplitHexSql) < 90 THEN 'val'
       |      ELSE 'test' END AS split
       |  FROM documents WHERE text IS NOT NULL),
       |grams AS (
       |  SELECT doc_id, lang, CAST(floor(n_chars / 64) AS BIGINT)
       |      AS szbucket,
       |    list_distinct(list_transform(range(1, length(n) - 1),
       |      i -> substring(n, i, 3))) AS g
       |  FROM (SELECT doc_id, lang, n_chars,
       |          trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')) AS n
       |        FROM documents)),
       |pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM grams a JOIN grams b
       |    ON a.lang = b.lang AND a.szbucket = b.szbucket
       |      AND a.doc_id < b.doc_id
       |  WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
       |    / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) >= 0.5)
       |SELECT split_a, split_b, n_pairs,
       |  CASE WHEN split_a <> split_b THEN 1 ELSE 0 END AS leaked
       |FROM (
       |  SELECT sa.split AS split_a, sb.split AS split_b,
       |    count(*) AS n_pairs
       |  FROM pairs p
       |    JOIN sp sa ON sa.doc_id = p.id_a
       |    JOIN sp sb ON sb.doc_id = p.id_b
       |  GROUP BY 1, 2)
       |ORDER BY split_a, split_b""".stripMargin

  // --------------------------------------------- q221 compress ratio

  /** Per-document DEFLATE lengths via `mapPartitions` — a real byte
    * codec (java.util.zip, level 6), so this is genuine
    * partition-batched worker territory like the media decodes in
    * [[MultimodalOps]]: one `Deflater` per partition, reset per row,
    * never an allocation per document. The Deflater holds NATIVE zlib
    * memory, so it is `end()`ed when the partition iterator is
    * exhausted rather than left to finalization — on a long-lived
    * executor running many queries, un-ended deflaters would
    * accumulate off-heap until a GC happens to collect them. */
  private[queries] def withDeflateLen(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)]
      .mapPartitions { iter =>
        val deflater = new java.util.zip.Deflater(6, false)
        val buf = new Array[Byte](1 << 16)
        new Iterator[(Long, String, Int, Int)] {
          override def hasNext: Boolean = {
            val more = iter.hasNext
            if (!more) deflater.end()
            more
          }
          override def next(): (Long, String, Int, Int) = {
            val (id, lang, text) = iter.next()
            val bytes = text.getBytes("UTF-8")
            deflater.reset()
            deflater.setInput(bytes)
            deflater.finish()
            var zlen = 0
            while (!deflater.finished()) zlen += deflater.deflate(buf)
            (id, lang, bytes.length, zlen)
          }
        }
      }
      .toDF("doc_id", "lang", "raw_len", "zip_len")
  }

  /** q221 — compression-ratio quality signal (the CCNet/RefinedWeb
    * family's cheap text filter): highly compressible text is
    * boilerplate/repetition, nearly incompressible text is noise; both
    * tails get filtered before training. Reports per language the mean
    * DEFLATE ratio in ppm plus both tail counts (boilerplate <45%,
    * noise >85% of raw size). Registered rows-only — no SQL engine
    * exposes DEFLATE — with the spec pinning the codec's behavioral
    * contract instead (see RetrievalOpsSpec: repetition compresses
    * far below 45%, hex noise sits above 85%, ratios bounded).
    *
    * Scale shape: embarrassingly parallel partition-local codec work
    * (the expensive stage), then a languages-sized aggregate. Ratio
    * arithmetic is integer ppm so the aggregate is order-free. */
  def q221CompressRatio(s: SparkSession, dir: String): DataFrame =
    withDeflateLen(Tables.documents(s, dir).filter(col("text").isNotNull)
        .filter(length(col("text")) > 0))
      .withColumn("ratio_ppm",
        (col("zip_len").cast(LongType) * lit(1000000L) / col("raw_len"))
          .cast(LongType))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        (sum(col("ratio_ppm")) / count(lit(1))).cast(LongType)
          .as("avg_ratio_ppm"),
        sum((col("ratio_ppm") < 450000L).cast(LongType))
          .as("n_boilerplate"),
        sum((col("ratio_ppm") > 850000L).cast(LongType)).as("n_noise"))
      .orderBy("lang")

  // --------------------------------------------- q228 epoch shuffle

  /** q228 — deterministic per-epoch training shuffle: every epoch
    * orders the corpus by `md5(epoch:doc_id)` — a different, fully
    * reproducible permutation each epoch with zero stored state, the
    * standard trick for resumable distributed training order (the
    * sort key is computable from (epoch, id) alone, so any worker can
    * reconstruct its slice after preemption). Emits the first 10
    * positions of epochs 0–2 for verification; the full-order
    * production form is the same expression as a sort key.
    *
    * Scale: the per-epoch order is a total sort in production
    * (rangepartitioned, as any global sort); the audit keeps 10 rows
    * per epoch via the [[graft.functions.BottomKByKey]] bounded-heap
    * aggregate — NOT a window. `row_number() OVER (PARTITION BY
    * epoch ...)` with 3 epochs means 3 shuffle partitions each sorting
    * the whole corpus in one task (the classic low-cardinality
    * window-partition parallelism collapse); the aggregate ships at
    * most 10 rows per epoch per map task and merges associatively, so
    * the plan has no per-epoch sort at all. Exact: bottom-k under the
    * (full digest, doc_id) total order merges without error, so the
    * DuckDB window oracle still matches bit-for-bit. */
  def q228EpochShuffle(s: SparkSession, dir: String): DataFrame = {
    val epochs = s.range(0, 3).select(col("id").cast(IntegerType).as("epoch"))
    val bottomk = udaf(graft.functions.BottomKByKey(10),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[graft.functions.KeyedId]())
    Tables.documents(s, dir).select(col("doc_id"))
      .crossJoin(epochs)
      .withColumn("sk", md5(concat(col("epoch").cast("string"), lit(":"),
        col("doc_id").cast("string"))))
      .groupBy("epoch")
      .agg(bottomk(col("sk"), col("doc_id")).as("head"))
      .select(col("epoch"), posexplode(col("head")).as(Seq("pos0", "e")))
      .select(col("epoch"), (col("pos0") + 1).cast(LongType).as("pos"),
        col("e.id").as("doc_id"))
      .orderBy("epoch", "pos")
  }

  private val EpochShuffleSql: String =
    """SELECT epoch, pos, doc_id FROM (
      |  SELECT epoch, doc_id,
      |    row_number() OVER (PARTITION BY epoch ORDER BY
      |      md5(CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)),
      |      doc_id) AS pos
      |  FROM documents, (SELECT CAST(unnest(range(0, 3)) AS INTEGER)
      |    AS epoch))
      |WHERE pos <= 10 ORDER BY epoch, pos""".stripMargin

  // ------------------------------------------- q237 rater agreement

  /** q237 — Cohen's κ between two deterministic quality raters: rater
    * A flags documents longer than 297 chars, rater B flags documents
    * with more than 30 'e' occurrences (a cheap proxy pair standing in
    * for two labeling heuristics/model versions). κ = (p_o − p_e) /
    * (1 − p_e) corrects raw agreement for chance — the
    * inter-annotator-agreement gate every labeling pipeline applies
    * before trusting labels for training. Raw agreement between
    * length-correlated raters is high by construction; κ reports how
    * much of it is real.
    *
    * Exactness: the 2×2 confusion cells are exact integer counts from
    * one scan; p_o, p_e, κ are one fixed double expression over them
    * (guarded for the degenerate p_e = 1 and empty-input cases). */
  def q237RaterAgreement(s: SparkSession, dir: String): DataFrame = {
    val a = (length(col("text")) > 297).cast("long")
    val b = ((length(col("text")) -
      length(regexp_replace(col("text"), "e", ""))) > 30).cast("long")
    val m = Tables.documents(s, dir).filter(col("text").isNotNull)
      .select(a.as("a"), b.as("b"))
      .agg(count(lit(1)).as("n"),
        sum(col("a") * col("b")).as("n11"),
        sum(col("a") * (lit(1L) - col("b"))).as("n10"),
        sum((lit(1L) - col("a")) * col("b")).as("n01"),
        sum((lit(1L) - col("a")) * (lit(1L) - col("b"))).as("n00"))
    val n = col("n").cast("double")
    val po = (col("n11") + col("n00")).cast("double") / n
    val pe = ((col("n11") + col("n10")).cast("double") / n) *
      ((col("n11") + col("n01")).cast("double") / n) +
      ((col("n01") + col("n00")).cast("double") / n) *
        ((col("n10") + col("n00")).cast("double") / n)
    m.select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
      when(col("n") > 0, po).as("po"),
      when(col("n") > 0, pe).as("pe"),
      when(col("n") > 0 && pe =!= lit(1.0), (po - pe) / (lit(1.0) - pe))
        .as("kappa"))
  }

  private val RaterAgreementSql: String =
    """SELECT n, n11, n10, n01, n00,
      |  CASE WHEN n > 0 THEN CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE)
      |    END AS po,
      |  CASE WHEN n > 0 THEN
      |    (CAST(n11 + n10 AS DOUBLE) / CAST(n AS DOUBLE)) *
      |      (CAST(n11 + n01 AS DOUBLE) / CAST(n AS DOUBLE)) +
      |    (CAST(n01 + n00 AS DOUBLE) / CAST(n AS DOUBLE)) *
      |      (CAST(n10 + n00 AS DOUBLE) / CAST(n AS DOUBLE))
      |    END AS pe,
      |  CASE WHEN n > 0 AND
      |    ((CAST(n11 + n10 AS DOUBLE) / CAST(n AS DOUBLE)) *
      |      (CAST(n11 + n01 AS DOUBLE) / CAST(n AS DOUBLE)) +
      |    (CAST(n01 + n00 AS DOUBLE) / CAST(n AS DOUBLE)) *
      |      (CAST(n10 + n00 AS DOUBLE) / CAST(n AS DOUBLE))) <> 1e0
      |  THEN
      |    (CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE) -
      |      ((CAST(n11 + n10 AS DOUBLE) / CAST(n AS DOUBLE)) *
      |        (CAST(n11 + n01 AS DOUBLE) / CAST(n AS DOUBLE)) +
      |      (CAST(n01 + n00 AS DOUBLE) / CAST(n AS DOUBLE)) *
      |        (CAST(n10 + n00 AS DOUBLE) / CAST(n AS DOUBLE))))
      |    / (1e0 - ((CAST(n11 + n10 AS DOUBLE) / CAST(n AS DOUBLE)) *
      |        (CAST(n11 + n01 AS DOUBLE) / CAST(n AS DOUBLE)) +
      |      (CAST(n01 + n00 AS DOUBLE) / CAST(n AS DOUBLE)) *
      |        (CAST(n10 + n00 AS DOUBLE) / CAST(n AS DOUBLE))))
      |  END AS kappa
      |FROM (
      |  SELECT count(*) AS n,
      |    CAST(sum(a * b) AS BIGINT) AS n11,
      |    CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
      |    CAST(sum((1 - a) * b) AS BIGINT) AS n01,
      |    CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00
      |  FROM (
      |    SELECT CASE WHEN len(text) > 297 THEN 1 ELSE 0 END AS a,
      |      CASE WHEN len(text) - len(replace(text, 'e', '')) > 30
      |        THEN 1 ELSE 0 END AS b
      |    FROM documents WHERE text IS NOT NULL))""".stripMargin

  // ------------------------------------------- q230 novelty rate

  private val NovK = 5   // char-gram length for the novelty measure
  // Rabin-Karp rolling-polynomial constants — aliases of the ONE
  // definition next to the kernels ([[graft.functions.RabinHash]]),
  // so the declarative twins and oracle spellings can never drift
  // from the native code paths.
  private[queries] val RkBase = graft.functions.RabinHash.Base
  private[queries] val RkMod = graft.functions.RabinHash.Mod

  /** q230 — held-out n-gram novelty rate: what fraction of the
    * val/test splits' 5-gram instances (and distinct 5-grams) never
    * appear in the train split. The memorization-adjacent hygiene
    * metric: a held-out set whose n-grams are mostly present in train
    * measures recall of the training data, not generalization —
    * novelty quantifies how much of the eval signal is actually new.
    * Complements q219 (pair-level near-dup leakage) at token grain.
    *
    * Scale shape: gram instances collapse to the (split, g, count)
    * histogram in ONE map-side-combined aggregate off ONE corpus scan
    * (round 12 — the prior per-consumer spelling re-ran the scan and
    * kernel six times), then a hash LEFT ANTI join at DISTINCT-gram
    * grain recovers instance counts via the weights; gram generation
    * is the codegen'd position-explode (never a per-token lambda).
    * The join/distinct
    * key is NOT the raw gram string but a Rabin–Karp polynomial over
    * its code points as a BIGINT: every downstream exchange ships
    * 8-byte longs instead of variable-length strings, the
    * distinct/anti-join compare fixed-width integers, and the keys
    * come from the native rolling kernel (one codegen'd O(len) pass
    * per doc; the explode emits bare BIGINTs). Measured at sf0.1:
    * 0.9-1.3 s via the kernel, vs 1.2-1.7 s for the declarative
    * split-array + element_at polynomial, 3.5 s for raw 5-char
    * string keys (r9), and 5.7 s for a 60-bit md5-prefix key (one
    * digest + hex parse per gram instance — hash cost swamped the
    * shuffle-width saving, so md5 was rejected on measurement). The
    * base is a prime above the Unicode ceiling (no two code points
    * alias within a step) and the 41-bit modulus keeps every
    * intermediate below 2⁶³; ~10⁶ distinct grams expect <1 colliding
    * pair, the oracle computes the identical polynomial, so
    * verification stays exact. */
  /** The DECLARATIVE twin of [[graft.functions.RabinGramKeys]] — the
    * element_at polynomial over a split code-point array. Exists for
    * the bit-equality spec only: (value) rows of gram keys for any
    * single-text-column frame. */
  private[graft] def noveltyGramsDeclarative(texts: DataFrame): DataFrame = {
    val gramKey = (0 until NovK).foldLeft(lit(0L)) { (acc, j) =>
      pmod(acc * lit(RkBase) +
        element_at(col("cp"), col("i") + lit(j)),
        lit(RkMod))
    }
    texts
      .select(transform(split(col("text"), ""), c => ascii(c).cast(LongType))
        .as("cp"))
      .select(explode(when(size(col("cp")) >= NovK,
        sequence(lit(1), size(col("cp")) - lit(NovK - 1)))
        .otherwise(array())).as("i"),
        col("cp"))
      .select(gramKey.as("g"))
  }

  def q230NoveltyRate(s: SparkSession, dir: String): DataFrame = {
    val fp = md5(norm(col("text")))
    val h = md5Hash32(concat(lit("split:"), fp)) % 100L
    val docs = Tables.documents(s, dir).filter(col("text").isNotNull)
      .select(col("doc_id"),
        when(h < 80, "train").when(h < 90, "val").otherwise("test")
          .as("split"),
        norm(col("text")).as("n"))
    // gram key: (((c0·B + c1) % M)·B + c2) % M … via the native
    // rolling kernel ([[graft.functions.RabinGramKeys]] — one
    // codegen'd O(len) pass per doc emitting the full key array, so
    // the explode carries bare BIGINTs and no payload column). The
    // declarative split-array + element_at twin stays as
    // [[noveltyGramsDeclarative]] for the bit-equality spec and the
    // oracle spelling.
    graft.functions.GraftFunctions.register(s)
    // ONE corpus pass: gram instances collapse to the (split, g,
    // count) histogram immediately (map-side combined), and that
    // narrow distinct-gram-sized frame — persisted for its three
    // consumers — carries every downstream statistic by the weight
    // identity: instance counts are Σ c, distinct counts are row
    // counts. The previous spelling re-derived the instance frame
    // per consumer (measured: SIX text scans + six Rabin kernel
    // passes + two instance-grain anti-joins in the executed plan —
    // the round-12 scan-multiplicity probe); this one scans text
    // once, runs the kernel once, and anti-joins once at gram grain.
    val gcnt = docs
      .select(col("split"),
        explode(call_function("rabin_gram_keys", col("n"), lit(NovK)))
          .as("g"))
      .groupBy("split", "g").agg(count(lit(1)).as("c"))
      .persist()
    val trainSet = gcnt.filter(col("split") === "train").select("g")
    val held = gcnt.filter(col("split") =!= "train")
    val novel = held.join(trainSet, Seq("g"), "left_anti")
    val heldStats = held.groupBy("split")
      .agg(sum(col("c")).as("n_grams"),
        count(lit(1)).as("n_distinct"))
    val novelStats = novel.groupBy("split")
      .agg(sum(col("c")).as("n_novel"),
        count(lit(1)).as("n_distinct_novel"))
    heldStats.join(novelStats, Seq("split"), "left")
      .select(col("split"), col("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        col("n_distinct"),
        coalesce(col("n_distinct_novel"), lit(0L)).as("n_distinct_novel"),
        floor(coalesce(col("n_novel"), lit(0L)).cast("double") /
          col("n_grams").cast("double") * lit(1e6)).cast("long")
          .as("novelty_ppm"))
      .orderBy("split")
  }

  private def NoveltyRateSql: String =
    s"""WITH docs AS (
       |  SELECT doc_id,
       |    CASE WHEN ($SplitHexSql) < 80 THEN 'train'
       |      WHEN ($SplitHexSql) < 90 THEN 'val'
       |      ELSE 'test' END AS split,
       |    ${normSql()} AS n
       |  FROM documents WHERE text IS NOT NULL),
       |grams AS (
       |  SELECT split, ${(0 until NovK).foldLeft("CAST(0 AS BIGINT)") {
            (acc, j) =>
              s"(($acc * $RkBase + ord(substr(n, CAST(i AS INTEGER) + $j, 1)))" +
                s" % $RkMod)"
          }} AS g
       |  FROM (SELECT split, n,
       |          unnest(range(1, len(n) - ${NovK - 2})) AS i
       |        FROM docs WHERE len(n) >= $NovK)),
       |train_set AS (
       |  SELECT DISTINCT g FROM grams WHERE split = 'train'),
       |held AS (SELECT * FROM grams WHERE split <> 'train'),
       |novel AS (
       |  SELECT h.split, h.g FROM held h
       |  WHERE NOT EXISTS (SELECT 1 FROM train_set t WHERE t.g = h.g))
       |SELECT h.split,
       |  count(*) AS n_grams,
       |  coalesce((SELECT count(*) FROM novel v
       |    WHERE v.split = h.split), 0) AS n_novel,
       |  count(DISTINCT h.g) AS n_distinct,
       |  coalesce((SELECT count(DISTINCT v.g) FROM novel v
       |    WHERE v.split = h.split), 0) AS n_distinct_novel,
       |  CAST(floor(CAST(coalesce((SELECT count(*) FROM novel v
       |      WHERE v.split = h.split), 0) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) * 1e6) AS BIGINT) AS novelty_ppm
       |FROM held h GROUP BY h.split ORDER BY h.split""".stripMargin

  // ---------------------------------------- q229 negative sampling

  /** q229 — deterministic negative sampling for contrastive training
    * (the in-batch-negatives / hard-negative-mining data step): for
    * each anchor vector (vec_id < 20), pick 3 reproducible negatives —
    * candidates with a DIFFERENT label, ranked by md5(anchor:cand).
    * Hash-ranking makes the draw uniform over eligible candidates,
    * stateless, and identically reconstructible by any worker — the
    * property that lets a preempted trainer resume mid-epoch without
    * a stored sample table.
    *
    * Scale shape: anchors broadcast against one candidate scan (the
    * q40 discipline); the per-anchor bottom-3 rides the
    * [[graft.functions.BottomKByKeyRow]] bounded heap (cand_label as
    * the payload) — a per-anchor window would hash every eligible
    * candidate into 20 single-task sorts (the round-11 census
    * collapse); the heap ships ≤3 rows per anchor per map task. */
  def q229NegativeSampling(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val anchors = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("anchor_id"), col("label").as("anchor_label"))
    val cands = emb.select(col("vec_id").as("cand_id"),
      col("label").as("cand_label"))
    val bottomk = udaf(graft.functions.BottomKByKeyRow(3),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[graft.functions.KeyedRow]())
    cands.crossJoin(broadcast(anchors))
      .filter(col("cand_label") =!= col("anchor_label"))
      .withColumn("sk", md5(concat(col("anchor_id").cast("string"),
        lit(":"), col("cand_id").cast("string"))))
      .groupBy("anchor_id")
      .agg(bottomk(col("sk"), col("cand_id"),
        col("cand_label").cast(LongType)).as("neg"))
      .select(col("anchor_id"), posexplode(col("neg")).as(Seq("pos0", "e")))
      .select(col("anchor_id"), (col("pos0") + 1).cast(LongType).as("rk"),
        col("e.id").as("cand_id"),
        col("e.payload").cast("int").as("cand_label"))
      .orderBy("anchor_id", "rk")
  }

  private val NegativeSamplingSql: String =
    """SELECT anchor_id, rk, cand_id, cand_label FROM (
      |  SELECT a.vec_id AS anchor_id, c.vec_id AS cand_id,
      |    c.label AS cand_label,
      |    row_number() OVER (PARTITION BY a.vec_id ORDER BY
      |      md5(CAST(a.vec_id AS VARCHAR) || ':' ||
      |        CAST(c.vec_id AS VARCHAR)), c.vec_id) AS rk
      |  FROM embeddings a, embeddings c
      |  WHERE a.vec_id < 20 AND c.label <> a.label)
      |WHERE rk <= 3 ORDER BY anchor_id, rk""".stripMargin

  // --------------------------------------------- q220 DP noisy counts

  /** q220 — ε-differentially-private count release (Dwork et al.,
    * TCC'06): per-language document counts released through the
    * Laplace mechanism at ε=1, sensitivity 1 — the third member of
    * the privacy family (q137 k-anonymity, q216 l-diversity audit the
    * data; this PERTURBS the release). "Randomness" follows the
    * repo-wide discipline: the uniform is md5-derived
    * ((hash32+0.5)/2³², never 0, ½, or 1), pushed through the exact
    * inverse-CDF sgn(u−½)·(−ln(1−2|u−½|)), and the single
    * transcendental is floor-quantized to integer microunits so the
    * released value is a deterministic function of integers. Seeded
    * DP noise is exactly how production pipelines make DP releases
    * replayable/testable; swap the salt for entropy to deploy.
    *
    * Scale: one groupBy(lang) count; the mechanism is per-GROUP
    * arithmetic on the (tiny) aggregate frame. */
  def q220DpCounts(s: SparkSession, dir: String): DataFrame = {
    val c = md5Hash32(concat(lit("dp:"), col("lang")))
      .cast(DoubleType).plus(lit(0.5)).divide(lit(4294967296.0))
      .minus(lit(0.5))
    val noise = when(c >= 0, -log(lit(1.0) - lit(2.0) * c))
      .otherwise(log(lit(1.0) + lit(2.0) * c))
    Tables.documents(s, dir)
      .groupBy("lang").agg(count(lit(1)).as("n_docs"))
      .withColumn("noise_micro", floor(noise * lit(1e6)))
      .select(col("lang"), col("n_docs"), col("noise_micro"),
        ((col("n_docs") * lit(1e6) + col("noise_micro")) / lit(1e6))
          .as("released"),
        lit(1.0).as("epsilon"))
      .orderBy("lang")
  }

  private def DpCountsSql: String =
    """WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
      |u AS (
      |  SELECT lang, n_docs,
      |    CAST(('0x' || substr(md5('dp:' || lang), 1, 8)) AS BIGINT)
      |      AS h32
      |  FROM c),
      |n AS (
      |  SELECT lang, n_docs,
      |    CAST(floor((CASE
      |      WHEN (CAST(h32 AS DOUBLE) + 5e-1) / 4294967296e0 - 5e-1 >= 0
      |      THEN -ln(1e0 - 2e0 *
      |        ((CAST(h32 AS DOUBLE) + 5e-1) / 4294967296e0 - 5e-1))
      |      ELSE ln(1e0 + 2e0 *
      |        ((CAST(h32 AS DOUBLE) + 5e-1) / 4294967296e0 - 5e-1))
      |      END) * 1e6) AS BIGINT) AS noise_micro
      |  FROM u)
      |SELECT lang, n_docs, noise_micro,
      |  (n_docs * 1e6 + noise_micro) / 1e6 AS released,
      |  1e0 AS epsilon
      |FROM n ORDER BY lang""".stripMargin

  // ---------------------------------------------- q218 rendezvous hash

  /** HRW hash of `key` on `node`: md5-derived so the oracle computes
    * the identical 32-bit value. */
  private def hrwHash(key: Column, node: Int): Column =
    conv(substring(md5(concat(key.cast("string"), lit("#"),
      lit(node.toString))), 1, 8), 16, 10).cast(LongType)

  /** q218 — rendezvous (highest-random-weight) sharding audit (Thaler
    * & Ravishankar, 1996): each key lands on argmax_node
    * hash(key, node). The property that makes HRW the sharding rule
    * for stateful stores: growing the cluster from 5 to 6 nodes moves
    * ONLY the keys the new node now wins (≈1/6, and every mover's
    * destination IS the new node) — mod-N hashing (q100's shard
    * assignment) would reshuffle ~5/6 of all keys. Output: per-shard
    * key counts and how many keys the expansion steals from it.
    *
    * Scale shape: the argmax is a 6-element array_max of (hash, node)
    * structs evaluated INLINE per row — no shuffle, no per-key group;
    * the only shuffle is the final 5-group count. Ties break to the
    * higher node on both engines ((h, node) struct order here, `ORDER
    * BY hv DESC, node DESC` in the oracle). */
  /** Per-key shard assignments before/after the 5→6 expansion — the
    * doc-grain frame q218 aggregates and the spec audits key-by-key. */
  private[queries] def rendezvousPerDoc(s: SparkSession, dir: String): DataFrame = {
    def shard(nNodes: Int): Column =
      array_max(array((0 until nNodes).map(n =>
        struct(hrwHash(col("doc_id"), n).as("h"),
          lit(n).as("node"))): _*)).getField("node")
    Tables.documents(s, dir)
      .select(col("doc_id"), shard(5).as("shard5"), shard(6).as("shard6"))
  }

  def q218Rendezvous(s: SparkSession, dir: String): DataFrame = {
    rendezvousPerDoc(s, dir)
      .groupBy("shard5")
      .agg(count(lit(1)).as("n_docs"),
        sum((col("shard6") =!= col("shard5")).cast(LongType)).as("n_moved"))
      .orderBy("shard5")
  }

  private val RendezvousSql: String =
    """WITH h AS (
      |  SELECT d.doc_id, CAST(n.node AS INTEGER) AS node,
      |    CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '#' ||
      |      CAST(n.node AS VARCHAR)), 1, 8)) AS BIGINT) AS hv
      |  FROM documents d, (SELECT unnest(range(0, 6)) AS node) n),
      |s5 AS (
      |  SELECT doc_id, node AS shard5 FROM (
      |    SELECT doc_id, node, row_number() OVER (PARTITION BY doc_id
      |      ORDER BY hv DESC, node DESC) AS rk
      |    FROM h WHERE node < 5) WHERE rk = 1),
      |s6 AS (
      |  SELECT doc_id, node AS shard6 FROM (
      |    SELECT doc_id, node, row_number() OVER (PARTITION BY doc_id
      |      ORDER BY hv DESC, node DESC) AS rk
      |    FROM h) WHERE rk = 1)
      |SELECT shard5, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN shard6 <> shard5 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_moved
      |FROM s5 JOIN s6 USING (doc_id)
      |GROUP BY shard5 ORDER BY shard5""".stripMargin

  // --------------------------------------------------- q216 l-diversity

  /** q216 — l-diversity audit (Machanavajjhala et al., ICDE'06), the
    * companion to q137's k-anonymity: a quasi-identifier group can be
    * large (k-anonymous) yet still leak if everyone in it shares the
    * same sensitive value. Quasi-identifier = (nation, market
    * segment) as in q137; sensitive attribute = the account-balance
    * band floor(acctbal/2000). Reports per-group size and distinct-
    * sensitive-value count l, flags groups below l=3, and carries the
    * table-wide min as the release's l-diversity.
    *
    * Scale: one groupBy on the QI key with a distinct-count — the
    * same two-level partial aggregation as any count-distinct; the
    * global-min window runs over the (tiny) group frame, never rows. */
  def q216LDiversity(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .withColumn("band", floor(col("c_acctbal") / lit(2000.0)))
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("grp_n"),
        countDistinct(col("band")).as("l"))
      .withColumn("is_risky", (col("l") < 3).cast(IntegerType))
      .withColumn("l_diversity", min(col("l")).over(Window.partitionBy()))
      .orderBy("c_nationkey", "c_mktsegment")

  private val LDiversitySql: String =
    """SELECT c_nationkey, c_mktsegment, grp_n, l,
      |  CASE WHEN l < 3 THEN 1 ELSE 0 END AS is_risky,
      |  min(l) OVER () AS l_diversity
      |FROM (
      |  SELECT c_nationkey, c_mktsegment, count(*) AS grp_n,
      |    count(DISTINCT CAST(floor(c_acctbal / 2000.0) AS BIGINT)) AS l
      |  FROM customer GROUP BY 1, 2)
      |ORDER BY c_nationkey, c_mktsegment""".stripMargin

  // ------------------------------------------------- q138 mixture sample

  /** q138 — temperature-flattened language mixture (the multilingual
    * rebalancing rule from the mBERT/XLM-R lineage: sample language l
    * with probability ∝ p_l^α, here α = 1/2): per-language keep-rates
    * derived from corpus shares, applied as the deterministic
    * content-hash Bernoulli q105 uses. Exactness: α = 1/2 makes the
    * weight `sqrt(share)` — sqrt is IEEE-correctly-rounded in BOTH
    * engines (a pow(x, 0.7) would risk 1-ulp libm drift); the weight
    * is floor-quantized to an exact BIGINT before the (order-
    * dependent) cross-language sum, so rates and the ppm cutoff are
    * bit-identical. Per-doc work is one hash + one broadcast-joined
    * comparison — embarrassingly parallel at any scale. */
  def q138MixtureSample(s: SparkSession, dir: String): DataFrame = {
    val all = Window.partitionBy()
    val d = Tables.documents(s, dir)
      .filter(col("text").isNotNull)
      .select(col("lang"), col("doc_id"),
        (md5Hash32(concat(lit("mix:"), col("doc_id").cast("string")))
          % lit(1000000L)).as("h"))
    val st = d.groupBy("lang").agg(count(lit(1)).as("n_docs"))
      .withColumn("share", col("n_docs").cast(DoubleType)
        / sum(col("n_docs")).over(all).cast(DoubleType))
      .withColumn("w_fp",
        floor(sqrt(col("share")) * lit(1e9)).cast(LongType))
      .withColumn("rate", least(lit(1.0),
        (col("w_fp").cast(DoubleType)
          / sum(col("w_fp")).over(all).cast(DoubleType)) / col("share")))
      .withColumn("rate_ppm", floor(col("rate") * lit(1e6)).cast(LongType))
      .select("lang", "n_docs", "rate_ppm")
    val kept = d.join(broadcast(st), Seq("lang"))
      .filter(col("h") < col("rate_ppm"))
      .groupBy("lang").agg(count(lit(1)).as("n_kept"))
    st.join(kept, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"), col("rate_ppm"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .orderBy("lang")
  }

  // -------------------------------------------------- q140 corpus diff

  /** q140 — corpus snapshot diff: the audit a versioned training-data
    * build runs between two corpus generations (what q100's diffable
    * content-addressed sharding exists FOR): full-outer join on doc_id
    * comparing content fingerprints, classifying every document as
    * added / removed / modified / unchanged, reported per language.
    * The v2 snapshot is derived deterministically in BOTH engines from
    * the same table (5% dropped, 10% of survivors edited, 4% cloned as
    * new ids via the md5-hash Bernoulli), so the diff itself — not the
    * fixture — is what the oracle checks. At 100 TB both sides hash
    * down to (doc_id, fp) before the one co-partitioned shuffle join;
    * text never moves. */
  def q140CorpusDiff(s: SparkSession, dir: String): DataFrame = {
    def h(tag: String) =
      md5Hash32(concat(lit(tag), col("doc_id").cast("string")))
    val v1 = Tables.documents(s, dir).filter(col("text").isNotNull)
      .select(col("doc_id"), col("lang"), col("text"))
    val kept = v1.filter(h("v2drop:") % 20 =!= 0)
    val v2base = kept.withColumn("text",
      when(h("v2mod:") % 10 === 0, concat(col("text"), lit(" [edited]")))
        .otherwise(col("text")))
    val added = v1.filter(h("v2add:") % 25 === 0)
      .select((col("doc_id") + lit(10000000L)).as("doc_id"),
        col("lang"), col("text"))
    val v2 = v2base.unionByName(added)
    val a = v1.select(col("doc_id"), col("lang").as("lang_a"),
      md5(col("text")).as("fp_a"))
    val b = v2.select(col("doc_id"), col("lang").as("lang_b"),
      md5(col("text")).as("fp_b"))
    a.join(b, Seq("doc_id"), "full_outer")
      .select(coalesce(col("lang_a"), col("lang_b")).as("lang"),
        when(col("fp_a").isNull, "added")
          .when(col("fp_b").isNull, "removed")
          .when(col("fp_a") =!= col("fp_b"), "modified")
          .otherwise("unchanged").as("status"))
      .groupBy("lang", "status")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "status")
  }

  // --------------------------------------------------- q145 drift PSI

  /** q145 — population stability index between corpus snapshots: the
    * drift alarm a production data build runs per release. v2 is
    * q140's deterministic derivation (5% dropped, 10% edited — the
    * edit suffix shifts document LENGTH, which is exactly the
    * monitored feature); lengths bin into 8 fixed 256-char buckets,
    * shares use add-one smoothing so empty bins stay finite, and
    * PSI = Σ (p−q)·ln(p/q). Exactness: ln(p/q) decomposes into ln of
    * two INTEGER products ((a+1)(B+8) vs (b+1)(A+8)), each
    * floor-quantized per the object-doc discipline, so `term_scaled`
    * and `psi_scaled` are exact BIGINTs. Two count-aggregate scans +
    * an 8-row join — nothing data-sized moves at any corpus scale. */
  def q145DriftPsi(s: SparkSession, dir: String): DataFrame = {
    def h(tag: String) =
      md5Hash32(concat(lit(tag), col("doc_id").cast("string")))
    val v1 = Tables.documents(s, dir).filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
    val kept = v1.filter(h("v2drop:") % 20 =!= 0)
    val v2base = kept.withColumn("text",
      when(h("v2mod:") % 10 === 0, concat(col("text"), lit(" [edited]")))
        .otherwise(col("text")))
    val added = v1.filter(h("v2add:") % 25 === 0)
      .select((col("doc_id") + lit(10000000L)).as("doc_id"), col("text"))
    val v2 = v2base.unionByName(added)
    def binned(df: DataFrame, cnt: String): DataFrame =
      df.select(least(floor(length(col("text")) / 256), lit(7))
        .cast("int").as("bin"))
        .groupBy("bin").agg(count(lit(1)).as(cnt))
    val all = Window.partitionBy()
    val lnQ = (c: Column) =>
      floor(log(c.cast(DoubleType)) * 1e6).cast(LongType)
    s.range(0, 8).select(col("id").cast("int").as("bin"))
      .join(binned(v1, "n_v1"), Seq("bin"), "left")
      .join(binned(v2, "n_v2"), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_v1"), lit(0L)).as("n_v1"),
        coalesce(col("n_v2"), lit(0L)).as("n_v2"))
      .withColumn("tot1", sum(col("n_v1")).over(all))
      .withColumn("tot2", sum(col("n_v2")).over(all))
      .withColumn("term_scaled", floor(
        ((col("n_v1") + 1).cast(DoubleType) / (col("tot1") + 8).cast(DoubleType)
          - (col("n_v2") + 1).cast(DoubleType) / (col("tot2") + 8).cast(DoubleType))
          * (lnQ((col("n_v1") + 1) * (col("tot2") + 8))
            - lnQ((col("n_v2") + 1) * (col("tot1") + 8))).cast(DoubleType))
        .cast(LongType))
      .withColumn("psi_scaled", sum(col("term_scaled")).over(all))
      .select(col("bin"), col("n_v1"), col("n_v2"), col("term_scaled"),
        col("psi_scaled"),
        (col("psi_scaled").cast(DoubleType) / lit(1e6)).as("psi"))
      .orderBy("bin")
  }

  // -------------------------------------------------- q146 train split

  /** q146 — leakage-safe train/val/test split: the split key is the
    * CONTENT fingerprint (md5 of normalized text), not the doc id, so
    * exact duplicates always land in the same split — the discipline
    * that keeps eval sets uncontaminated (an id-keyed split leaks a
    * training dup's twin into test; with this keying it cannot, by
    * construction). 80/10/10 via the salted md5-Bernoulli the
    * q100/q105/q58 family uses; per-doc work is two hashes + one
    * keyed aggregate — embarrassingly parallel. */
  def q146TrainSplit(s: SparkSession, dir: String): DataFrame = {
    val fp = md5(norm(col("text")))
    val h = md5Hash32(concat(lit("split:"), fp)) % 100L
    Tables.documents(s, dir).filter(col("text").isNotNull)
      .select(col("lang"), fp.as("fp"),
        when(h < 80, "train").when(h < 90, "val").otherwise("test")
          .as("split"))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("fp")).as("n_fps"))
      .orderBy("lang", "split")
  }

  /** q164 — DSIR importance weighting (Data Selection via Importance
    * Resampling, Xie et al. 2023 — the published method modern
    * pretraining curation uses to up-sample target-domain-like data):
    * documents are featurized as HASHED BIGRAM counts (256 buckets via
    * the md5Hash32 discipline), two add-one-smoothed bucket LMs are
    * fit — the TARGET domain (here: `lang='en'`, the stand-in for
    * "high-quality domain sample") and the RAW corpus — and each doc
    * scores Σ_b n_b·(ln p̂_target[b] − ln p̂_raw[b]), the
    * log-likelihood ratio under the two LMs. Top-50 by weight is the
    * selected batch.
    *
    * Exactness: the only transcendental is ln over INTEGER-valued
    * doubles (counts + smoothing), floor-quantized to 1e6 microunits —
    * the q145/q131 idiom both engines agree on bit-for-bit — so every
    * per-doc weight is an exact BIGINT dot product. Scale shape: ONE
    * corpus-sized shuffle (doc × bucket partial counts, map-side
    * combined, ≤256 rows per doc); both LMs are 256-row aggregates OF
    * that frame (model-sized, broadcast back); scoring is a broadcast
    * join + keyed sum; top-50 is TakeOrdered. At 100 TB the per-doc
    * count frame is the only big intermediate and it shuffles once. */
  def q164DsirWeights(s: SparkSession, dir: String): DataFrame = {
    val B = 256
    // Materialize the token array BEFORE the bigram lambda: expressions
    // captured inside a higher-order-function body are re-evaluated per
    // element, so inlining `split(norm(text))` here would re-run the
    // regex normalization O(tokens) times per doc (O(n²) per row — a
    // measured 14 s at sf0.1 vs ~1 s with the projection boundary).
    // CollapseProject keeps the boundary because `toks` is consumed
    // more than once by a non-cheap producer.
    val toks = col("toks")
    val perDoc = Tables.documents(s, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("lang"),
        split(norm(col("text")), " ").as("toks"))
      .filter(size(toks) >= 2)
      .select(col("doc_id"), col("lang"),
        explode(transform(sequence(lit(1), size(toks) - 1),
          i => concat(element_at(toks, i), lit(" "),
            element_at(toks, i + 1)))).as("bg"))
      .select(col("doc_id"), col("lang"),
        pmod(md5Hash32(concat(lit("dsir:"), col("bg"))), lit(B.toLong))
          .as("b"))
      .groupBy("doc_id", "lang", "b")
      .agg(count(lit(1)).as("n"))
      // 3 consumers (target LM, raw LM, scoring join): pay the
      // corpus-sized explode+shuffle once; the frame is ≤256 rows/doc
      .persist()
    // bucket LMs: 256-key aggregates of the per-doc frame (never a
    // second corpus scan); missing buckets smooth to ln(1)
    val buckets = s.range(B).select(col("id").as("b"))
    def lm(cnts: DataFrame, tag: String): DataFrame = {
      val tot = cnts.agg(sum(col("nb")).as("tot"))
      buckets.join(cnts, Seq("b"), "left")
        .select(col("b"), coalesce(col("nb"), lit(0L)).as("nb"))
        .crossJoin(broadcast(tot))
        .select(col("b"),
          (floor(log(coalesce(col("nb"), lit(0L)).cast(DoubleType) + 1.0)
            * 1e6).cast(LongType)
            - floor(log((coalesce(col("tot"), lit(0L)) + B)
              .cast(DoubleType)) * 1e6).cast(LongType)).as(s"l_$tag"))
    }
    val lt = lm(perDoc.filter(col("lang") === "en")
      .groupBy("b").agg(sum(col("n")).as("nb")), "t")
    val lr = lm(perDoc.groupBy("b").agg(sum(col("n")).as("nb")), "r")
    perDoc
      .join(broadcast(lt), Seq("b"))
      .join(broadcast(lr), Seq("b"))
      .groupBy("doc_id")
      .agg(first(col("lang")).as("lang"),
        sum(col("n")).as("n_bigrams"),
        sum(col("n") * (col("l_t") - col("l_r"))).as("weight_scaled"))
      .orderBy(col("weight_scaled").desc, col("doc_id"))
      .limit(50)
      .select(col("doc_id"), col("lang"), col("n_bigrams"),
        col("weight_scaled"))
  }

  // ---------------------------------------------------------------- q175

  private val CompactTarget = 4000L

  /** q175 — compaction planning (the lakehouse OPTIMIZE primitive):
    * assign each document ("small file") within its source partition
    * to a target output file so every file lands near the target size.
    * The distributed form is next-fit over a size-desc order: one
    * window sort per source partition, running byte total, bin =
    * `cum_before div target` — each partition plans independently
    * (exactly how table-format compaction jobs parallelize; a global
    * optimal bin-pack is NP-hard AND serial, the running-sum form is
    * the standard approximation that bounds every bin by
    * target + max_item). All integers → bit-exact; the second window
    * reports per-bin fill so the spec can assert the bound. Scale:
    * two windows over source partitions, no shuffle wider than the
    * source key — at 100 TB this is per-partition metadata work on
    * file MANIFESTS, never data. */
  def q175CompactionPlan(s: SparkSession, dir: String): DataFrame = {
    val order = Window.partitionBy("source")
      .orderBy(col("n_chars").desc, col("doc_id"))
    val cumBefore = coalesce(
      sum(col("n_chars")).over(
        order.rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L))
    val withBin = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("cum", cumBefore)
      .withColumn("bin_id", expr(s"cum div $CompactTarget"))
    withBin
      .withColumn("bin_bytes",
        sum(col("n_chars")).over(Window.partitionBy("source", "bin_id")))
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("bin_id"), col("bin_bytes"))
      .orderBy("source", "bin_id", "doc_id")
  }

  private val CompactionPlanSql: String =
    s"""WITH cumed AS (
       |  SELECT doc_id, source, n_chars,
       |    CAST(coalesce(sum(n_chars) OVER (
       |      PARTITION BY source ORDER BY n_chars DESC, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS cum
       |  FROM documents),
       |binned AS (
       |  SELECT doc_id, source, n_chars, cum // $CompactTarget AS bin_id
       |  FROM cumed)
       |SELECT doc_id, source, n_chars, bin_id,
       |  CAST(sum(n_chars) OVER (PARTITION BY source, bin_id) AS BIGINT)
       |    AS bin_bytes
       |FROM binned
       |ORDER BY source, bin_id, doc_id""".stripMargin

  // ---------------------------------------------------------------- q176

  private val AllocSlots = 1000L

  /** q176 — exact stratified allocation by the largest-remainder
    * method: distribute a fixed budget of sample slots across language
    * strata proportional to document counts, floors first, then the
    * leftover slots to the largest remainders (lang as the
    * deterministic tie-break). This is the EXACT-count complement to
    * q58's Bernoulli stratified sampling — when the downstream
    * contract is "exactly N rows, proportionally", hash sampling can't
    * promise it. Every quantity is integer (`slots·cᵢ` floor-divided
    * by the corpus total) and the remainder ranking is a window over
    * the strata-sized frame, so the allocation is bit-exact and sums
    * to the budget by construction (asserted in spec). Scale: one
    * count aggregate over the corpus, then windows over a
    * langs-sized frame — nothing corpus-sized past the first shuffle. */
  def q176StratifiedAlloc(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(s, dir)
      .groupBy("lang").agg(count(lit(1)).as("n_docs"))
    val total = Window.partitionBy(lit(1))
    val byRem = Window.partitionBy(lit(1))
      .orderBy(col("rem").desc, col("lang"))
    counts
      .withColumn("c_total", sum(col("n_docs")).over(total))
      .withColumn("floor_alloc",
        expr(s"($AllocSlots * n_docs) div c_total"))
      .withColumn("rem", expr(s"($AllocSlots * n_docs) % c_total"))
      .withColumn("leftover",
        lit(AllocSlots) - sum(col("floor_alloc")).over(total))
      .withColumn("rk", row_number().over(byRem))
      .select(col("lang"), col("n_docs"),
        (col("floor_alloc")
          + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
          .as("alloc"))
      .orderBy("lang")
  }

  private val StratifiedAllocSql: String =
    s"""WITH counts AS (
       |  SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
       |based AS (
       |  SELECT lang, n_docs,
       |    CAST(sum(n_docs) OVER () AS BIGINT) AS c_total
       |  FROM counts),
       |floored AS (
       |  SELECT lang, n_docs,
       |    ($AllocSlots * n_docs) // c_total AS floor_alloc,
       |    ($AllocSlots * n_docs) % c_total AS rem
       |  FROM based),
       |ranked AS (
       |  SELECT lang, n_docs, floor_alloc,
       |    $AllocSlots - CAST(sum(floor_alloc) OVER () AS BIGINT)
       |      AS leftover,
       |    row_number() OVER (ORDER BY rem DESC, lang) AS rk
       |  FROM floored)
       |SELECT lang, n_docs,
       |  CAST(floor_alloc + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
       |    AS BIGINT) AS alloc
       |FROM ranked ORDER BY lang""".stripMargin

  // ------------------------------------------------------------ registry

  // ---------------------------------------------------- q188 hashing trick

  /** q188 — feature-hashing vectorizer audit (the "hashing trick",
    * Weinberger et al., ICML 2009): every token maps to one of 64
    * buckets via the shared md5 discipline, and the report shows each
    * (lang, bucket)'s token mass and how many DISTINCT terms collided
    * into it — exactly the collision/occupancy audit run before fixing
    * a hashed-feature dimensionality for a linear model or a
    * hashed-embedding table. No vocabulary is ever materialized (the
    * point of the trick at 100 TB: the feature space is fixed-width
    * regardless of corpus vocabulary growth).
    *
    * Shape: one explode + ONE shuffle on the (lang, bucket, token)
    * grain (count-distinct expands to Spark's standard two-phase
    * aggregate with map-side partials); output is langs × 64 rows.
    * All counts integer → bit-exact cross-engine. */
  def q188FeatureHash(s: SparkSession, dir: String): DataFrame = {
    val B = 64
    Tables.documents(s, dir)
      .filter(col("text").isNotNull)
      .select(col("lang"), explode(split(norm(col("text")), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .select(col("lang"), col("tok"),
        pmod(md5Hash32(concat(lit("fh:"), col("tok"))), lit(B.toLong))
          .as("b"))
      .groupBy("lang", "b")
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("tok")).as("n_terms"))
      .orderBy("lang", "b")
  }

  private val FeatureHashSql: String =
    s"""WITH toks AS (
       |  SELECT lang, unnest(string_split(${normSql()}, ' ')) AS tok
       |  FROM documents WHERE text IS NOT NULL),
       |h AS (
       |  SELECT lang, tok,
       |    ${hexPoly("md5('fh:' || tok)")} % 64 AS b
       |  FROM toks WHERE tok <> '')
       |SELECT lang, b, count(*) AS n_tokens,
       |  CAST(count(DISTINCT tok) AS BIGINT) AS n_terms
       |FROM h GROUP BY 1, 2 ORDER BY lang, b""".stripMargin

  // ---------------------------------------------------------------- q201

  /** q201 — cross-source containment audit: for every ordered source
    * pair, C(A→B) = |grams(A) ∩ grams(B)| / |grams(A)| over each
    * source's distinct 5-gram set — the dataset-overlap matrix a
    * curation pipeline reads before mixing sources (near-1 rows mean
    * source A is redundant given B: a scrape-of-a-scrape, a mirror, or
    * a re-crawl) and the source-level complement of q140's snapshot
    * diff and q74's train/test decontamination.
    *
    * Scale shape: the per-source gram set is one explode + distinct
    * (source-keyed shuffle, map-side combined); the pair stage joins
    * on the gram hash — inverted-list-shaped like q198, bounded by
    * source-count² output; sizes join back source-keyed (tiny, AQE
    * broadcasts). Everything is an exact integer; containment is an
    * exact ppm division. */
  def q201SourceContainment(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val grams = Tables.documents(s, dir)
      .select(col("source"), norm(col("text")).as("n"))
      .filter(length(col("n")) >= 5)
      .select(col("source"),
        explode(call_function("sorted_gram_hashes", col("n"), lit(5)))
          .as("h"))
      .distinct()
      .persist() // sizes aggregate + both pair-join sides
    val sizes = grams.groupBy("source").agg(count(lit(1)).as("sz"))
    grams.as("a").join(grams.as("b"),
        col("a.h") === col("b.h") && col("a.source") =!= col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("inter_sz"))
      .join(sizes.select(col("source").as("src_a"), col("sz").as("size_a")),
        "src_a")
      .join(sizes.select(col("source").as("src_b"), col("sz").as("size_b")),
        "src_b")
      .select(col("src_a"), col("src_b"), col("inter_sz"), col("size_a"),
        col("size_b"),
        expr("inter_sz * 1000000 div size_a").as("containment_ppm"))
      .orderBy("src_a", "src_b")
  }

  /** String-gram twin (hash-count equality under the q45/q198
    * injectivity discipline). */
  private val SourceContainmentSql: String =
    """WITH d AS (SELECT source,
      |    trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g')) AS n
      |  FROM documents),
      |e AS (SELECT DISTINCT source, g FROM (
      |    SELECT source, unnest(list_distinct(list_transform(
      |      range(1, length(n) - 3), i -> substring(n, i, 5)))) AS g
      |    FROM d WHERE length(n) >= 5)),
      |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS sz
      |       FROM e GROUP BY 1),
      |iv AS (SELECT a.source AS src_a, b.source AS src_b,
      |         CAST(count(*) AS BIGINT) AS inter_sz
      |       FROM e a JOIN e b ON a.g = b.g AND a.source <> b.source
      |       GROUP BY 1, 2)
      |SELECT src_a, src_b, inter_sz, x.sz AS size_a, y.sz AS size_b,
      |  inter_sz * 1000000 // x.sz AS containment_ppm
      |FROM iv JOIN sz x ON x.source = iv.src_a
      |  JOIN sz y ON y.source = iv.src_b
      |ORDER BY src_a, src_b""".stripMargin

  // ---------------------------------------------------- q215 CDC chunks

  private val CdcWindow = 8

  /** q215 — content-defined chunking dedup audit (the Rabin/FastCDC
    * family, as in LBFS/restic/training-data blob stores): a chunk
    * boundary falls after position i wherever the RABIN POLYNOMIAL of
    * the trailing 8-char window hits a 1-in-16 target (window key
    * ≡ 0 mod 16), plus a forced boundary at end-of-document.
    * Identical byte runs then chunk identically REGARDLESS of their
    * offset in the containing document — the insertion-shift
    * robustness that fixed-size blocking lacks and the reason every
    * dedup store chunks this way. Output: per-source chunk counts,
    * distinct-chunk counts, and the byte volume a content-addressed
    * store would not re-write.
    *
    * The boundary hash HISTORY — a measured negative result worth
    * keeping: rounds 8-9 used md5 of the window (first hex digit =
    * '0') and documented "a rolling Rabin hash would cut the constant
    * ~10× but has no DuckDB spelling". The q230 work found the
    * spelling (per-step ord()/ascii() polynomial, identical pmod
    * arithmetic on both engines), so that trade was finally testable
    * — and the premise was WRONG: the digest was never the
    * bottleneck. Three shapes measured at sf0.1: md5-per-window
    * 3.2 s; the polynomial with the code-point array carried through
    * the position explode 58 s (Generate materializes the array per
    * output row — payload columns through an explode are quadratic);
    * the polynomial as a filter HOF over a localCheckpointed
    * code-point array 2.8-3.2 s — the cost is the 1.45M-position
    * stream itself (interpreted lambda per element; HOFs sit outside
    * whole-stage codegen), not the hash inside it; the native
    * [[graft.functions.RabinBoundaries]] kernel (one codegen'd
    * O(len) rolling pass per document, bit-equality-spec'd against
    * the HOF twin incl. CJK/astral) 1.1 s. The kernel is the
    * production path: 3x under the md5 rule, integer-exact on both
    * engines, and the boundary rule now IS the Rabin-family window
    * key the CDC literature assumes.
    *
    * Scale shape: boundary detection is embarrassingly parallel
    * (position explode → codegen'd integer ops — no interpreted
    * lambda per the r8 HOF lesson); boundary rows carry (doc_id, i)
    * ONLY — the text amplification of carrying documents through the
    * per-doc window shuffle is deliberately avoided, text moves once
    * in the final span join. The chunk-hash groupBy shuffles 16-byte
    * keys, high-cardinality and uniform. Each stage survives
    * 100 TB. */
  /** The DECLARATIVE twin of the [[graft.functions.RabinBoundaries]]
    * kernel — the filter-HOF polynomial over a split code-point
    * array. Exists for the bit-equality spec only (the kernel is the
    * production path): (doc_id, boundary-position) rows. */
  private[graft] def cdcBoundariesDeclarative(docs0: DataFrame): DataFrame = {
    val docs = docs0.filter(length(col("text")) >= 1)
    def winKey(i: Column) = (0 until CdcWindow).foldLeft(lit(0L)) {
      (acc, j) =>
        pmod(acc * lit(RkBase) +
          element_at(col("cp"), i - lit(CdcWindow - 1) + lit(j)),
          lit(RkMod))
    }
    docs
      .select(col("doc_id"), length(col("text")).as("n"),
        transform(split(col("text"), ""), c => ascii(c).cast(LongType))
          .as("cp"))
      .localCheckpoint(eager = false) // CollapseProject barrier (r8 HOF lesson)
      .select(col("doc_id"),
        explode(filter(
          when(size(col("cp")) >= CdcWindow,
            sequence(lit(CdcWindow), size(col("cp")))).otherwise(array()),
          i => pmod(winKey(i), lit(16L)) === 0L)).as("i"))
      .select(col("doc_id"), col("i").cast(IntegerType).as("i"))
  }

  /** The chunker itself, reusable over any (doc_id, source, text)
    * frame — q215 aggregates it; the spec re-runs it on shifted text
    * to pin the offset-robustness property. */
  private[graft] def cdcChunkFrame(docs0: DataFrame): DataFrame = {
    val docs = docs0.filter(length(col("text")) >= 1)
      .select(col("doc_id"), col("source"), col("text"))
    // Boundary detection is the native one-pass rolling kernel
    // ([[graft.functions.RabinBoundaries]] — O(1) per character,
    // codegen'd): the generate emits only the ~len/16 boundary list,
    // never len positions, and no payload column rides through it.
    // The declarative twin (filter HOF over a split code-point array)
    // is bit-equality-spec'd against the kernel in LlmOpsSpec and
    // kept there as [[cdcBoundariesDeclarative]].
    graft.functions.GraftFunctions.register(docs0.sparkSession)
    val bnd = docs
      .select(col("doc_id"),
        explode(call_function("rabin_boundaries", col("text"),
          lit(CdcWindow), lit(16))).as("i"))
      .union(docs.select(col("doc_id"), length(col("text")).as("i")))
      .distinct()
    val w = Window.partitionBy("doc_id").orderBy("i")
    val spans = bnd.withColumn("start",
      coalesce(lag(col("i"), 1).over(w), lit(0)) + lit(1))
    spans.join(docs, Seq("doc_id"))
      .select(col("doc_id"), col("source"),
        col("text").substr(col("start"), col("i") - col("start") + lit(1))
          .as("chunk"))
  }

  def q215CdcChunks(s: SparkSession, dir: String): DataFrame = {
    cdcChunkFrame(Tables.documents(s, dir))
      .select(col("source"), md5(col("chunk")).as("h"),
        length(col("chunk")).as("clen"))
      .groupBy("source", "h")
      .agg(count(lit(1)).as("cnt"), max(col("clen")).as("clen2"))
      .groupBy("source")
      .agg(sum(col("cnt")).as("n_chunks"),
        count(lit(1)).as("n_distinct"),
        sum(col("cnt") * col("clen2")).as("chunk_bytes"),
        sum((col("cnt") - 1) * col("clen2")).as("dup_bytes"))
      .withColumn("dup_frac",
        col("dup_bytes").cast(DoubleType) / col("chunk_bytes").cast(DoubleType))
      .orderBy("source")
  }

  private val CdcChunksSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, source, text, len(text) AS n FROM documents
       |  WHERE len(text) >= 1),
       |pos AS (
       |  SELECT doc_id, text, unnest(range($CdcWindow, n + 1)) AS i
       |  FROM d WHERE n >= $CdcWindow),
       |bnd AS (
       |  SELECT doc_id, i FROM pos
       |  WHERE (${(0 until CdcWindow).foldLeft("CAST(0 AS BIGINT)") {
              (acc, j) =>
                s"(($acc * $RkBase + ord(substr(text, " +
                  s"CAST(i - ${CdcWindow - 1 - j} AS INTEGER), 1)))" +
                  s" % $RkMod)"
            }}) % 16 = 0
       |  UNION
       |  SELECT doc_id, n AS i FROM d),
       |sp AS (
       |  SELECT doc_id, i,
       |    coalesce(lag(i) OVER (PARTITION BY doc_id ORDER BY i), 0) + 1
       |      AS start
       |  FROM bnd),
       |ch AS (
       |  SELECT s.doc_id, d.source,
       |    substr(d.text, CAST(s.start AS INTEGER),
       |      CAST(s.i - s.start + 1 AS INTEGER)) AS chunk
       |  FROM sp s JOIN d USING (doc_id)),
       |byh AS (
       |  SELECT source, md5(chunk) AS h, max(len(chunk)) AS clen,
       |    count(*) AS cnt
       |  FROM ch GROUP BY 1, 2)
       |SELECT source,
       |  CAST(sum(cnt) AS BIGINT) AS n_chunks,
       |  count(*) AS n_distinct,
       |  CAST(sum(cnt * clen) AS BIGINT) AS chunk_bytes,
       |  CAST(sum((cnt - 1) * clen) AS BIGINT) AS dup_bytes,
       |  CAST(CAST(sum((cnt - 1) * clen) AS BIGINT) AS DOUBLE) /
       |    CAST(CAST(sum(cnt * clen) AS BIGINT) AS DOUBLE) AS dup_frac
       |FROM byh GROUP BY source ORDER BY source""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q215_cdc_chunks" -> (q215CdcChunks _),
    "q216_l_diversity" -> (q216LDiversity _),
    "q218_rendezvous" -> (q218Rendezvous _),
    "q219_split_leakage" -> (q219SplitLeakage _),
    "q220_dp_counts" -> (q220DpCounts _),
    "q221_compress_ratio" -> (q221CompressRatio _),
    "q228_epoch_shuffle" -> (q228EpochShuffle _),
    "q229_negative_sampling" -> (q229NegativeSampling _),
    "q230_novelty_rate" -> (q230NoveltyRate _),
    "q237_rater_agreement" -> (q237RaterAgreement _),
    "q201_source_containment" -> (q201SourceContainment _),
    "q188_feature_hash" -> (q188FeatureHash _),
    "q175_compaction_plan" -> (q175CompactionPlan _),
    "q176_stratified_alloc" -> (q176StratifiedAlloc _),
    "q164_dsir_weights" -> (q164DsirWeights _),
    "q131_bm25" -> (q131Bm25 _),
    "q179_rank_fusion" -> (q179RankFusion _),
    "q134_stopword_prune" -> (q134StopwordPrune _),
    "q136_span_dedup" -> (q136SpanDedup _),
    "q137_k_anonymity" -> (q137KAnonymity _),
    "q138_mixture_sample" -> (q138MixtureSample _),
    "q145_drift_psi" -> (q145DriftPsi _),
    "q146_train_split" -> (q146TrainSplit _),
    "q140_corpus_diff" -> (q140CorpusDiff _),
    "q100_shard_assign" -> (q100ShardAssign _),
    "q101_pii_redact" -> (q101PiiRedact _),
    "q102_token_entropy" -> (q102TokenEntropy _),
    "q103_embed_quant" -> (q103EmbedQuant _),
    "q104_zipf_fit" -> (q104ZipfFit _),
    "q105_weighted_sample" -> (q105WeightedSample _),
    "q107_bigram_lm" -> (q107BigramLm _),
    "q156_collocations" -> (q156Collocations _),
    "q161_gini_lengths" -> (q161GiniLengths _))

  private val email = EmailPat
  private val phone = PhonePat
  private val ip = IpPat

  val oracles: Map[String, String] = Map(
    "q215_cdc_chunks" -> CdcChunksSql,
    "q216_l_diversity" -> LDiversitySql,
    "q218_rendezvous" -> RendezvousSql,
    "q219_split_leakage" -> SplitLeakageSql,
    "q220_dp_counts" -> DpCountsSql,
    "q228_epoch_shuffle" -> EpochShuffleSql,
    "q229_negative_sampling" -> NegativeSamplingSql,
    "q230_novelty_rate" -> NoveltyRateSql,
    "q237_rater_agreement" -> RaterAgreementSql,
    "q201_source_containment" -> SourceContainmentSql,
    "q188_feature_hash" -> FeatureHashSql,
    "q175_compaction_plan" -> CompactionPlanSql,
    "q176_stratified_alloc" -> StratifiedAllocSql,
    "q179_rank_fusion" -> RankFusionSql,
    "q164_dsir_weights" -> s"""
      |WITH toks AS (
      |  SELECT doc_id, lang, string_split(${normSql()}, ' ') AS t
      |  FROM documents WHERE text IS NOT NULL),
      |per_doc AS (
      |  SELECT doc_id, lang,
      |    ${hexPoly("md5('dsir:' || bg)")} % 256 AS b,
      |    count(*) AS n
      |  FROM (
      |    SELECT doc_id, lang,
      |      unnest(list_transform(range(1, len(t)),
      |        i -> t[i] || ' ' || t[i + 1])) AS bg
      |    FROM toks WHERE len(t) >= 2)
      |  GROUP BY 1, 2, 3),
      |buckets AS (SELECT unnest(range(0, 256)) AS b),
      |lt AS (
      |  SELECT buckets.b,
      |    CAST(floor(ln(CAST(COALESCE(c.nb, 0) + 1 AS DOUBLE)) * 1e6)
      |      AS BIGINT)
      |    - CAST(floor(ln(CAST(t.tot + 256 AS DOUBLE)) * 1e6) AS BIGINT)
      |      AS l_t
      |  FROM buckets
      |  LEFT JOIN (SELECT b, CAST(sum(n) AS BIGINT) AS nb FROM per_doc
      |             WHERE lang = 'en' GROUP BY b) c ON buckets.b = c.b
      |  CROSS JOIN (SELECT CAST(COALESCE(sum(n), 0) AS BIGINT) AS tot
      |              FROM per_doc WHERE lang = 'en') t),
      |lr AS (
      |  SELECT buckets.b,
      |    CAST(floor(ln(CAST(COALESCE(c.nb, 0) + 1 AS DOUBLE)) * 1e6)
      |      AS BIGINT)
      |    - CAST(floor(ln(CAST(t.tot + 256 AS DOUBLE)) * 1e6) AS BIGINT)
      |      AS l_r
      |  FROM buckets
      |  LEFT JOIN (SELECT b, CAST(sum(n) AS BIGINT) AS nb FROM per_doc
      |             GROUP BY b) c ON buckets.b = c.b
      |  CROSS JOIN (SELECT CAST(COALESCE(sum(n), 0) AS BIGINT) AS tot
      |              FROM per_doc) t)
      |SELECT doc_id, min(lang) AS lang,
      |  CAST(sum(n) AS BIGINT) AS n_bigrams,
      |  CAST(sum(n * (l_t - l_r)) AS BIGINT) AS weight_scaled
      |FROM per_doc JOIN lt USING (b) JOIN lr USING (b)
      |GROUP BY doc_id
      |ORDER BY weight_scaled DESC, doc_id LIMIT 50""".stripMargin,
    "q134_stopword_prune" -> s"""
      |WITH docs AS (SELECT doc_id, string_split(${normSql()}, ' ') AS t
      |              FROM documents),
      |toks AS (SELECT doc_id, u.pos AS pos, u.w AS w
      |         FROM (SELECT doc_id,
      |                 unnest(list_transform(t, (w, i) -> {'pos': i, 'w': w})) AS u
      |               FROM docs)),
      |dfreq AS (SELECT w, count(DISTINCT doc_id) AS df FROM toks GROUP BY w),
      |n AS (SELECT count(*) AS n_docs FROM docs),
      |pruned AS (SELECT doc_id, count(*) AS n_kept,
      |             string_agg(w, ' ' ORDER BY pos) AS text_pruned
      |           FROM toks JOIN dfreq USING (w) CROSS JOIN n
      |           WHERE df * 100 < n_docs * 79
      |           GROUP BY doc_id)
      |SELECT d.doc_id, CAST(len(d.t) AS INTEGER) AS n_tokens,
      |  coalesce(p.n_kept, 0) AS n_kept,
      |  coalesce(p.text_pruned, '') AS text_pruned
      |FROM docs d LEFT JOIN pruned p ON d.doc_id = p.doc_id
      |ORDER BY d.doc_id""".stripMargin,
    "q131_bm25" -> s"""
      |WITH docs AS (SELECT doc_id, string_split(${normSql()}, ' ') AS t
      |              FROM documents),
      |dl AS (SELECT doc_id, len(t) AS dl FROM docs),
      |tdq AS (SELECT doc_id, term FROM (SELECT doc_id, unnest(t) AS term FROM docs)
      |        WHERE term IN ('data', 'join', 'scan')),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM tdq GROUP BY 1, 2),
      |dfr AS (SELECT term, count(DISTINCT doc_id) AS df FROM tdq GROUP BY 1),
      |stats AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl
      |          FROM dl),
      |sc AS (SELECT tf.doc_id,
      |  CAST(floor(ln((CAST(n_docs AS DOUBLE) - df + 5e-1)
      |               / (CAST(df AS DOUBLE) + 5e-1) + 1e0) * 1e6) AS BIGINT)
      |    AS idf_fp,
      |  (CAST(tf AS DOUBLE) * 22e-1)
      |    / (CAST(tf AS DOUBLE) + 12e-1 * (25e-2 + 75e-2 * CAST(dl AS DOUBLE)
      |       * CAST(n_docs AS DOUBLE) / CAST(sum_dl AS DOUBLE))) AS tfn
      |  FROM tf JOIN dfr USING (term) JOIN dl ON tf.doc_id = dl.doc_id
      |  CROSS JOIN stats)
      |SELECT doc_id, count(*) AS n_terms,
      |  CAST(sum(CAST(floor(idf_fp * tfn) AS BIGINT)) AS BIGINT) AS score_fp,
      |  CAST(CAST(sum(CAST(floor(idf_fp * tfn) AS BIGINT)) AS BIGINT) AS DOUBLE)
      |    / 1e6 AS bm25
      |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q100_shard_assign" -> s"""
      |SELECT shard, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  min(doc_id) AS min_id, max(doc_id) AS max_id
      |FROM (SELECT ${hexPoly(s"md5(${normSql()})")} % 64 AS shard,
      |        doc_id, n_chars FROM documents)
      |GROUP BY shard ORDER BY shard""".stripMargin,

    "q101_pii_redact" -> s"""
      |WITH msg AS (
      |  SELECT c_custkey,
      |    concat('contact ',
      |      regexp_replace(lower(c_name), '[^a-z0-9]', '.', 'g'),
      |      '@corp.example.com', ' tel ',
      |      lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0'), '-555-',
      |      lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0'),
      |      ' ip ', CAST(c_custkey % 256 AS VARCHAR), '.',
      |      CAST(c_nationkey % 256 AS VARCHAR), '.',
      |      CAST((c_custkey // 256) % 256 AS VARCHAR), '.',
      |      CAST((c_custkey * 7) % 256 AS VARCHAR),
      |      ' segment ', c_mktsegment) AS msg
      |  FROM customer)
      |SELECT c_custkey, CAST(length(msg) AS INTEGER) AS msg_len,
      |  CAST(len(regexp_extract_all(msg, '$email')) AS INTEGER) AS n_emails,
      |  CAST(len(regexp_extract_all(msg, '$phone')) AS INTEGER) AS n_phones,
      |  regexp_replace(regexp_replace(regexp_replace(msg,
      |    '$email', '<EMAIL>', 'g'), '$phone', '<PHONE>', 'g'),
      |    '$ip', '<IP>', 'g') AS redacted
      |FROM msg ORDER BY c_custkey""".stripMargin,

    "q102_token_entropy" -> s"""
      |WITH tok AS (
      |  SELECT doc_id, lang, unnest(string_split(${normSql()}, ' ')) AS t
      |  FROM documents),
      |cnt AS (
      |  SELECT doc_id, lang, t, count(*) AS c FROM tok
      |  GROUP BY doc_id, lang, t),
      |agg AS (
      |  SELECT doc_id, lang, CAST(sum(c) AS BIGINT) AS n_tokens,
      |    count(*) AS n_types,
      |    CAST(sum(CAST(floor(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
      |      * 1e6) AS BIGINT)) AS BIGINT) AS sclnc
      |  FROM cnt GROUP BY doc_id, lang)
      |SELECT doc_id, lang, n_tokens, n_types,
      |  CAST(n_types AS DOUBLE) / n_tokens AS ttr,
      |  n_tokens * CAST(floor(ln(CAST(n_tokens AS DOUBLE)) * 1e6) AS BIGINT)
      |    - sclnc AS entropy_scaled,
      |  (n_tokens * CAST(floor(ln(CAST(n_tokens AS DOUBLE)) * 1e6) AS BIGINT)
      |    - sclnc) / (1e6 * n_tokens) AS entropy
      |FROM agg ORDER BY doc_id""".stripMargin,

    "q103_embed_quant" -> """
      |WITH el AS (
      |  SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS x,
      |    len(embedding) AS n_dims
      |  FROM embeddings),
      |m AS (SELECT vec_id, max(abs(x)) AS max_abs FROM el GROUP BY vec_id)
      |SELECT el.vec_id, any_value(el.label) AS label,
      |  CAST(any_value(el.n_dims) AS INTEGER) AS n_dims,
      |  any_value(m.max_abs) AS max_abs,
      |  CAST(sum(CAST(floor(el.x * (127e0 / nullif(m.max_abs, 0e0)) + 5e-1)
      |    AS BIGINT)) AS BIGINT) AS sum_q,
      |  CAST(sum(CAST(floor(abs(el.x -
      |      floor(el.x * (127e0 / nullif(m.max_abs, 0e0)) + 5e-1)
      |        / (127e0 / nullif(m.max_abs, 0e0))) * 1e9) AS BIGINT))
      |    AS BIGINT) AS err_scaled
      |FROM el JOIN m ON el.vec_id = m.vec_id
      |GROUP BY el.vec_id ORDER BY el.vec_id""".stripMargin,

    "q104_zipf_fit" -> s"""
      |WITH tok AS (
      |  SELECT lang, unnest(string_split(${normSql()}, ' ')) AS t
      |  FROM documents),
      |vc AS (SELECT lang, t, count(*) AS c FROM tok GROUP BY lang, t),
      |rk AS (SELECT lang, c,
      |    row_number() OVER (PARTITION BY lang ORDER BY c DESC, t) AS r
      |  FROM vc),
      |su AS (SELECT lang,
      |    CAST(floor(ln(CAST(r AS DOUBLE)) * 1e6) AS BIGINT) AS x,
      |    CAST(floor(ln(CAST(c AS DOUBLE)) * 1e6) AS BIGINT) AS y
      |  FROM rk WHERE r <= 1000),
      |st AS (SELECT lang, count(*) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(x*y) AS BIGINT) AS sxy,
      |    CAST(sum(y*y) AS BIGINT) AS syy
      |  FROM su GROUP BY lang)
      |SELECT lang, n AS n_terms,
      |  (CAST(n AS DOUBLE)*sxy - CAST(sx AS DOUBLE)*sy)
      |    / nullif(CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx, 0e0)
      |    AS slope,
      |  (CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE)*sxy - CAST(sx AS DOUBLE)*sy)
      |    / nullif(CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx, 0e0))
      |    * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept,
      |  ((CAST(n AS DOUBLE)*sxy - CAST(sx AS DOUBLE)*sy)
      |    * (CAST(n AS DOUBLE)*sxy - CAST(sx AS DOUBLE)*sy))
      |    / nullif((CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx)
      |      * (CAST(n AS DOUBLE)*syy - CAST(sy AS DOUBLE)*sy), 0e0) AS r2
      |FROM st ORDER BY lang""".stripMargin,

    "q105_weighted_sample" -> s"""
      |WITH k AS (
      |  SELECT lang, doc_id, n_chars,
      |    -ln((${hexPoly(s"md5(${normSql()})")} + 1) / 4294967296e0)
      |      / nullif(n_chars, 0) AS key
      |  FROM documents),
      |rk AS (SELECT lang, doc_id, n_chars,
      |    CAST(row_number() OVER (PARTITION BY lang ORDER BY key, doc_id)
      |      AS INTEGER) AS rank
      |  FROM k)
      |SELECT lang, rank, doc_id, n_chars FROM rk
      |WHERE rank <= 5 ORDER BY lang, rank""".stripMargin,

    "q107_bigram_lm" -> s"""
      |WITH d AS (
      |  SELECT doc_id, lang, string_split(${normSql()}, ' ') AS toks
      |  FROM documents
      |  WHERE len(string_split(${normSql()}, ' ')) >= 2),
      |bg0 AS (SELECT doc_id, lang,
      |    unnest(list_zip(toks, toks[2:])) AS p FROM d),
      |bg AS (SELECT doc_id, lang, p[1] AS w1, p[2] AS w2 FROM bg0
      |       WHERE p[2] IS NOT NULL),
      |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
      |c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
      |q AS (SELECT doc_id, lang,
      |    CAST(floor(ln(CAST(c1.c1 AS DOUBLE)) * 1e6) AS BIGINT)
      |      - CAST(floor(ln(CAST(c12.c12 AS DOUBLE)) * 1e6) AS BIGINT) AS q
      |  FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1))
      |SELECT doc_id, lang, count(*) AS n_bigrams,
      |  CAST(sum(q) AS BIGINT) AS xent_scaled,
      |  CAST(sum(q) AS BIGINT) / (1e6 * count(*)) AS xent
      |FROM q GROUP BY doc_id, lang ORDER BY doc_id""".stripMargin,

    "q156_collocations" -> s"""
      |WITH d AS (
      |  SELECT string_split(${normSql()}, ' ') AS toks
      |  FROM documents
      |  WHERE len(string_split(${normSql()}, ' ')) >= 2),
      |bg0 AS (SELECT unnest(list_zip(toks, toks[2:])) AS p FROM d),
      |bg AS (SELECT p[1] AS w1, p[2] AS w2 FROM bg0
      |       WHERE p[2] IS NOT NULL),
      |n AS (SELECT count(*) AS n_pairs FROM bg),
      |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2
      |        HAVING count(*) >= $CollocMinSupport),
      |c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
      |c2 AS (SELECT w2, count(*) AS c2 FROM bg GROUP BY w2)
      |SELECT w1, w2, c12, c1, c2,
      |  CAST(c12 * n.n_pairs AS DOUBLE) / (c1 * c2) AS lift
      |FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2), n
      |ORDER BY lift DESC, w1, w2 LIMIT 50""".stripMargin,

    "q161_gini_lengths" -> """
      |WITH r AS (
      |  SELECT lang, CAST(n_chars AS BIGINT) AS x,
      |    CAST(row_number() OVER (PARTITION BY lang
      |      ORDER BY CAST(n_chars AS BIGINT), doc_id) AS BIGINT) AS rk
      |  FROM documents)
      |SELECT lang, count(*) AS n_docs,
      |  CAST(sum(x) AS BIGINT) AS total_chars,
      |  CAST(2 * sum(rk * x) - (count(*) + 1) * sum(x) AS DOUBLE)
      |    / (count(*) * sum(x)) AS gini
      |FROM r GROUP BY lang ORDER BY lang""".stripMargin,

    "q136_span_dedup" -> s"""
      |WITH t AS (
      |  SELECT doc_id, string_split(${normSql()}, ' ') AS toks
      |  FROM documents
      |  WHERE text IS NOT NULL
      |    AND len(string_split(${normSql()}, ' ')) >= 8),
      |sp0 AS (
      |  SELECT doc_id, toks, unnest(range(1, len(toks) - 6)) AS i FROM t),
      |sp AS (
      |  SELECT doc_id, array_to_string(toks[i:i+7], ' ') AS span FROM sp0)
      |SELECT md5(span) AS span_md5, n_docs, n_occ, min_doc FROM (
      |  SELECT span, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ,
      |    min(doc_id) AS min_doc
      |  FROM sp GROUP BY span)
      |WHERE n_docs >= 2 ORDER BY span_md5""".stripMargin,

    "q137_k_anonymity" -> """
      |SELECT c_nationkey, c_mktsegment, count(*) AS grp_n,
      |  CAST(count(*) < 5 AS INTEGER) AS is_risky,
      |  min(count(*)) OVER () AS k_anonymity
      |FROM customer GROUP BY c_nationkey, c_mktsegment
      |ORDER BY c_nationkey, c_mktsegment""".stripMargin,

    "q138_mixture_sample" -> s"""
      |WITH d AS (
      |  SELECT lang, doc_id,
      |    ${hexPoly("md5('mix:' || CAST(doc_id AS VARCHAR))")} % 1000000
      |      AS h
      |  FROM documents WHERE text IS NOT NULL),
      |st0 AS (SELECT lang, count(*) AS n_docs FROM d GROUP BY lang),
      |st1 AS (SELECT lang, n_docs,
      |    CAST(n_docs AS DOUBLE) / CAST(sum(n_docs) OVER () AS DOUBLE)
      |      AS share,
      |    CAST(floor(sqrt(CAST(n_docs AS DOUBLE)
      |        / CAST(sum(n_docs) OVER () AS DOUBLE)) * 1000000000e0)
      |      AS BIGINT) AS w_fp
      |  FROM st0),
      |st AS (SELECT lang, n_docs,
      |    CAST(floor(least(1e0,
      |        (CAST(w_fp AS DOUBLE) / CAST(sum(w_fp) OVER () AS DOUBLE))
      |          / share) * 1000000e0) AS BIGINT) AS rate_ppm
      |  FROM st1),
      |kept AS (SELECT d.lang AS lang, count(*) AS n_kept
      |  FROM d JOIN st USING (lang) WHERE d.h < st.rate_ppm
      |  GROUP BY d.lang)
      |SELECT st.lang AS lang, st.n_docs AS n_docs,
      |  st.rate_ppm AS rate_ppm, COALESCE(kept.n_kept, 0) AS n_kept
      |FROM st LEFT JOIN kept USING (lang) ORDER BY lang""".stripMargin,

    "q145_drift_psi" -> s"""
      |WITH v1 AS (
      |  SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
      |kept AS (
      |  SELECT * FROM v1
      |  WHERE ${hexPoly("md5('v2drop:' || CAST(doc_id AS VARCHAR))")} % 20
      |    <> 0),
      |v2base AS (
      |  SELECT doc_id,
      |    CASE WHEN ${hexPoly("md5('v2mod:' || CAST(doc_id AS VARCHAR))")}
      |        % 10 = 0
      |      THEN text || ' [edited]' ELSE text END AS text
      |  FROM kept),
      |added AS (
      |  SELECT doc_id + 10000000 AS doc_id, text FROM v1
      |  WHERE ${hexPoly("md5('v2add:' || CAST(doc_id AS VARCHAR))")} % 25
      |    = 0),
      |v2 AS (SELECT * FROM v2base UNION ALL SELECT * FROM added),
      |a AS (SELECT least(CAST(floor(length(text) / 256) AS INTEGER), 7)
      |        AS bin, count(*) AS n_v1 FROM v1 GROUP BY 1),
      |b AS (SELECT least(CAST(floor(length(text) / 256) AS INTEGER), 7)
      |        AS bin, count(*) AS n_v2 FROM v2 GROUP BY 1),
      |bins AS (SELECT CAST(unnest(range(0, 8)) AS INTEGER) AS bin),
      |j AS (SELECT bin, COALESCE(n_v1, 0) AS n_v1, COALESCE(n_v2, 0) AS n_v2
      |      FROM bins LEFT JOIN a USING (bin) LEFT JOIN b USING (bin)),
      |t AS (SELECT bin, n_v1, n_v2,
      |        sum(n_v1) OVER () AS tot1, sum(n_v2) OVER () AS tot2 FROM j),
      |u AS (SELECT bin, n_v1, n_v2,
      |  CAST(floor(
      |    (CAST(n_v1 + 1 AS DOUBLE) / CAST(tot1 + 8 AS DOUBLE)
      |      - CAST(n_v2 + 1 AS DOUBLE) / CAST(tot2 + 8 AS DOUBLE))
      |    * CAST(CAST(floor(ln(CAST((n_v1 + 1) * (tot2 + 8) AS DOUBLE)) * 1e6)
      |          AS BIGINT)
      |        - CAST(floor(ln(CAST((n_v2 + 1) * (tot1 + 8) AS DOUBLE)) * 1e6)
      |          AS BIGINT) AS DOUBLE)) AS BIGINT) AS term_scaled
      |  FROM t)
      |SELECT bin, n_v1, n_v2, term_scaled,
      |  CAST(sum(term_scaled) OVER () AS BIGINT) AS psi_scaled,
      |  CAST(sum(term_scaled) OVER () AS DOUBLE) / 1e6 AS psi
      |FROM u ORDER BY bin""".stripMargin,

    "q146_train_split" -> s"""
      |SELECT lang,
      |  CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val'
      |    ELSE 'test' END AS split,
      |  count(*) AS n_docs, count(DISTINCT fp) AS n_fps
      |FROM (
      |  SELECT lang, md5(${normSql()}) AS fp,
      |    ${hexPoly("md5('split:' || md5(" + normSql() + "))")} % 100 AS h
      |  FROM documents WHERE text IS NOT NULL)
      |GROUP BY 1, 2 ORDER BY lang, split""".stripMargin,

    "q140_corpus_diff" -> s"""
      |WITH v1 AS (
      |  SELECT doc_id, lang, text FROM documents WHERE text IS NOT NULL),
      |kept AS (
      |  SELECT * FROM v1
      |  WHERE ${hexPoly("md5('v2drop:' || CAST(doc_id AS VARCHAR))")} % 20
      |    <> 0),
      |v2base AS (
      |  SELECT doc_id, lang,
      |    CASE WHEN ${hexPoly("md5('v2mod:' || CAST(doc_id AS VARCHAR))")}
      |        % 10 = 0
      |      THEN text || ' [edited]' ELSE text END AS text
      |  FROM kept),
      |added AS (
      |  SELECT doc_id + 10000000 AS doc_id, lang, text FROM v1
      |  WHERE ${hexPoly("md5('v2add:' || CAST(doc_id AS VARCHAR))")} % 25
      |    = 0),
      |v2 AS (SELECT * FROM v2base UNION ALL SELECT * FROM added),
      |a AS (SELECT doc_id, lang AS lang_a, md5(text) AS fp_a FROM v1),
      |b AS (SELECT doc_id, lang AS lang_b, md5(text) AS fp_b FROM v2)
      |SELECT COALESCE(lang_a, lang_b) AS lang,
      |  CASE WHEN fp_a IS NULL THEN 'added'
      |       WHEN fp_b IS NULL THEN 'removed'
      |       WHEN fp_a <> fp_b THEN 'modified'
      |       ELSE 'unchanged' END AS status,
      |  count(*) AS n_docs
      |FROM a FULL OUTER JOIN b USING (doc_id)
      |GROUP BY 1, 2 ORDER BY lang, status""".stripMargin)
}
