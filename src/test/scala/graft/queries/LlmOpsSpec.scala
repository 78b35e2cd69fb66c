package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Dedup / text / vector / multimodal operator checks on sf0.001. */
class LlmOpsSpec extends SparkTestBase {

  lazy val nDocs: Long = graft.Tables.documents(spark, Sf).count()

  test("q30 exact dedup: dup counts partition the corpus") {
    val rows = TextOps.q30ExactDedup(spark, Sf).collect()
    assert(rows.map(_.getAs[Long]("dup_cnt")).sum == nDocs)
    assert(rows.forall(_.getAs[Long]("dup_cnt") >= 1))
  }

  test("q31 dedup stats: distinct <= total per lang") {
    val rows = TextOps.q31DedupStats(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_docs"))
    }
  }

  test("q32 text stats are internally consistent") {
    val rows = TextOps.q32TextStats(spark, Sf).collect()
    assert(rows.length == nDocs)
    rows.foreach { r =>
      assert(r.getAs[Int]("n_tokens") >= 1)
      assert(r.getAs[Int]("text_len") > 0)
      assert(r.getAs[Double]("mean_token_len") > 0)
    }
  }

  test("q36 fingerprints are well-formed and unique per distinct text") {
    val rows = TextOps.q36Fingerprint(spark, Sf).collect()
    assert(rows.forall(_.getAs[String]("fp_md5").matches("[0-9a-f]{32}")))
    assert(rows.forall(_.getAs[String]("fp_sha256").matches("[0-9a-f]{64}")))
  }

  test("q36 md5 matches JVM reference digest for one document") {
    val doc = graft.Tables.documents(spark, Sf)
      .filter(col("doc_id") === 0).select("text").head().getString(0)
    val norm = doc.toLowerCase.replaceAll("\\s+", " ").trim
    val exp = java.security.MessageDigest.getInstance("MD5")
      .digest(norm.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val got = TextOps.q36Fingerprint(spark, Sf)
      .filter(col("doc_id") === 0).head().getAs[String]("fp_md5")
    assert(got == exp)
  }

  test("q37 minhash pairs: ordered ids, jaccard estimate in [0.5, 1]") {
    val rows = TextOps.q37MinhashPairs(spark, Sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"))
      val j = r.getAs[Double]("est_jaccard")
      assert(j >= 0.5 && j <= 1.0)
    }
  }

  test("q37 has no forced broadcast on either re-attach side (AQE decides)") {
    // a hard broadcast() on the full signature frame is a memory
    // ceiling at 100x corpus — only the SHUFFLE_HASH pair-stage hint
    // is allowed to survive in the plan
    import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, ResolvedHint}
    val plan = TextOps.q37MinhashPairs(spark, Sf).queryExecution.analyzed
    val forced = plan.collect {
      case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) => h
    }
    assert(forced.isEmpty, s"forced broadcast hints in q37 plan: $forced")
  }

  test("q143 sorted-neighborhood: ordered pairs, jaccard in [0.5, 1], shared prefix") {
    val rows = TextOps.q143SortedNeighborhood(spark, Sf).collect()
    assert(rows.nonEmpty, "corpus has planted near-dups; window must catch some")
    val norms = graft.Tables.documents(spark, Sf)
      .selectExpr("doc_id", "trim(regexp_replace(lower(text), '\\\\s+', ' ')) AS n")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))
      val j = r.getAs[Double]("jaccard")
      assert(a < b && j >= 0.5 && j <= 1.0)
      // candidates can only arise inside one 8-char-prefix sort block
      assert(norms(a).take(8) == norms(b).take(8),
        s"pair ($a,$b) crosses sort blocks")
    }
  }

  test("q149 BPE: greedy left-to-right merge, merged symbol feeds next round") {
    import spark.implicits._
    // corpus "aaa"x2 + "bb": round 1 must pick (a,a) with count 4 — the
    // overlapping "aaa" contributes TWO occurrences per word (greedy
    // left-to-right replace then merges only the first: ["aa","a"]) —
    // round 2 must pair the MERGED symbol (aa,a), round 3 falls to (b,b)
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    Seq((0L, "en", "fixture", "aaa bb aaa", 10))
      .toDF("doc_id", "lang", "source", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextOps.q149BpeMerges(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(rows == Seq((1, "a", "a", 4L), (2, "aa", "a", 2L), (3, "b", "b", 1L)),
      s"got $rows")
  }

  test("q149 BPE: merge is symbol-boundary-safe (no gluing across a prior merge)") {
    import spark.implicits._
    // vocab th:4, the:1, he:2 — round 1 merges (t,h) cnt 5, so "the"
    // becomes [th, e]. Round 2 picks (h,e) cnt 2 (from "he"); a string
    // replace of "h<sep>e" would ALSO match inside "th<sep>e", gluing
    // [th,e] into [the] even though its adjacency is (th,e) not (h,e).
    // The fold must leave it alone, so round 3 still finds (th,e).
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe2").toString
    Seq((0L, "en", "fixture", "th th th th the he he", 21))
      .toDF("doc_id", "lang", "source", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextOps.q149BpeMerges(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(rows == Seq((1, "t", "h", 5L), (2, "h", "e", 2L),
      (3, "th", "e", 1L)), s"got $rows")
  }

  test("q149 BPE: runs of identical symbols merge non-overlapping pairwise") {
    import spark.implicits._
    // "aaaa" + (a,a) must become [aa, aa] (textbook greedy) — a
    // separator-padded replace consumes the shared separator and
    // yields [aa, a, a], which would flip round 2 to (aa,a)/(a,a)
    // instead of the correct (aa,aa).
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe3").toString
    Seq((0L, "en", "fixture", "aaaa", 4))
      .toDF("doc_id", "lang", "source", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextOps.q149BpeMerges(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    // round 3 has no pairs left ("aaaa" is one symbol) — only 2 rows
    assert(rows == Seq((1, "a", "a", 3L), (2, "aa", "aa", 1L)), s"got $rows")
  }

  test("q38 simhash: bands decompose the signature") {
    val rows = TextOps.q38Simhash(spark, Sf).collect()
    assert(rows.length == nDocs)
    rows.foreach { r =>
      val sig = r.getAs[Long]("simhash")
      (0 until 4).foreach { b =>
        assert(r.getAs[Long](s"band$b") == ((sig >>> (b * 16)) & 0xFFFFL))
      }
    }
  }

  test("q87 simhash pairs: verified Hamming<=3, exact dups appear at distance 0") {
    val pairs = TextOps.q87SimhashPairs(spark, Sf).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Int]("hamming")))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b, h) => assert(a < b && h >= 0 && h <= 3) }
    // identical normalized text => identical token stream => identical
    // signature: every exact-dup pair must surface with hamming == 0
    // (band agreement is total, and the planted cluster stays far
    // under the 64-doc bucket cap — clusters BEYOND the cap are
    // deliberately not emitted, see q87's scaladoc). sf0.001 has no
    // exact dups, so plant some: copy docs 0-9 under new ids into a
    // temp documents.parquet and run the registered query on it.
    val tmp = java.nio.file.Files.createTempDirectory("graft_q87").toString
    val docs = graft.Tables.documents(spark, Sf)
    val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)
    docs.unionByName(
        docs.filter(col("doc_id") < 10)
          .withColumn("doc_id", col("doc_id") + maxId + 1))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val planted = TextOps.q87SimhashPairs(spark, tmp).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Int]("hamming")))
    val zeroDist = planted.collect { case (a, b, 0) => (a, b) }.toSet
    (0L until 10L).foreach { i =>
      assert(zeroDist.contains((i, i + maxId + 1)),
        s"planted exact dup ($i, ${i + maxId + 1}) missing from q87 pairs")
    }
  }

  test("decontaminateAgainst takes an external benchmark frame") {
    // a corpus doc measured against a bench set CONTAINING ITSELF must
    // share exactly its own distinct 8-gram count — checks the
    // parameterized path end-to-end with an externally supplied frame
    val docs = graft.Tables.documents(spark, Sf)
    val bench = docs.filter(col("doc_id").between(10, 12))
      .select("doc_id", "text")
    val shared = TextOps.decontaminateAgainst(bench, bench).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_shared")).toMap
    val ownGrams = docs.filter(col("doc_id").between(10, 12))
      .select(col("doc_id"),
        explode(array_distinct(transform(
          sequence(lit(0), greatest(length(
            trim(regexp_replace(lower(col("text")), "\\s+", " "))) - 8, lit(0))),
          i => trim(regexp_replace(lower(col("text")), "\\s+", " "))
            .substr(i + 1, lit(8))))).as("g"))
      .groupBy("doc_id").agg(countDistinct(col("g")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(shared.keySet == ownGrams.keySet)
    ownGrams.foreach { case (id, n) =>
      assert(shared(id) >= n, s"doc $id shares ${shared(id)} < own $n grams")
    }
  }

  test("distinct_gram_count matches a reference implementation (incl. CJK, shorts)") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val samples = Seq("abcabcabc", "aaaa", "abc", "", "中文中文中文字",
      "the quick brown fox jumps over the lazy dog")
    val got = samples.toDF("s")
      .select(call_function("distinct_gram_count", col("s"), lit(4)).as("n"))
      .collect().map(_.getInt(0)).toSeq
    val ref = samples.map { s =>
      val cps = s.codePoints.toArray
      (0 to cps.length - 4).map(i => new String(cps, i, 4)).distinct.size
    }
    assert(got == ref, s"$got != $ref")
    // and the full q73 column agrees with the explode-aggregate form
    val viaExpr = TextOps.q73Repetition(spark, Sf).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    val viaExplode = graft.Tables.documents(spark, Sf)
      .select(col("doc_id"),
        trim(regexp_replace(lower(col("text")), "\\s+", " ")).as("norm"))
      .filter(length(col("norm")) >= 4)
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), length(col("norm")) - 4),
        i => substr(col("norm"), i + 1, lit(4)))).as("g"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("ng"),
        countDistinct(col("g")).cast("int").as("nd"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(viaExpr == viaExplode)
  }

  test("minhash_sigs expression is bit-identical to the explode-aggregate form") {
    graft.functions.GraftFunctions.register(spark)
    val norm = trim(regexp_replace(lower(col("text")), "\\s+", " "))
    val viaExpr = graft.Tables.documents(spark, Sf)
      .select(col("doc_id"),
        call_function("minhash_sigs", norm, lit(5), lit(16)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val minCols = (0 until 16).map(j =>
      min(xxhash64(lit(j), col("sh"))).as(s"m$j"))
    val viaAgg = graft.Tables.documents(spark, Sf)
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), greatest(length(norm) - 5, lit(0))),
        i => substr(norm, i + 1, lit(5)))).as("sh"))
      .groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"),
        array((0 until 16).map(j => col(s"m$j")): _*).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaExpr.keySet == viaAgg.keySet)
    viaExpr.foreach { case (id, sig) =>
      assert(sig == viaAgg(id), s"doc $id signature mismatch")
    }
    // edge cases: shorter-than-k and empty-ish strings follow substr's
    // clamped single-window semantics
    import spark.implicits._
    val edge = Seq((0L, "abc"), (1L, "a"), (2L, "abcdef"))
      .toDF("doc_id", "text")
    val e1 = edge.select(col("doc_id"),
        call_function("minhash_sigs", col("text"), lit(5), lit(4)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val eAgg = edge.select(col("doc_id"), explode(transform(
        sequence(lit(0), greatest(length(col("text")) - 5, lit(0))),
        i => substr(col("text"), i + 1, lit(5)))).as("sh"))
      .groupBy("doc_id")
      .agg(min(xxhash64(lit(0), col("sh"))).as("m0"),
        min(xxhash64(lit(1), col("sh"))).as("m1"),
        min(xxhash64(lit(2), col("sh"))).as("m2"),
        min(xxhash64(lit(3), col("sh"))).as("m3"))
      .select(col("doc_id"), array(col("m0"), col("m1"), col("m2"), col("m3")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(e1 == eAgg)
  }

  test("sorted_gram_hashes is bit-identical to the declarative chain") {
    graft.functions.GraftFunctions.register(spark)
    val norm = trim(regexp_replace(lower(col("text")), "\\s+", " "))
    for (k <- Seq(3, 8)) {
      val viaExpr = graft.Tables.documents(spark, Sf)
        .select(col("doc_id"),
          call_function("sorted_gram_hashes", norm, lit(k)).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val viaChain = graft.Tables.documents(spark, Sf)
        .select(col("doc_id"), norm.as("norm"))
        .select(col("doc_id"), sort_array(array_distinct(transform(
          transform(sequence(lit(0), greatest(length(col("norm")) - k, lit(0))),
            i => substr(col("norm"), i + 1, lit(k))),
          g => xxhash64(g)))).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(viaExpr == viaChain, s"k=$k mismatch")
    }
    // short/empty edge cases follow the clamped single-window semantics
    import spark.implicits._
    val e = Seq((0L, "ab"), (1L, ""), (2L, "abcd"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        call_function("sorted_gram_hashes", col("text"), lit(3)).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val eChain = Seq((0L, "ab"), (1L, ""), (2L, "abcd"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), sort_array(array_distinct(transform(
        transform(sequence(lit(0), greatest(length(col("text")) - 3, lit(0))),
          i => substr(col("text"), i + 1, lit(3))),
        g => xxhash64(g)))).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(e == eChain)
  }

  test("q200 phrase search equals a regex count over reassembled text") {
    import org.apache.spark.sql.functions._
    val got = graft.queries.TextOps.queries("q200_phrase_search")(spark, Sf)
      .collect()
      .map(r => (r.getAs[String]("phrase"), r.getAs[Long]("doc_id")) ->
        (r.getAs[Long]("n_matches"), r.getAs[Long]("first_pos"))).toMap
    val docs = graft.Tables.documents(spark, Sf)
      .select(col("doc_id"),
        trim(regexp_replace(lower(col("text")), "\\s+", " ")).as("n"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("n"))
    val phrases = Seq("slow hash batch", "window fast query",
      "data merge group")
    val want = (for {
      (id, n) <- docs; ph <- phrases
      toks = n.split(" ")
      hits = toks.indices.dropRight(2).filter(i =>
        toks(i) + " " + toks(i + 1) + " " + toks(i + 2) == ph)
      if hits.nonEmpty
    } yield (ph, id) -> (hits.size.toLong, hits.min.toLong + 1)).toMap
    assert(got == want)
    assert(got.nonEmpty, "no phrase hits at this SF — pick commoner phrases")
  }

  test("q201 containment: diagonal-free, bounded ppm, symmetric intersections") {
    val rows = graft.queries.CorpusOps
      .queries("q201_source_containment")(spark, Sf).collect()
    assert(rows.nonEmpty)
    val inter = rows.map(r => (r.getAs[String]("src_a"),
      r.getAs[String]("src_b")) -> r.getAs[Long]("inter_sz")).toMap
    rows.foreach { r =>
      assert(r.getAs[String]("src_a") != r.getAs[String]("src_b"))
      val c = r.getAs[Long]("containment_ppm")
      assert(c >= 0 && c <= 1000000L)
      assert(r.getAs[Long]("inter_sz") <=
        math.min(r.getAs[Long]("size_a"), r.getAs[Long]("size_b")))
      // |A∩B| is symmetric even though containment is not
      assert(inter((r.getAs[String]("src_b"), r.getAs[String]("src_a")))
        == r.getAs[Long]("inter_sz"))
    }
  }

  test("q202 Heaps fit: sub-linear growth with a sane r2") {
    val r = graft.queries.TextOps.queries("q202_heaps_fit")(spark, Sf)
      .collect().head
    val beta = r.getAs[Double]("beta")
    assert(r.getAs[Long]("n") >= 2)
    // gram vocabulary grows, but sub-linearly
    assert(beta > 0.0 && beta < 1.0, s"beta=$beta")
    assert(r.getAs[Double]("r2") > 0.5 && r.getAs[Double]("r2") <= 1.0)
    // ln V = ln k + beta ln N must roughly reproduce the final vocab
    val lnK = r.getAs[Double]("ln_k")
    assert(!lnK.isNaN && !lnK.isInfinite)
  }

  test("winnow_fingerprints kernel equals the declarative array chain") {
    graft.functions.GraftFunctions.register(spark)
    val (k, w, enc) = (5, 4, 2097152L)
    val norm = trim(regexp_replace(lower(col("text")), "\\s+", " "))
    val viaKernel = graft.Tables.documents(spark, Sf)
      .select(col("doc_id"), norm.as("n"))
      .filter(length(col("n")) >= k + w - 1)
      .select(col("doc_id"), call_function("winnow_fingerprints",
        col("n"), lit(k), lit(w)).as("f"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaChain = graft.Tables.documents(spark, Sf)
      .select(col("doc_id"), norm.as("n"))
      .filter(length(col("n")) >= k + w - 1)
      .select(col("doc_id"), expr(
        s"""sort_array(array_distinct(transform(
           |  sequence($w, length(n) - ${k - 1}), j ->
           |    array_min(transform(sequence(j - ${w - 1}, j), i ->
           |      CAST(ascii(substr(n, i, 1)) * 923521
           |        + ascii(substr(n, i + 1, 1)) * 29791
           |        + ascii(substr(n, i + 2, 1)) * 961
           |        + ascii(substr(n, i + 3, 1)) * 31
           |        + ascii(substr(n, i + 4, 1)) AS BIGINT) * $enc
           |      + (${enc - 1} - i))) div $enc)))""".stripMargin).as("f"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaKernel == viaChain)
    // too-short docs produce no fingerprints (no descending-sequence
    // ghosts): length in [k, k+w-2] has no full window
    import spark.implicits._
    val short = Seq((0L, "abcde"), (1L, "abcdefg"), (2L, "abcdefgh"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), call_function("winnow_fingerprints",
        col("text"), lit(k), lit(w)).as("f"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).size).toMap
    assert(short == Map(0L -> 0, 1L -> 0, 2L -> 1))
  }

  test("winnow_fingerprints rejects bad parameters loudly, not with garbage") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq("abcdefghij").toDF("text")
    // non-positive k or w: analysis-time failure (w=0 would silently
    // emit Long.MaxValue-derived fingerprints before r9's value check)
    for ((k, w) <- Seq((0, 4), (-1, 4), (5, 0), (5, -2)))
      intercept[org.apache.spark.sql.AnalysisException] {
        df.select(call_function("winnow_fingerprints",
          col("text"), lit(k), lit(w))).collect()
      }
    // a document whose gram-position count exceeds the 2^21-1 packed
    // tie-break budget must throw, not silently corrupt the encoding
    val big = Seq("x" * 2200000).toDF("text")
    val e = intercept[Exception] {
      big.select(call_function("winnow_fingerprints",
        col("text"), lit(5), lit(4))).collect()
    }
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(e).exists(c => c.isInstanceOf[IllegalArgumentException] &&
      c.getMessage.contains("position budget")), s"unexpected: $e")
  }

  test("simhash64 expression is bit-identical to the explode-aggregate form") {
    graft.functions.GraftFunctions.register(spark)
    val norm = trim(regexp_replace(lower(col("text")), "\\s+", " "))
    val viaExpr = graft.Tables.documents(spark, Sf)
      .select(col("doc_id"), call_function("simhash64", norm).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val voteCols = (0 until 64).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1L)
        .otherwise(-1L)).as(s"v$b"))
    val sigCol = (0 until 64)
      .map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce((x, y) => x.bitwiseOR(y))
    val viaAgg = graft.Tables.documents(spark, Sf)
      .select(col("doc_id"), explode(split(norm, "\\s+")).as("t"))
      .select(col("doc_id"), xxhash64(col("t")).as("h"))
      .groupBy("doc_id").agg(voteCols.head, voteCols.tail: _*)
      .select(col("doc_id"), sigCol.as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaExpr == viaAgg)
    // tokenization edges: empty string (one empty token), leading and
    // trailing whitespace (empty first/last tokens) — same both ways
    import spark.implicits._
    val edge = Seq((0L, ""), (1L, " a"), (2L, "a "), (3L, "a  b"))
      .toDF("doc_id", "text")
    val e1 = edge.select(col("doc_id"),
        call_function("simhash64", col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e2 = edge
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("t"))
      .select(col("doc_id"), xxhash64(col("t")).as("h"))
      .groupBy("doc_id").agg(voteCols.head, voteCols.tail: _*)
      .select(col("doc_id"), sigCol.as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(e1 == e2)
  }

  test("byte-walk kernels match their twins on multibyte unicode") {
    // CJK (3-byte UTF-8), emoji (4-byte, surrogate pair in UTF-16),
    // combining marks, and mixed-width runs — a byte-indexed window
    // that is not codepoint-aware diverges from substr() on all of
    // these
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val texts = Seq(
      (0L, "中文处理中文处理完整测试"),
      (1L, "héllo wörld héllo"),
      (2L, "mixed 中en文 text 🎉🎊 done"),
      (3L, "🎉🎊🎈🎉🎊🎈🎉"),
      (4L, "ééé combining"),
      (5L, "中 文 with spaces 中 文"))
    val df = texts.toDF("doc_id", "text")

    val sg = df.select(col("doc_id"),
        call_function("sorted_gram_hashes", col("text"), lit(4)).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val sgChain = df.select(col("doc_id"), sort_array(array_distinct(transform(
        transform(sequence(lit(0), greatest(length(col("text")) - 4, lit(0))),
          i => substr(col("text"), i + 1, lit(4))),
        g => xxhash64(g)))).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sg == sgChain, "sorted_gram_hashes diverges on unicode")

    val mh = df.select(col("doc_id"),
        call_function("minhash_sigs", col("text"), lit(4), lit(4)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val mhAgg = df.select(col("doc_id"), explode(transform(
        sequence(lit(0), greatest(length(col("text")) - 4, lit(0))),
        i => substr(col("text"), i + 1, lit(4)))).as("sh"))
      .groupBy("doc_id")
      .agg(min(xxhash64(lit(0), col("sh"))).as("m0"),
        min(xxhash64(lit(1), col("sh"))).as("m1"),
        min(xxhash64(lit(2), col("sh"))).as("m2"),
        min(xxhash64(lit(3), col("sh"))).as("m3"))
      .select(col("doc_id"),
        array(col("m0"), col("m1"), col("m2"), col("m3")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(mh == mhAgg, "minhash_sigs diverges on unicode")

    val voteCols = (0 until 64).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1L)
        .otherwise(-1L)).as(s"v$b"))
    val sigCol = (0 until 64)
      .map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce((x, y) => x.bitwiseOR(y))
    val sh = df.select(col("doc_id"),
        call_function("simhash64", col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val shAgg = df
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("t"))
      .select(col("doc_id"), xxhash64(col("t")).as("h"))
      .groupBy("doc_id").agg(voteCols.head, voteCols.tail: _*)
      .select(col("doc_id"), sigCol.as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh == shAgg, "simhash64 diverges on unicode")
  }

  test("native cosine expression is bit-identical to the declarative form") {
    val emb = graft.Tables.embeddings(spark, Sf).limit(50)
    val a = emb.select(col("vec_id").as("ida"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("idb"), col("embedding").as("eb"))
    val pairs = a.crossJoin(b).filter(col("ida") < col("idb"))
    val diffs = pairs.select(
      VectorOps.cosine(col("ea"), col("eb")).as("hof"),
      VectorOps.cosineNative(spark, col("ea"), col("eb")).as("native"))
      .filter(col("hof") =!= col("native")) // bit-exact, not approx
      .count()
    assert(diffs == 0)
  }

  test("sorted_intersect_count matches array_intersect cardinality") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { _ =>
      val a = Seq.fill(rnd.nextInt(50) + 1)(rnd.nextInt(40).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(50) + 1)(rnd.nextInt(40).toLong).distinct.sorted
      (a, b)
    }
    val df = rows.toDF("a", "b")
    val bad = df.filter(
      call_function("sorted_intersect_count", col("a"), col("b")) =!=
        size(array_intersect(col("a"), col("b")))).count()
    assert(bad == 0)
  }

  test("cosine of a vector with itself is 1") {
    import spark.implicits._
    val df = Seq((1L, Array(1.0f, 2.0f, 3.0f)), (2L, Array(-1.0f, 0.5f, 0.0f)))
      .toDF("id", "v")
    val sims = df.select(VectorOps.cosine(col("v"), col("v"))).collect()
    sims.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-12))
  }

  test("q40 cosine top-k: ranks 1..10 per query, sims non-increasing") {
    val rows = VectorOps.q40CosineTopK(spark, Sf).collect()
    val perQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(perQ.size == 5)
    perQ.values.foreach { qs =>
      val byRank = qs.sortBy(_.getAs[Int]("rk"))
      assert(byRank.map(_.getAs[Int]("rk")).toSeq == (1 to qs.length))
      val sims = byRank.map(_.getAs[Double]("sim")).toSeq
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
      sims.foreach(s => assert(s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9))
    }
  }

  test("RhpSignatures kernel is bit-identical to the declarative " +
    "per-table signature columns (all tables, incl. the NULL-embedding " +
    "-> 0 collapse and the shorter/longer-than-dims edges)") {
    import org.apache.spark.sql.graft.Bridge
    val (bits, tables) = (8, 8)
    // edge rows ride along (r13 ADVICE — the twin must hold beyond the
    // fixed 64-dim fixtures): NULL embedding (both sides -> 0), an
    // array SHORTER than dims (zip_with null-pads the ARRAY side ->
    // declarative fold null-dilutes -> 0), and an array LONGER than
    // dims (zip_with null-pads the SEQUENCE side -> xxhash64 skips the
    // null index, extra elements fold with the hash-of-null sign —
    // generally NON-zero, so a kernel short-circuit would diverge here)
    val shortArr = array((0 until 32).map(i => lit(0.5f - i * 0.01f)): _*)
    val longArr = array((0 until 70).map(i => lit(i * 0.03f - 1.0f)): _*)
    val emb = graft.Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding"))
      .unionAll(spark.range(1).select(lit(-1L).as("vec_id"),
        lit(null).cast("array<float>").as("embedding")))
      .unionAll(spark.range(1).select(lit(-2L).as("vec_id"),
        shortArr.cast("array<float>").as("embedding")))
      .unionAll(spark.range(1).select(lit(-3L).as("vec_id"),
        longArr.cast("array<float>").as("embedding")))
    val kernel = Bridge.column(graft.functions.RhpSignatures(
      Bridge.expr(col("embedding")), bits, tables, 64))
    val viaKernel = emb.select(col("vec_id"), kernel.as("sigs"))
      .select(col("vec_id") +: (0 until tables).map(t =>
        coalesce(col("sigs").getItem(t), lit(0L)).as(s"s_$t")): _*)
      .collect().map(r => r.getLong(0) ->
        (1 to tables).map(r.getLong)).toMap
    val declarative = emb.select(col("vec_id") +: (0 until tables).map(t =>
      VectorOps.rhpSignature(col("embedding"), bits, t * bits)
        .as(s"s_$t")): _*)
      .collect().map(r => r.getLong(0) ->
        (1 to tables).map(r.getLong)).toMap
    assert(viaKernel.size > 1 && viaKernel == declarative)
    assert(viaKernel(-1L).forall(_ == 0L), "NULL embedding must map to 0")
    assert(viaKernel(-2L).forall(_ == 0L), "short array must map to 0")
    assert(viaKernel(-3L).exists(_ != 0L),
      "long-array fixture must exercise a non-zero padded fold — " +
        "otherwise this edge pins nothing")
  }

  test("q41 ANN candidates are a subset of brute-force scoring space") {
    val rows = VectorOps.q41AnnLsh(spark, Sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("query_id") < 5)
      assert(r.getAs[Long]("cand_id") >= 5)
    }
  }

  // --- ANN recall gate: q41/q51 measured against q40's exact top-10.
  // The ground truth is free — q40 computes it on the same table with
  // the same cosine expression, so a recall regression turns red here
  // even though both ANN queries stay rows-only in CORRECTNESS.
  lazy val exactTop10: Map[Long, Set[Long]] =
    VectorOps.q40CosineTopK(spark, Sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("cand_id")).toSet }

  private def recallAt10(df: org.apache.spark.sql.DataFrame): Double = {
    val got = df.collect().groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("cand_id")).toSet }
    exactTop10.map { case (q, truth) =>
      // denominator is the ground-truth size, not a hard-coded 10, so a
      // k change in q40 fails the shape assert loudly instead of
      // silently mis-scaling every recall gate
      assert(truth.size == 10, s"ground truth for query $q has ${truth.size} != 10 rows")
      got.getOrElse(q, Set.empty[Long]).count(truth).toDouble / truth.size
    }.sum / exactTop10.size
  }

  test("q148 Hamming-shortlist + cosine re-rank: ranked by sim, " +
    "shortlist carries signal") {
    val got = VectorOps.q148HammingTopK(spark, Sf).collect()
    val perQ = got.groupBy(_.getAs[Long]("query_id"))
    assert(perQ.size == 5)
    perQ.values.foreach { qs =>
      assert(qs.map(_.getAs[Int]("rk")).sorted.toSeq == (1 to 10))
      // sim is non-increasing in rank (the re-rank sort key since r13;
      // hamming rides along as the shortlist diagnostic)
      val byRk = qs.sortBy(_.getAs[Int]("rk"))
      val sims = byRk.map(_.getAs[Double]("sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
      assert(byRk.map(_.getAs[Int]("hamming")).forall(h => h >= 0 && h <= 64))
    }
    // the composed tier re-ranks the sign-bit shortlist at full
    // precision, so recall must be far above the Hamming-only ~0.3
    // band (and the ~0.5% random-pick floor); RecallAtScaleSpec pins
    // 0.85 at sf0.1
    val r = recallAt10(VectorOps.q148HammingTopK(spark, Sf))
    assert(r >= 0.5, s"composed sign-bit recall@10 = $r")
  }

  test("q150 PQ ADC: ranked per query, monotone distance, enriches for true neighbors") {
    val got = VectorOps.q150PqAnn(spark, Sf).collect()
    val perQ = got.groupBy(_.getAs[Long]("query_id"))
    assert(perQ.size == 5)
    perQ.values.foreach { qs =>
      assert(qs.map(_.getAs[Int]("rk")).sorted.toSeq == (1 to 10))
      val byRk = qs.sortBy(_.getAs[Int]("rk")).map(_.getAs[Long]("adc_dist"))
      assert(byRk.zip(byRk.tail).forall { case (a, b) => a <= b })
      assert(byRk.forall(_ >= 0L))
    }
    // 8-byte codes are lossy but must beat the ~0.5% random-pick floor
    // (full hash-exact semantics — encode argmin, ADC table, top-k —
    // are verified by the independent DuckDB oracle)
    val r = recallAt10(VectorOps.q150PqAnn(spark, Sf))
    assert(r >= 0.1, s"PQ ADC recall@10 = $r — indistinguishable from random")
  }

  test("q153 quantile norm: per-dim ranks form a permutation") {
    val rows = VectorOps.q153QuantileNorm(spark, Sf).collect()
    val n = rows.length.toLong
    rows.foreach { r =>
      assert(r.getAs[Long]("min_rank") >= 0)
      assert(r.getAs[Long]("max_rank") <= n - 1)
      val mq = r.getAs[Double]("mean_quantile")
      assert(mq >= 0.0 && mq <= 1.0)
    }
    // each of the 64 dims assigns ranks 0..n-1 exactly once, so the
    // grand total of sum_rank is 64 * n(n-1)/2 — any duplicate or
    // dropped rank breaks this
    val grand = rows.map(_.getAs[Long]("sum_rank")).sum
    assert(grand == 64L * n * (n - 1) / 2, s"rank mass $grand")
  }

  test("q154 calibration: bins partition the corpus into deciles") {
    val rows = VectorOps.q154Calibration(spark, Sf).collect()
    assert(rows.map(_.getAs[Int]("bin")).sorted.toSeq == (0 to 9))
    val n = rows.map(_.getAs[Long]("n")).sum
    assert(n == graft.Tables.embeddings(spark, Sf).count())
    rows.foreach { r =>
      // exact decile boundaries: each bin holds ~n/10 (float ties only)
      assert(math.abs(r.getAs[Long]("n") - n / 10.0) <= 2,
        s"bin ${r.getAs[Int]("bin")} holds ${r.getAs[Long]("n")} of $n")
      val rate = r.getAs[Double]("pos_rate")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(r.getAs[Long]("n_pos") <= r.getAs[Long]("n"))
    }
  }

  test("LSH ANN: exhaustive multi-probe (maxHamming = bits) IS exact") {
    val ann = VectorOps.annLsh(spark, Sf, bits = 4, maxHamming = 4, k = 10)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rk"),
        r.getAs[Long]("cand_id"))).toSeq.sorted
    val exact = VectorOps.q40CosineTopK(spark, Sf)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rk"),
        r.getAs[Long]("cand_id"))).toSeq.sorted
    assert(ann == exact)
  }

  test("LSH ANN: Hamming-1 multi-probe recall dominates single-probe") {
    val r0 = recallAt10(VectorOps.annLsh(spark, Sf, 8, 0, 10))
    val r1 = recallAt10(VectorOps.annLsh(spark, Sf, 8, 1, 10))
    assert(r1 >= r0, s"multi-probe recall $r1 < single-probe $r0")
  }

  test("LSH ANN: 4-bit Hamming<=2 multi-probe clears the recall gate") {
    val r = recallAt10(VectorOps.annLsh(spark, Sf, bits = 4, maxHamming = 2, k = 10))
    // this random-noise corpus (top-10 cosines 0.24-0.40, no planted
    // neighbors) is LSH-hostile; 0.82 simulated mean for this config
    assert(r >= 0.5, s"recall@10 = $r < 0.5")
  }

  test("PCA ANN: exact at full candidates, monotone in candidate count") {
    // re-ranking every candidate with exact cosine IS brute force
    val rAll = recallAt10(VectorOps.annPca(spark, Sf, 8, 100000, 10))
    assert(rAll == 1.0, s"full-candidate recall $rAll != 1")
    val r25 = recallAt10(VectorOps.annPca(spark, Sf, 8, 25, 10))
    val r200 = recallAt10(VectorOps.annPca(spark, Sf, 8, 200, 10))
    assert(r200 >= r25, s"recall not monotone: 200-cand $r200 < 25-cand $r25")
  }

  test("PcaProject kernel is bit-identical to the declarative projection tree") {
    val pcs = VectorOps.topPrincipalComponents(spark, Sf, 4)
    val emb = graft.Tables.embeddings(spark, Sf).limit(50)
    val native = emb.select(org.apache.spark.sql.graft.Bridge.column(
        graft.functions.PcaProject(
          org.apache.spark.sql.graft.Bridge.expr(col("embedding")), pcs))
        .as("p"))
      .collect().map(_.getSeq[Float](0))
    val declarative = emb.select(array((0 until 4).map(j =>
        (0 until 64).map(i => col("embedding").getItem(i).cast("double") *
          lit(pcs(j)(i))).reduce(_ + _)): _*).cast("array<float>").as("p"))
      .collect().map(_.getSeq[Float](0))
    assert(native.length == 50)
    native.zip(declarative).foreach { case (a, b) => assert(a == b) }
  }

  test("q110 PCA ANN clears the recall gate") {
    val r = recallAt10(VectorOps.q110AnnPca(spark, Sf))
    // random-noise corpus: 8 of 64 dims keep ~12% of the variance, so
    // reduced-space ordering is a weak proxy — the gate is deliberately
    // modest, like the LSH one; real embedding corpora concentrate
    // variance and score far higher
    assert(r >= 0.4, s"recall@10 = $r < 0.4")
  }

  test("IVF ANN: probing every list IS exact; nprobe=2 clears the gate") {
    val annAll = VectorOps.annIvf(spark, Sf, nprobe = Int.MaxValue, k = 10)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rk"),
        r.getAs[Long]("cand_id"))).toSeq.sorted
    val exact = VectorOps.q40CosineTopK(spark, Sf)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rk"),
        r.getAs[Long]("cand_id"))).toSeq.sorted
    assert(annAll == exact)
    val r2 = recallAt10(VectorOps.annIvf(spark, Sf, nprobe = 2, k = 10))
    // simulated 0.64 for nprobe=2 of K=4 lists on this corpus
    assert(r2 >= 0.4, s"IVF nprobe=2 recall@10 = $r2 < 0.4")
  }

  test("q51 IVF ANN returns ranked candidates per query from probed lists") {
    val rows = VectorOps.q51AnnIvf(spark, Sf).collect()
    val perQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(perQ.size == 5)
    perQ.values.foreach { qs =>
      assert(qs.map(_.getAs[Int]("rk")).sorted.toSeq == (1 to qs.length))
      assert(qs.forall(_.getAs[Long]("cand_id") >= 5))
    }
  }

  test("q42 binary metadata byte counts match document text bytes") {
    val meta = MultimodalOps.q42BinaryMeta(spark, Sf)
      .filter(col("doc_id") === 0).head()
    val txt = graft.Tables.documents(spark, Sf)
      .filter(col("doc_id") === 0).select("text").head().getString(0)
    assert(meta.getAs[Int]("n_bytes") == txt.getBytes("UTF-8").length)
  }

  test("q43 PNG decode roundtrips real headers, CRC verified") {
    val rows = MultimodalOps.q43PngDecode(spark, Sf).collect()
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Boolean]("png_ok"), s"doc $id: png checks failed")
      assert(r.getAs[Int]("width") == (id % 1024 + 1).toInt)
      assert(r.getAs[Int]("height") == (id % 768 + 1).toInt)
      assert(r.getAs[Int]("bit_depth") == 8 && r.getAs[Int]("color_type") == 2)
    }
  }

  test("q43 PNG blobs are readable by javax.imageio (header-level)") {
    // an INDEPENDENT third parser: the JDK's PNG ImageReader identifies
    // the format and reads dimensions from the IHDR bytes alone
    val blobs = MultimodalOps.mediaBlobs(spark, Sf)
      .select("doc_id", "png").limit(8).collect()
    assert(blobs.nonEmpty)
    blobs.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val bytes = r.getAs[Array[Byte]]("png")
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      assert(readers.hasNext, s"doc $id: imageio does not recognize PNG")
      val reader = readers.next()
      reader.setInput(iis)
      assert(reader.getFormatName.toLowerCase.contains("png"))
      assert(reader.getWidth(0) == (id % 1024 + 1).toInt)
      assert(reader.getHeight(0) == (id % 768 + 1).toInt)
      reader.dispose(); iis.close()
    }
  }

  test("q108 bounded-state covariance matches the explode+groupBy twin") {
    val cells = VectorOps.q108Covariance(spark, Sf).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(cells.size == 64 * 65 / 2)
    // declarative twin: per-vector (i, j) pair explode, same floor
    // quantization, shuffles 2080 rows per vector — the shape the
    // Aggregator exists to avoid, used here as the reference
    val emb = graft.Tables.embeddings(spark, Sf)
    val el = emb.select(col("vec_id"),
      posexplode(col("embedding")).as(Seq("i", "x")))
      .select(col("vec_id"), col("i"), col("x").cast("double").as("x"))
    val m = el.groupBy("i")
      .agg((sum(floor(col("x") * 1e9).cast("long")).cast("double") / 1e9 /
        count(lit(1))).as("m"))
    val cen = el.join(m, "i")
      .select(col("vec_id"), col("i"), (col("x") - col("m")).as("c"))
    val twin = cen.as("a")
      .join(cen.as("b"),
        col("a.vec_id") === col("b.vec_id") && col("a.i") <= col("b.i"))
      .groupBy(col("a.i").as("i"), col("b.i").as("j"))
      .agg(sum(floor(col("a.c") * col("b.c") * 1e9).cast("long")).as("cs"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(cells == twin)
  }

  test("q197 winnowing guarantees shared fingerprints on a long shared substring") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.TextOps.queries("q197_winnowing")(spark, Sf)
      .collect()
    // pairs are symmetric-deduped, ordered, and meet the floor
    rows.foreach { r =>
      assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"))
      assert(r.getAs[Long]("n_shared") >= 3)
    }
    // planted check: two docs sharing a 200-char substring MUST share
    // fingerprints (winnowing guarantee: any match >= k+w-1 = 8 chars
    // yields at least one common selected hash)
    val shared = "the quick brown fox jumps over the lazy dog " * 5
    val base = graft.Tables.documents(spark, Sf).limit(0)
    val planted = spark.createDataFrame(java.util.List.of(
      org.apache.spark.sql.Row(9000001L, s"prefix one $shared", "en", "t", 1L),
      org.apache.spark.sql.Row(9000002L, s"other lead-in $shared tail", "en", "t", 1L)),
      base.schema)
    val tmp = java.nio.file.Files.createTempDirectory("graft_winnow").toString
    graft.Tables.names.foreach { t =>
      val df = if (t == "documents") planted else graft.Tables(spark, Sf, t)
      df.write.mode("overwrite").parquet(s"$tmp/$t.parquet")
    }
    val p = graft.queries.TextOps.queries("q197_winnowing")(spark, tmp)
      .collect()
    assert(p.exists(r => r.getAs[Long]("id_a") == 9000001L &&
      r.getAs[Long]("id_b") == 9000002L && r.getAs[Long]("n_shared") >= 3),
      s"planted near-dup not found: ${p.mkString(";")}")
  }

  test("q198 prefix join is EXACT: equals brute-force all-pairs jaccard at threshold") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.TextOps.queries("q198_prefix_join")(spark, Sf)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("jac_ppm"))).toSet
    // brute force over every same-language doc pair — no prefix
    // filter, no length filter: proves the filters lose nothing
    val sets = graft.Tables.documents(spark, Sf)
      .select(col("doc_id"), col("lang"),
        trim(regexp_replace(lower(col("text")), "\\s+", " ")).as("n"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[String]("n").sliding(5).filter(_.length == 5).toSet))
      .filter(_._3.nonEmpty)
    val brute = (for {
      (a, la, ga) <- sets; (b, lb, gb) <- sets if a < b && la == lb
      inter = (ga & gb).size.toLong
      union = ga.size + gb.size - inter
      if inter * 5L >= union * 4L
    } yield (a, b, inter * 1000000L / union)).toSet
    assert(rows == brute,
      s"missing=${(brute -- rows).take(3)} extra=${(rows -- brute).take(3)}")
  }

  test("q209 fertility: merges shrink tokens-per-word below chars-per-word") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.TextOps.queries("q209_bpe_fertility")(spark, Sf)
      .collect()
    assert(rows.nonEmpty)
    // chars-per-word baseline: with zero merges fertility == word length
    val base = graft.Tables.documents(spark, Sf)
      .select(col("lang"), explode(split(trim(regexp_replace(
        lower(col("text")), "\\s+", " ")), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("lang")
      .agg(sum(length(col("w")).cast("long")).as("sum_chars"),
        count(lit(1)).as("n_words"))
      .collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("sum_chars") * 1000000L / r.getAs[Long]("n_words"),
          r.getAs[Long]("n_words"))).toMap
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val f = r.getAs[Long]("fertility_ppm")
      assert(r.getAs[Long]("n_words") == base(lang)._2)
      // 3 merges strictly reduce the corpus-wide symbol count, and can
      // never push fertility below 1 token/word
      assert(f < base(lang)._1, s"$lang: $f !< chars ${base(lang)._1}")
      assert(f >= 1000000L)
      assert(f ==
        r.getAs[Long]("n_tokens") * 1000000L / r.getAs[Long]("n_words"))
    }
  }

  test("q207 matryoshka recall agrees with an in-memory two-precision rerank") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.VectorOps
      .queries("q207_matryoshka_recall")(spark, Sf).collect()
    assert(rows.map(_.getAs[Long]("query_id")).toSeq == (0L to 4L))
    val emb = graft.Tables.embeddings(spark, Sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding").toArray).toMap
    def cos(a: Array[Float], b: Array[Float], d: Int): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- 0 until d) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val qs = emb.keys.filter(_ < 5).toSeq.sorted
    val cs = emb.keys.filter(_ >= 5).toSeq
    rows.foreach { r =>
      val q = r.getAs[Long]("query_id")
      def top10(d: Int) = cs.map(c => c -> cos(emb(q), emb(c), d))
        .sortBy { case (c, s) => (-s, c) }.take(10).map(_._1)
      val (f, t) = (top10(64), top10(16))
      assert(r.getAs[Long]("n_overlap") == f.toSet.intersect(t.toSet).size)
      assert(r.getAs[Boolean]("top1_kept") == t.contains(f.head))
    }
  }

  test("topPrincipalComponent is a unit-norm eigenvector of q108's matrix") {
    val (v, lambda) = VectorOps.topPrincipalComponent(spark, Sf)
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9)
    assert(lambda > 0)
    val c = Array.ofDim[Double](64, 64)
    VectorOps.q108Covariance(spark, Sf).collect().foreach { r =>
      val (i, j, cv) = (r.getInt(0), r.getInt(1), r.getDouble(3))
      c(i)(j) = cv; c(j)(i) = cv
    }
    def resid(vec: Array[Double], l: Double): Double = {
      val cv = Array.tabulate(64)(i =>
        (0 until 64).map(j => c(i)(j) * vec(j)).sum)
      math.sqrt(
        cv.zip(vec).map { case (a, b) => val d = a - l * b; d * d }.sum) / l
    }
    // near-random embeddings have a small eigengap, so convergence is
    // slow — gate loosely and assert it tightens with more iterations
    assert(resid(v, lambda) < 1e-2, s"residual ${resid(v, lambda)}")
    val (v3, l3) = VectorOps.topPrincipalComponent(spark, Sf, iters = 300)
    assert(resid(v3, l3) < resid(v, lambda))
    // deterministic across runs
    val (v2, l2) = VectorOps.topPrincipalComponent(spark, Sf)
    assert(v.toSeq == v2.toSeq && lambda == l2)
  }

  test("rabin_boundaries kernel is bit-identical to the declarative " +
    "filter-HOF polynomial (corpus + edge cases)") {
    graft.functions.GraftFunctions.register(spark)
    def viaKernel(df: org.apache.spark.sql.DataFrame) = df
      .filter(length(col("text")) >= 1)
      .select(col("doc_id"),
        explode(call_function("rabin_boundaries", col("text"),
          lit(8), lit(16))).as("i"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    def viaTwin(df: org.apache.spark.sql.DataFrame) =
      CorpusOps.cdcBoundariesDeclarative(df)
        .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val docs = graft.Tables.documents(spark, Sf)
      .select(col("doc_id"), col("text"))
    val k = viaKernel(docs)
    assert(k === viaTwin(docs), "corpus boundary mismatch")
    assert(k.nonEmpty, "fixture corpus should produce some boundaries")
    // edge cases: shorter than the window (no hash boundaries),
    // exactly the window, a boundary-free long run, accented/CJK/
    // astral code points (split("") cuts per code point and ascii()
    // returns the TRUE code point \u2014 the kernel decodes UTF-8 to the
    // same units), and a repeated pattern (identical windows ->
    // aligned boundaries). Non-ASCII is CONSTRUCTED from code points
    // so no editor/pipe encoding can corrupt the fixture.
    import spark.implicits._
    val cafe = "caf" + 0xe9.toChar + " au lait, "
    val cjk = ("one" + 0x4e2d.toChar + 0x6587.toChar + "two") * 5
    val astral = ("ab" + new String(Character.toChars(0x1F600)) + "cd") * 6
    val edges = Seq(
      (0L, "short"), (1L, "12345678"), (2L, "a" * 200),
      (3L, cafe * 3 + "end!"),
      (4L, ("the quick brown fox. " * 20)),
      (5L, cjk), (6L, astral)).toDF("doc_id", "text")
    assert(viaKernel(edges) === viaTwin(edges), "edge-case mismatch")
    // the kernel agrees with itself across partitionings (pure per-row)
    assert(viaKernel(edges.repartition(7)) === viaKernel(edges))
  }

  test("rabin_gram_keys kernel is bit-identical to the declarative " +
    "element_at polynomial (corpus + edge cases)") {
    graft.functions.GraftFunctions.register(spark)
    def viaKernel(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(call_function("rabin_gram_keys", col("text"),
        lit(5))).as("g"))
      .collect().map(_.getLong(0)).sorted.toSeq
    def viaTwin(df: org.apache.spark.sql.DataFrame) =
      CorpusOps.noveltyGramsDeclarative(df)
        .collect().map(_.getLong(0)).sorted.toSeq
    val docs = graft.Tables.documents(spark, Sf)
      .filter(col("text").isNotNull).select(col("text"))
    val k = viaKernel(docs)
    assert(k === viaTwin(docs), "corpus gram-key mismatch")
    assert(k.nonEmpty)
    import spark.implicits._
    val cafe = "caf" + 0xe9.toChar + " au lait, "
    val cjk = ("one" + 0x4e2d.toChar + 0x6587.toChar + "two") * 5
    val astral = ("ab" + new String(Character.toChars(0x1F600)) + "cd") * 6
    val edges = Seq("tiny", "12345", "z" * 40, cafe * 3, cjk, astral)
      .toDF("text")
    assert(viaKernel(edges) === viaTwin(edges), "edge-case mismatch")
    // exactly n-k+1 keys per doc, none for shorter-than-k
    assert(viaKernel(Seq("abcd").toDF("text")).isEmpty)
    assert(viaKernel(Seq("abcde").toDF("text")).length === 1)
  }
}
