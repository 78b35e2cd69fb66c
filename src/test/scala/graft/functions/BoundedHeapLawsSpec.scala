package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic laws of the bounded-heap aggregators, property-tested
  * over random inputs (no Spark session — the Aggregator methods are
  * pure). These laws are exactly what Spark's partial aggregation
  * assumes when it runs `reduce` map-side and `merge` across
  * arbitrary partition splits in arbitrary order: if any of them
  * failed on some input, the aggregate's answer would depend on the
  * physical partitioning — the bug class the spec-level
  * partition-invariance tests (q227/q228) sample and these properties
  * sweep. */
class BoundedHeapLawsSpec extends AnyFunSuite {

  private def check(name: String)(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val scored: Gen[ScoredId] = for {
    s <- Gen.chooseNum(-50L, 50L) // small domain => many ties
    id <- Gen.chooseNum(0L, 40L)
  } yield ScoredId(s, id)

  private val keyed: Gen[KeyedId] = for {
    k <- Gen.oneOf("a", "b", "ba", "ab", "z", "", "aa", "b0")
    id <- Gen.chooseNum(0L, 40L)
  } yield KeyedId(k, id)

  private def refTop(xs: Seq[ScoredId], k: Int): Seq[ScoredId] =
    xs.sortBy(x => (-x.score, x.id)).take(k)

  private def refBottom(xs: Seq[KeyedId], k: Int): Seq[KeyedId] =
    xs.sortBy(x => (x.key, x.id)).take(k)

  test("TopKByScore: reduce-fold equals the reference sort-take") {
    check("fold=ref")(Prop.forAll(Gen.listOf(scored),
      Gen.chooseNum(1, 7)) { (xs, k) =>
      val agg = TopKByScore(k)
      xs.foldLeft(agg.zero)(agg.reduce) == refTop(xs, k)
    })
  }

  test("TopKByScore: merge of any split equals the unsplit fold " +
    "(partial-aggregation correctness), commutes, and zero is identity") {
    check("merge laws")(Prop.forAll(Gen.listOf(scored),
      Gen.chooseNum(0, 100), Gen.chooseNum(1, 7)) { (xs, cut, k) =>
      val agg = TopKByScore(k)
      val (l, r) = xs.splitAt(cut % (xs.size + 1))
      val lf = l.foldLeft(agg.zero)(agg.reduce)
      val rf = r.foldLeft(agg.zero)(agg.reduce)
      val merged = agg.merge(lf, rf)
      merged == xs.foldLeft(agg.zero)(agg.reduce) &&
        agg.merge(rf, lf) == merged &&
        agg.merge(merged, agg.zero) == merged &&
        agg.merge(agg.zero, merged) == merged
    })
  }

  test("BottomKByKey: reduce-fold equals the reference sort-take") {
    check("fold=ref")(Prop.forAll(Gen.listOf(keyed),
      Gen.chooseNum(1, 7)) { (xs, k) =>
      val agg = BottomKByKey(k)
      xs.foldLeft(agg.zero)(agg.reduce) == refBottom(xs, k)
    })
  }

  test("BottomKByKey: merge of any split equals the unsplit fold, " +
    "commutes, and zero is identity") {
    check("merge laws")(Prop.forAll(Gen.listOf(keyed),
      Gen.chooseNum(0, 100), Gen.chooseNum(1, 7)) { (xs, cut, k) =>
      val agg = BottomKByKey(k)
      val (l, r) = xs.splitAt(cut % (xs.size + 1))
      val lf = l.foldLeft(agg.zero)(agg.reduce)
      val rf = r.foldLeft(agg.zero)(agg.reduce)
      val merged = agg.merge(lf, rf)
      merged == xs.foldLeft(agg.zero)(agg.reduce) &&
        agg.merge(rf, lf) == merged &&
        agg.merge(merged, agg.zero) == merged &&
        agg.merge(agg.zero, merged) == merged
    })
  }

  test("BottomKByKey: duplicate (key, id) entries keep multiplicity " +
    "like the reference sort (stability under ties)") {
    check("dup multiplicity")(Prop.forAll(Gen.listOf(keyed),
      Gen.chooseNum(1, 5)) { (xs, k) =>
      val doubled = xs ++ xs
      val agg = BottomKByKey(k)
      doubled.foldLeft(agg.zero)(agg.reduce) == refBottom(doubled, k)
    })
  }

  // ---- round-11 aggregators: TopKByScoreKey / BottomKByScore

  /** UTF-8 byte order — what Spark's ORDER BY and DuckDB's binary
    * collation use, and what the aggregators must therefore agree
    * with. Java String ordering (UTF-16 code units) differs: U+E000..
    * U+FFFF sort ABOVE astral code points in UTF-16, below in UTF-8. */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < x.length && i < y.length) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  // includes U+E000 (BMP private use, 3-byte UTF-8) and U+10000
  // (astral, 4-byte UTF-8) — the exact pair where UTF-16 and UTF-8
  // orders flip — plus ASCII prefixes/ties
  private val puaKey = 0xE000.toChar.toString
  private val astralKey = new String(Character.toChars(0x10000))
  private val utf8Keys = Gen.oneOf(
    "a", "ab", "b", "", puaKey, astralKey, "a" + puaKey,
    "a" + astralKey, "z")

  private val scoredKey: Gen[ScoredKey] = for {
    s <- Gen.chooseNum(-20L, 20L) // ties common => tie-break exercised
    key <- utf8Keys
  } yield ScoredKey(s, key)

  private def refTopKey(xs: Seq[ScoredKey], k: Int): Seq[ScoredKey] =
    xs.sortWith((a, b) =>
      a.score > b.score || (a.score == b.score && utf8Lt(a.key, b.key)))
      .take(k)

  test("TopKByScoreKey: reduce-fold equals the UTF-8-ordered " +
    "reference sort-take, including astral/BMP boundary keys") {
    check("fold=ref")(Prop.forAll(Gen.listOf(scoredKey),
      Gen.chooseNum(1, 7)) { (xs, k) =>
      val agg = TopKByScoreKey(k)
      xs.foldLeft(agg.zero)(agg.reduce) == refTopKey(xs, k)
    })
  }

  test("TopKByScoreKey: merge of any split equals the unsplit fold, " +
    "commutes, and zero is identity") {
    check("merge laws")(Prop.forAll(Gen.listOf(scoredKey),
      Gen.chooseNum(0, 100), Gen.chooseNum(1, 7)) { (xs, cut, k) =>
      val agg = TopKByScoreKey(k)
      val (l, r) = xs.splitAt(cut % (xs.size + 1))
      val lf = l.foldLeft(agg.zero)(agg.reduce)
      val rf = r.foldLeft(agg.zero)(agg.reduce)
      val merged = agg.merge(lf, rf)
      merged == xs.foldLeft(agg.zero)(agg.reduce) &&
        agg.merge(rf, lf) == merged &&
        agg.merge(merged, agg.zero) == merged &&
        agg.merge(agg.zero, merged) == merged
    })
  }

  test("TopKByScoreKey: large k (q104's 1000) stays exact") {
    check("large k")(Prop.forAll(Gen.listOfN(300, scoredKey)) { xs =>
      val agg = TopKByScoreKey(1000)
      xs.foldLeft(agg.zero)(agg.reduce) == refTopKey(xs, 1000)
    })
  }

  private val scoredRow: Gen[ScoredRow] = for {
    s <- Gen.oneOf(Gen.chooseNum(-5.0, 5.0),
      Gen.oneOf(Double.NegativeInfinity, 0.0, 1.0)) // -Inf = NULL key map
    id <- Gen.chooseNum(0L, 40L)
    p <- Gen.chooseNum(0L, 100L)
  } yield ScoredRow(s, id, p)

  private def refBottomRow(xs: Seq[ScoredRow], k: Int): Seq[ScoredRow] =
    xs.sortWith((a, b) => a.score < b.score || (a.score == b.score &&
      (a.id < b.id || (a.id == b.id && a.payload < b.payload)))).take(k)

  test("BottomKByScore: reduce-fold equals the reference sort-take " +
    "(double asc incl. -Inf, id asc; payload rides untouched)") {
    check("fold=ref")(Prop.forAll(Gen.listOf(scoredRow),
      Gen.chooseNum(1, 7)) { (xs, k) =>
      val agg = BottomKByScore(k)
      xs.foldLeft(agg.zero)(agg.reduce) == refBottomRow(xs, k)
    })
  }

  test("BottomKByScore: merge of any split equals the unsplit fold, " +
    "commutes, and zero is identity") {
    check("merge laws")(Prop.forAll(Gen.listOf(scoredRow),
      Gen.chooseNum(0, 100), Gen.chooseNum(1, 7)) { (xs, cut, k) =>
      val agg = BottomKByScore(k)
      val (l, r) = xs.splitAt(cut % (xs.size + 1))
      val lf = l.foldLeft(agg.zero)(agg.reduce)
      val rf = r.foldLeft(agg.zero)(agg.reduce)
      val merged = agg.merge(lf, rf)
      merged == xs.foldLeft(agg.zero)(agg.reduce) &&
        agg.merge(rf, lf) == merged &&
        agg.merge(merged, agg.zero) == merged &&
        agg.merge(agg.zero, merged) == merged
    })
  }

  // ---- the two round-11-addendum members (ANN-family rework)

  private def refTopRow(xs: Seq[ScoredRow], k: Int): Seq[ScoredRow] =
    xs.sortWith((a, b) => a.score > b.score || (a.score == b.score &&
      (a.id < b.id || (a.id == b.id && a.payload < b.payload)))).take(k)

  private val keyedRow: Gen[KeyedRow] = for {
    k <- Gen.oneOf("a", "b", "ba", "ab", "z", "", "aa", "b0")
    id <- Gen.chooseNum(0L, 40L)
    p <- Gen.chooseNum(-3L, 3L)
  } yield KeyedRow(k, id, p)

  private def refBottomKeyRow(xs: Seq[KeyedRow], k: Int): Seq[KeyedRow] =
    xs.sortBy(x => (x.key, x.id, x.payload)).take(k)

  test("TopKByScoreRow: reduce-fold equals the reference sort-take " +
    "(doubles desc, tie-heavy)") {
    check("fold=ref")(Prop.forAll(Gen.listOf(scoredRow),
      Gen.chooseNum(1, 7)) { (xs, k) =>
      val agg = TopKByScoreRow(k)
      xs.foldLeft(agg.zero)(agg.reduce) == refTopRow(xs, k)
    })
  }

  test("TopKByScoreRow: merge of any split equals the unsplit fold, " +
    "commutes, and zero is identity") {
    check("merge laws")(Prop.forAll(Gen.listOf(scoredRow),
      Gen.chooseNum(0, 100), Gen.chooseNum(1, 7)) { (xs, cut, k) =>
      val agg = TopKByScoreRow(k)
      val (l, r) = xs.splitAt(cut % (xs.size + 1))
      val lf = l.foldLeft(agg.zero)(agg.reduce)
      val rf = r.foldLeft(agg.zero)(agg.reduce)
      val merged = agg.merge(lf, rf)
      merged == xs.foldLeft(agg.zero)(agg.reduce) &&
        agg.merge(rf, lf) == merged &&
        agg.merge(merged, agg.zero) == merged &&
        agg.merge(agg.zero, merged) == merged
    })
  }

  test("BottomKByKeyRow: reduce-fold equals the UTF-8-ordered " +
    "reference sort-take") {
    check("fold=ref")(Prop.forAll(Gen.listOf(keyedRow),
      Gen.chooseNum(1, 7)) { (xs, k) =>
      val agg = BottomKByKeyRow(k)
      xs.foldLeft(agg.zero)(agg.reduce) == refBottomKeyRow(xs, k)
    })
  }

  test("BottomKByKeyRow: merge of any split equals the unsplit fold, " +
    "commutes, and zero is identity") {
    check("merge laws")(Prop.forAll(Gen.listOf(keyedRow),
      Gen.chooseNum(0, 100), Gen.chooseNum(1, 7)) { (xs, cut, k) =>
      val agg = BottomKByKeyRow(k)
      val (l, r) = xs.splitAt(cut % (xs.size + 1))
      val lf = l.foldLeft(agg.zero)(agg.reduce)
      val rf = r.foldLeft(agg.zero)(agg.reduce)
      val merged = agg.merge(lf, rf)
      merged == xs.foldLeft(agg.zero)(agg.reduce) &&
        agg.merge(rf, lf) == merged &&
        agg.merge(merged, agg.zero) == merged &&
        agg.merge(agg.zero, merged) == merged
    })
  }

  test("BottomKByKeyRow: UTF-8 key order holds across the astral/BMP " +
    "boundary (family discipline)") {
    val astral = KeyedRow(astralKey, 1L, 0L)
    val pua = KeyedRow(puaKey, 2L, 0L)
    val agg = BottomKByKeyRow(1)
    assert(Seq(pua, astral).foldLeft(agg.zero)(agg.reduce) == Seq(pua))
    assert(Seq(astral, pua).foldLeft(agg.zero)(agg.reduce) == Seq(pua))
  }

  test("BottomKByKey: UTF-8 key order holds across the astral/BMP " +
    "boundary (the r10 ADVICE divergence case)") {
    // U+10000 (astral) must sort BELOW U+E000 under UTF-8 bytes even
    // though UTF-16 code units say otherwise
    val astral = KeyedId(astralKey, 1L)
    val pua = KeyedId(puaKey, 2L)
    val agg = BottomKByKey(1)
    assert(Seq(pua, astral).foldLeft(agg.zero)(agg.reduce) == Seq(pua))
    assert(Seq(astral, pua).foldLeft(agg.zero)(agg.reduce) == Seq(pua))
    assert(puaKey.compareTo(astralKey) > 0,
      "sanity: Java String order disagrees, so the UTF8String compare " +
        "is doing real work here")
  }
}
