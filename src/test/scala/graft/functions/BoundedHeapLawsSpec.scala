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
}
