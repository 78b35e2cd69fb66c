package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Misra-Gries guarantees on real grouped data. */
class HeavyHittersSpec extends SparkTestBase {

  test("MG summary contains every item above the n/(k+1) threshold") {
    import spark.implicits._
    val k = 8
    val tokens = graft.Tables.documents(spark, Sf)
      .select(col("lang"), explode(split(lower(col("text")), "\\s+")).as("t"))
      .filter(col("t") =!= "")
    val truth = tokens.groupBy("lang", "t").count().collect()
      .groupBy(_.getString(0))
      .map { case (lang, rows) =>
        lang -> rows.map(r => r.getString(1) -> r.getLong(2)).toMap
      }
    val hh = udaf(HeavyHitters(k))
    val got = tokens.groupBy("lang").agg(hh(col("t")).as("top")).collect()
      .map { r =>
        val s = r.getStruct(1)
        r.getString(0) -> (s.getSeq[String](0) zip s.getSeq[Long](1)).toMap
      }.toMap
    truth.foreach { case (lang, freqs) =>
      val n = freqs.values.sum
      val bound = n.toDouble / (k + 1)
      val summary = got(lang)
      assert(summary.size <= k)
      freqs.filter(_._2 > bound).foreach { case (item, f) =>
        assert(summary.contains(item),
          s"$lang: '$item' (freq $f > $bound) missing from $summary")
        // reported count is a lower bound within n/(k+1) of the truth
        assert(summary(item) <= f && summary(item) >= f - bound.toLong - 1,
          s"$lang: '$item' reported ${summary(item)}, true $f, bound $bound")
      }
    }
  }

  test("summary is exact when a group has at most k distinct items") {
    import spark.implicits._
    val hh = udaf(HeavyHitters(10))
    val df = graft.Tables.orders(spark, Sf)
      .groupBy("o_orderstatus")
      .agg(hh(col("o_orderpriority")).as("top"))
    val truth = graft.Tables.orders(spark, Sf)
      .groupBy("o_orderstatus", "o_orderpriority").count().collect()
      .groupBy(_.getString(0))
      .map { case (s, rows) =>
        s -> rows.map(r => r.getString(1) -> r.getLong(2)).toMap
      }
    df.collect().foreach { r =>
      val s = r.getStruct(1)
      val got = (s.getSeq[String](0) zip s.getSeq[Long](1)).toMap
      // ≤ 5 distinct priorities < k=10 ⇒ MG degrades to exact counts
      assert(got == truth(r.getString(0)))
    }
  }

  test("q76 sketch is bounded by q210's oracle-verified exact counts") {
    // The MG guarantee, asserted against the REAL corpus through the
    // oracle-green exact companion (q210): any token whose exact
    // frequency exceeds n_lang/(k+1) must appear in the k=8 sketch.
    // This ties the rows-only q76 to a DuckDB-verified frame — the MG
    // output is no longer checked only on synthetic fixtures.
    import org.apache.spark.sql.functions._
    val sketch = graft.queries.TextOps.q76HeavyHitters(spark, Sf)
      .collect().groupBy(_.getString(0))
      .map { case (lang, rs) => lang -> rs.map(_.getAs[String]("token")).toSet }
    val exactTop = graft.queries.TextOps.q210HeavyHittersExact(spark, Sf)
      .collect().groupBy(_.getString(0))
    // per-language total token counts (n in the MG bound)
    val nTok = graft.Tables.documents(spark, Sf)
      .select(col("lang"), explode(split(lower(col("text")), "\\s+")).as("t"))
      .filter(col("t") =!= "")
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exactTop.nonEmpty)
    exactTop.foreach { case (lang, rows) =>
      val threshold = nTok(lang) / 9.0 // k = 8
      val mustAppear = rows.filter(_.getAs[Long]("cnt") > threshold)
        .map(_.getAs[String]("token"))
      mustAppear.foreach { t =>
        assert(sketch(lang).contains(t),
          s"lang=$lang token '$t' above n/(k+1) missing from MG sketch")
      }
    }
  }
}
