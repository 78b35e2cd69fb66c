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
}
