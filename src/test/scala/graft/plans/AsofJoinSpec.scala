package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.AsofJoinOp

/** The custom as-of join plan: equivalence with the declarative
  * union+window twin (q27), physical-plan shape, and the merge loop's
  * edge semantics on hand-built frames. */
class AsofJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def asofSmall(left: Seq[(String, Long, Int)],
      right: Seq[(String, Long, Int)],
      direction: String = "backward",
      tolerance: Option[Long] = None): Map[(String, Long, Int), Option[Long]] =
    AsofJoinOp.asof(
      left.toDF("k", "t", "id"),
      right.toDF("rk", "rt", "rid"),
      Seq("k" -> "rk"), "t" -> "rt", direction, tolerance)
      .collect()
      .map(r => ((r.getString(0), r.getLong(1), r.getInt(2)),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
      .toMap

  test("q106 custom exec output is identical to q27's union+window twin") {
    val a = graft.queries.EventOps.q27AsofJoin(spark, Sf).collect()
    val b = graft.queries.EventOps.q106AsofExec(spark, Sf).collect()
    assert(a.length == b.length && a.length > 0)
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("q106 plans the custom exec — no Window, no BroadcastNestedLoop") {
    val plan = graft.queries.EventOps.q106AsofExec(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan.take(1500))
    assert(!plan.contains("Window"), plan.take(1500))
    assert(!plan.contains("BroadcastNestedLoop"), plan.take(1500))
  }

  test("merge semantics: latest right ≤ left time, inclusive ties") {
    val out = asofSmall(
      left = Seq(("a", 10L, 1), ("a", 20L, 2), ("a", 20L, 3), ("b", 5L, 4)),
      right = Seq(("a", 5L, 0), ("a", 10L, 0), ("a", 15L, 0), ("b", 6L, 0)))
    assert(out(("a", 10L, 1)) == Some(10L)) // inclusive: rt == lt matches
    assert(out(("a", 20L, 2)) == Some(15L)) // latest ≤, carried forward
    assert(out(("a", 20L, 3)) == Some(15L)) // duplicate left times both match
    assert(out(("b", 5L, 4)) == None)       // right is strictly ahead
  }

  test("no right rows for a key → NULL match; empty right side → all NULL") {
    val out = asofSmall(
      left = Seq(("a", 10L, 1), ("z", 10L, 2)),
      right = Seq(("a", 1L, 0)))
    assert(out(("a", 10L, 1)) == Some(1L))
    assert(out(("z", 10L, 2)) == None)
    val empty = AsofJoinOp.asof(
      Seq(("a", 10L, 1)).toDF("k", "t", "id"),
      Seq.empty[(String, Long, Int)].toDF("rk", "rt", "rid"),
      Seq("k" -> "rk"), "t" -> "rt").collect()
    assert(empty.length == 1 && empty.head.isNullAt(4))
  }

  test("match state does not leak across keys") {
    // key "b" has no rights; the consumed "a" rights must not match it
    val out = asofSmall(
      left = Seq(("a", 10L, 1), ("b", 99L, 2), ("c", 10L, 3)),
      right = Seq(("a", 9L, 0), ("c", 2L, 0)))
    assert(out(("a", 10L, 1)) == Some(9L))
    assert(out(("b", 99L, 2)) == None)
    assert(out(("c", 10L, 3)) == Some(2L))
  }

  test("SQL NULL keys and times never match") {
    val left = Seq((Some("a"), Some(10L), 1), (None, Some(10L), 2),
      (Some("a"), None, 3))
      .toDF("k", "t", "id")
    val right = Seq((Some("a"), Some(5L), 0), (None, Some(1L), 0),
      (Some("a"), None, 0))
      .toDF("rk", "rt", "rid")
    val rows = AsofJoinOp.asof(left, right, Seq("k" -> "rk"), "t" -> "rt")
      .collect().map(r => r.getInt(2) ->
        (if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    assert(rows(1) == Some(5L)) // null-keyed/timed rights skipped, real one kept
    assert(rows(2) == None)     // null left key
    assert(rows(3) == None)     // null left time
  }

  test("self-join attribute conflicts are re-aliased, not miscompiled") {
    val df = Seq(("a", 1L, 10), ("a", 5L, 20)).toDF("k", "t", "v")
    val out = AsofJoinOp.asof(df, df, Seq("k" -> "k"), "t" -> "t")
    assert(out.columns.length == 6)
    val rows = out.collect()
    assert(rows.length == 2)
    // each row as-of-matches itself (inclusive)
    assert(rows.forall(r => r.getLong(1) == r.getLong(4)))
  }

  test("left-side filters push through the join; right-side filters stay") {
    val ev = graft.Tables.events(spark, Sf)
    val joined = AsofJoinOp.asof(
      ev.filter(col("event_type") === "error").select("event_id", "user_id", "ts"),
      ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user_id"), col("ts").as("c_ts")),
      Seq("user_id" -> "c_user_id"), "ts" -> "c_ts")
    // left-side predicate: must sink below the AsofJoin node
    val leftFiltered = joined.filter(col("user_id") < 50)
    val opt = leftFiltered.queryExecution.optimizedPlan
    val filterAbove = opt.collect {
      case f @ org.apache.spark.sql.catalyst.plans.logical.Filter(_, _: AsofJoin) => f
    }
    assert(filterAbove.isEmpty, s"left filter not pushed:\n$opt")
    // and the result matches pre-filtering the left input
    val expected = AsofJoinOp.asof(
      ev.filter(col("event_type") === "error" && col("user_id") < 50)
        .select("event_id", "user_id", "ts"),
      ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user_id"), col("ts").as("c_ts")),
      Seq("user_id" -> "c_user_id"), "ts" -> "c_ts")
      .collect().map(_.toString).sorted.toSeq
    assert(leftFiltered.collect().map(_.toString).sorted.toSeq == expected)
    // right-side predicate: must NOT move below the join (outer
    // semantics — below the join it would change the as-of match)
    val rightFiltered = joined.filter(col("c_ts").isNotNull)
    val stays = rightFiltered.queryExecution.optimizedPlan.collect {
      case f @ org.apache.spark.sql.catalyst.plans.logical.Filter(cond, _: AsofJoin) => cond
    }
    assert(stays.nonEmpty, "right-side filter was wrongly pushed")
  }

  test("result is stable across input partitioning") {
    val left = (1 to 500).map(i => (s"k${i % 7}", (i * 13 % 101).toLong, i))
    val right = (1 to 300).map(i => (s"k${i % 11}", (i * 17 % 97).toLong, i))
    val a = asofSmall(left, right)
    val b = AsofJoinOp.asof(
      left.toDF("k", "t", "id").repartition(7),
      right.toDF("rk", "rt", "rid").repartition(3),
      Seq("k" -> "rk"), "t" -> "rt")
      .collect()
      .map(r => ((r.getString(0), r.getLong(1), r.getInt(2)),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
      .toMap
    assert(a == b)
    // cross-check against a declarative max-per-left-row twin
    val twin = left.toDF("k", "t", "id")
      .join(right.toDF("rk", "rt", "rid"),
        col("k") === col("rk") && col("rt") <= col("t"), "left")
      .groupBy("k", "t", "id").agg(max("rt").as("m"))
      .collect()
      .map(r => ((r.getString(0), r.getLong(1), r.getInt(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
    assert(a == twin)
  }

  test("forward direction: earliest right ≥ left, shared across lefts") {
    val out = asofSmall(
      left = Seq(("a", 10L, 1), ("a", 12L, 2), ("a", 20L, 3), ("b", 5L, 4)),
      right = Seq(("a", 8L, 0), ("a", 15L, 0), ("b", 3L, 0)),
      direction = "forward")
    assert(out(("a", 10L, 1)) == Some(15L)) // next at or after 10
    assert(out(("a", 12L, 2)) == Some(15L)) // SAME candidate, not consumed
    assert(out(("a", 20L, 3)) == None)      // rights exhausted
    assert(out(("b", 5L, 4)) == None)       // right is strictly behind
    // inclusive tie: rt == lt matches forward too
    val tie = asofSmall(Seq(("a", 15L, 1)), Seq(("a", 15L, 0)), "forward")
    assert(tie(("a", 15L, 1)) == Some(15L))
  }

  test("tolerance bounds the match window in both directions") {
    val left = Seq(("a", 100L, 1), ("a", 200L, 2))
    val right = Seq(("a", 90L, 0), ("a", 230L, 0))
    // backward: 100-90=10 within 10 (inclusive); 200-90=110 outside
    val back = asofSmall(left, right, "backward", tolerance = Some(10L))
    assert(back(("a", 100L, 1)) == Some(90L))
    assert(back(("a", 200L, 2)) == None)
    // forward: 230-200=30 within 30 (inclusive); 230-100=130 outside
    val fwd = asofSmall(left, right, "forward", tolerance = Some(30L))
    assert(fwd(("a", 100L, 1)) == None)
    assert(fwd(("a", 200L, 2)) == Some(230L))
  }

  test("forward + tolerance matches a brute-force reference on random data") {
    val rnd = new scala.util.Random(11)
    val left = (1 to 400).map(i => (s"k${rnd.nextInt(5)}", rnd.nextInt(200).toLong, i))
    val right = (1 to 250).map(i => (s"k${rnd.nextInt(6)}", rnd.nextInt(200).toLong, i))
    val tol = 25L
    val got = asofSmall(left, right, "forward", Some(tol))
    left.foreach { case lr @ (k, t, _) =>
      val expected = right.filter(r => r._1 == k && r._2 >= t && r._2 - t <= tol)
        .map(_._2).minOption
      assert(got(lr) == expected, s"left $lr: got ${got(lr)}, want $expected")
    }
  }

  test("q119 plans the custom exec and only in-window matches survive") {
    val plan = graft.queries.EventOps.q119AsofForward(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan.take(1500))
    val rows = graft.queries.EventOps.q119AsofForward(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.filter(!_.isNullAt(3)).foreach { r =>
      val gap = r.getDouble(3)
      assert(gap >= 0 && gap <= 600.0, s"gap $gap outside [0, 600s]")
    }
  }
}
