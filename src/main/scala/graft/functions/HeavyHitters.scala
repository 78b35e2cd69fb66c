package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Summary emitted by [[HeavyHitters]]: parallel arrays sorted by
  * (count desc, item). */
case class TopItems(items: Array[String], counts: Array[Long])

/** Misra-Gries heavy hitters as a typed [[Aggregator]] (UDAF) — the
  * one aggregate family the built-in surface genuinely can't express:
  * exact `collect_list` + count explodes memory on a 100 TB group,
  * while this keeps a BOUNDED k-entry buffer per group, combines
  * map-side, and merges associatively.
  *
  * Guarantees (standard Misra-Gries): after aggregating n items,
  * every item with true frequency > n/(k+1) is present in the
  * summary, and each reported count undercounts its true frequency by
  * at most n/(k+1). The summary is exact when the group has ≤ k
  * distinct items.
  *
  * Output is sorted (count desc, item) so downstream use is
  * deterministic; the counts themselves are summary-order dependent
  * within the MG error bound — register queries over it rows-only,
  * assert the guarantees in tests.
  */
case class HeavyHitters(k: Int)
    extends Aggregator[String, Map[String, Long], TopItems] {

  require(k > 0, "k must be positive")

  override def zero: Map[String, Long] = Map.empty

  /** Classic MG step: count if tracked or space free, else decrement
    * every tracked count by 1 (dropping zeros) — the "pair up one
    * occurrence of each of k+1 distinct items and discard" argument
    * that yields the n/(k+1) bound. */
  override def reduce(b: Map[String, Long], item: String): Map[String, Long] = {
    val cur = b.getOrElse(item, 0L)
    if (cur > 0 || b.size < k) b.updated(item, cur + 1L)
    else b.map { case (i, c) => i -> (c - 1L) }.filter(_._2 > 0L)
  }

  /** Mergeable-summaries merge (Agarwal et al., TODS'13): sum counts,
    * then if more than k survive, subtract the (k+1)-th largest count
    * from every entry and drop non-positives — error bounds add. */
  override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
    val combined = b2.foldLeft(b1) { case (acc, (i, c)) =>
      acc.updated(i, acc.getOrElse(i, 0L) + c)
    }
    if (combined.size <= k) combined
    else {
      val kth = combined.values.toSeq.sorted(Ordering[Long].reverse)(k)
      combined.map { case (i, c) => i -> (c - kth) }.filter(_._2 > 0L)
    }
  }

  override def finish(b: Map[String, Long]): TopItems = {
    val sorted = b.toSeq.sortBy { case (i, c) => (-c, i) }
    TopItems(sorted.map(_._1).toArray, sorted.map(_._2).toArray)
  }

  /** Native ExpressionEncoder (MapType(String, Long)), NOT Kryo: the
    * Kryo path reflects into `java.nio.HeapByteBuffer` internals and
    * dies with EXPRESSION_ENCODING_FAILED under a plain `java -cp`
    * launcher that lacks build.sbt's `--add-opens java.base/java.nio`
    * (r13 PERF ledger). The native encoder serializes through Catalyst
    * UnsafeMapData — no reflection, launcher-independent — and is also
    * smaller on the wire than a Kryo-framed Scala Map. */
  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[TopItems] = Encoders.product[TopItems]
}
