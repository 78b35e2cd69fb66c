package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One (score, id) entry of a [[TopKByScore]] summary. Fields are
  * non-null by the bounded-heap family's input contract — see
  * [[ScoredRow]]. */
case class ScoredId(score: Long, id: Long)

/** Exact bounded-heap top-k per group as a typed [[Aggregator]] — the
  * scalable alternative to `row_number() OVER (PARTITION BY g ORDER BY
  * score DESC)` + `rk <= k`: the window form SORTS every group's full
  * row set through the exchange, while this keeps a k-entry buffer per
  * group, combines MAP-SIDE (each task ships at most k rows per
  * group), and merges associatively. Unlike [[HeavyHitters]] this is
  * EXACT — top-k by a total order is mergeable without error: the
  * global top-k is contained in the union of per-partition top-ks.
  *
  * Total order: score DESC, then id ASC — ties are deterministic, so
  * the output is bit-identical to the window twin (spec-asserted and
  * DuckDB-oracle-paired through q227).
  *
  * The buffer stays a sorted ≤k array; reduce is O(k) insertion (k is
  * small by contract), merge is an O(k) sorted merge. */
case class TopKByScore(k: Int)
    extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {

  require(k > 0, "k must be positive")

  private def beats(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: Seq[ScoredId] = Seq.empty

  override def reduce(buf: Seq[ScoredId], x: ScoredId): Seq[ScoredId] = {
    if (buf.size >= k && !beats(x, buf.last)) buf
    else {
      val (better, worse) = buf.span(beats(_, x))
      (better ++ (x +: worse)).take(k)
    }
  }

  override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[ScoredId]
    var (i, j) = (0, 0)
    while (out.size < k && (i < a.size || j < b.size)) {
      if (j >= b.size || (i < a.size && beats(a(i), b(j)))) {
        out += a(i); i += 1
      } else { out += b(j); j += 1 }
    }
    out.toSeq
  }

  override def finish(buf: Seq[ScoredId]): Seq[ScoredId] = buf

  override def bufferEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()

  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
}
