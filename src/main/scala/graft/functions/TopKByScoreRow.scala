package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One (score, id, payload) entry of a [[TopKByScoreRow]] summary —
  * the same row shape as [[ScoredRow]], reused so the two heaps share
  * encoders and fixtures. */

/** Exact bounded-heap top-k per group by (double score DESC, id ASC)
  * with a payload column riding along — the descending-double member
  * of the bounded-heap family ([[TopKByScore]] long-desc,
  * [[BottomKByScore]] double-asc, [[BottomKByKey]]/[[BottomKByKeyRow]]
  * string-asc, [[TopKByScoreKey]] long-desc-string-ties). Built for
  * the ANN re-rank idiom `row_number() OVER (PARTITION BY query_id
  * ORDER BY sim DESC, cand_id)` — with a handful of queries that
  * window hash-partitions EVERY scored candidate into one single-task
  * sort per query (the round-11 census's last standing collapse);
  * this ships at most k rows per query per map task and merges
  * associatively. Exact: top-k under a total order merges without
  * error, so rank = explode position + 1 reproduces the window
  * bit-for-bit (ids unique per group; payload is the final tie-break
  * leg purely to keep the order total).
  *
  * Scores must be non-NaN (the family contract); doubles compare by
  * IEEE `>`, identical to both engines' ORDER BY DESC on finite
  * values. Buffer is a sorted ≤k array: O(k) insert, O(k) merge. */
case class TopKByScoreRow(k: Int)
    extends Aggregator[ScoredRow, Seq[ScoredRow], Seq[ScoredRow]] {

  require(k > 0, "k must be positive")

  private def beats(a: ScoredRow, b: ScoredRow): Boolean =
    a.score > b.score || (a.score == b.score &&
      (a.id < b.id || (a.id == b.id && a.payload < b.payload)))

  override def zero: Seq[ScoredRow] = Vector.empty

  override def reduce(buf: Seq[ScoredRow], x: ScoredRow): Seq[ScoredRow] = {
    if (buf.size >= k && !beats(x, buf.last)) buf
    else {
      val (better, worse) = buf.span(beats(_, x))
      (better ++ (x +: worse)).take(k)
    }
  }

  override def merge(a: Seq[ScoredRow], b: Seq[ScoredRow]): Seq[ScoredRow] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[ScoredRow]
    var (i, j) = (0, 0)
    while (out.size < k && (i < a.size || j < b.size)) {
      if (j >= b.size || (i < a.size && beats(a(i), b(j)))) {
        out += a(i); i += 1
      } else { out += b(j); j += 1 }
    }
    out.toSeq
  }

  override def finish(buf: Seq[ScoredRow]): Seq[ScoredRow] = buf

  override def bufferEncoder: Encoder[Seq[ScoredRow]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredRow]]()

  override def outputEncoder: Encoder[Seq[ScoredRow]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredRow]]()
}
