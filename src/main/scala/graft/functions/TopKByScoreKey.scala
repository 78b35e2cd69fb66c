package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.unsafe.types.UTF8String

/** One (score, key) entry of a [[TopKByScoreKey]] summary. Fields
  * are non-null by the bounded-heap family's input contract — see
  * [[ScoredRow]]. */
case class ScoredKey(score: Long, key: String)

/** Exact bounded-heap top-k per group by (score DESC, string key ASC)
  * — the string-tie-break sibling of [[TopKByScore]], for the
  * per-group vocabulary leaderboards (q210 top-8 tokens, q104
  * top-1000 Zipf head) where the secondary order key is the token
  * itself. `row_number() OVER (PARTITION BY lang ORDER BY cnt DESC,
  * token)` with ~5 languages hash-partitions the WHOLE vocabulary
  * frame into ~5 single-task sorts (the low-cardinality
  * window-partition parallelism collapse); this keeps a k-entry
  * buffer per group, combines MAP-SIDE, and merges associatively, so
  * each task ships at most k rows per group however large the
  * vocabulary. Exact, not sketched: top-k under a total order is
  * contained in the union of per-partition top-ks.
  *
  * Tie-break keys compare as UTF-8 BYTES (`UTF8String.compareTo`),
  * matching both Spark's `ORDER BY` on strings and DuckDB's binary
  * collation — NOT Java `String.compareTo`, whose UTF-16 code-unit
  * order diverges for supplementary-plane text (relevant here: the
  * corpus includes zh documents).
  *
  * The buffer is a sorted ≤k IndexedSeq; reduce rejects
  * non-qualifying rows in O(1) via the buffer tail and inserts by
  * binary search + patch (O(log k) probe, O(k) copy — k=1000 for
  * q104, so the linear-scan insert of the k≈10 siblings would be the
  * wrong constant here); merge is an O(k) sorted merge. */
case class TopKByScoreKey(k: Int)
    extends Aggregator[ScoredKey, Seq[ScoredKey], Seq[ScoredKey]] {

  require(k > 0, "k must be positive")

  private def beats(a: ScoredKey, b: ScoredKey): Boolean = {
    if (a.score != b.score) a.score > b.score
    else UTF8String.fromString(a.key).compareTo(UTF8String.fromString(b.key)) < 0
  }

  override def zero: Seq[ScoredKey] = Vector.empty

  override def reduce(buf0: Seq[ScoredKey], x: ScoredKey): Seq[ScoredKey] = {
    val buf = buf0.toIndexedSeq
    if (buf.size >= k && !beats(x, buf.last)) buf
    else {
      // binary search for the insertion point: first i with beats(x, buf(i))
      var lo = 0
      var hi = buf.size
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (beats(buf(mid), x)) lo = mid + 1 else hi = mid
      }
      ((buf.take(lo) :+ x) ++ buf.drop(lo)).take(k)
    }
  }

  override def merge(a0: Seq[ScoredKey], b0: Seq[ScoredKey]): Seq[ScoredKey] = {
    val a = a0.toIndexedSeq
    val b = b0.toIndexedSeq
    val out = scala.collection.mutable.ArrayBuffer.empty[ScoredKey]
    var (i, j) = (0, 0)
    while (out.size < k && (i < a.size || j < b.size)) {
      if (j >= b.size || (i < a.size && beats(a(i), b(j)))) {
        out += a(i); i += 1
      } else { out += b(j); j += 1 }
    }
    out.toSeq
  }

  override def finish(buf: Seq[ScoredKey]): Seq[ScoredKey] = buf

  override def bufferEncoder: Encoder[Seq[ScoredKey]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredKey]]()

  override def outputEncoder: Encoder[Seq[ScoredKey]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredKey]]()
}
