package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One (score, id, payload) entry of a [[BottomKByScore]] /
  * [[TopKByScoreRow]] summary. `payload` rides along un-ordered (q105
  * carries `n_chars`) so the winners need no join back to the source
  * frame.
  *
  * NON-NULL input contract (whole bounded-heap family — ScoredRow,
  * ScoredId, ScoredKey, KeyedId, KeyedRow): entry fields are
  * primitives, and the udaf input deserializer reads a NULL slot of a
  * primitive field as 0/0.0 — SILENTLY, fabricating a rank or payload
  * with no error anywhere (measured, not assumed: pinned in
  * CorpusOpsSpec "heap family null contract"; a NULL STRING key would
  * instead NPE inside the UTF-8 compare). Callers therefore own the
  * null mapping at the call site: coalesce a NULLable sort key to the
  * order's sentinel (±Infinity / "" reproduce Spark's NULLS FIRST
  * window order for the respective directions), and ride a NULLable
  * payload behind an out-of-domain sentinel restored via nullif on
  * output (q105's Long.MinValue idiom). */
case class ScoredRow(score: Double, id: Long, payload: Long)

/** Exact bounded-heap bottom-k per group by (double score ASC, id
  * ASC) — the ascending-numeric member of the bounded-heap family
  * ([[TopKByScore]] numeric-desc, [[BottomKByKey]] string-asc,
  * [[TopKByScoreKey]] desc-with-string-ties), for reservoir-style
  * smallest-key selections (q105's Efraimidis–Spirakis weighted
  * sample, key = −ln(u)/w). The window twin `row_number() OVER
  * (PARTITION BY lang ORDER BY key)` hash-partitions ALL documents
  * into ~5 single-task sorts; this ships at most k rows per group
  * per map task and merges associatively — exact, since bottom-k
  * under a total order merges without error.
  *
  * Scores must be non-NaN (callers map NULL sort keys to −∞, which
  * reproduces Spark's NULLS FIRST ascending window order); doubles
  * compare by IEEE `<`, identical to both engines' ORDER BY on
  * finite/infinite values. The buffer stays a sorted ≤k array;
  * reduce is O(k) insertion (k is small by contract), merge is an
  * O(k) sorted merge. */
case class BottomKByScore(k: Int)
    extends Aggregator[ScoredRow, Seq[ScoredRow], Seq[ScoredRow]] {

  require(k > 0, "k must be positive")

  // payload is the LAST tie-break, purely to keep the order total:
  // with duplicate (score, id) inputs a preorder would make the
  // surviving payload partition-order-dependent (q105's ids are
  // unique per group, so this leg never decides there)
  private def beats(a: ScoredRow, b: ScoredRow): Boolean =
    a.score < b.score || (a.score == b.score &&
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
