package graft.functions

import org.apache.spark.sql.Encoder

/** One (key, id) entry of a [[BottomKByKey]] summary. Fields are
  * non-null by the bounded-heap family's input contract — see
  * [[ScoredRow]]. */
case class KeyedId(key: String, id: Long)

/** Exact bounded-heap bottom-k per group by a STRING sort key — the
  * ascending, lexicographic sibling of [[TopKByScore]], for the
  * deterministic-shuffle family where the order key is a hash digest
  * (q228 orders each epoch by `md5(epoch:doc_id)`). Same physics as
  * the numeric twin: `row_number() OVER (PARTITION BY g ORDER BY key)`
  * sorts every group's FULL row set through the exchange — with a
  * handful of groups (3 epochs) that is a per-group whole-corpus
  * single-task sort — while this keeps a k-entry buffer per group,
  * combines MAP-SIDE, and merges associatively, so each task ships at
  * most k rows per group regardless of corpus size.
  *
  * Exact, not sketched: the global bottom-k under a total order is
  * contained in the union of per-partition bottom-ks. The full digest
  * string is the key (no bit-prefix truncation), so ties and ordering
  * are bit-identical to the window/oracle form: key ASC, then id ASC.
  *
  * The buffer stays a sorted ≤k array; reduce is O(k) insertion (k is
  * small by contract), merge is an O(k) sorted merge. */
case class BottomKByKey(k: Int)
    extends org.apache.spark.sql.expressions
      .Aggregator[KeyedId, Seq[KeyedId], Seq[KeyedId]] {

  require(k > 0, "k must be positive")

  private def beats(a: KeyedId, b: KeyedId): Boolean = {
    // UTF-8 byte order (Spark ORDER BY / DuckDB binary collation), not
    // Java String.compareTo's UTF-16 code-unit order — the two diverge
    // for supplementary-plane keys (U+E000–U+FFFF vs astral), and this
    // aggregator is documented as a generic lexicographic sibling, not
    // an md5-hex-only one.
    val c = org.apache.spark.unsafe.types.UTF8String.fromString(a.key)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b.key))
    c < 0 || (c == 0 && a.id < b.id)
  }

  override def zero: Seq[KeyedId] = Seq.empty

  override def reduce(buf: Seq[KeyedId], x: KeyedId): Seq[KeyedId] = {
    if (buf.size >= k && !beats(x, buf.last)) buf
    else {
      val (better, worse) = buf.span(beats(_, x))
      (better ++ (x +: worse)).take(k)
    }
  }

  override def merge(a: Seq[KeyedId], b: Seq[KeyedId]): Seq[KeyedId] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[KeyedId]
    var (i, j) = (0, 0)
    while (out.size < k && (i < a.size || j < b.size)) {
      if (j >= b.size || (i < a.size && beats(a(i), b(j)))) {
        out += a(i); i += 1
      } else { out += b(j); j += 1 }
    }
    out.toSeq
  }

  override def finish(buf: Seq[KeyedId]): Seq[KeyedId] = buf

  override def bufferEncoder: Encoder[Seq[KeyedId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[KeyedId]]()

  override def outputEncoder: Encoder[Seq[KeyedId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[KeyedId]]()
}
