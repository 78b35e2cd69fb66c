package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One (key, id, payload) entry of a [[BottomKByKeyRow]] summary.
  * Fields are non-null by the bounded-heap family's input contract —
  * see [[ScoredRow]]. */
case class KeyedRow(key: String, id: Long, payload: Long)

/** [[BottomKByKey]] with a payload column riding along — bottom-k per
  * group by (STRING key ASC in UTF-8 byte order, id ASC), carrying one
  * extra long so the winners need no join back to the source frame
  * (q229's hash-ranked negative sample carries `cand_label`). Same
  * physics as the rest of the bounded-heap family: ≤k rows per group
  * per map task, associative merge, exact under the total order —
  * payload is the last tie-break leg purely to keep the order total
  * (q229's ids are unique per group, so it never decides there). */
case class BottomKByKeyRow(k: Int)
    extends Aggregator[KeyedRow, Seq[KeyedRow], Seq[KeyedRow]] {

  require(k > 0, "k must be positive")

  private def beats(a: KeyedRow, b: KeyedRow): Boolean = {
    // UTF-8 byte order (Spark ORDER BY / DuckDB binary collation) —
    // the family discipline since the r10 ADVICE fix on BottomKByKey
    val c = org.apache.spark.unsafe.types.UTF8String.fromString(a.key)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b.key))
    c < 0 || (c == 0 &&
      (a.id < b.id || (a.id == b.id && a.payload < b.payload)))
  }

  override def zero: Seq[KeyedRow] = Vector.empty

  override def reduce(buf: Seq[KeyedRow], x: KeyedRow): Seq[KeyedRow] = {
    if (buf.size >= k && !beats(x, buf.last)) buf
    else {
      val (better, worse) = buf.span(beats(_, x))
      (better ++ (x +: worse)).take(k)
    }
  }

  override def merge(a: Seq[KeyedRow], b: Seq[KeyedRow]): Seq[KeyedRow] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[KeyedRow]
    var (i, j) = (0, 0)
    while (out.size < k && (i < a.size || j < b.size)) {
      if (j >= b.size || (i < a.size && beats(a(i), b(j)))) {
        out += a(i); i += 1
      } else { out += b(j); j += 1 }
    }
    out.toSeq
  }

  override def finish(buf: Seq[KeyedRow]): Seq[KeyedRow] = buf

  override def bufferEncoder: Encoder[Seq[KeyedRow]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[KeyedRow]]()

  override def outputEncoder: Encoder[Seq[KeyedRow]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[KeyedRow]]()
}
