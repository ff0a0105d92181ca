package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One (id, m) candidate row, the aggregator's input and output unit. */
case class IdMeasure(id: Long, m: Long)

/** Per-group top-k under (m DESC, id ASC) as a typed `Aggregator` — the
  * window-free group top-k.
  *
  * Why an Aggregator and not `row_number() OVER (PARTITION BY grp)`:
  * the window shuffles EVERY row of the group to one task and sorts it;
  * this buffer is associative and commutative — map-side combinable —
  * so each input partition collapses a group's rows into one ≤k-row
  * state before the exchange. For a 100 TB fact with million-row
  * groups, the wire carries k rows per (group × partition) instead of
  * the whole group, and no task ever materializes a full group.
  *
  * The buffer is kept SORTED (m DESC, id ASC) and truncated at k, so
  * reduce is an O(k) insertion and merge an O(k) list merge. Ordering
  * is total (the id tiebreak), so the result is deterministic under any
  * partitioning — the oracle's rank window reproduces it exactly.
  */
class TopKByMeasureAgg(k: Int) extends Aggregator[IdMeasure, Seq[IdMeasure], Seq[IdMeasure]] {
  require(k >= 1, s"k=$k must be >= 1")

  private def before(a: IdMeasure, b: IdMeasure): Boolean =
    a.m > b.m || (a.m == b.m && a.id < b.id)

  override def zero: Seq[IdMeasure] = Seq.empty

  override def reduce(buf: Seq[IdMeasure], in: IdMeasure): Seq[IdMeasure] = {
    if (buf.size == k && !before(in, buf.last)) buf
    else {
      val (hi, lo) = buf.span(before(_, in))
      (hi ++ (in +: lo)).take(k)
    }
  }

  override def merge(a: Seq[IdMeasure], b: Seq[IdMeasure]): Seq[IdMeasure] = {
    val out = Seq.newBuilder[IdMeasure]
    var (x, y) = (a, b)
    var n = 0
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && before(x.head, y.head))) {
        out += x.head; x = x.tail
      } else {
        out += y.head; y = y.tail
      }
      n += 1
    }
    out.result()
  }

  override def finish(buf: Seq[IdMeasure]): Seq[IdMeasure] = buf

  override def bufferEncoder: Encoder[Seq[IdMeasure]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[IdMeasure]] = ExpressionEncoder()
}
