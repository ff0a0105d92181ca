package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values (KMV) distinct sketch as a typed `Aggregator`: the
  * buffer is the k smallest DISTINCT hash values seen so far, kept
  * sorted ascending and truncated at k.
  *
  * Why an Aggregator and not `sort_array(collect_set(h))[k-1]`: the
  * collect_set buffer grows with the group's DISTINCT cardinality —
  * exactly the quantity a distinct sketch exists to avoid
  * materializing. This buffer is O(k) no matter how many distinct
  * values a key carries, dedups INSIDE the buffer (no pre-distinct
  * exchange), and is associative + commutative, so it is map-side
  * combinable and legal under streaming partial-merge: each input
  * partition collapses to ≤ k longs before the exchange.
  *
  * Estimator (applied by the caller): with hashes uniform on
  * [0, 2^60), `est = (k-1) · 2^60 / h_(k)` when the buffer is full,
  * else the buffer size is itself the exact distinct count. Relative
  * error ~ 1/sqrt(k-2). Unlike HLL registers, the sketch VALUES
  * support further set algebra (the k smallest of a union are a
  * merge of the operands' sketches — the `merge` law below).
  *
  * Reference behavior: distinct-count estimation over unbounded
  * streams, cf. Sea-Otter-Labs/Stream-Processing-Test
  * `StreamTest.cpp:830-944` (exact GROUP BY counts on bounded MySQL
  * tables — the sketch is the unbounded-cardinality generalization).
  */
class KMinValuesAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k >= 2 && k <= 4096, s"k=$k out of range [2, 4096]")

  override def zero: Seq[Long] = Seq.empty

  override def reduce(buf: Seq[Long], h: Long): Seq[Long] = {
    if (buf.size == k && h >= buf.last) buf
    else {
      val (lo, hi) = buf.span(_ < h)
      if (hi.nonEmpty && hi.head == h) buf
      else (lo ++ (h +: hi)).take(k)
    }
  }

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
    val out = Seq.newBuilder[Long]
    var (x, y) = (a, b)
    var n = 0
    var last = 0L
    var seen = false
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      val v =
        if (y.isEmpty || (x.nonEmpty && x.head <= y.head)) {
          val v = x.head; x = x.tail; v
        } else {
          val v = y.head; y = y.tail; v
        }
      if (!seen || v != last) {
        out += v
        last = v
        seen = true
        n += 1
      }
    }
    out.result()
  }

  override def finish(buf: Seq[Long]): Seq[Long] = buf

  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
