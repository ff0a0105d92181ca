package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One (cid, csim) centroid-similarity row, the aggregator's input. */
case class CellSim(cid: Long, csim: Double)

/** Fixed-size top-2 state: best and runner-up under (csim DESC, cid ASC).
  * `c* = -1` marks an empty slot — cell ids are corpus vec_ids and
  * therefore non-negative (documented precondition). */
case class Top2Buf(s1: Double, c1: Long, s2: Double, c2: Long)

/** Top-2 IVF cells per vector, as a typed `Aggregator` (multi-probe
  * assignment for semantic dedup's recall extension).
  *
  * Why an Aggregator and not `row_number() OVER (PARTITION BY vec_id)`:
  * the input is the corpus×centroid similarity stream (N·k rows), and a
  * window would SHUFFLE all of them on vec_id. This buffer is
  * associative and commutative — map-side combinable — and since every
  * vector's k similarity rows are produced in one input partition (the
  * centroids are broadcast), the partial aggregation collapses them to
  * ONE fixed-size state per vector before the exchange: k× less wire
  * traffic, same answer. Order is (csim DESC, cid ASC), matching
  * [[graft.ext.Similarity.ivfAssign]]'s `(csim, -cid)` argmax exactly,
  * so slot 1 IS the single-probe assignment.
  */
class Top2CellsAgg extends Aggregator[CellSim, Top2Buf, Seq[Long]] {

  private def beats(s: Double, c: Long, s0: Double, c0: Long): Boolean =
    s > s0 || (s == s0 && c < c0)

  override def zero: Top2Buf =
    Top2Buf(Double.NegativeInfinity, -1L, Double.NegativeInfinity, -1L)

  private def insert(b: Top2Buf, s: Double, c: Long): Top2Buf =
    // NaN csim (a zero-norm vector or centroid) must never occupy a
    // slot: beats() is false for every NaN comparison, so a NaN that
    // lands in slot 1 at zero-state could never be displaced and would
    // poison the assignment. Skipping it mirrors the oracle's
    // `WHERE NOT isnan(csim)` rank filter exactly.
    if (c < 0L || s.isNaN) b // empty slot from a merge partner, or NaN
    else if (b.c1 < 0L || beats(s, c, b.s1, b.c1)) Top2Buf(s, c, b.s1, b.c1)
    else if (b.c2 < 0L || beats(s, c, b.s2, b.c2)) Top2Buf(b.s1, b.c1, s, c)
    else b

  override def reduce(b: Top2Buf, in: CellSim): Top2Buf =
    insert(b, in.csim, in.cid)

  override def merge(a: Top2Buf, b: Top2Buf): Top2Buf =
    insert(insert(a, b.s1, b.c1), b.s2, b.c2)

  override def finish(b: Top2Buf): Seq[Long] =
    if (b.c1 < 0L) Seq.empty
    else if (b.c2 < 0L) Seq(b.c1)
    else Seq(b.c1, b.c2)

  override def bufferEncoder: Encoder[Top2Buf] = Encoders.product[Top2Buf]
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
