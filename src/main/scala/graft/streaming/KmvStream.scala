package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One pre-hashed element arrival for a key's distinct-count sketch —
  * the upstream projection ships `md5Hash60(element)` scan-side
  * (x180's hash), never the element itself. */
final case class ElemHash(k: String, h: Long)

/** Cumulative KMV verdict for a key, re-issued only when a micro-batch
  * actually changed the sketch: the buffer fill, the k-th minimum, and
  * the distinct estimate `(k−1)·2^60 DIV kth_min` — bit-identical to
  * the batch [[graft.ext.Sketches.kmvDistinct]] columns. */
final case class KmvRow(k: String, n_sketch: Long, kth_min: Long,
    est_distinct: Long)

/** Streaming twin of x180's KMV distinct sketch — and the twin family's
  * STRONGEST lateness/replay contract, stronger than [[EwmaStream]]:
  * the state is the SET of the k smallest distinct element hashes,
  * and set-insert-then-trim is commutative AND idempotent, so
  *
  *   - ANY arrival order converges to the batch sketch (shuffled-
  *     arrival spec pin), and
  *   - an at-least-once replay changes NOTHING — not even a counter
  *     (where [[DedupStream]]'s n_seen and the χ²/KS histograms
  *     double-count, a re-delivered hash is already in (or above) the
  *     buffer; the spec pins that a replayed batch emits ZERO rows).
  *
  * Emission discipline: a row only when the sketch CHANGED — duplicate
  * and out-of-buffer arrivals are absorbed silently, which is also
  * what makes the identical-element flood O(1): 100k copies of one
  * value cost one buffer slot and one emitted row.
  *
  * O(k) state per key (k longs, default 64 = 512 bytes). Estimate
  * formula and the n_sketch < k exact-regime shortcut are exactly
  * [[graft.ext.Sketches.kmvDistinct]]'s — the batch-parity pin feeds
  * both the same corpus and asserts the final stream row equals the
  * batch sketch columns. */
object KmvStream {

  private val Pow60 = 1L << 60

  def sketches(elems: Dataset[ElemHash], k: Int = 64): Dataset[KmvRow] = {
    require(k >= 2 && k <= 4096, s"sketches: k=$k out of [2, 4096]")
    import elems.sparkSession.implicits._
    elems.groupByKey(_.k)
      .flatMapGroupsWithState[Seq[Long], KmvRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, batch: Iterator[ElemHash],
            state: GroupState[Seq[Long]]) =>
          val old = state.getOption.getOrElse(Seq.empty)
          var set = scala.collection.immutable.SortedSet.empty[Long] ++ old
          batch.foreach { e =>
            require(e.h >= 0 && e.h < Pow60,
              s"sketches: key '$key' got hash ${e.h} outside [0, 2^60) — " +
                "ship md5Hash60 values (x180's hash), not raw elements")
            if (set.size < k) set += e.h
            else if (e.h < set.max) {
              set += e.h
              // a re-delivered hash inserts as a no-op — only trim when
              // the insert actually grew the buffer
              if (set.size > k) set -= set.max
            }
          }
          val now = set.toSeq
          if (now == old) Iterator.empty
          else {
            state.update(now)
            val n = now.size
            val kth = now.last
            val est =
              if (n < k) n.toLong
              else ((BigInt(k - 1) * BigInt(Pow60)) / kth).toLong
            Iterator.single(KmvRow(key, n.toLong, kth, est))
          }
      }
  }
}
