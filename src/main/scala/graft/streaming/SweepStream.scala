package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.GroupStateTimeout

/** One ±1 sweep event: interval start mints d = +1 at `us`, the end
  * mints d = −1; `eid` is the strictly-increasing arrival id that makes
  * the cross-batch frontier total (duplicate (us, d) pairs are REAL —
  * two intervals can start the same microsecond — so the frontier
  * cannot key on time alone). */
final case class IntervalDelta(k: Long, us: Long, d: Int, eid: Long)

/** Per-(key, micro-batch) running sweep report: events folded so far,
  * currently open intervals, the running max, and the EARLIEST
  * microsecond the max was reached. */
final case class SweepUpdate(k: Long, n_ev: Long, open: Long,
    max_open: Long, peak_us: Long)

/** Streaming twin of [[graft.ext.TimeSeries.maxConcurrency]]: the
  * per-key sweep-line folded incrementally in `mapGroupsWithState`.
  * The batch op's correctness rests on processing deltas in (t, d)
  * order with −1 before +1 at equal t (half-open semantics) and on tie
  * groups sharing a delta (peak order-independence); the SAME argument
  * makes five longs of state sufficient here — no event history is
  * ever retained, the 100 TB posture for a sweep.
  *
  * Ordering contract: within a micro-batch the op sorts by
  * (us, d, eid); ACROSS batches an event at or before the (us, d, eid)
  * frontier is dropped ([[TransitionStream]]'s late contract — a
  * time-regressing delta would corrupt the open count, and the batch
  * twin exists for reconciling late data). In-order feeds make the
  * final update per key EQUAL the batch operator's row (spec-pinned,
  * including a tie group split across batch boundaries). */
object SweepStream {

  private val Unset = Long.MinValue

  def updates(deltas: Dataset[IntervalDelta]): Dataset[SweepUpdate] = {
    import deltas.sparkSession.implicits._
    deltas.groupByKey(_.k)
      .mapGroupsWithState[(Long, Long, Long, Long, Long, Long, Long), SweepUpdate](
        GroupStateTimeout.NoTimeout()) {
        (k: Long, batch: Iterator[IntervalDelta],
            state: org.apache.spark.sql.streaming.GroupState[(Long, Long, Long, Long, Long, Long, Long)]) =>
          // (nEv, open, maxOpen, peakUs, fUs, fD, fEid)
          var (nEv, open, maxOpen, peakUs, fUs, fD, fEid) =
            state.getOption.getOrElse((0L, 0L, 0L, Unset, Unset, Unset, Unset))
          batch.toSeq.sortBy(e => (e.us, e.d, e.eid)).foreach { e =>
            val fresh = fUs == Unset || e.us > fUs ||
              (e.us == fUs && (e.d > fD || (e.d == fD && e.eid > fEid)))
            if (fresh) {
              nEv += 1; open += e.d
              if (open > maxOpen) { maxOpen = open; peakUs = e.us }
              fUs = e.us; fD = e.d; fEid = e.eid
            }
          }
          state.update((nEv, open, maxOpen, peakUs, fUs, fD, fEid))
          SweepUpdate(k, nEv, open, maxOpen, peakUs)
      }
  }
}
