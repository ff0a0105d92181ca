package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One keyed order-level observation: event time (µs), a per-key-unique
  * order id (the tie-breaker — the [[graft.ext.TimeSeries.ewmaLast]]
  * determinism contract), and the integer measure. */
final case class OrderLevel(k: String, tus: Long, ord: Long, m: Long)

/** One EWMA verdict, re-issued whenever the key's top-`taps` window
  * actually changes: the verdict's per-key sequence number (monotone —
  * a monitor reads the max, forensics orders the trajectory by it),
  * how many taps are filled, the exact truncated EWMA, and the newest
  * measure. */
final case class EwmaRow(k: String, n_emit: Long, k_used: Long,
    ewma_m: Long, last_m: Long)

/** Streaming twin of [[graft.ext.TimeSeries.ewmaLast]] — the
  * feature-store freshness monitor a pipeline actually keeps online:
  * the α=1/2 exponential smoothing over each key's last `taps`
  * observations, re-scored as orders arrive instead of re-scanning the
  * corpus. Same exact integers as the batch plan: weights
  * `2^(taps−rn)` newest-first, denominator `2^taps − 2^(taps−k)`,
  * ONE truncating division (BigInt here, DECIMAL(38) there — both
  * truncate toward zero), so the stream's latest verdict equals the
  * batch row bit for bit (spec-pinned in MonitorStreamSpec).
  *
  * ORDER-INDEPENDENT by construction — the property the frontier-based
  * twins can't offer: the state is the top-`taps` set under the total
  * order (tus desc, ord desc), and set-insert-then-trim commutes, so
  * ANY arrival order (late data included, no watermark needed)
  * converges to the same verdict the batch computes. Replay-safe too:
  * observations merge by their (tus, ord) IDENTITY (max-measure on a
  * conflict — commutative and idempotent), so at-least-once delivery
  * can't double-occupy taps. The price is the verdict is only
  * re-emitted when the top-`taps` set actually changes — an arrival
  * older than the full window is absorbed silently (it cannot affect
  * any future verdict either, since the window only moves forward).
  *
  * O(taps) state per key (taps ≤ 62 triples). Emissions are cumulative
  * verdicts in Append mode — the latest row per key is the current
  * feature value. The int64 narrowing of the emitted EWMA is guarded
  * loudly (the [[CusumStream]] contract): the state is exact, so a
  * breach poisons the query instead of wrapping. */
object EwmaStream {

  def ewmas(orders: Dataset[OrderLevel], taps: Int): Dataset[EwmaRow] = {
    require(taps >= 1 && taps <= 62, s"ewmas: taps=$taps must be in [1, 62]")
    import orders.sparkSession.implicits._
    orders.groupByKey(_.k)
      .flatMapGroupsWithState[(Seq[(Long, Long, Long)], Long), EwmaRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, batch: Iterator[OrderLevel],
            state: GroupState[(Seq[(Long, Long, Long)], Long)]) =>
          val (old, nEmit) = state.getOption.getOrElse((Seq.empty, 0L))
          val incoming = batch.map(o => (o.tus, o.ord, o.m)).toSeq
          // set-insert + trim: newest-first total order, keep taps.
          // At-least-once replay safe: dedup by the (tus, ord) identity
          // first so a re-delivered observation can't occupy two taps;
          // max(m) keeps the merge commutative AND idempotent, so the
          // order-independence claim survives even a corrupt replay
          // that disagrees about the measure
          val buf = (incoming ++ old)
            .groupBy(t => (t._1, t._2))
            .map { case ((tus, ord), ts) => (tus, ord, ts.iterator.map(_._3).max) }
            .toSeq
            .sortBy(t => (-t._1, -t._2))
            .take(taps)
          if (buf == old) Iterator.empty // window unchanged — no verdict
          else {
            state.update((buf, nEmit + 1))
            var num = BigInt(0)
            buf.zipWithIndex.foreach { case ((_, _, m), i) =>
              num += BigInt(m) << (taps - 1 - i)
            }
            val den = (BigInt(1) << taps) - (BigInt(1) << (taps - buf.size))
            val ewma = num / den // truncates toward zero, as the batch DIV
            require(ewma.isValidLong,
              s"ewmas: key '$key' ewma $ewma exceeds int64 — the measure " +
                s"envelope is breached, recalibrate upstream")
            Iterator.single(EwmaRow(key, nEmit + 1, buf.size.toLong,
              ewma.toLong, buf.head._3))
          }
      }
  }
}
