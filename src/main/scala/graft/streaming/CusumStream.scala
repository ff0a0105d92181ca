package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One running-CUSUM verdict, final on arrival: the day's level and the
  * cumulative sum of exact mean-centered deviations through this day. */
final case class CusumRow(k: String, day: Int, level: Long, cusum: Long)

/** Streaming twin of [[graft.ext.TimeSeries.cusumPeak]]'s running-sum
  * scan — the control-chart form a pipeline actually runs continuously.
  *
  * The batch operator centers on the key's own global mean (two passes:
  * totals, then the window) — unknowable online. The streaming contract
  * is the production one: a CALIBRATED reference mean per key, supplied
  * as the exact rational `(num, den)` (typically `(Σy, n)` from a
  * trailing calibration window), so each day's deviation is the same
  * exact integer the batch plan computes: `dev = den·y − num`. With
  * `refs(k) = (total_k, n_k)` from the batch totals, the emitted cusum
  * sequence IS the batch window column, row for row (spec-pinned in
  * MonitorStreamSpec), and the batch (peak_x, peak_cusum) verdict is a
  * downstream argmax over the emissions — same split as
  * [[DrawdownStream]].
  *
  * O(1) state per key: the running cusum (a BigInt, carried as its
  * decimal string so the accumulation itself never wraps) plus the
  * closed-day frontier — no level history retained or rescanned. Days
  * at-or-behind the frontier are dropped (the [[TransitionStream]] late
  * contract). Emissions narrow the batch plan's DECIMAL(38) envelope to
  * int64 (|cusum| < 2^63, i.e. n·Σ|y| < 9.2e18) — the documented
  * streaming trade, as [[DrawdownStream]] narrows cents — and the
  * narrowing is GUARDED: an envelope breach poisons the query loudly
  * (the exact BigInt state makes the check free) instead of emitting
  * wrapped garbage verdicts. Keys absent
  * from `refs` emit nothing (a monitor watches calibrated keys;
  * throwing would poison the whole query) — documented, not silent:
  * the builder requires a non-empty calibration map.
  */
object CusumStream {

  private val Unset = Int.MinValue

  def cusums(levels: Dataset[DailyLevel], refs: Map[String, (Long, Long)])
      : Dataset[CusumRow] = {
    require(refs.nonEmpty, "cusums: empty calibration map — supply (num, den) reference means per key")
    refs.foreach { case (k, (_, den)) =>
      require(den > 0, s"cusums: ref for key '$k' has den=$den (must be > 0)")
    }
    import levels.sparkSession.implicits._
    levels.groupByKey(_.k)
      .flatMapGroupsWithState[(String, Int), CusumRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, batch: Iterator[DailyLevel],
            state: GroupState[(String, Int)]) =>
          refs.get(key) match {
            case None => Iterator.empty // uncalibrated key — documented drop
            case Some((num, den)) =>
              val out = Seq.newBuilder[CusumRow]
              var (cusumStr, frontier) = state.getOption.getOrElse(("0", Unset))
              var cusum = BigInt(cusumStr)
              batch.toSeq.sortBy(_.day).foreach { lv =>
                if (frontier == Unset || lv.day > frontier) {
                  cusum += BigInt(den) * lv.cents - num
                  // the state is exact; the EMISSION narrows to int64 —
                  // breach must be loud, never a wrapped verdict
                  require(cusum.isValidLong,
                    s"cusums: key '$key' cusum $cusum exceeds int64 at day " +
                      s"${lv.day} — recalibrate the reference (den*Sum|y| envelope)")
                  out += CusumRow(key, lv.day, lv.cents, cusum.toLong)
                  frontier = lv.day
                } // else: late behind the closed-day frontier — dropped
              }
              state.update((cusum.toString, frontier))
              out.result().iterator
          }
      }
  }
}
