package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One completed daily level for a key: epoch day + level in cents.
  * The upstream daily rollup (a windowed streaming agg or the batch
  * [[graft.ext.TimeSeries.maxDrawdown]] prelude) produces these. */
final case class DailyLevel(k: String, day: Int, cents: Long)

/** One drawdown verdict, final on arrival: the day's level, the running
  * peak INCLUDING this day, and the day's drawdown vs that peak. */
final case class DrawdownRow(k: String, day: Int, level: Long,
    runmax: Long, dd_ppm: Long)

/** Streaming twin of [[graft.ext.TimeSeries.maxDrawdown]]'s per-day
  * scan: the running peak is a MONOTONE fold, so two longs of state
  * (peak, day frontier) make each day's drawdown verdict final the
  * moment the day's level arrives — no level history is ever retained
  * or rescanned, the O(1)-state posture for 100 TB streams. Emissions
  * across micro-batches union to the batch running-max scan exactly
  * (spec-pinned, including peaks set in an earlier batch). Days
  * at-or-behind the frontier are dropped ([[TransitionStream]]'s late
  * contract — a closed day never reopens); the batch operator's
  * DECIMAL(38) envelope narrows to int64 cents per day here, the
  * documented streaming trade.
  *
  * The final (peak, max dd, trough) rollup is a downstream combinable
  * aggregate over these verdicts — same split as the batch plan, where
  * the argmax rides max(struct) over the dd table. */
object DrawdownStream {

  private val Unset = Int.MinValue

  def drawdowns(levels: Dataset[DailyLevel]): Dataset[DrawdownRow] = {
    import levels.sparkSession.implicits._
    levels.groupByKey(_.k)
      .flatMapGroupsWithState[(Long, Int), DrawdownRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, batch: Iterator[DailyLevel],
            state: GroupState[(Long, Int)]) =>
          val out = Seq.newBuilder[DrawdownRow]
          // Peak seeds at Long.MinValue (unset) so a key whose levels
          // are all non-positive still reports the TRUE running max —
          // the batch window's max(y) — not a phantom 0 (round-11
          // ADVICE fix; the first observed level always installs).
          var (peak, frontier) =
            state.getOption.getOrElse((Long.MinValue, Unset))
          batch.toSeq.sortBy(_.day).foreach { lv =>
            if (frontier == Unset || lv.day > frontier) {
              if (lv.cents > peak) peak = lv.cents
              val dd = if (peak > 0) (peak - lv.cents) * 1000000L / peak else 0L
              out += DrawdownRow(key, lv.day, lv.cents, peak, dd)
              frontier = lv.day
            } // else: late behind the closed-day frontier — dropped
          }
          state.update((peak, frontier))
          out.result().iterator
      }
  }
}
