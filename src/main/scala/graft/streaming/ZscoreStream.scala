package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One flagged spike day, final on arrival: the day's level, the
  * trailing-window size it was judged against, and BOTH sides of the
  * exact z² comparison as decimal strings (the batch operator's
  * auditable-margin contract — no float ever formed). */
final case class ZscoreFlag(k: String, day: Int, v: Long, n_win: Long,
    z2_num: String, z2_den: String)

/** Streaming twin of [[graft.ext.TimeSeries.rollingZscore]] — the
  * spike monitor to [[CusumStream]]'s sustained-shift detector, run
  * continuously instead of re-scanning the corpus: flag day t when its
  * level deviates from the TRAILING window's mean by more than `c`
  * standard deviations, in exact integer math. With n trailing rows,
  * s = Σv, ss = Σv²: flag iff `(n·x − s)² > c²·(n·ss − s²)`, both
  * sides in BigInt (the batch plan's DECIMAL(38) envelope, exceeded by
  * nothing here because the state is exact).
  *
  * Unlike the monitors that need a calibrated reference, the trailing
  * window is COMPUTABLE online — the state carries the last ≤ `win`
  * closed daily levels per key, so the emitted flags are the batch
  * operator's output rows EXACTLY, row for row (spec-pinned in
  * MonitorStreamSpec): same frame (ends at 1 PRECEDING — a day never
  * judges itself), same minN gate, same flagged-only emission.
  *
  * O(win) state per key (win ≤ 365 longs — calendar-bounded, the
  * [[Chi2DriftStream]] O(bins) discipline) plus the closed-day
  * frontier: days at-or-behind the frontier are dropped (the
  * [[TransitionStream]] late contract; the batch twin re-sorts, a
  * stream cannot re-open a judged window). Emissions are final on
  * arrival — Append mode with no retraction, because each flag is a
  * pure function of the already-closed trailing window. */
object ZscoreStream {

  def flags(levels: Dataset[DailyLevel], win: Int, c: Int, minN: Int = 8)
      : Dataset[ZscoreFlag] = {
    require(win >= 2 && win <= 365, s"flags: win=$win out of range")
    require(c >= 1 && minN >= 2 && minN <= win,
      s"flags: c=$c / minN=$minN out of range")
    val c2 = BigInt(c.toLong * c)
    import levels.sparkSession.implicits._
    levels.groupByKey(_.k)
      .flatMapGroupsWithState[Seq[(Int, Long)], ZscoreFlag](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, batch: Iterator[DailyLevel],
            state: GroupState[Seq[(Int, Long)]]) =>
          // trailing window, oldest first; last element is the frontier
          var tail = state.getOption.getOrElse(Seq.empty).toVector
          val out = Seq.newBuilder[ZscoreFlag]
          batch.toSeq.sortBy(_.day).foreach { lv =>
            if (tail.isEmpty || lv.day > tail.last._1) {
              val n = tail.size
              if (n >= minN) {
                var s = BigInt(0)
                var ss = BigInt(0)
                tail.foreach { case (_, v) =>
                  s += v; ss += BigInt(v) * v
                }
                val num = { val d = BigInt(n) * lv.cents - s; d * d }
                val den = BigInt(n) * ss - s * s
                if (num > c2 * den)
                  out += ZscoreFlag(key, lv.day, lv.cents, n.toLong,
                    num.toString, den.toString)
              }
              tail = (tail :+ (lv.day, lv.cents)).takeRight(win)
            } // else: late behind the closed-day frontier — dropped
          }
          state.update(tail)
          out.result().iterator
      }
  }
}
