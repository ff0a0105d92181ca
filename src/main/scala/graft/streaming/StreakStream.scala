package graft.streaming

/** One key-day activity mark (duplicates within a day are fine — the
  * state collapses them, mirroring the batch distinct). */
final case class ActiveDay(k: Long, day: Int)

/** One streak verdict, final on arrival of that day: the current
  * consecutive-day run ending at `day`, and the best run seen so far. */
final case class StreakRow(k: Long, day: Int, cur_streak: Long,
    longest: Long)

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.ext.TimeSeries.streakHistogram]]'s per-key
  * streak scan: the islands-and-gaps rank-difference trick needs the
  * whole sorted day list in batch, but incrementally a streak is just
  * three longs of state — (last day, current run, best run). A day
  * extends the run iff it is `last + 1`; same-day duplicates collapse
  * against the frontier (the batch `distinct`); anything older is
  * dropped ([[TransitionStream]]'s late contract). Verdicts are final
  * on arrival, so emissions across micro-batches union to the batch
  * scan exactly (spec-pinned, including runs straddling batch
  * boundaries), and the survival histogram is one downstream
  * combinable rollup over each key's LAST verdict — the same split as
  * the batch plan. No day history is ever retained: the O(1)-state
  * posture for 100 TB event streams. */
object StreakStream {

  private val Unset = Int.MinValue

  def streaks(days: Dataset[ActiveDay]): Dataset[StreakRow] = {
    import days.sparkSession.implicits._
    days.groupByKey(_.k)
      .flatMapGroupsWithState[(Int, Long, Long), StreakRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, batch: Iterator[ActiveDay],
            state: GroupState[(Int, Long, Long)]) =>
          val out = Seq.newBuilder[StreakRow]
          var (last, cur, best) = state.getOption.getOrElse((Unset, 0L, 0L))
          batch.toSeq.sortBy(_.day).foreach { d =>
            if (last == Unset || d.day > last) {
              cur = if (last != Unset && d.day == last + 1) cur + 1L else 1L
              if (cur > best) best = cur
              last = d.day
              out += StreakRow(key, d.day, cur, best)
            } // else: duplicate or late day — collapsed/dropped
          }
          state.update((last, cur, best))
          out.result().iterator
      }
  }
}
