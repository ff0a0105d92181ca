package graft.streaming

import org.apache.spark.sql.Dataset

/** Streaming twin of [[graft.ops.EventAnalytics.funnel3]]: per-user
  * funnel stage tracked incrementally in `GroupState` (three optional
  * step timestamps), advancing only when a step arrives STRICTLY after
  * the previous step's time — the same ordered semantics as the batch
  * form, emitted as a progress row on the micro-batch where the user's
  * stage advances (conversion tracking without rescanning history).
  *
  * Parity caveat (inherent to any incremental funnel): the state keeps
  * the FIRST-ACCEPTED step time, so a step-1 event that arrives in a
  * later micro-batch with an EARLIER timestamp does not retroactively
  * lower t1 the way a batch recompute would. [[advances]] is therefore
  * the fast path for event-time-ordered arrival (exact parity, zero
  * buffering, pinned by spec); [[advancesReordered]] is the
  * general-arrival path — it holds events in `GroupState` until the
  * watermark passes them, then applies the same stage logic in
  * event-time order, so shuffled arrival matches
  * [[graft.ops.EventAnalytics.funnel3]] exactly (also spec-pinned). */
object FunnelStream {

  case class StepEvent(user: Long, tus: Long, step: Int)
  case class FunnelState(t1: Long, t2: Long, t3: Long) // MinValue = unset
  case class StageAdvance(user: Long, stage: Int, tus: Long)

  private val Unset = Long.MinValue

  /** Emits (user, newStage, eventMicros) whenever a user's funnel stage
    * advances. `step` is 1-based (1 = entry step). */
  def advances(events: Dataset[StepEvent]): Dataset[StageAdvance] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.groupByKey(_.user)
      .flatMapGroupsWithState[FunnelState, StageAdvance](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, batch: Iterator[StepEvent], state: GroupState[FunnelState]) =>
          val s0 = state.getOption.getOrElse(FunnelState(Unset, Unset, Unset))
          var (t1, t2, t3) = (s0.t1, s0.t2, s0.t3)
          val out = batch.toSeq.sortBy(e => (e.tus, e.step)).flatMap { e =>
            e.step match {
              case 1 if t1 == Unset =>
                t1 = e.tus; Some(StageAdvance(user, 1, e.tus))
              case 2 if t2 == Unset && t1 != Unset && e.tus > t1 =>
                t2 = e.tus; Some(StageAdvance(user, 2, e.tus))
              case 3 if t3 == Unset && t2 != Unset && e.tus > t2 =>
                t3 = e.tus; Some(StageAdvance(user, 3, e.tus))
              case _ => None
            }
          }
          state.update(FunnelState(t1, t2, t3))
          out.iterator
      }
  }

  /** A buffered step event (micros + step), plus the stage times —
    * everything [[advancesReordered]] keeps per user between batches.
    * The buffer is watermark-bounded: at most `maxDelay` worth of one
    * user's events, freed as the watermark passes them. */
  case class BufEvent(tus: Long, step: Int)
  case class ReorderState(buf: Seq[BufEvent], t1: Long, t2: Long, t3: Long)

  /** [[advancesReordered]]'s input row after the watermark column is
    * attached (not `private`: the deserializer is code-generated OUTSIDE
    * this object and needs constructor access). */
  case class TimedStep(user: Long, tus: Long, step: Int,
      ets: java.sql.Timestamp)

  /** Reorder-buffered funnel: exact [[graft.ops.EventAnalytics.funnel3]]
    * semantics under ARBITRARY arrival order, at the price of watermark
    * latency. Events wait in `GroupState` until the event-time watermark
    * passes them; only then do they run through the stage machine, in
    * `(tus, step)` order. Release waves cover disjoint, increasing time
    * ranges (wave k finalizes everything below watermark_k, and any
    * later arrival inside an already-finalized range is late by
    * definition and dropped by the watermark), so the concatenation of
    * sorted waves IS the fully time-sorted event sequence — which is
    * why incremental processing here equals the batch recompute.
    *
    * `maxDelay` is the disorder bound: an event arriving more than
    * `maxDelay` (event-time) behind the stream maximum is dropped, the
    * standard watermark contract. Emission happens on the micro-batch
    * where the watermark passes the event (often a later batch than its
    * arrival, and possibly a timeout-triggered batch with no new data
    * for that user — the `EventTimeTimeout` re-arms while the buffer is
    * non-empty). */
  def advancesReordered(events: Dataset[StepEvent],
      maxDelay: String = "10 minutes"): Dataset[StageAdvance] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val timed = events
      .withColumn("ets", timestamp_micros(col("tus")))
      .withWatermark("ets", maxDelay)
      .as[TimedStep]
    timed.groupByKey(_.user)
      .flatMapGroupsWithState[ReorderState, StageAdvance](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, batch: Iterator[TimedStep], state: GroupState[ReorderState]) =>
          val s0 = state.getOption.getOrElse(ReorderState(Seq.empty, Unset, Unset, Unset))
          val wmMs = state.getCurrentWatermarkMs()
          val wmUs = wmMs * 1000L
          val all = s0.buf ++ batch.map(e => BufEvent(e.tus, e.step))
          // strict <: an event AT the watermark could still gain an
          // earlier sibling (arrivals >= watermark are not late)
          val (ready, hold) = all.partition(_.tus < wmUs)
          var (t1, t2, t3) = (s0.t1, s0.t2, s0.t3)
          val out = ready.sortBy(e => (e.tus, e.step)).flatMap { e =>
            e.step match {
              case 1 if t1 == Unset =>
                t1 = e.tus; Some(StageAdvance(user, 1, e.tus))
              case 2 if t2 == Unset && t1 != Unset && e.tus > t1 =>
                t2 = e.tus; Some(StageAdvance(user, 2, e.tus))
              case 3 if t3 == Unset && t2 != Unset && e.tus > t2 =>
                t3 = e.tus; Some(StageAdvance(user, 3, e.tus))
              case _ => None
            }
          }
          state.update(ReorderState(hold, t1, t2, t3))
          if (hold.nonEmpty) {
            // wake when the watermark reaches the oldest held event
            // (must be strictly ahead of the current watermark)
            state.setTimeoutTimestamp(math.max(wmMs + 1, hold.map(_.tus).min / 1000L))
          }
          out.iterator
      }
  }
}
