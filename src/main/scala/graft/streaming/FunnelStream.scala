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
  * lower t1 the way a batch recompute would. With event-time-ordered
  * arrival (or a watermark-sized reorder buffer upstream) the stages
  * match [[graft.ops.EventAnalytics.funnel3]] exactly — the spec pins
  * that equivalence. */
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
}
