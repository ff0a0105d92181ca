package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One typed event on the stream, the transition input. */
final case class TypedEvent(user_id: Long, us: Long, event_id: Long, et: String)

/** An observed transition: consecutive (from, to) on one user's
  * timeline. */
final case class Transition(user_id: Long, from_type: String, to_type: String)

/** The last event seen per user — the only state a first-order chain
  * needs. */
final case class LastEvent(us: Long, eid: Long, et: String)

/** Streaming twin of [[graft.ops.EventAnalytics.transitionRates]]'
  * pair extraction: each user's consecutive (from, to) event-type
  * transitions as incremental `flatMapGroupsWithState`. A transition
  * is final the moment its second event arrives, so unlike the grid
  * fill there is NO open tail: the union of emissions across
  * micro-batches equals the batch lag-derived pair multiset exactly
  * (spec-pinned). Feed the output to a streaming count aggregation for
  * live rates. State is one (us, eid, et) row per user; events older
  * than the state's frontier are dropped (same late contract as
  * [[GridFill]]). */
object TransitionStream {
  def transitions(events: Dataset[TypedEvent]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEvent, Transition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, batch: Iterator[TypedEvent], state: GroupState[LastEvent]) =>
          val out = Seq.newBuilder[Transition]
          var s = state.getOption.orNull
          batch.toSeq.sortBy(e => (e.us, e.event_id)).foreach { e =>
            if (s == null) s = LastEvent(e.us, e.event_id, e.et)
            else if (e.us > s.us || (e.us == s.us && e.event_id > s.eid)) {
              out += Transition(userId, s.et, e.et)
              s = LastEvent(e.us, e.event_id, e.et)
            } // else: at-or-before the frontier — late, dropped
          }
          if (s != null) state.update(s)
          out.result().iterator
      }
  }
}
