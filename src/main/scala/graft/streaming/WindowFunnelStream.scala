package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One conversion verdict: a step-3 event with its minimal chain span
  * (microseconds from the best step-1), or `span = -1` when no prior
  * s1 < s2 chain exists. `ok` applies the caller's window bound. */
final case class FunnelHit(user_id: Long, us: Long, ok: Boolean, span: Long)

/** Greedy-latest chain state: the latest s1 time, and the latest s2
  * with the s1 frontier it saw (MinValue = unset). Fixed size — two
  * longs and a pair — regardless of how many events the user has. */
final case class ChainState(lastS1: Long, s2T: Long, s2S1: Long)

/** Streaming twin of [[graft.ops.EventAnalytics.windowFunnel]]'s
  * per-conversion verdicts: the greedy-latest three-step chain tracked
  * incrementally in `flatMapGroupsWithState`. The batch form proves
  * greedy-latest exact (the running-last frame is monotone); the SAME
  * monotonicity makes the incremental state sufficient — a conversion's
  * verdict depends only on (latest s2 before it, that s2's latest s1),
  * which is exactly the state. A verdict is final the moment the
  * step-3 event arrives, so there is NO open tail: emissions across
  * micro-batches union to the batch per-conversion rows exactly
  * (spec-pinned, including chains straddling batch boundaries).
  * Events at-or-before the user's frontier are dropped
  * ([[TransitionStream]]'s late contract).
  *
  * State is three longs per user — the 100 TB posture for funnels: no
  * event history is ever retained or rescanned. */
object WindowFunnelStream {

  private val Unset = Long.MinValue

  def verdicts(events: Dataset[TypedEvent], s1: String, s2: String,
      s3: String, windowUs: Long): Dataset[FunnelHit] = {
    require(windowUs > 0, s"windowUs=$windowUs must be positive")
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[(ChainState, Long, Long), FunnelHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, batch: Iterator[TypedEvent],
            state: GroupState[(ChainState, Long, Long)]) =>
          val out = Seq.newBuilder[FunnelHit]
          // (chain, frontierUs, frontierEid)
          var (s, fUs, fEid) = state.getOption
            .getOrElse((ChainState(Unset, Unset, Unset), Unset, Unset))
          batch.toSeq.sortBy(e => (e.us, e.event_id)).foreach { e =>
            val fresh = fUs == Unset || e.us > fUs || (e.us == fUs && e.event_id > fEid)
            if (fresh) {
              // verdict BEFORE folding the event in: frames end at 1 PRECEDING
              if (e.et == s3) {
                val chainS1 = if (s.s2T == Unset) Unset else s.s2S1
                if (chainS1 == Unset) out += FunnelHit(userId, e.us, ok = false, -1L)
                else {
                  val span = e.us - chainS1
                  out += FunnelHit(userId, e.us, span <= windowUs, span)
                }
              }
              if (e.et == s1) s = s.copy(lastS1 = e.us)
              else if (e.et == s2) s = s.copy(s2T = e.us, s2S1 = s.lastS1)
              fUs = e.us; fEid = e.event_id
            } // else: late behind the frontier — dropped
          }
          state.update((s, fUs, fEid))
          out.result().iterator
      }
  }
}
