package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One raw observation on the stream: (user, event-time micros, event
  * id, value). */
final case class ObsEvent(user_id: Long, us: Long, event_id: Long, value: Double)

/** A finalized hourly grid row: hour start in micros, the LOCF value,
  * and whether the hour had its own observation. */
final case class GridRow(user_id: Long, h_us: Long, v_locf: Double, observed: Int)

/** Per-user fill state: the PENDING hour (its current winning
  * observation under (us DESC, event_id DESC)) — pending because a
  * later event in the same hour can still override it. */
final case class LocfState(pendH: Long, pendUs: Long, pendEid: Long, pendV: Double)

/** Streaming twin of [[graft.ext.TimeSeries.locfGrid]]: the hourly
  * LOCF grid as incremental `flatMapGroupsWithState` instead of a
  * batch grid explode + window.
  *
  * Emission contract (spec-pinned in StreamingGridFillSpec): an hour's
  * row is emitted when the stream moves PAST it — a new event in a
  * later hour finalizes the pending hour (observed = 1, last event in
  * the hour wins) and every gap hour between them (observed = 0,
  * carrying the finalized value). The union of emissions across
  * micro-batches therefore equals the batch grid MINUS each user's
  * still-open last hour (the row batch can close only because its
  * input is finite). State is ONE fixed-size row per user — the
  * pending hour's winning observation — regardless of stream length.
  *
  * Ordering: within and across batches, same-hour events compare by
  * (us, event_id) exactly like the batch election; an event arriving
  * for an hour STRICTLY BEFORE the pending one is late beyond the
  * fill frontier and is dropped (the watermark contract — the batch
  * twin would have needed it before the frontier hour was emitted).
  */
object GridFill {
  val HourUs: Long = 3600L * 1000000L

  def streamingLocf(events: Dataset[ObsEvent]): Dataset[GridRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[LocfState, GridRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, batch: Iterator[ObsEvent], state: GroupState[LocfState]) =>
          val out = Seq.newBuilder[GridRow]
          var s = state.getOption.orNull
          batch.toSeq.sortBy(e => (e.us, e.event_id)).foreach { e =>
            val h = Math.floorDiv(e.us, HourUs) * HourUs
            if (s == null) s = LocfState(h, e.us, e.event_id, e.value)
            else if (h == s.pendH) {
              // same hour: last (us, eid) wins, exactly the batch election
              if (e.us > s.pendUs || (e.us == s.pendUs && e.event_id > s.pendEid))
                s = LocfState(h, e.us, e.event_id, e.value)
            } else if (h > s.pendH) {
              out += GridRow(userId, s.pendH, s.pendV, 1)
              var g = s.pendH + HourUs
              while (g < h) { out += GridRow(userId, g, s.pendV, 0); g += HourUs }
              s = LocfState(h, e.us, e.event_id, e.value)
            } // h < s.pendH: late beyond the frontier — dropped
          }
          if (s != null) state.update(s)
          out.result().iterator
      }
  }
}
