package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time-timeout sessionization with `flatMapGroupsWithState` —
  * the stateful-API corner the restock machine doesn't exercise:
  * per-key state that EXPIRES by watermark. A session accumulates
  * events per user; when the watermark passes last-event + gap, the
  * timeout fires and the closed session is emitted exactly once.
  *
  * Complements the declarative `session_window` aggregate: this form
  * is for when the per-session output needs custom logic (first/last
  * event payloads, conditional emission) that a grouped aggregate
  * can't express.
  */
object SessionTracker {

  final case class Event(user_id: Long, ts: Timestamp, value: Double)

  final case class SessionState(
      startMs: Long, lastMs: Long, nEvents: Int, totalValue: Double)

  final case class ClosedSession(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Int, total_value: Double)

  /** Input must already carry a watermark on `ts`. */
  def track(events: Dataset[Event], gapMs: Long): Dataset[ClosedSession] = {
    implicit val stEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[ClosedSession]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(ClosedSession(userId, new Timestamp(s.startMs),
              new Timestamp(s.lastMs), s.nEvents, s.totalValue))
          } else {
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            val closed = Seq.newBuilder[ClosedSession]
            var st = state.getOption
            // a watermark-legal straggler can predate the OPEN session
            // (cross-batch out-of-order delivery): events within the
            // gap of the session's START extend it backwards; events
            // more than a gap BEFORE it belong to their own earlier
            // session, accumulated here and closed at batch end (the
            // batch is sorted, so consecutive stragglers chain by the
            // same gap rule). Without the startMs branch, `t - lastMs`
            // is negative for every past t and ANY straggler — even
            // hours earlier — silently absorbed into the session
            // without moving its start.
            var early: Option[SessionState] = None
            sorted.foreach { e =>
              val t = e.ts.getTime
              st match {
                case Some(s) if t < s.startMs - gapMs =>
                  early match {
                    case Some(p) if t - p.lastMs <= gapMs =>
                      early = Some(p.copy(lastMs = math.max(p.lastMs, t),
                        nEvents = p.nEvents + 1,
                        totalValue = p.totalValue + e.value))
                    case Some(p) =>
                      closed += ClosedSession(userId, new Timestamp(p.startMs),
                        new Timestamp(p.lastMs), p.nEvents, p.totalValue)
                      early = Some(SessionState(t, t, 1, e.value))
                    case None =>
                      early = Some(SessionState(t, t, 1, e.value))
                  }
                case Some(s) if t - s.lastMs <= gapMs =>
                  st = Some(s.copy(startMs = math.min(s.startMs, t),
                    lastMs = math.max(s.lastMs, t),
                    nEvents = s.nEvents + 1, totalValue = s.totalValue + e.value))
                case Some(s) => // gap inside one batch: close inline
                  closed += ClosedSession(userId, new Timestamp(s.startMs),
                    new Timestamp(s.lastMs), s.nEvents, s.totalValue)
                  st = Some(SessionState(t, t, 1, e.value))
                case None =>
                  st = Some(SessionState(t, t, 1, e.value))
              }
            }
            // batch-end reconciliation: a later in-batch event can
            // EXTEND the open session backwards (min(startMs, t)) to
            // within the gap of a chain that was classified early
            // against the pre-extension start — in that case the gap
            // rule defines ONE session, so merge instead of closing.
            // Only the surviving chain can connect: mid-loop closures
            // happen exactly when the next (sorted) straggler is
            // > gap after them, and the open start never drops below
            // that straggler.
            early.foreach { p =>
              st match {
                case Some(s) if s.startMs - p.lastMs <= gapMs =>
                  st = Some(s.copy(startMs = p.startMs,
                    nEvents = s.nEvents + p.nEvents,
                    totalValue = s.totalValue + p.totalValue))
                case _ =>
                  closed += ClosedSession(userId, new Timestamp(p.startMs),
                    new Timestamp(p.lastMs), p.nEvents, p.totalValue)
              }
            }
            st.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
