package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time-timeout sessionization with `flatMapGroupsWithState` —
  * the stateful-API corner the restock machine doesn't exercise:
  * per-key state that EXPIRES by watermark. Events accumulate into
  * per-user sessions under the gap rule; a session is emitted exactly
  * once, when the watermark passes its last event + gap.
  *
  * The state holds a LIST of open sessions, not just the latest one:
  * out-of-order delivery within the watermark horizon can interleave
  * sessions across micro-batches (a straggler chain arriving over two
  * batches, a late event bridging two previously-separate sessions),
  * and any eager single-session emission necessarily either
  * double-emits or mis-merges some legal arrival order. Holding every
  * session open until the WATERMARK proves no legal event can still
  * touch it makes the gap rule's output independent of how events were
  * batched — the same guarantee the declarative `session_window`
  * aggregate provides, here with custom per-session logic. State per
  * key is bounded by the number of distinct in-horizon sessions
  * (horizon / gap at worst), not by history.
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

  final case class Sessions(open: Seq[SessionState])

  final case class ClosedSession(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Int, total_value: Double)

  /** Input must already carry a watermark on `ts`. */
  def track(events: Dataset[Event], gapMs: Long): Dataset[ClosedSession] = {
    implicit val stEnc = Encoders.product[Sessions]
    implicit val outEnc = Encoders.product[ClosedSession]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Sessions, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[Sessions]) =>
          var open = state.getOption.map(_.open).getOrElse(Seq.empty)
          if (!state.hasTimedOut) {
            // fold each event in: absorb every open session within the
            // gap of it (an event can BRIDGE two sessions — e.g. [10]
            // and [60] with gap 30 joined by a late 40), widening the
            // merged span. Order-insensitive: the merge of overlapping
            // gap-intervals is the same whatever order events land.
            it.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              val (touch, rest) = open.partition(s =>
                t >= s.startMs - gapMs && t <= s.lastMs + gapMs)
              val merged = touch.foldLeft(SessionState(t, t, 1, e.value)) {
                (a, s) => SessionState(math.min(a.startMs, s.startMs),
                  math.max(a.lastMs, s.lastMs),
                  a.nEvents + s.nEvents, a.totalValue + s.totalValue)
              }
              open = rest :+ merged
            }
          }
          // emit exactly the sessions the watermark has sealed: no
          // legal event (ts ≥ watermark) can fall within their gap.
          // STRICT <: at lastMs + gapMs == wm an on-time event with
          // ts == wm still satisfies t <= lastMs + gapMs — sealing at
          // equality would let that event open a second overlapping
          // session and double-emit. Progress is safe: the event-time
          // timeout fires only once the watermark EXCEEDS the set
          // timestamp, at which point the strict predicate holds.
          val wm = state.getCurrentWatermarkMs()
          val (sealedNow, stillOpen) = open.partition(_.lastMs + gapMs < wm)
          if (stillOpen.isEmpty) state.remove()
          else {
            state.update(Sessions(stillOpen))
            // earliest possible seal; > wm for every stillOpen session
            state.setTimeoutTimestamp(stillOpen.map(_.lastMs).min + gapMs)
          }
          sealedNow.sortBy(_.startMs).map(s =>
            ClosedSession(userId, new Timestamp(s.startMs),
              new Timestamp(s.lastMs), s.nEvents, s.totalValue)).iterator
      }
  }
}
