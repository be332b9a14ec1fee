package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Input event for sessionization: `eventTime` drives the watermark,
  * `ts` is the exact nanosecond event time. */
final case class SessionEvent(
    userId: Long, ts: Long, eventTime: Timestamp)

/** Open-session state kept per user. */
final case class SessionState(startTs: Long, lastTs: Long, nEvents: Int)

/** A closed session. */
final case class Session(
    userId: Long, startTs: Long, endTs: Long, nEvents: Int)

/** Custom streaming state: gap-based sessionization with
  * `flatMapGroupsWithState` — the stateful-streaming analogue of the
  * batch gaps-and-islands query (q29). A session closes when a new
  * event arrives more than `gapNs` after the last one, or when the
  * event-time watermark passes the gap deadline (EventTimeTimeout).
  *
  * Scale: state is one small record per active user, partitioned by
  * userId across the state store; the watermark bounds state lifetime
  * to (gap + watermark delay).
  */
object Sessionize {

  def sessions(
      events: Dataset[SessionEvent], gapNs: Long): Dataset[Session] = {
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[Session]
    events
      .groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[SessionEvent],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.startTs, s.lastTs, s.nEvents))
          } else {
            val sorted = batch.toSeq.sortBy(_.ts)
            val closed = Seq.newBuilder[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.ts - s.lastTs > gapNs =>
                  closed += Session(userId, s.startTs, s.lastTs, s.nEvents)
                  cur = Some(SessionState(e.ts, e.ts, 1))
                case Some(s) =>
                  cur = Some(SessionState(s.startTs, e.ts, s.nEvents + 1))
                case None =>
                  cur = Some(SessionState(e.ts, e.ts, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // Close the session once event time passes last + gap.
              state.setTimeoutTimestamp(s.lastTs / 1000000L + gapNs / 1000000L)
            }
            closed.result().iterator
          }
      }
  }
}
