package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed event row for the stateful APIs (KeyValueGroupedDataset). */
case class Event(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

/** One closed session. */
case class UserSession(user_id: Long, session_start: Timestamp, n: Long)

/** Open-session state carried between micro-batches (epoch millis). */
case class OpenSession(startMs: Long, lastMs: Long, n: Long)

/** Arbitrary-state sessionization (SURVEY C9, `flatMapGroupsWithState`):
  * the custom-state twin of `session_window` — same merge rule (an event
  * extends a session iff ts − last <= gap; Spark's session windows are
  * gap-inclusive, verified empirically), but with explicit state so
  * arbitrary per-session logic (counters, funnels, fraud scores) can ride
  * along.
  *
  * State is bounded: one OpenSession per active user; EventTimeTimeout +
  * watermark evict idle users, which is what keeps 100 TB/day of events
  * from accumulating unbounded state.
  */
object StatefulSessions {

  def sessionize(events: Dataset[Event], gapMinutes: Int,
      watermarkDelay: String = "10 minutes"): Dataset[UserSession] = {
    val gapMs = gapMinutes * 60000L
    implicit val sessEnc = Encoders.product[UserSession]
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val longEnc = Encoders.scalaLong

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
        (user: Long, batch: Iterator[Event], state: GroupState[OpenSession]) => {
          if (state.hasTimedOut) {
            // watermark passed lastTs+gap: the open session is final
            val s = state.get
            state.remove()
            Iterator.single(UserSession(user, new Timestamp(s.startMs), s.n))
          } else {
            // merge this batch (sorted by event time) into the open session,
            // emitting every session that closes within the batch
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var open = state.getOption
            val closed = Seq.newBuilder[UserSession]
            sorted.foreach { e =>
              val t = e.ts.getTime
              open = open match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  Some(OpenSession(s.startMs, t, s.n + 1))
                case Some(s) =>
                  closed += UserSession(user, new Timestamp(s.startMs), s.n)
                  Some(OpenSession(t, t, 1))
                case None => Some(OpenSession(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closed.result().iterator
          }
        })
  }
}
