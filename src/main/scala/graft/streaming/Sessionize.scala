package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import scala.collection.mutable.ListBuffer

/** One event on a user's timeline. `tsUs` carries the event time in
  * microseconds (exact — java.sql.Timestamp getTime is millis); `ts` is the
  * same instant as a timestamp column for the watermark.
  */
case class SessionEvent(user_id: Long, tsUs: Long, ts: java.sql.Timestamp, event_id: Long)

/** Open-session state per user. */
case class SessionState(startUs: Long, lastUs: Long, nEvents: Long)

/** A closed session. */
case class SessionOut(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

/** Custom stateful sessionization with `flatMapGroupsWithState` — the
  * Structured Streaming twin of the batch gaps-and-islands query
  * (RelationalQueries.q14Sessionize): a session closes when a user is idle
  * longer than [[Sessionize.GapUs]].
  *
  * Per micro-batch, each user's new events merge into the open-session
  * state; sessions whose gap is exceeded are emitted downstream (append
  * mode), and an event-time timeout flushes the final open session once the
  * watermark passes `last + gap`. State per user is O(1) — this is the
  * pattern that scales to unbounded streams where `session_window` +
  * complete mode cannot.
  */
object Sessionize {

  val GapUs: Long = 1800L * 1000000L

  private def update(
      userId: Long,
      events: Iterator[SessionEvent],
      state: GroupState[SessionState]): Iterator[SessionOut] = {
    val out = ListBuffer.empty[SessionOut]
    if (state.hasTimedOut) {
      val s = state.get
      out += SessionOut(userId, s.startUs, s.lastUs, s.nEvents)
      state.remove()
    } else {
      // Within a batch events arrive unordered; sort by (time, id).
      val sorted = events.toSeq.sortBy(e => (e.tsUs, e.event_id))
      var st = state.getOption
      sorted.foreach { e =>
        st match {
          case None =>
            st = Some(SessionState(e.tsUs, e.tsUs, 1L))
          case Some(s) if e.tsUs - s.lastUs > GapUs =>
            out += SessionOut(userId, s.startUs, s.lastUs, s.nEvents)
            st = Some(SessionState(e.tsUs, e.tsUs, 1L))
          case Some(s) =>
            st = Some(s.copy(lastUs = math.max(s.lastUs, e.tsUs), nEvents = s.nEvents + 1L))
        }
      }
      st.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.lastUs / 1000L + GapUs / 1000L)
      }
    }
    out.iterator
  }

  /** Closed sessions per user over a (watermarked) event stream. */
  def sessions(evs: Dataset[SessionEvent]): Dataset[SessionOut] = {
    val spark = evs.sparkSession
    import spark.implicits._
    evs
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
