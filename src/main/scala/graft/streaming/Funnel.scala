package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import scala.collection.mutable.ListBuffer

/** One user event entering the funnel state machine. `us` is event time in
  * exact microseconds; `ts` the same instant for the watermark.
  */
case class FunnelEvent(user_id: Long, event_type: String, us: Long, ts: java.sql.Timestamp)

/** Per-user funnel progress: step timestamps reached so far (0 = unset). */
case class FunnelState(t1: Long, t2: Long, t3: Long)

/** One funnel ADVANCEMENT: the user reached `depth` at `at_us`;
  * `completed` is meaningful on the final step only (depth 3 inside the
  * window of t1).
  */
case class FunnelOut(user_id: Long, depth: Long, at_us: Long, completed: Boolean)

/** Streaming first-touch conversion funnel (view → click → purchase) as a
  * keyed ordered state machine on `flatMapGroupsWithState` — the live
  * counterpart of the batch `q78_funnel` aggregate. State per user is
  * three longs (O(1)); a row is emitted only when the funnel ADVANCES, so
  * output is advancement-proportional, not event-proportional.
  *
  * Ordering: within each micro-batch the group's events are sorted by
  * (event time, then type rank view<click<purchase) before the state
  * machine runs, so a single bounded AvailableNow replay is EXACTLY the
  * batch first-touch semantics (each step the minimal qualifying event
  * time strictly after the previous step). Across multiple batches the
  * machine is monotone — a step once taken never moves — which matches
  * first-touch ONLY under per-key in-order delivery across batches; a
  * late out-of-order 'view' cannot retroactively lower t1 (the same
  * documented boundary class as st_quota's arrival-order admission).
  *
  * State lifetime: keys expire by event-time timeout once the watermark
  * passes the last observed event by 48 h (the completion window — after
  * that a completed-in-window transition is impossible, and we accept
  * losing a late never-in-window depth advance in exchange for bounded
  * state).
  */
object Funnel {

  /** Completion window (48 h in micros) — keep in sync with the batch
    * `q78_funnel` constant in `RelationalQueries`.
    */
  val WindowUs: Long = 48L * 3600L * 1000000L

  private def typeRank(t: String): Int = t match {
    case "view"     => 0
    case "click"    => 1
    case "purchase" => 2
    case _          => 3
  }

  private def update(
      userId: Long,
      events: Iterator[FunnelEvent],
      state: GroupState[FunnelState]): Iterator[FunnelOut] = {
    val out = ListBuffer.empty[FunnelOut]
    if (state.hasTimedOut) {
      state.remove()
    } else {
      var s = state.getOption.getOrElse(FunnelState(0L, 0L, 0L))
      val sorted = events.toSeq.sortBy(e => (e.us, typeRank(e.event_type)))
      sorted.foreach { e =>
        e.event_type match {
          case "view" if s.t1 == 0L =>
            s = s.copy(t1 = e.us)
            out += FunnelOut(userId, 1L, e.us, completed = false)
          case "click" if s.t1 != 0L && s.t2 == 0L && e.us > s.t1 =>
            s = s.copy(t2 = e.us)
            out += FunnelOut(userId, 2L, e.us, completed = false)
          case "purchase" if s.t2 != 0L && s.t3 == 0L && e.us > s.t2 =>
            s = s.copy(t3 = e.us)
            out += FunnelOut(userId, 3L, e.us, completed = e.us - s.t1 <= WindowUs)
          case _ => ()
        }
      }
      state.update(s)
      sorted.lastOption.foreach(e =>
        state.setTimeoutTimestamp(e.us / 1000L + WindowUs / 1000L))
    }
    out.iterator
  }

  /** Funnel advancements per user over a watermarked event stream. */
  def track(evs: Dataset[FunnelEvent]): Dataset[FunnelOut] = {
    val spark = evs.sparkSession
    import spark.implicits._
    evs
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        update)
  }
}
