package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import scala.collection.mutable.ListBuffer

/** One event competing for a (tenant, hour) quota slot. `tsUs` is event time
  * in exact microseconds; `ts` is the same instant for the watermark.
  */
case class QuotaEvent(
    tenant: String,
    hour: String,
    tsUs: Long,
    ts: java.sql.Timestamp,
    event_id: Long)

/** Admission count for one (tenant, hour) key. */
case class QuotaState(admitted: Long)

/** An admitted event with its quota slot. */
case class QuotaOut(tenant: String, hour: String, event_id: Long, ts_us: Long, quota_rank: Long)

/** Streaming per-key rate limiting with `flatMapGroupsWithState`: each
  * (tenant, hour) key admits its first [[Quota.DefaultN]] events and drops
  * the rest — the ingestion-throttle / per-tenant-quota pattern. State per
  * key is ONE counter (O(1)), expired by an event-time timeout once the
  * watermark passes the hour by a full hour, so unbounded streams hold
  * state only for live hours.
  *
  * Semantics are ARRIVAL-order admission (as production rate limiters
  * are); within a micro-batch the iterator is unordered, so the batch is
  * sorted by (event time, event_id) to pin determinism. For the bounded
  * AvailableNow replay the whole backlog is one batch, making admission
  * exactly "first N per key by (ts, event_id)" — which is what the DuckDB
  * oracle replays. Under a multi-batch split with out-of-order arrival,
  * admission follows arrival order instead — inherent to quota semantics,
  * same caveat class as documented on st_cdc's retained-tombstone merge.
  */
object Quota {

  val DefaultN: Long = 2L

  private def update(n: Long)(
      key: (String, String),
      events: Iterator[QuotaEvent],
      state: GroupState[QuotaState]): Iterator[QuotaOut] = {
    val out = ListBuffer.empty[QuotaOut]
    if (state.hasTimedOut) {
      state.remove()
    } else {
      var admitted = state.getOption.map(_.admitted).getOrElse(0L)
      val sorted = events.toSeq.sortBy(e => (e.tsUs, e.event_id))
      sorted.foreach { e =>
        if (admitted < n) {
          admitted += 1L
          out += QuotaOut(key._1, key._2, e.event_id, e.tsUs, admitted)
        }
      }
      state.update(QuotaState(admitted))
      // Expire the counter once the watermark is a full hour past the
      // last event's hour — late events after that would re-open the
      // quota, the standard watermark-lateness tradeoff.
      sorted.lastOption.foreach(e => state.setTimeoutTimestamp(e.tsUs / 1000L + 7200L * 1000L))
    }
    out.iterator
  }

  /** Admitted events per (tenant, hour) over a watermarked event stream. */
  def admit(evs: Dataset[QuotaEvent], n: Long): Dataset[QuotaOut] = {
    val spark = evs.sparkSession
    import spark.implicits._
    evs
      .withWatermark("ts", "1 hour")
      .groupByKey(e => (e.tenant, e.hour))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        update(n))
  }
}
