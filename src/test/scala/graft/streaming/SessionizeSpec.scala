package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class SessionizeSpec extends SparkSpec {

  private def ev(user: Long, us: Long, id: Long) =
    SessionEvent(user, us, new java.sql.Timestamp(us / 1000L), id)

  test("flatMapGroupsWithState sessionization closes sessions on gap and timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[SessionEvent]
    val gap = Sessionize.GapUs

    val q = Sessionize
      .sessions(source.toDS())
      .writeStream
      .format("memory")
      .queryName("sess_test")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()

    val t0 = 1700000000000000L // any epoch-us base
    // user 1: two events 10 min apart (one session), then one event
    // 40 min later (gap > 30 min -> second session).
    // user 2: single event — at a time >= the current watermark (t0+600s
    // after batch 1), since the 0-second watermark drops late arrivals.
    source.addData(ev(1, t0, 1), ev(1, t0 + 600L * 1000000L, 2))
    q.processAllAvailable()
    source.addData(
      ev(1, t0 + 600L * 1000000L + gap + 1L, 3),
      ev(2, t0 + 700L * 1000000L, 4))
    q.processAllAvailable()
    // Flush: far-future events advance the watermark past every open
    // session's timeout so event-time timeouts fire.
    source.addData(ev(99, t0 + 10L * gap, 99))
    q.processAllAvailable()
    source.addData(ev(98, t0 + 20L * gap, 98))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("sess_test").as[SessionOut].collect().toSeq
    val u1 = out.filter(_.user_id == 1).sortBy(_.start_us)
    assert(u1.map(_.n_events) == Seq(2, 1))
    assert(u1.head.start_us == t0 && u1.head.end_us == t0 + 600L * 1000000L)
    val u2 = out.filter(_.user_id == 2)
    assert(u2.map(_.n_events) == Seq(1L))
    assert(u2.head.start_us == t0 + 700L * 1000000L)
  }

  test("streaming hourly rollup equals the batch rollup at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val streamed = StreamingQueries.stHourly(spark, dir).collect().toSeq
    val batch = StreamingQueries.batchHourly(spark, dir).collect().toSeq
    assert(streamed == batch)
  }
}
