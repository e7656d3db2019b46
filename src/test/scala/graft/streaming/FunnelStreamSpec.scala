package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class FunnelStreamSpec extends SparkSpec {

  private def ev(user: Long, tpe: String, us: Long) =
    FunnelEvent(user, tpe, us, new java.sql.Timestamp(us / 1000L))

  test("state machine: ordered transitions, monotone across batches, window flag exact") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[FunnelEvent]
    val q = Funnel
      .track(source.toDS())
      .writeStream
      .format("memory")
      .queryName("funnel_test")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()

    val t0 = 1700000000000000L
    val h = 3600L * 1000000L
    // batch 1, deliberately shuffled arrival INSIDE the batch: the per-
    // batch (event-time, type-rank) sort pins first-touch order. user 1
    // reaches depth 2; a purchase BEFORE the click must not fire depth 3.
    source.addData(
      ev(1, "click", t0 + 2 * h),
      ev(1, "view", t0),
      ev(1, "purchase", t0 + 1 * h),
      ev(2, "purchase", t0)) // no view yet: ignored
    q.processAllAvailable()
    // batch 2: user 1 completes inside the 48 h window; a second view
    // (later than t1, but a view nonetheless) must NOT move t1 (monotone
    // state). user 2 starts its funnel. All event times sit at/after the
    // 1 h watermark so nothing here is dropped as late.
    source.addData(
      ev(1, "purchase", t0 + 3 * h),
      ev(1, "view", t0 + 2 * h),
      ev(2, "view", t0 + 3 * h))
    q.processAllAvailable()
    // batch 3: user 2 clicks then purchases OUTSIDE 48 h of its t1.
    source.addData(ev(2, "click", t0 + 4 * h), ev(2, "purchase", t0 + 60 * h))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("funnel_test").as[FunnelOut].collect().toSeq
    val u1 = out.filter(_.user_id == 1).sortBy(_.depth)
    assert(u1.map(o => (o.depth, o.at_us, o.completed)) ==
      Seq((1L, t0, false), (2L, t0 + 2 * h, false), (3L, t0 + 3 * h, true)))
    val u2 = out.filter(_.user_id == 2).sortBy(_.depth)
    assert(u2.map(o => (o.depth, o.at_us, o.completed)) ==
      Seq((1L, t0 + 3 * h, false), (2L, t0 + 4 * h, false), (3L, t0 + 60 * h, false)))
  }

  test("bounded st_funnel replay equals the batch q78 steps at sf0.001") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val streamed = StreamingQueries
      .stFunnel(spark, dir)
      .as[(Long, Long, Long, Boolean)]
      .collect()
      .toSeq
      .sorted
    val batch = graft.queries.RelationalQueries
      .q78Funnel(spark, dir)
      .as[(Long, Option[Long], Option[Long], Option[Long], Long, Boolean)]
      .collect()
      .flatMap { case (u, t1, t2, t3, _, completed) =>
        t1.map(v => (u, 1L, v, false)).toSeq ++
          t2.map(v => (u, 2L, v, false)) ++
          t3.map(v => (u, 3L, v, completed))
      }
      .toSeq
      .sorted
    assert(streamed == batch)
    assert(streamed.exists(_._2 == 3))
  }
}
