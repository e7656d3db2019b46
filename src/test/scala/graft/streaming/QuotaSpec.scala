package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class QuotaSpec extends SparkSpec {

  private def ev(tenant: String, hour: String, us: Long, id: Long) =
    QuotaEvent(tenant, hour, us, new java.sql.Timestamp(us / 1000L), id)

  test("quota admits first N per key, counts persist across batches, ranks are stable") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[QuotaEvent]
    val q = Quota
      .admit(source.toDS(), 2L)
      .writeStream
      .format("memory")
      .queryName("quota_test")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()

    val t0 = 1700000000000000L
    // batch 1: tenant a gets 3 events (one over quota) — the batch is
    // sorted by (ts, id), so events 1,2 win; tenant b gets 1.
    source.addData(
      ev("a", "h1", t0 + 3L, 3),
      ev("a", "h1", t0 + 1L, 1),
      ev("a", "h1", t0 + 2L, 2),
      ev("b", "h1", t0 + 1L, 4))
    q.processAllAvailable()
    // batch 2: tenant a's counter is already exhausted — nothing admitted
    // even though these events are EARLIER in event time (arrival-order
    // semantics); tenant b takes its second slot.
    source.addData(ev("a", "h1", t0, 5), ev("b", "h1", t0 + 9L, 6))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("quota_test").as[QuotaOut].collect().toSeq
    val a = out.filter(_.tenant == "a").sortBy(_.quota_rank)
    assert(a.map(o => (o.event_id, o.quota_rank)) == Seq((1L, 1L), (2L, 2L)))
    val b = out.filter(_.tenant == "b").sortBy(_.quota_rank)
    assert(b.map(o => (o.event_id, o.quota_rank)) == Seq((4L, 1L), (6L, 2L)))
  }

  test("bounded st_quota replay equals the batch row_number filter at sf0.001") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val streamed = StreamingQueries.stQuota(spark, dir).collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("tenant", "hour")
      .orderBy("ts", "event_id")
    val batch = graft.queries.Tables
      .events(spark, dir)
      .select(
        col("event_type").as("tenant"),
        date_format(col("ts"), "yyyy-MM-dd HH").as("hour"),
        col("ts"),
        col("event_id"))
      .withColumn("quota_rank", row_number().over(w).cast("long"))
      .filter(col("quota_rank") <= Quota.DefaultN)
      .select(
        col("tenant"),
        col("hour"),
        col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("quota_rank"))
      .orderBy("tenant", "hour", "quota_rank")
      .collect()
      .toSeq
    assert(streamed == batch)
  }
}
