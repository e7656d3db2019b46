package graft.streaming

import graft.SparkSpec
import graft.queries.Tables
import org.apache.spark.sql.functions._

class TopkSpec extends SparkSpec {
  import spark.implicits._

  test("streaming top-k equals the batch leaderboard at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val got = StreamingQueries.stTopk(spark, dir)
      .as[(String, Long, Double, Long, Long)].collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type")
      .orderBy(col("total").desc, col("user_id"))
    val want = Tables.events(spark, dir)
      .groupBy("event_type", "user_id")
      .agg(
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total"),
        count(lit(1)).as("n_events"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .orderBy("event_type", "rnk")
      .as[(String, Long, Double, Long, Long)].collect().toSeq
    assert(got == want)
    assert(got.nonEmpty)
    // exactly 3 (or fewer) per event type, ranks 1..k contiguous
    got.groupBy(_._1).foreach { case (et, rows) =>
      assert(rows.map(_._5) == (1L to rows.size.toLong), et)
    }
  }
}
