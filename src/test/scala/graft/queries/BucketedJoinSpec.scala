package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketedJoinSpec extends SparkSpec {

  test("co-bucketed tables join without an exchange") {
    import spark.implicits._
    Tables.dropTable(spark, "bspec_left")
    Tables.dropTable(spark, "bspec_right")
    (1L to 500L).map(i => (i % 50, i)).toDF("k", "v")
      .write.bucketBy(4, "k").sortBy("k").saveAsTable("bspec_left")
    (0L until 50L).map(i => (i, s"dim$i")).toDF("k", "name")
      .write.bucketBy(4, "k").sortBy("k").saveAsTable("bspec_right")

    // Force the shuffle-based join path so the assertion is about
    // bucketing, not about broadcast kicking in.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("bspec_left").join(spark.table("bspec_right"), Seq("k"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(j.count() == 500L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
