package graft.streaming

import graft.SparkSpec

/** Regression lock for the round-2 advice: the bounded streaming runs set
  * `spark.sql.legacy.parquet.nanosAsLong` and a small shuffle width for
  * their own duration and must restore BOTH afterwards — a leaked legacy
  * flag silently changes the type of later batch reads of
  * nanos-timestamp parquet.
  */
class StreamConfRestoreSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("stHourly restores nanosAsLong and shuffle partitions") {
    val prevNanos = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    val out = StreamingQueries.stHourly(spark, dir)
    assert(out.count() > 0)
    assert(
      spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == prevNanos,
      "nanosAsLong leaked past the bounded streaming run")
    assert(
      spark.conf.get("spark.sql.shuffle.partitions") == prevShuffle,
      "shuffle width leaked past the bounded streaming run")
  }
}
