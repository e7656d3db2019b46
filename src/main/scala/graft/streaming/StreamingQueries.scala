package graft.streaming

import graft.queries.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.LongType

/** Structured Streaming twins of the batch event queries.
  *
  * [[stHourly]] is a REAL streaming query — file source -> event-time
  * window aggregation with a watermark -> memory sink — driven to
  * completion with Trigger.AvailableNow, so it is deterministic and
  * oracle-checkable: the final complete-mode result must equal the batch
  * hourly rollup (q13's oracle modulo column naming). On a cluster the same
  * plan runs unbounded: the watermark bounds state, the window aggregate
  * shuffles by (window, event_type), and the sink would be Kafka/Delta
  * instead of memory.
  */
object StreamingQueries {

  /** Hourly (window-start, event_type) counts + value sums over a parquet
    * file STREAM of events, watermarked 1 hour on event time.
    */
  def stHourly(spark: SparkSession, dir: String): DataFrame = {
    // The events file stores TIMESTAMP(NANOS); same long->micros read path
    // as the batch Tables.events.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
    // Glob, not the bare file: the file-stream source requires its base
    // path (the glob's parent) to be a directory.
    val raw = spark.readStream.schema(rawSchema).parquet(s"$dir/events*.parquet")
    val evs =
      if (rawSchema("ts").dataType == LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw
    val agg = evs
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))

    // One query name per run; AvailableNow processes the full backlog then
    // stops, leaving the complete-mode result in the in-memory table.
    spark.streams.active.filter(_.name == "st_hourly").foreach(_.stop())
    val q = agg.writeStream
      .format("memory")
      .queryName("st_hourly")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    spark
      .table("st_hourly")
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH").as("hour"),
        col("event_type"),
        col("n"),
        col("total_value"))
      .orderBy("hour", "event_type")
  }

  /** Oracle: the batch hourly rollup — the streaming run must converge to
    * exactly this.
    */
  val stHourlySql: String =
    """SELECT strftime(ts, '%Y-%m-%d %H') AS hour, event_type, count(*) AS n,
      sum(CAST(value AS DECIMAL(18,2)))::DOUBLE AS total_value
      FROM events GROUP BY hour, event_type ORDER BY hour, event_type"""

  /** Batch reference for tests (same frame the memory sink must produce). */
  def batchHourly(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH").as("hour"),
        col("event_type"),
        col("n"),
        col("total_value"))
      .orderBy("hour", "event_type")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st_hourly" -> stHourly _)

  val oracles: Map[String, String] = Map(
    "st_hourly" -> stHourlySql)
}
