package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Normalize the events `ts` column to TIMESTAMP regardless of how the
    * generator wrote it. Two physical encodings have shipped: TIMESTAMP
    * (NANOS) — Spark rejects it by default, so read nanos as long then
    * floor-divide to micros (the same truncation DuckDB's `epoch_us`
    * applies) — and TIMESTAMP_NTZ (micros, no zone). The session time zone
    * is pinned to UTC, so casting NTZ→TIMESTAMP reads the naive value as
    * the same instant DuckDB sees; event-time streaming (`withWatermark`)
    * and `unix_micros` both require plain TIMESTAMP, never NTZ.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(t(spark, dir, "events"))
  }

  private[graft] def normalizeTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }

  /** Escape a string literal for embedding in DuckDB SQL. */
  def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Drop a managed table AND its warehouse location. The in-memory catalog
    * is fresh per JVM but the warehouse directory is not — without the
    * location delete, a second run fails with LOCATION_ALREADY_EXISTS.
    */
  def dropTable(spark: SparkSession, name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val p = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      name.toLowerCase)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }
}
