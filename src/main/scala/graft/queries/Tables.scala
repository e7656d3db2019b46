package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table stores TIMESTAMP(NANOS), which Spark rejects by
    * default (PARQUET_TYPE_ILLEGAL). Read nanos as long, then floor-divide
    * to microseconds — the same truncation DuckDB's `epoch_us` applies, so
    * both engines see identical instants.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(spark, dir, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
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
