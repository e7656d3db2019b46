package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

object Tables {

  /** Inferred-schema memo for the fixed harness tables, keyed by path plus
    * the one conf that changes inference (nanosAsLong → events.ts LongType).
    *
    * Why (r15, guide §1.2/§6): every `spark.read.parquet` call runs a
    * schema-inference footer job — measured 85 ms against 9.5 ms with an
    * explicit schema (FloorProbe) — and the bench surface performs ~600
    * such reads per run, all against immutable harness tables. The memo
    * holds only [[StructType]]s (no session or data references, so nothing
    * leaks across the test suite's many sessions), is computed from the
    * parquet footer on first access in each JVM, and never caches data or
    * results. Harness tables are never rewritten within a JVM; staged
    * per-run temp outputs do not come through here.
    */
  private val schemaMemo =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  private def nanosConf(spark: SparkSession): String =
    spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").getOrElse("false")

  /** The memoized schema of `$dir/$name.parquet` (inferred once per JVM per
    * nanosAsLong setting). */
  def schemaOf(spark: SparkSession, dir: String, name: String): org.apache.spark.sql.types.StructType = {
    val path = s"$dir/$name.parquet"
    schemaMemo.computeIfAbsent(
      s"${nanosConf(spark)}|$path",
      _ => spark.read.parquet(path).schema)
  }

  /** Analyzed-DataFrame memo on top of [[schemaMemo]]: the relation +
    * file-index construction behind a fresh `read.parquet` costs another
    * ~33 ms per call (FloorProbe: 105 ms fresh-with-schema vs 72 ms reused)
    * and DataFrames are immutable, so handing every caller the same
    * analyzed frame is pure plan reuse — no data, no results, nothing
    * cached across runs. Entries are guarded by a weak session reference:
    * a frame is only served to the session that built it (the test suite
    * creates many sessions; a frame from a stopped session must never
    * leak into a new one), and a mismatch simply rebuilds and overwrites,
    * so at most #tables stale entries exist transiently.
    */
  private val dfMemo =
    new java.util.concurrent.ConcurrentHashMap[
      String, (java.lang.ref.WeakReference[SparkSession], DataFrame)]()

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val key = s"${nanosConf(spark)}|$dir/$name.parquet"
    dfMemo.get(key) match {
      case (ref, df) if ref.get() eq spark => df
      case _ =>
        val df = spark.read.schema(schemaOf(spark, dir, name)).parquet(s"$dir/$name.parquet")
        dfMemo.put(key, (new java.lang.ref.WeakReference(spark), df))
        df
    }
  }

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
