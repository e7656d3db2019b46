package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Escape a string literal for embedding in DuckDB SQL. */
  def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"
}
