package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational operator coverage over the TPC-H-ish harness tables — one
  * query per SURVEY.md §2 operator class, each with a DuckDB oracle.
  *
  * Cross-engine float discipline: money sums aggregate through
  * DECIMAL(18,2) (exact, order-independent) and convert to double once at
  * the end; both engines then produce bitwise-identical values.
  */
object RelationalQueries {
  import Tables.t

  /** A1/A3: multi-key aggregate with sum/count. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag", "l_linestatus")

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
      sum(CAST(l_extendedprice AS DECIMAL(18,2)))::DOUBLE AS sum_price,
      count(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> q1Agg _)

  val oracles: Map[String, String] = Map(
    "q1_agg" -> q1AggSql)
}
