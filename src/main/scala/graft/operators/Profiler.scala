package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass dataset profiler (the Deequ/Glue-crawler-style audit a
  * pipeline runs before trusting a new drop): for every column — row
  * count, null count, exact distinct count, and type-aware rendered
  * min/max. Works on ANY DataFrame; dispatch is on the schema, so the
  * caller declares nothing.
  *
  * Shape: ONE aggregate over the table computes every column's stats
  * (Catalyst plans the multiple single-column DISTINCT aggregates via one
  * Expand — each input row fans out once per distinct column, the
  * standard exact plan). At 100 TB you would swap `countDistinct` for
  * `approx_count_distinct` and keep everything else — the q20_ndv query
  * covers that sketch path; this operator is the exact-audit variant.
  * The long-format pivot is an `explode` of one already-aggregated row —
  * no second pass over the data.
  *
  * Rendering: doubles go through DECIMAL(18,2) (money-style data —
  * identical correctly-rounded text on every engine), timestamps through
  * a fixed `yyyy-MM-dd HH:mm:ss` format; everything else is the plain
  * string cast. Strings compare bytewise on both engines for ASCII data.
  */
object Profiler {

  def profile(df: DataFrame): DataFrame = {
    val fields = df.schema.fields
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      Seq(
        count(c).as(s"__nn_${f.name}"),
        countDistinct(c).as(s"__nd_${f.name}"),
        rendered(f.dataType, min(c)).as(s"__mn_${f.name}"),
        rendered(f.dataType, max(c)).as(s"__mx_${f.name}"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs.toIndexedSeq: _*)
    val entries = fields.map { f =>
      struct(
        lit(f.name).as("column_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_${f.name}")).as("n_null"),
        col(s"__nd_${f.name}").as("n_distinct"),
        col(s"__mn_${f.name}").as("min_s"),
        col(s"__mx_${f.name}").as("max_s"))
    }
    one
      .select(explode(array(entries.toIndexedSeq: _*)).as("p"))
      .select("p.*")
      .orderBy("column_name")
  }

  private def rendered(dt: DataType, c: Column): Column = dt match {
    case DoubleType | FloatType => c.cast("decimal(18,2)").cast("string")
    case TimestampType => date_format(c, "yyyy-MM-dd HH:mm:ss")
    case _ => c.cast("string")
  }
}
