package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q28_sketch is oracle-gated via exact anchors + boolean ε-verdicts
  * (approximate VALUES differ across engines; their error bounds don't).
  * This spec independently re-derives the exact answers and asserts the
  * emitted anchors agree and every verdict is TRUE — a second,
  * Spark-internal check of the bounds machinery, so a sketch regression
  * is caught here even before the DuckDB gate runs.
  */
class SketchBoundsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("q28 verdicts are all true and its exact anchors match an independent aggregate") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val exact = li
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        countDistinct("l_partkey").as("nd_parts"),
        countDistinct("l_suppkey").as("nd_supps"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val rows = graft.SparkEntry.queries("q28_sketch")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flag = r.getString(0)
      val (n, ndParts, ndSupps) = exact(flag)
      assert(r.getLong(1) == n, s"$flag: n_rows anchor")
      assert(r.getLong(2) == ndParts, s"$flag: exact_parts anchor")
      assert(r.getLong(3) == ndSupps, s"$flag: exact_supps anchor")
      assert(r.getBoolean(4), s"$flag: HLL++ NDV outside 5% of $ndParts")
      assert(r.getBoolean(5), s"$flag: DataSketches NDV outside 5% of $ndSupps")
      assert(r.getBoolean(6), s"$flag: approx p50 outside the exact p40..p60 range")
    }
  }
}
