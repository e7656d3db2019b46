package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q28_sketch has no DuckDB oracle (approximation algorithms differ across
  * engines), so its accuracy contract is pinned here instead: every
  * approximate aggregate must land within its documented error bound of
  * the exact answer computed on the same data.
  */
class SketchBoundsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("approx NDV estimates land within 5% of exact; approx p50 within the value range") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val exact = li
      .groupBy("l_returnflag")
      .agg(
        countDistinct("l_partkey").as("nd_parts"),
        countDistinct("l_suppkey").as("nd_supps"),
        min("l_extendedprice").as("lo"),
        max("l_extendedprice").as("hi"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    graft.SparkEntry
      .queries("q28_sketch")(spark, dir)
      .collect()
      .foreach { r =>
        val flag = r.getString(0)
        val (ndParts, ndSupps, lo, hi) = exact(flag)
        val approxParts = r.getAs[Number](1).doubleValue
        val hllSupps = r.getAs[Number](2).doubleValue
        val p50 = r.getAs[Number](3).doubleValue
        assert(
          math.abs(approxParts - ndParts).toDouble / ndParts < 0.05,
          s"$flag: HLL++ NDV $approxParts vs exact $ndParts")
        assert(
          math.abs(hllSupps - ndSupps) / ndSupps < 0.05,
          s"$flag: DataSketches NDV $hllSupps vs exact $ndSupps")
        assert(p50 >= lo && p50 <= hi, s"$flag: p50 $p50 outside [$lo, $hi]")
      }
  }
}
