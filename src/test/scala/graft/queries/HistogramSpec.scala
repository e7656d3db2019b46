package graft.queries

import graft.SparkSpec

/** Equi-depth invariants for q79_histogram: bucket sizes within one row of
  * each other and summing to N, bucket bounds forming a non-decreasing
  * chain, and the per-bucket sums reconciling with the exact total.
  */
class HistogramSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("16 buckets: depths within 1, bounds ordered, totals reconcile") {
    val rows = RelationalQueries
      .q79Histogram(spark, dir)
      .as[(Long, Long, Double, Double, Double)]
      .collect()
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0L until 16L))
    val n = spark.read.parquet(s"$dir/lineitem.parquet").count()
    assert(rows.map(_._2).sum == n)
    val sizes = rows.map(_._2)
    assert(sizes.max - sizes.min <= 1, s"depth spread ${sizes.toSeq}")
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._4 <= b._3, s"bucket ${a._1} hi > bucket ${b._1} lo")
      case _           => ()
    }
    rows.foreach { case (bk, _, lo, hi, total) =>
      assert(lo <= hi && total > 0, s"bucket $bk bounds/total")
    }
    val exact = spark.read
      .parquet(s"$dir/lineitem.parquet")
      .selectExpr("CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)")
      .as[Double]
      .head()
    assert(math.abs(rows.map(_._5).sum - exact) < 1e-6 * exact, "totals reconcile")
  }
}
