package graft.queries

import graft.SparkSpec

class StratifiedSpec extends SparkSpec {
  import spark.implicits._

  test("stratified split: exact ceil(10%) holdouts per stratum, deterministic") {
    val rows = DedupQueries.dsStratified(spark, "/root/testdata/sf0.001")
      .as[(Long, String, Long, Long, String)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      val n = rs.length.toLong
      assert(rs.forall(_._4 == n), s"$lang n_stratum")
      assert(rs.map(_._3).sorted.toSeq == (1L to n), s"$lang ranks are a permutation")
      val hold = math.ceil(n * 10.0 / 100.0).toLong
      val bySplit = rs.groupBy(_._5).view.mapValues(_.size.toLong).toMap
      assert(bySplit.getOrElse("val", 0L) == hold, s"$lang val size")
      assert(bySplit.getOrElse("test", 0L) == hold, s"$lang test size")
      assert(bySplit.getOrElse("train", 0L) == n - 2 * hold, s"$lang train size")
    }
    // determinism: same call, same assignment
    val again = DedupQueries.dsStratified(spark, "/root/testdata/sf0.001")
      .as[(Long, String, Long, Long, String)].collect()
    assert(rows.toSeq == again.toSeq)
  }
}
