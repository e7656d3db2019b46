package graft.queries

import graft.SparkSpec

/** Sorted-neighborhood blocking invariants: every emitted pair passes the
  * shared match predicate (subset of the exhaustive match), sits within W
  * positions of the (lang, n_chars, doc_id) sort, and shares a language.
  */
class SortedBlockSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("pairs ⊆ exhaustive matches, within-window, same-lang") {
    val sorted = ErQueries.sortedBlock(spark, dir).as[(Long, Long, Int, Double)].collect()
    assert(sorted.nonEmpty)
    val full = ErQueries
      .matchFull(spark, dir)
      .as[(Long, Long, Int, Double)]
      .collect()
      .map(r => (math.min(r._1, r._2), math.max(r._1, r._2)) -> (r._3, r._4))
      .toMap
    val meta = spark.read
      .parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "lang", "n_chars")
      .as[(Long, String, Long)]
      .collect()
    val rank = meta
      .sortBy(d => (d._2, d._3, d._1))
      .zipWithIndex
      .map { case (d, i) => d._1 -> (i + 1, d._2) }
      .toMap
    sorted.foreach { case (a, b, lev, jac) =>
      val key = (math.min(a, b), math.max(a, b))
      assert(full.contains(key), s"($a,$b) not in exhaustive match set")
      assert(full(key) == ((lev, jac)), s"($a,$b) scores differ from exhaustive")
      val (ra, la) = rank(a)
      val (rb, lb) = rank(b)
      assert(la == lb, s"($a,$b) crosses languages")
      assert(rb > ra && rb - ra <= 5, s"($a,$b) outside the sort window: $ra,$rb")
    }
  }
}
