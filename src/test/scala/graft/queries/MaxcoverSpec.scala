package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Brute replay of ds_maxcover (the Round11/14 pattern), added with the
  * r15 incremental-uncovered rewrite: the greedy picks, per-round gains,
  * and running cover are re-derived driver-side with independent Set
  * arithmetic, so the shrinking-frame plan cannot drift from the
  * rebuild-covered-per-round semantics it replaced.
  */
class MaxcoverSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("ds_maxcover replays: greedy picks, gains, running cover") {
    val pairs = Tables
      .t(spark, dir, "documents")
      .select(
        col("doc_id"),
        explode(graft.functions.TextAnalysis.tokens(col("text"))).as("tok"))
      .distinct()
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byDoc: Map[Long, Set[String]] =
      pairs.groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).toSet }
    var covered = Set.empty[String]
    var picked = Vector.empty[(Long, Long)]
    for (_ <- 1 to 5) { // McK, pinned by the unrolled oracle too
      val cand = byDoc.keySet -- picked.map(_._1)
      val w = cand.toSeq
        .map(d => (d, (byDoc(d) -- covered).size.toLong))
        .sortBy { case (d, g) => (-g, d) }
        .head
      covered ++= byDoc(w._1)
      picked = picked :+ w
    }
    val expected = picked.zipWithIndex.map { case ((d, g), i) =>
      (i + 1L, d, g, picked.take(i + 1).map(_._2).sum)
    }
    val got = DedupQueries
      .dsMaxcover(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    graft.Caches.releaseAll()
  }
}
