package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  /** Run ta_winnow's selection over an in-memory documents frame. */
  private def winnow(rows: Seq[(Long, String)]): Map[Long, Set[(Long, Long)]] = {
    val dir = java.nio.file.Files.createTempDirectory("winnow").toString
    rows
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write
      .mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    TextQueries
      .taWinnow(spark, dir)
      .as[(Long, Long, Long)]
      .collect()
      .groupBy(_._1)
      .map { case (id, fps) => id -> fps.map(t => (t._2, t._3)).toSet }
  }

  test("winnowing guarantee: token runs >= W+K-1 long share a fingerprint hash") {
    // K=4, W=4: any common token run of length >= 7 must yield at least one
    // common selected HASH between the two documents (positions differ).
    val shared = "alpha beta gamma delta epsilon zeta eta" // 7 tokens
    val a = s"one two three $shared four five six"
    val b = s"nine $shared eight seven" // same run embedded elsewhere
    val fps = winnow(Seq((1L, a), (2L, b)))
    val hashesA = fps(1L).map(_._2)
    val hashesB = fps(2L).map(_._2)
    assert((hashesA & hashesB).nonEmpty, s"$hashesA vs $hashesB")
  }

  test("density and bounds: every doc selects >=1 fingerprint, positions valid") {
    val docs = Seq(
      (1L, "a"), // single token -> whole-list shingle fallback
      (2L, "a b c"), // fewer tokens than K
      (3L, "w x y z"), // exactly K tokens -> one window hash
      (4L, (1 to 40).map(i => s"tok$i").mkString(" ")))
    val fps = winnow(docs)
    docs.foreach { case (id, text) =>
      val n = text.split("\\s+").length
      val nWindows = math.max(n - 4 + 1, 1)
      val got = fps(id)
      assert(got.nonEmpty)
      assert(got.forall { case (pos, _) => pos >= 1 && pos <= nWindows })
      // winnowing density is ~2/(W+1); selection can never exceed window count
      assert(got.size <= nWindows)
    }
    // identical docs produce identical fingerprint sets
    val dup = winnow(Seq((1L, "p q r s t u v w"), (2L, "p q r s t u v w")))
    assert(dup(1L) == dup(2L))
  }
}
