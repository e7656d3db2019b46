package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class P(dblp_title: String, dblp_authors: String, dblp_venue: String,
    dblp_num_authors: Int, acm_title: String, acm_authors: String,
    acm_venue: String, acm_num_authors: Int, tag: String)

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def jac(a: String, b: String): Double =
    Seq((a, b)).toDF("a", "b")
      .select(Similarity.jaccardTokens(col("a"), col("b")).as("j"))
      .collect()(0).getDouble(0)

  test("jaccard: exact values with set semantics (duplicate tokens deduped)") {
    assert(jac("a b c", "a b c") == 1.0)
    assert(jac("a b", "c d") == 0.0)
    assert(jac("a b c d", "c d e f") == 2.0 / 6.0)
    // duplicates collapse: {a,b} vs {a} -> 1/2
    assert(jac("a a b", "a a a") == 0.5)
    // multi-whitespace tokenization
    assert(jac("a  b\tc", "a b c") == 1.0)
  }

  test("jaccard properties: [0,1] and symmetric (seeded sampling)") {
    val rnd = new scala.util.Random(42)
    val vocab = Array("join", "scan", "sort", "hash", "tree", "index", "query")
    val sentences = Seq.fill(30)(Array.fill(6)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    val pairs = sentences.zip(sentences.reverse)
    // batch both orientations in two Spark jobs instead of 60 collect()s
    import spark.implicits._
    val df = pairs.toDF("a", "b")
    val fwd = df.select(Similarity.jaccardTokens(col("a"), col("b"))).as[Double].collect()
    val bwd = df.select(Similarity.jaccardTokens(col("b"), col("a"))).as[Double].collect()
    fwd.zip(bwd).foreach { case (f, b) =>
      assert(f >= 0.0 && f <= 1.0)
      assert(f == b)
    }
  }

  /** Truth table for the match predicate (`similarity.py:50-67`):
    * boundary scores 0/9/10, author-count compatibility, venue gating.
    */
  test("match predicate truth table") {
    // columns: titles identical (jaccard 1.0) so only the author/venue
    // conditions decide; vary authors to hit levenshtein boundaries.
    val t = "one two three"
    val rows = Seq(
      // scores == 0, same nonzero author count -> cond1 match
      P(t, "alice", "sigmod rec", 1, t, "alice", "sigmod", 1, "cond1"),
      // scores == 0, both zero authors -> cond2 match
      P(t, "", "vldb j", 0, t, "", "vldb", 0, "cond2"),
      // 0 < scores < 10 (distance 1), same count -> cond3 match
      P(t, "alicia", "sigmod", 1, t, "alicea", "sigmod", 1, "cond3"),
      // distance >= 10 -> dropped by score filter
      P(t, "aaaaaaaaaaaa", "sigmod", 1, t, "zzzzzzzzzzzz", "sigmod", 1, "far"),
      // scores == 0 but different counts (1 vs 2) -> no cond holds
      P(t, "alice", "sigmod", 1, t, "alice", "sigmod", 2, "count-mismatch"),
      // venues differ (sigmod vs vldb) -> dropped by venue gate
      P(t, "alice", "sigmod", 1, t, "alice", "vldb", 1, "venue-mismatch"),
      // distance 1 but different counts -> cond3 needs same count
      P(t, "bob", "vldb", 1, t, "rob", "vldb", 2, "cond3-count"))
    val got = Similarity
      .computeSimAndMatch(rows.toDF())
      .select("tag").as[String].collect().toSet
    assert(got == Set("cond1", "cond2", "cond3"))
  }

  test("jaccard threshold gate at 0.6") {
    val rows = Seq(
      // jaccard 3/5 = 0.6 -> kept (>= 0.6)
      P("a b c d", "x", "sigmod", 1, "a b c e", "x", "sigmod", 1, "at-0.6"),
      // jaccard 2/6 -> dropped
      P("a b c d", "x", "sigmod", 1, "c d e f", "x", "sigmod", 1, "below"))
    val got = Similarity.computeSimAndMatch(rows.toDF()).select("tag").as[String].collect().toSet
    assert(got == Set("at-0.6"))
  }

  test("bounded levenshtein keeps identical scores for kept rows") {
    val df = Seq(("kitten", "sitting"), ("abc", "abd"), ("same", "same")).toDF("a", "b")
    val bounded = df.select(levenshtein(col("a"), col("b"), 9).as("s")).as[Int].collect().toSeq
    val exact = df.select(levenshtein(col("a"), col("b")).as("s")).as[Int].collect().toSeq
    assert(bounded == exact)
  }
}
