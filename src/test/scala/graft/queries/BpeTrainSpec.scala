package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Locks ta_bpetrain's two load-bearing pieces:
  *
  *  1. the greedy merge fold (the semantics the DuckDB oracle's
  *     island-parity windows must equal), on the adversarial chain cases
  *     where naive implementations diverge;
  *  2. the end-to-end invariant that concatenating each word's final
  *     tokens reconstructs the word — merges re-segment, never rewrite.
  */
class BpeTrainSpec extends SparkSpec {

  private def fold(tokens: Seq[String], l: String, r: String): Seq[String] = {
    import spark.implicits._
    Seq(tokens)
      .toDF("tk")
      .select(TextQueries.bpeMergeFold(col("tk"), l, r).as("m"))
      .collect()(0)
      .getSeq[String](0)
  }

  test("greedy fold: non-overlapping leftmost, including l == r chains") {
    // The classic BPE cases: runs of the same token merge every OTHER pair.
    assert(fold(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(fold(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    assert(fold(Seq("a", "a", "a", "a", "a"), "a", "a") == Seq("aa", "aa", "a"))
    // Adjacent repeats of a distinct pair all merge (no overlap exists).
    assert(fold(Seq("a", "b", "a", "b"), "a", "b") == Seq("ab", "ab"))
    // A merged token must not cascade into a second merge within the round.
    assert(fold(Seq("a", "b", "b"), "a", "b") == Seq("ab", "b"))
    // Pair absent: identity.
    assert(fold(Seq("x", "y", "z"), "a", "b") == Seq("x", "y", "z"))
    // Boundary alignment: the pair must sit on token boundaries.
    assert(fold(Seq("ab", "c"), "b", "c") == Seq("ab", "c"))
  }

  test("merges re-segment words: final tokens concatenate back to each word") {
    val dir = "/root/testdata/sf0.001"
    // Replay the same rounds the query runs, keeping the token frame.
    val words = TextQueries
      .docs(spark, dir)
      .select(explode(graft.functions.TextAnalysis.tokens(col("text"))).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .distinct()
    val merges = TextQueries.taBpetrain(spark, dir).collect()
    assert(merges.length > 0, "the corpus must yield at least one merge")
    var tk = words.select(
      col("word"),
      expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))").as("tk"))
    for (m <- merges)
      tk = tk.select(
        col("word"),
        TextQueries.bpeMergeFold(col("tk"), m.getString(1), m.getString(2)).as("tk"))
    val broken = tk
      .filter(concat_ws("", col("tk")) =!= col("word"))
      .count()
    assert(broken == 0L, "every word must reconstruct from its merged tokens")
    // And at least one word must actually have been re-segmented.
    val resegmented = tk.filter(size(col("tk")) < length(col("word"))).count()
    assert(resegmented > 0L, "vacuous training: no word was ever merged")
    graft.Caches.releaseAll()
  }
}
