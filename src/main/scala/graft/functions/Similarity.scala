package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Similarity scoring + the entity-match predicate.
  *
  * Port of `/root/reference/src/similarity.py:38-74` as pure Column
  * expressions. The Levenshtein score uses Spark's bounded variant
  * (`levenshtein(l, r, threshold)`) so the O(n*m) DP short-circuits once the
  * running distance exceeds the filter bound — the reference filters
  * `0 <= score < 10`, so computing distances above 9 is wasted work. Rows the
  * bounded call returns as -1 are exactly the rows the unbounded filter
  * would drop; kept rows carry identical distances.
  */
object Similarity {

  /** Token-set Jaccard over whitespace-split strings
    * (`similarity.py:38-44`): `|A ∩ B| / |A ∪ B|` with set semantics
    * (array_intersect/array_union dedupe).
    */
  def jaccardTokens(t1: Column, t2: Column): Column = {
    val tok1 = split(t1, "\\s+")
    val tok2 = split(t2, "\\s+")
    size(array_intersect(tok1, tok2)).cast("double") / size(array_union(tok1, tok2))
  }

  /** Match conditions over a renamed pair frame with columns
    * `{l}_venue,{l}_authors,{l}_num_authors,{l}_title` (and same for `r`).
    * Mirrors `compute_sim_and_match` (`similarity.py:47-74`):
    *
    *  1. keep same-venue pairs (both contain "sigmod" or both "vldb");
    *  2. score = levenshtein(authors, authors), keep 0 <= score < 10;
    *  3. keep cond1|cond2|cond3 (author-count compatibility);
    *  4. title Jaccard >= 0.6.
    */
  def computeSimAndMatch(
      df: org.apache.spark.sql.DataFrame,
      l: String = "dblp",
      r: String = "acm",
      venues: Seq[String] = Seq("sigmod", "vldb"),
      levMax: Int = 10,
      jaccardMin: Double = 0.6): org.apache.spark.sql.DataFrame = {

    val nonZeroAuthors = (col(s"${l}_num_authors") > 0) && (col(s"${r}_num_authors") > 0)
    val zeroAuthors = (col(s"${l}_num_authors") === 0) && (col(s"${r}_num_authors") === 0)
    val sameVenue = venues
      .map(v => col(s"${l}_venue").contains(v) && col(s"${r}_venue").contains(v))
      .reduce(_ || _)
    val sameNumAuthors = col(s"${l}_num_authors") === col(s"${r}_num_authors")

    val cond1 = (col("scores") === 0) && sameNumAuthors && nonZeroAuthors
    val cond2 = (col("scores") === 0) && zeroAuthors
    val cond3 = (col("scores") > 0) && (col("scores") < levMax) && sameNumAuthors

    // If the caller pre-tokenized titles (once per ROW, before the pair
    // join — see EntityResolution.matchPairs), Jaccard is an
    // intersect/union over ready arrays; identical sizes, hence identical
    // scores, to splitting inside each pair.
    val jaccard =
      if (df.columns.contains(s"${l}_title_toks"))
        size(array_intersect(col(s"${l}_title_toks"), col(s"${r}_title_toks"))).cast("double") /
          size(array_union(col(s"${l}_title_toks"), col(s"${r}_title_toks")))
      else jaccardTokens(col(s"${l}_title"), col(s"${r}_title"))

    df.filter(sameVenue)
      .withColumn("scores", levenshtein(col(s"${l}_authors"), col(s"${r}_authors"), levMax - 1))
      .filter((col("scores") >= 0) && (col("scores") < levMax))
      .filter(cond1 || cond2 || cond3)
      .withColumn("title_jaccard_sim", jaccard)
      .filter(col("title_jaccard_sim") >= jaccardMin)
  }
}
