package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: token statistics,
  * quality scoring, language identification, and document fingerprinting.
  *
  * Everything is a pure Column expression (whole-stage codegen, no UDFs),
  * and every hash is md5-derived (see [[Hashing]]) so the DuckDB oracle can
  * reproduce results bit-for-bit. Double-valued scores are built with the
  * same operation order on both engines, which makes them IEEE-identical —
  * no rounding fudge needed in the correctness compare.
  */
object TextAnalysis {

  /** Whitespace tokens, empties dropped (leading/trailing space safe). */
  def tokens(c: Column): Column =
    filter(split(c, "\\s+"), t => t =!= lit(""))

  /** Marker stopword sets per language, scored in this fixed order; ties
    * resolve to the earlier entry, zero hits everywhere resolves to "und".
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "dans"),
    "es" -> Seq("el", "los", "las", "y", "es", "un", "en"))

  /** Number of tokens (with repeats) that appear in `words`. */
  def markerHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(typedLit(words), t)))

  /** Argmax over [[LangMarkers]] scores with first-wins tie-break. */
  def langIdFromScores(scores: Seq[(String, Column)]): Column = {
    val allZero = scores.map(_._2 === 0).reduce(_ && _)
    val cases = scores.zipWithIndex.map { case ((lang, s), i) =>
      val rest = scores.drop(i + 1).map(_._2)
      val isMax = rest.foldLeft(lit(true))((acc, o) => acc && s >= o)
      (lang, isMax)
    }
    cases.foldRight(lit(LangMarkers.last._1)) { case ((lang, isMax), els) =>
      when(isMax, lit(lang)).otherwise(els)
    } match {
      case picked => when(allZero, lit("und")).otherwise(picked)
    }
  }

  /** Canonical form for fingerprinting: trimmed, lowercased, spaces collapsed. */
  def normalized(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Content fingerprint: md5 of the normalized text. */
  def fingerprint(c: Column): Column = md5(normalized(c))

  /** Shingle fingerprint: lexicographic min of md5 over all 5-token windows
    * (a single-permutation MinHash); whole-text md5 when under 5 tokens.
    */
  def shingleFingerprint(c: Column): Column = {
    val toks = tokens(normalized(c))
    val n = size(toks)
    when(
      n >= 5,
      array_min(transform(
        sequence(lit(1), n - 4),
        i => md5(concat_ws(" ", slice(toks, i, lit(5)))))))
      .otherwise(md5(normalized(c)))
  }

  /** Token-count shingles of width `k` (ordered, with duplicates kept by
    * position then deduped): the n-gram sets used by Jaccard dedup.
    */
  def shingles(toks: Column, k: Int): Column =
    when(
      size(toks) >= k,
      array_distinct(transform(
        sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k))))))
      .otherwise(array(concat_ws(" ", toks)))
}
