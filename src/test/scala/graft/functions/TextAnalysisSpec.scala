package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column): Any =
    Seq(text).toDF("text").select(c.as("r")).head().get(0)

  test("tokens drops empties from ragged whitespace") {
    assert(
      one("  a  b \t c ", array_join(TextAnalysis.tokens(col("text")), "|")) == "a|b|c")
  }

  test("markerHits counts repeats") {
    val hits = TextAnalysis.markerHits(TextAnalysis.tokens(col("text")), Seq("the", "a"))
    assert(one("the cat the hat a mat", hits) == 3)
  }

  test("langId picks max score, first-wins tie-break, und when all zero") {
    def lid(text: String): String = {
      val toks = TextAnalysis.tokens(col("text"))
      val scores = TextAnalysis.LangMarkers.map { case (l, ws) =>
        l -> TextAnalysis.markerHits(toks, ws)
      }
      one(text, TextAnalysis.langIdFromScores(scores)).asInstanceOf[String]
    }
    assert(lid("the cat is here") == "en")
    assert(lid("der hund ist da") == "de")
    assert(lid("xyzzy plugh") == "und")
    // "un" scores 1 for fr and es -> fr wins (earlier in LangMarkers)
    assert(lid("un gato") == "fr")
  }

  test("normalized collapses case and whitespace") {
    assert(one("  A  B\tC ", TextAnalysis.normalized(col("text"))) == "a b c")
  }

  test("shingleFingerprint: short text falls back to whole-text md5") {
    val short = one("a b c", TextAnalysis.shingleFingerprint(col("text")))
    val whole = one("a b c", md5(TextAnalysis.normalized(col("text"))))
    assert(short == whole)
  }

  test("shingleFingerprint: min over 5-gram md5s") {
    val text = "a b c d e f"
    val expected = Seq("a b c d e", "b c d e f").map { s =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }.min
    assert(one(text, TextAnalysis.shingleFingerprint(col("text"))) == expected)
  }

  test("shingles dedupe and fall back below k") {
    val sh = TextAnalysis.shingles(TextAnalysis.tokens(col("text")), 3)
    assert(
      one("a b a b a b", array_join(array_sort(sh), "|")) == "a b a|b a b")
    assert(one("a b", array_join(sh, "|")) == "a b")
  }

  test("Hashing.md5Long60 matches JVM md5 prefix") {
    val h = one("hello", Hashing.md5Long60(col("text"))).asInstanceOf[Long]
    assert(h == java.lang.Long.parseLong("5d41402abc4b2a7", 16))
  }
}
