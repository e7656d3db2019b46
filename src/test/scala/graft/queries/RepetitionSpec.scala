package graft.queries

import graft.SparkSpec

class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  test("ta_repetition signals: duplicate n-gram fractions and dominant token") {
    val dir = java.nio.file.Files.createTempDirectory("rep").toString
    Seq(
      (1L, "a a a a"),
      (2L, "a b c d"),
      (3L, ""),
      (4L, "x y x y x"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextQueries.taRepetition(spark, dir)
      .as[(Long, Double, Double, String, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    assert(r(1L) == ((2.0 / 3, 1.0 / 2, "a", 1.0)))
    // all counts tie at 1 -> lexicographically smallest token wins
    assert(r(2L) == ((0.0, 0.0, "a", 0.25)))
    assert(r(3L) == ((0.0, 0.0, "", 0.0)))
    assert(r(4L) == ((0.5, 1.0 / 3, "x", 3.0 / 5)))
  }

  test("ta_entropy: char-distribution entropy, empty docs kept at zero") {
    val dir = java.nio.file.Files.createTempDirectory("ent").toString
    Seq(
      (1L, "aaaa"), // one symbol: H = 0
      (2L, "abab"), // uniform over 2: H = ln 2
      (3L, ""), // empty: kept, H = 0
      (4L, "aab")) // 2/3, 1/3
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextQueries.taEntropy(spark, dir)
      .as[(Long, Long, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(r(1L) == ((4L, 1L, math.log(4.0) - 4.0 * math.log(4.0) / 4)))
    assert(r(1L)._3 == 0.0)
    assert(math.abs(r(2L)._3 - math.log(2.0)) < 1e-15 && r(2L)._1 == 4L && r(2L)._2 == 2L)
    assert(r(3L) == ((0L, 0L, 0.0)))
    val h4 = math.log(3.0) - (2.0 * math.log(2.0) + 1.0 * math.log(1.0)) / 3.0
    assert(math.abs(r(4L)._3 - h4) < 1e-15 && r(4L)._2 == 2L)
  }

  test("ta_lmscore: corpus-unigram cross-entropy replayed driver-side") {
    val dir = java.nio.file.Files.createTempDirectory("lm").toString
    val corpus = Seq((1L, "a a b"), (2L, "a c"), (3L, ""))
    corpus.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextQueries.taLmscore(spark, dir)
      .as[(Long, Long, Double)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    // counts: a=3, b=1, c=1, N=5
    val p = Map("a" -> 3.0 / 5, "b" -> 1.0 / 5, "c" -> 1.0 / 5)
    def xent(t: String) = {
      val tk = t.split("\\s+").filter(_.nonEmpty)
      if (tk.isEmpty) 0.0 else tk.map(w => -math.log(p(w))).sum / tk.length
    }
    assert(got(3L) == ((0L, 0.0)))
    assert(math.abs(got(1L)._2 - xent("a a b")) < 1e-12)
    assert(math.abs(got(2L)._2 - xent("a c")) < 1e-12)
    // the rare-token doc scores strictly higher than the common-token doc
    assert(got(2L)._2 > got(1L)._2)
  }
}
