package graft.queries

import graft.SparkSpec

/** Driver-side replays of the round-6 batch-3 additions: the Q13
  * customer-distribution histogram and bigram-LM predictability.
  */
class Round6BatchThreeSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("q96_tpch13 keeps the zero-order customers") {
    val dir = tmp("tpch13")
    Seq(1L, 2L, 3L).toDF("c_custkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((10L, 1L), (11L, 1L), (12L, 2L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = RelationalQueries.queries("q96_tpch13")(spark, dir)
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((0L, 1L), (1L, 1L), (2L, 1L)))
  }

  test("ta_bigramlm scores each doc by corpus bigram statistics") {
    val dir = tmp("bigram")
    // corpus bigrams: (a b) x2 from docs 1,2; (b c) x1 from doc 2.
    Seq((1L, "a b"), (2L, "a b c"), (3L, "solo"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextQueries.queries("ta_bigramlm")(spark, dir)
      .as[(Long, Long, Long, Option[Double])].collect().toSeq
    // c1(a)=2 c1(b)=1; P(b|a)=2/2 -> 1e6; P(c|b)=1/1 -> 1e6
    assert(got(0) === ((1L, 1L, 1000000L, Some(1000000.0))))
    assert(got(1) === ((2L, 2L, 2000000L, Some(1000000.0))))
    assert(got(2) === ((3L, 0L, 0L, None)))
  }
}
