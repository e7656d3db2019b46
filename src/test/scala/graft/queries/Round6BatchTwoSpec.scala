package graft.queries

import graft.SparkSpec

/** Driver-side replays of the round-6 batch-2 additions: scaled Brandes
  * betweenness, the Q20-shape dominant-supplier audit, gaps-and-islands
  * streaks, and the Pareto-front selection.
  */
class Round6BatchTwoSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("gr_betweenness accumulates fixed-point dependencies on a path") {
    val dir = tmp("bw")
    // bipartite path p0 - s1 - p1 - s2 (node ids 0, 3, 2, 5); source = 0.
    Seq((0L, 1L), (1L, 1L), (1L, 2L))
      .toDF("l_partkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = GraphQueries.queries("gr_betweenness")(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    // delta(p1=2) = floor(1*(1e6+0)/1) = 1e6; delta(s1=3) = floor(1*(1e6+1e6)/1)
    assert(got === Seq((2L, 1L, 1000000L), (3L, 1L, 2000000L)))
  }

  test("q93_tpch20 keeps only strictly-dominant suppliers") {
    val dir = tmp("tpch20")
    Seq((100L, "Brand#1"), (200L, "Brand#2"))
      .toDF("p_partkey", "p_brand")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    Seq((1L, "SUPP_1"), (2L, "SUPP_2")).toDF("s_suppkey", "s_name")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq(
      (100L, 1L, 9.0), // 90% of part 100 -> dominant
      (100L, 2L, 1.0), // exactly 10% -> NOT strict, excluded
      (200L, 2L, 5.0) // wrong brand
    ).toDF("l_partkey", "l_suppkey", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = RelationalQueries.queries("q93_tpch20")(spark, dir)
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got === Seq((1L, "SUPP_1", 1L, 9L)))
  }

  test("q95_islands groups consecutive ship days") {
    val dir = tmp("islands")
    def ts(d: String) = java.sql.Timestamp.valueOf(s"$d 00:00:00")
    Seq(
      (7L, ts("2020-01-01")), (7L, ts("2020-01-02")), (7L, ts("2020-01-02")),
      (7L, ts("2020-01-03")), (7L, ts("2020-01-10")))
      .toDF("l_suppkey", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = RelationalQueries.queries("q95_islands")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((7L, 2L, 3L, 4L)))
  }

  test("ds_pareto keeps exactly the non-dominated documents") {
    val dir = tmp("pareto")
    Seq(
      (1L, "x y z", 10L), // (10, 3): skyline
      (2L, "p q r s t", 5L), // (5, 5): skyline
      (3L, "m n", 10L), // (10, 2): dominated by doc 1
      (4L, "p q r s t", 4L) // (4, 5): dominated by doc 2
    ).toDF("doc_id", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = DedupQueries.queries("ds_pareto")(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 10L, 3L), (2L, 5L, 5L)))
  }
}
