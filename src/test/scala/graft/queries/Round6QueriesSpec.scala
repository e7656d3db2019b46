package graft.queries

import graft.SparkSpec

/** Driver-side replays of the round-6 additions on tiny synthesized
  * tables: local clustering coefficient, greedy k-center selection,
  * the TPC-H Q7 bilateral-trade rollup, and Flesch readability.
  */
class Round6QueriesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("gr_clustercoeff matches a brute-force wedge closure") {
    val dir = tmp("ccoef")
    // order 1 co-purchases parts {0,1,2} (a closed triangle around 0);
    // order 2 adds neighbor 3 with no closing edges.
    Seq((1L, 0L), (1L, 1L), (1L, 2L), (2L, 0L), (2L, 3L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = GraphQueries.queries("gr_clustercoeff")(spark, dir)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    // q=0: deg 3 (neighbors 1,2,3), one closed pair (1,2) of three.
    assert(got === Seq((0L, 3L, 1L, 3L, 1.0 / 3.0)))
  }

  test("ds_kcenter replays the greedy max-min selection") {
    val dir = tmp("kcenter")
    val rnd = new scala.util.Random(1312)
    val vecs = (0L until 20L).map(id => (id, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
    vecs.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = DedupQueries.queries("ds_kcenter")(spark, dir)
      .as[(Long, Long, Double, Long, Double)].collect().toSeq

    def cos(a: Array[Float], b: Array[Float]): Double = {
      def dot(x: Array[Float], y: Array[Float]) =
        x.indices.foldLeft(0.0)((s, i) => s + x(i).toDouble * y(i).toDouble)
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val byId = vecs.toMap
    var chosen = Vector((0L, 1.0))
    for (_ <- 1 until 5) {
      val cands = vecs.filterNot(v => chosen.exists(_._1 == v._1)).map { case (id, v) =>
        (chosen.map(c => cos(v, byId(c._1))).max, id)
      }
      val pick = cands.minBy { case (mc, id) => (mc, id) }
      chosen = chosen :+ ((pick._2, pick._1))
    }
    assert(got.map(_._2) === chosen.map(_._1))
    got.zip(chosen).foreach { case (row, (_, selCos)) => assert(row._3 === selCos) }
    // every point assigned exactly once
    assert(got.map(_._4).sum === 20L)
  }

  test("q92_tpch7 groups bilateral trade by nation pair and year") {
    val dir = tmp("tpch7")
    Seq((1L, "NATION_1"), (2L, "NATION_2"), (3L, "NATION_3"))
      .toDF("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq((10L, 1L), (11L, 3L)).toDF("s_suppkey", "s_nationkey")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq((20L, 2L)).toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((30L, 20L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val ts = java.sql.Timestamp.valueOf("1995-03-01 00:00:00")
    Seq(
      (30L, 10L, ts, 100.0, 0.1), // NATION_1 supp -> NATION_2 cust: kept
      (30L, 11L, ts, 50.0, 0.0) // NATION_3 supp: dropped by the nation gate
    ).toDF("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = RelationalQueries.queries("q92_tpch7")(spark, dir)
      .as[(String, String, Long, Long, Double)].collect().toSeq
    assert(got === Seq(("NATION_1", "NATION_2", 1995L, 1L, 90.0)))
  }

  test("ta_readability counts words, sentences, vowel-group syllables") {
    val dir = tmp("read")
    Seq((1L, "Hello world. This is a test!"), (2L, ""))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextQueries.queries("ta_readability")(spark, dir)
      .select("doc_id", "n_words", "n_sents", "n_syll")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 6L, 2L, 7L), (2L, 0L, 1L, 0L)))
    val fk = TextQueries.queries("ta_readability")(spark, dir)
      .select("fk_score").as[Option[Double]].collect().toSeq
    assert(fk(0).get === 206.835 - 1.015 * (6.0 / 2.0) - 84.6 * (7.0 / 6.0))
    assert(fk(1).isEmpty)
  }
}
