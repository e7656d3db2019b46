package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnnSpec extends SparkSpec {
  import spark.implicits._

  private def vecsDf(n: Int) = {
    val rnd = new scala.util.Random(37)
    (0 until n).map(i => (i.toLong, Array.fill(8)(rnd.nextDouble() * 2 - 1)))
      .toDF("vec_id", "embedding")
  }

  test("brute top-k truncates gracefully when k exceeds the corpus") {
    val df = vecsDf(4)
    val out = Ann
      .bruteTopK(df, "vec_id", "embedding", col("id") === 0, k = 10)
      .collect()
    assert(out.length == 3) // only 3 non-self neighbors exist
    assert(out.map(_.getAs[Long]("rank")).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("brute top-1 returns the true nearest neighbor") {
    // vector 1 is a scaled copy of vector 0 -> cosine exactly 1.0
    val df = Seq(
      (0L, Array(1.0, 0.0, 0.0)),
      (1L, Array(2.0, 0.0, 0.0)),
      (2L, Array(0.0, 1.0, 0.0)))
      .toDF("vec_id", "embedding")
    val out = Ann
      .bruteTopK(df, "vec_id", "embedding", col("id") === 0, k = 1)
      .collect()(0)
    assert(out.getAs[Long]("n_id") == 1L && out.getAs[Double]("cos") == 1.0)
  }

  test("IVF with every vector as its own centroid reduces to exact search") {
    val df = vecsDf(12)
    val brute = Ann
      .bruteTopK(df, "vec_id", "embedding", col("id") < 3, k = 4)
      .select("q_id", "n_id", "rank").as[(Long, Long, Long)].collect().toSet
    val ivf = Ann
      .ivfTopK(df, "vec_id", "embedding", lit(true), col("id") < 3, nprobe = 12, k = 4)
      .select("q_id", "n_id", "rank").as[(Long, Long, Long)].collect().toSet
    assert(ivf == brute)
  }
}
