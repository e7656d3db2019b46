package graft.queries

import graft.SparkSpec

class AnnPqSpec extends SparkSpec {
  import spark.implicits._

  private val (pqM, pqK, pqD) = (8, 16, 8)

  private def centroid(m: Int, c: Int): Seq[Double] =
    (0 until pqD).map { d =>
      graft.expressions.Md5Long60.hash(s"pq|$m|$c|$d".getBytes("UTF-8")).toDouble /
        (1L << 59).toDouble - 1.0
    }

  test("ADC search equals a driver-side replay of codes + LUT") {
    val dir = java.nio.file.Files.createTempDirectory("annpq").toString
    val rnd = new scala.util.Random(911)
    val vecs = (0L until 30L).map(id => (id, Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    vecs.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = AnnQueries.queries("ann_pq")(spark, dir)
      .as[(Long, Long, Double, Long)].collect().toSeq

    def sub(v: Array[Float], m: Int): Seq[Double] =
      (0 until pqD).map(d => v(m * pqD + d).toDouble)
    def sq(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + (x - y) * (x - y) }
    // codes: per vector per subspace, argmin centroid (ties to lower code)
    val codes = vecs.map { case (id, v) =>
      id -> (0 until pqM).map { m =>
        (0 until pqK).map(c => (sq(sub(v, m), centroid(m, c)), c)).min._2
      }
    }.toMap
    val queries = vecs.filter(_._1 % 50 == 0)
    val want = queries.flatMap { case (qid, qv) =>
      val scored = vecs.map { case (vid, _) =>
        val adist = (0 until pqM).foldLeft(0.0) { (s, m) =>
          s + sq(sub(qv, m), centroid(m, codes(vid)(m)))
        }
        (vid, adist)
      }
      scored.sortBy(t => (t._2, t._1)).take(10).zipWithIndex.map { case ((vid, ad), i) =>
        (qid, vid, ad, i.toLong + 1)
      }
    }
    assert(got.map(t => (t._1, t._2, t._4)) == want.map(t => (t._1, t._2, t._4)))
    got.zip(want).foreach { case (g, w) => assert(math.abs(g._3 - w._3) < 1e-12) }
  }
}
