package graft.operators

import graft.SparkSpec

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def count(edges: Set[(Long, Long)]): (Long, Long, Long) =
    Triangles.count(edges.toSeq.toDF("u", "v")).as[(Long, Long, Long)].head()

  test("known shapes: K4 has 4 triangles, C5 has none, two sharing an edge") {
    val k4 = (for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)).toSet
    assert(count(k4) == ((6L, 4L, 4L)))
    val c5 = Set((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 5L))
    assert(count(c5)._3 == 0L)
    // triangles {1,2,3} and {2,3,4} share edge (2,3)
    val twin = Set((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(count(twin)._3 == 2L)
  }

  test("matches brute-force enumeration on a random graph") {
    val rnd = new scala.util.Random(6101)
    val edges = (1 to 300)
      .map(_ => (rnd.nextInt(25).toLong + 1, rnd.nextInt(25).toLong + 1))
      .filter(e => e._1 != e._2)
      .map(e => (e._1 min e._2, e._1 max e._2))
      .toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val brute = (for {
      a <- nodes; b <- nodes if a < b; c <- nodes if b < c
      if edges((a, b)) && edges((b, c)) && edges((a, c))
    } yield 1).size.toLong
    val (ne, _, tri) = count(edges)
    assert(ne == edges.size.toLong)
    assert(tri == brute)
  }
}
