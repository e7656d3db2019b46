package graft.operators

import graft.SparkSpec
import scala.util.Random

/** Apsp.run vs a brute Floyd–Warshall: integer distances must agree
  * pair-for-pair (both exact — no tolerance).
  */
class ApspSpec extends SparkSpec {

  private def floyd(
      nodes: Seq[Long],
      edges: Seq[(Long, Long, Long)]): Map[(Long, Long), Long] = {
    val d = collection.mutable.Map[(Long, Long), Long]()
    for ((u, v, w) <- edges if u != v) {
      val k = (u, v)
      if (d.get(k).forall(_ > w)) d(k) = w
    }
    for (k <- nodes; i <- nodes; j <- nodes if i != j) {
      (d.get((i, k)), d.get((k, j))) match {
        case (Some(a), Some(b)) if d.get((i, j)).forall(_ > a + b) =>
          d((i, j)) = a + b
        case _ => ()
      }
    }
    d.toMap
  }

  test("Apsp.run equals Floyd-Warshall on random weighted digraphs") {
    import spark.implicits._
    val rnd = new Random(13)
    for (trial <- 1 to 4) {
      val n = 10 + trial * 5
      // Random digraph with duplicate weights (min-fold of parallel
      // edges), long chains (path doubling must actually iterate), and
      // unreachable islands (absent rows, not infinities).
      val edges = (1 to n * 2).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong, (1 + rnd.nextInt(9)).toLong)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val expect = floyd(nodes, edges)
      val got = Apsp
        .run(edges.toDF("src", "dst", "w"), rounds = 8)
        .as[(Long, Long, Long)]
        .collect()
        .map { case (u, v, d) => (u, v) -> d }
        .toMap
      assert(got == expect, s"trial $trial: Apsp != Floyd-Warshall")
      graft.Caches.releaseAll()
    }
  }

  test("directed reachability: distances follow edge direction only") {
    import spark.implicits._
    // 0 -> 1 -> 2, plus a reverse edge 2 -> 0: cycle closes all pairs.
    val edges = Seq((0L, 1L, 4L), (1L, 2L, 1L), (2L, 0L, 2L))
    val got = Apsp.run(edges.toDF("src", "dst", "w"), rounds = 4)
      .as[(Long, Long, Long)].collect().map { case (u, v, d) => (u, v) -> d }.toMap
    assert(got == Map(
      (0L, 1L) -> 4L, (0L, 2L) -> 5L,
      (1L, 2L) -> 1L, (1L, 0L) -> 3L,
      (2L, 0L) -> 2L, (2L, 1L) -> 6L))
    graft.Caches.releaseAll()
  }

  test("early fixpoint: extra rounds beyond the closure change nothing") {
    import spark.implicits._
    // A 3-path closes in 2 rounds; ask for 12 — the (count, sum)
    // signature must short-circuit the rest.
    val edges = Seq((0L, 1L, 1L), (1L, 2L, 1L), (2L, 3L, 1L))
    val got = Apsp.run(edges.toDF("src", "dst", "w"), rounds = 12)
      .as[(Long, Long, Long)].collect().map { case (u, v, d) => (u, v) -> d }.toMap
    assert(got == Map(
      (0L, 1L) -> 1L, (0L, 2L) -> 2L, (0L, 3L) -> 3L,
      (1L, 2L) -> 1L, (1L, 3L) -> 2L, (2L, 3L) -> 1L))
    graft.Caches.releaseAll()
  }
}
