package graft.operators

import graft.SparkSpec
import scala.util.Random

/** Coreness.run (h-index iteration) vs the brute sequential min-degree
  * peel: converged values must equal core numbers node-for-node.
  */
class CorenessSpec extends SparkSpec {

  /** Textbook core decomposition: repeatedly remove a minimum-degree
    * node; its core number is the max of its removal-time degree and all
    * earlier ones.
    */
  private def bruteCoreness(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = collection.mutable.Map[Long, collection.mutable.Set[Long]]()
    for ((u, v) <- edges if u != v) {
      adj.getOrElseUpdate(u, collection.mutable.Set()) += v
      adj.getOrElseUpdate(v, collection.mutable.Set()) += u
    }
    val core = collection.mutable.Map[Long, Long]()
    var k = 0L
    while (adj.nonEmpty) {
      val (v, nbs) = adj.minBy { case (n, s) => (s.size, n) }
      k = k.max(nbs.size.toLong)
      core(v) = k
      adj.remove(v)
      for (u <- nbs) {
        adj.get(u).foreach(_ -= v)
      }
    }
    core.toMap
  }

  test("h-index iteration converges to core numbers on random graphs") {
    import spark.implicits._
    val rnd = new Random(21)
    for (trial <- 1 to 4) {
      val n = 15 + trial * 10
      val edges = (1 to n * 3).map { _ =>
        val u = rnd.nextInt(n).toLong
        val v = rnd.nextInt(n).toLong
        (u.min(v), u.max(v))
      }.filter { case (u, v) => u != v }.distinct
      val expect = bruteCoreness(edges)
      val sym = edges.toDF("src", "dst")
        .union(edges.toDF("dst", "src").select($"src", $"dst"))
      val got = Coreness
        .run(sym, rounds = 40)
        .as[(Long, Long)]
        .collect()
        .toMap
      assert(got == expect, s"trial $trial: h-index fixpoint != coreness")
      graft.Caches.releaseAll()
    }
  }

  test("self-loops never inflate core numbers") {
    import spark.implicits._
    // A triangle where one vertex also carries a self-loop: core numbers
    // are 2 everywhere (the peel removes a node WITH its loop).
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 0L))
    val sym = edges.toDF("src", "dst").union(edges.toDF("dst", "src").select($"src", $"dst"))
    val got = Coreness.run(sym, rounds = 10).as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 2L, 1L -> 2L, 2L -> 2L), s"self-loop inflated coreness: $got")
    graft.Caches.releaseAll()
  }

  test("truncated rounds give a monotone upper bound on coreness") {
    import spark.implicits._
    // A 5-clique with a long pendant path: the path end's estimate must
    // step down round by round, never below its true coreness of 1.
    val clique = for (u <- 0L until 5L; v <- (u + 1) until 5L) yield (u, v)
    val path = (4L until 9L).map(i => (i, i + 1))
    val edges = (clique ++ path).toDF("src", "dst")
    val sym = edges.union(edges.select($"dst", $"src"))
    val expect = bruteCoreness((clique ++ path))
    val r1 = Coreness.run(sym, 1).as[(Long, Long)].collect().toMap
    val r3 = Coreness.run(sym, 40).as[(Long, Long)].collect().toMap
    assert(r3 == expect, "deep run reaches the exact decomposition")
    for ((id, h) <- r1) {
      assert(h >= expect(id), s"round-1 estimate below true coreness for $id")
    }
    graft.Caches.releaseAll()
  }
}
