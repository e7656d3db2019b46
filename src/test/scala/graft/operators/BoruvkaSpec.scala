package graft.operators

import graft.SparkSpec
import scala.util.Random

/** Borůvka MSF vs a brute sequential Kruskal under the same strict
  * `(w, u, v)` total order — the MSF is unique under a strict order, so
  * the two must agree edge-for-edge, not just in total weight.
  */
class BoruvkaSpec extends SparkSpec {

  private def kruskal(
      n: Int,
      edges: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
      r
    }
    val out = Set.newBuilder[(Long, Long, Long)]
    for ((u, v, w) <- edges.sortBy { case (u, v, w) => (w, u, v) }) {
      val (ru, rv) = (find(u.toInt), find(v.toInt))
      if (ru != rv) { parent(ru) = rv; out += ((u, v, w)) }
    }
    out.result()
  }

  test("Boruvka.run equals sequential Kruskal on random multigraphs") {
    import spark.implicits._
    val rnd = new Random(42)
    for (trial <- 1 to 5) {
      val n = 30 + trial * 10
      // Random multigraph with duplicate weights (exercises the
      // lexicographic tie-break) and a few disconnected islands
      // (exercises the forest, not just tree, case).
      val edges = (1 to n * 3).map { _ =>
        val u = rnd.nextInt(n).toLong
        val v = rnd.nextInt(n).toLong
        (u.min(v), u.max(v), rnd.nextInt(7).toLong)
      }.filter { case (u, v, _) => u != v }.distinct
      val expect = kruskal(n, edges)
      val got = Boruvka
        .run(edges.toDF("u", "v", "w"), rounds = 8)
        .as[(Long, Long, Long)]
        .collect()
        .toSet
      assert(got == expect, s"trial $trial: Borůvka != Kruskal")
      // Forest invariant: |F| = n_touched - n_components.
      val touched = edges.flatMap(e => Seq(e._1, e._2)).distinct.size
      val comps = {
        val parent = collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElse(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        for ((u, v, _) <- edges) parent(find(u)) = find(v)
        edges.flatMap(e => Seq(e._1, e._2)).distinct.map(find).distinct.size
      }
      assert(got.size == touched - comps, "forest edge count")
    }
    graft.Caches.releaseAll()
  }

  test("early fixpoint: extra rounds change nothing and are skipped cheaply") {
    import spark.implicits._
    // A path graph completes in ceil(log2 5) = 3 rounds; ask for 12.
    val edges = Seq((0L, 1L, 5L), (1L, 2L, 3L), (2L, 3L, 9L), (3L, 4L, 1L))
    val out = Boruvka.run(edges.toDF("u", "v", "w"), rounds = 12)
    assert(out.count() == 4L, "path MSF is the whole path")
    graft.Caches.releaseAll()
  }
}
