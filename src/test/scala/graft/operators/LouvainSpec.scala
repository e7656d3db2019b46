package graft.operators

import graft.SparkSpec
import scala.util.Random

/** Louvain.moveRounds vs an independent sequential reimplementation of
  * the identical synchronous rule (integer scores, parity schedule,
  * strict-improvement moves) — label-for-label on random graphs — plus
  * structural sanity on hand graphs.
  */
class LouvainSpec extends SparkSpec {

  private def brute(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val sym = edges
      .flatMap { case (u, v) => Seq((u, v), (v, u)) }
      .filter { case (u, v) => u != v }
      .distinct
    val nodes = sym.map(_._1).distinct
    val k = sym.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    val m2 = sym.size.toLong
    val adj = sym.groupBy(_._1).map { case (n, es) => n -> es.map(_._2) }
    var lab = nodes.map(n => n -> n).toMap
    for (r <- 1 to rounds) {
      // .toSeq before mapping to degrees: the key collection is a Set,
      // and mapping members to k over a Set COLLAPSES equal degrees.
      val tot = lab.keys
        .groupBy(lab)
        .map { case (c, ms) => c -> ms.toSeq.map(k).sum }
      val next = nodes.map { i =>
        val e = adj(i).groupBy(lab).map { case (c, js) => c -> js.size.toLong }
        def score(c: Long): Long =
          m2 * e.getOrElse(c, 0L) -
            k(i) * (tot(c) - (if (lab(i) == c) k(i) else 0L))
        val (bestC, bs) = e.keys.map(c => (c, score(c))).minBy { case (c, s) => (-s, c) }
        val ss = m2 * e.getOrElse(lab(i), 0L) - k(i) * (tot(lab(i)) - k(i))
        val moved = i % 2 == (r % 2) && bs > ss
        i -> (if (moved) bestC else lab(i))
      }.toMap
      lab = next
    }
    lab
  }

  test("moveRounds equals the sequential synchronous rule on random graphs") {
    import spark.implicits._
    val rnd = new Random(33)
    for (trial <- 1 to 4) {
      val n = 12 + trial * 8
      val edges = (1 to n * 2).map { _ =>
        val u = rnd.nextInt(n).toLong
        val v = rnd.nextInt(n).toLong
        (u.min(v), u.max(v))
      }.filter { case (u, v) => u != v }.distinct
      val sym = edges.toDF("src", "dst")
        .union(edges.toDF("dst", "src").select($"src", $"dst"))
      val got = Louvain
        .moveRounds(sym, rounds = 4)
        .as[(Long, Long)]
        .collect()
        .toMap
      val expect = brute(edges, 4)
      assert(got == expect, s"trial $trial: parallel != sequential synchronous rule")
      graft.Caches.releaseAll()
    }
  }

  test("two triangles with a bridge resolve to the two triangle communities") {
    import spark.implicits._
    val edges = Seq(
      (0L, 1L), (1L, 2L), (2L, 0L),
      (3L, 4L), (4L, 5L), (5L, 3L),
      (2L, 3L))
    val sym = edges.toDF("src", "dst").union(edges.toDF("dst", "src").select($"src", $"dst"))
    val got = Louvain.moveRounds(sym, rounds = 4).as[(Long, Long)].collect().toMap
    val left = Set(0L, 1L, 2L).map(got)
    val right = Set(3L, 4L, 5L).map(got)
    assert(left.size == 1, s"left triangle split: $got")
    assert(right.size == 1, s"right triangle split: $got")
    assert(left != right, s"bridge merged the triangles: $got")
    graft.Caches.releaseAll()
  }

  test("star collapses into one community under the parity schedule") {
    import spark.implicits._
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L))
    val sym = edges.toDF("src", "dst").union(edges.toDF("dst", "src").select($"src", $"dst"))
    val got = Louvain.moveRounds(sym, rounds = 4).as[(Long, Long)].collect().toMap
    assert(got.values.toSet.size == 1, s"star did not converge to one community: $got")
    graft.Caches.releaseAll()
  }
}
