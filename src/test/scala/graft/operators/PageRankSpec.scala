package graft.operators

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], d: Double, iters: Int): Map[Long, Double] =
    PageRank.run(edges.toDF("src", "dst"), d, iters)
      .as[(Long, Double)].collect().toMap

  /** Driver-side replay of the same fixed-iteration update rule. */
  private def replay(edges: Seq[(Long, Long)], d: Double, iters: Int): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    val out = edges.groupBy(_._1).map { case (s, es) => s -> es.size }
    var pr = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val contrib = edges
        .groupBy(_._2)
        .map { case (t, es) => t -> es.map(e => pr(e._1) / out(e._1)).sum }
      pr = nodes.map(v => v -> ((1.0 - d) / n + d * contrib.getOrElse(v, 0.0))).toMap
    }
    pr
  }

  test("matches a driver-side replay on a random graph, mass conserved") {
    val rnd = new scala.util.Random(4177)
    val edges = (1 to 120)
      .map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter(e => e._1 != e._2)
      .distinct
    val got = run(edges, 0.85, 3)
    val want = replay(edges, 0.85, 3)
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-12, s"node $k") }
    // all nodes in this graph have out-links, so mass is conserved
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("uniform on a symmetric cycle, center dominates a star") {
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L), (3L, 2L), (1L, 3L))
    val prC = run(cycle, 0.85, 4)
    assert(prC.values.map(v => math.abs(v - 1.0 / 3)).max < 1e-12)
    // star: leaves point at the center AND back, center out-links to all
    val star = Seq((2L, 1L), (3L, 1L), (4L, 1L), (1L, 2L), (1L, 3L), (1L, 4L))
    val prS = run(star, 0.85, 5)
    assert(prS(1L) > prS(2L) * 2)
    assert(math.abs(prS(2L) - prS(4L)) < 1e-12)
  }

  test("dangling nodes keep their base rank, no crash") {
    // 2 has no out-edges: its mass drains (standard fixed-iteration PR
    // without dangling redistribution), others still get base + incoming.
    val pr = run(Seq((1L, 2L)), 0.85, 2)
    assert(pr.keySet == Set(1L, 2L))
    assert(math.abs(pr(1L) - 0.075) < 1e-12) // (1-d)/2 with no inbound
  }
}
