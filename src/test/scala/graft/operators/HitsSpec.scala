package graft.operators

import graft.SparkSpec

class HitsSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, (Long, Long, Double, Double)] =
    Hits
      .run(edges.toDF("src", "dst"), iters)
      .as[(Long, Long, Long, Double, Double)]
      .collect()
      .map { case (id, hr, ar, hf, af) => id -> (hr, ar, hf, af) }
      .toMap

  /** Driver-side replay of the exact-integer iteration. */
  private def replay(edges: Seq[(Long, Long)], iters: Int): Map[Long, (Long, Long)] = {
    val srcs = edges.map(_._1).distinct
    val dsts = edges.map(_._2).distinct
    var h = srcs.map(_ -> 1L).toMap
    var a = Map.empty[Long, Long]
    for (_ <- 1 to iters) {
      a = edges
        .filter(e => h.contains(e._1))
        .groupBy(_._2)
        .map { case (d, es) => d -> es.map(e => h(e._1)).sum }
      h = edges
        .filter(e => a.contains(e._2))
        .groupBy(_._1)
        .map { case (s, es) => s -> es.map(e => a(e._2)).sum }
    }
    (srcs ++ dsts).distinct.map(n => n -> (h.getOrElse(n, 0L), a.getOrElse(n, 0L))).toMap
  }

  test("matches a driver-side exact-integer replay on a random bipartite graph") {
    val rnd = new scala.util.Random(982451)
    // sources 0..19 point at items 100..109
    val edges = (1 to 120)
      .map(_ => (rnd.nextInt(20).toLong, 100L + rnd.nextInt(10)))
      .distinct
    for (iters <- 1 to 3) {
      val got = run(edges, iters)
      val want = replay(edges, iters)
      assert(got.keySet == want.keySet, s"iters=$iters")
      got.foreach { case (id, (hr, ar, _, _)) =>
        assert((hr, ar) == want(id), s"iters=$iters id=$id")
      }
    }
  }

  test("fractions are the raw scores over the exact L1 totals and sum to 1 per side") {
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L), (3L, 12L))
    val got = run(edges, 2)
    val hTot = got.values.map(_._1).sum.toDouble
    val aTot = got.values.map(_._2).sum.toDouble
    got.foreach { case (_, (hr, ar, hf, af)) =>
      assert(hf == hr / hTot)
      assert(af == ar / aTot)
    }
    assert(math.abs(got.values.map(_._3).sum - 1.0) < 1e-12)
    assert(math.abs(got.values.map(_._4).sum - 1.0) < 1e-12)
  }

  test("hub mass concentrates on the source pointing at the popular item") {
    // item 10 is pointed at by everyone; source 1 also points at the only
    // source of item 11's mass, so after round 2 source 1 out-hubs source 3.
    val edges = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 11L))
    val got = run(edges, 2)
    assert(got(1L)._1 > got(3L)._1)
    assert(got(10L)._2 > got(11L)._2)
  }
}
