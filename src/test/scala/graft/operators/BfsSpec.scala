package graft.operators

import graft.SparkSpec

class BfsSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], seeds: Seq[Long], hops: Int): Map[Long, Long] =
    Bfs
      .run(edges.toDF("src", "dst"), seeds.toDF("id"), hops)
      .as[(Long, Long)]
      .collect()
      .toMap

  /** Driver-side replay: textbook BFS over an adjacency map. */
  private def replay(edges: Seq[(Long, Long)], seeds: Seq[Long], hops: Int): Map[Long, Long] = {
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    var dist = seeds.distinct.map(_ -> 0L).toMap
    var frontier = seeds.distinct
    for (h <- 1 to hops) {
      val next = frontier
        .flatMap(adj.getOrElse(_, Nil))
        .distinct
        .filterNot(dist.contains)
      dist = dist ++ next.map(_ -> h.toLong)
      frontier = next
    }
    dist
  }

  test("matches a driver-side replay on a random directed graph") {
    val rnd = new scala.util.Random(4179)
    val edges = (1 to 200)
      .map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2)
      .distinct
    val seeds = Seq(0L, 7L, 13L)
    for (hops <- 1 to 4) {
      assert(run(edges, seeds, hops) == replay(edges, seeds, hops), s"hops=$hops")
    }
  }

  test("keeps the minimum distance when a node is reachable at several depths") {
    // 0->1->2->3 plus a shortcut 0->2: node 2 must be dist 1, node 3 dist 2.
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 2L))
    assert(run(edges, Seq(0L), 3) == Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 2L))
  }

  test("duplicate seeds collapse and unreached nodes are absent") {
    val edges = Seq((0L, 1L), (5L, 6L))
    assert(run(edges, Seq(0L, 0L), 2) == Map(0L -> 0L, 1L -> 1L))
  }

  test("broadcast-frontier path returns the same distances as the shuffle path") {
    val rnd = new scala.util.Random(5023)
    val edges = (1 to 300)
      .map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(e => e._1 != e._2)
      .distinct
    val seeds = Seq(0L, 11L)
    val ef = edges.toDF("src", "dst")
    val sf = seeds.toDF("id")
    // Threshold 1 forces the per-round size check to fall back to the
    // shuffle join every round (2 seeds > 1); the large threshold keeps
    // every round on the broadcast side. Both must agree with the replay.
    for (thresh <- Seq(1L, 1000000L)) {
      val got = Bfs
        .run(ef, sf, 3, broadcastFrontierUpTo = thresh)
        .as[(Long, Long)]
        .collect()
        .toMap
      assert(got == replay(edges, seeds, 3), s"thresh=$thresh")
    }
  }
}
