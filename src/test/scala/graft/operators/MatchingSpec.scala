package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** Pins [[Matching.run]] to the sequential greedy-by-edge-id matching it
  * claims to parallelize (same pairs, same unmatched set), and locks the
  * fixed-round `undecided` residue on a chain-shaped graph.
  */
class MatchingSpec extends SparkSpec {
  import spark.implicits._

  private def seqGreedy(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val matched = scala.collection.mutable.Map.empty[Long, Long]
    for ((u, v) <- edges.sorted)
      if (!matched.contains(u) && !matched.contains(v)) {
        matched(u) = v; matched(v) = u
      }
    matched.toMap
  }

  /** Rounds the parallel local-minima schedule needs to fully resolve. */
  private def parallelDepth(edges: Seq[(Long, Long)]): Int = {
    var live = edges.toSet
    var r = 0
    while (live.nonEmpty) {
      r += 1
      val mn = live.toSeq
        .flatMap { case (u, v) => Seq(u -> (u, v), v -> (u, v)) }
        .groupMap(_._1)(_._2)
        .view
        .mapValues(_.min)
        .toMap
      val winners = live.filter(e => mn(e._1) == e && mn(e._2) == e)
      val matchedNodes = winners.flatMap { case (u, v) => Seq(u, v) }
      live = live.filter { case (u, v) => !matchedNodes(u) && !matchedNodes(v) }
    }
    math.max(r, 1)
  }

  test("enough rounds reproduce the sequential greedy matching exactly") {
    val rnd = new Random(17)
    val edges = (0 until 200)
      .map(_ => (rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter { case (u, v) => u != v }
      .map { case (u, v) => (math.min(u, v), math.max(u, v)) }
      .distinct
    val exp = seqGreedy(edges)
    val nodes = edges.flatMap { case (u, v) => Seq(u, v) }.toSet
    val got = Matching.run(edges.toDF("u", "v"), rounds = parallelDepth(edges)).collect()
    assert(got.forall(_.getString(1) != "undecided"), "depth rounds must resolve every node")
    val gotMates = got
      .filter(_.getString(1) == "matched")
      .map(r => r.getLong(0) -> r.getLong(2))
      .toMap
    val gotUnmatched = got.filter(_.getString(1) == "unmatched").map(_.getLong(0)).toSet
    assert(gotMates == exp, s"pair mismatch: ${gotMates.toSet.diff(exp.toSet)}")
    assert(gotUnmatched == nodes.diff(exp.keySet))
    // Matching invariant: mates are mutual and disjoint.
    assert(gotMates.forall { case (a, b) => gotMates(b) == a && a != b })
    graft.Caches.releaseAll()
  }

  test("a path graph leaves an undecided residue under few rounds, decided prefix exact") {
    // Path 0-1-2-…-19: greedy pairs (0,1),(2,3),…; round r commits pair
    // (2r-2, 2r-1) — the frontier moves one pair per round.
    val edges = (0L until 19L).map(i => (i, i + 1))
    val got = Matching.run(edges.toDF("u", "v"), rounds = 2).collect()
    val byId = got
      .map(r =>
        r.getLong(0) ->
          ((r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))))
      .toMap
    assert(byId(0L) == (("matched", Some(1L))))
    assert(byId(1L) == (("matched", Some(0L))))
    assert(byId(2L) == (("matched", Some(3L))))
    assert(byId(3L) == (("matched", Some(2L))))
    assert((4L until 20L).forall(byId(_)._1 == "undecided"))
    graft.Caches.releaseAll()
  }

  test("self-loops are dropped, never pinning their node (or its neighbors) undecided") {
    // (1,1) is node 1's struct-min edge but appears only once in the
    // node-min table — unfiltered, it could never win and 1-2-3 would
    // stay undecided forever. With the filter, the triangle-free chain
    // resolves exactly as if the loop were absent.
    val edges = Seq((1L, 1L), (1L, 2L), (2L, 3L), (5L, 5L))
    val got = Matching.run(edges.toDF("u", "v"), rounds = 2).collect()
    val byId = got
      .map(r =>
        r.getLong(0) ->
          ((r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))))
      .toMap
    assert(byId(1L) == (("matched", Some(2L))))
    assert(byId(2L) == (("matched", Some(1L))))
    assert(byId(3L) == (("unmatched", None)))
    // A self-loop-only node has no live edge after the filter: absent
    // from the output entirely (the documented contract), not undecided.
    assert(!byId.contains(5L))
    graft.Caches.releaseAll()
  }
}
