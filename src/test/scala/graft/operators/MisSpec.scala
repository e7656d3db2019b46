package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** Pins [[Mis.run]] to the sequential greedy-by-id MIS it claims to
  * parallelize, and locks the fixed-round `undecided` residue on a
  * deliberately chain-shaped graph (a path graph needs ~n/2 rounds).
  */
class MisSpec extends SparkSpec {
  import spark.implicits._

  private def seqGreedy(edges: Seq[(Long, Long)]): (Set[Long], Set[Long]) = {
    val adj = edges
      .flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupMap(_._1)(_._2)
      .view
      .mapValues(_.toSet)
      .toMap
    val nodes = adj.keys.toSeq.sorted
    var in = Set.empty[Long]
    for (v <- nodes) if (!adj(v).exists(in)) in += v
    (in, nodes.toSet -- in)
  }

  test("enough rounds reproduce the sequential greedy MIS exactly") {
    val rnd = new Random(7)
    val edges = (0 until 300)
      .map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (u, v) => u != v }
      .map { case (u, v) => (math.min(u, v), math.max(u, v)) }
      .distinct
    val (expIn, expOut) = seqGreedy(edges)
    val sym = edges.toDF("u", "v")
    val symBoth = sym.union(sym.select(col("v").as("u"), col("u").as("v")))
    val got = Mis.run(symBoth, rounds = 12).collect()
    val gotIn = got.filter(_.getString(1) == "in").map(_.getLong(0)).toSet
    val gotOut = got.filter(_.getString(1) == "out").map(_.getLong(0)).toSet
    assert(got.forall(_.getString(1) != "undecided"), "random graph should resolve in 12 rounds")
    assert(gotIn == expIn, s"in mismatch: ${gotIn.diff(expIn)} / ${expIn.diff(gotIn)}")
    assert(gotOut == expOut)
    graft.Caches.releaseAll()
  }

  test("a path graph leaves an undecided residue under few rounds, decided prefix exact") {
    // Path 0-1-2-...-19: sequential greedy takes evens; round r decides
    // nodes 2r-2 and 2r-1 (the frontier moves two nodes per round).
    val edges = (0L until 19L).map(i => (i, i + 1))
    val sym = edges.toDF("u", "v")
    val symBoth = sym.union(sym.select(col("v").as("u"), col("u").as("v")))
    val got = Mis.run(symBoth, rounds = 3).collect()
    val byId = got.map(r => r.getLong(0) -> (r.getString(1), Option(r.get(2)))).toMap
    assert(byId(0L) == (("in", Some(1))))
    assert(byId(1L) == (("out", Some(1))))
    assert(byId(2L) == (("in", Some(2))))
    assert(byId(3L) == (("out", Some(2))))
    assert(byId(4L) == (("in", Some(3))))
    assert(byId(5L) == (("out", Some(3))))
    assert((6L until 20L).forall(i => byId(i)._1 == "undecided"))
    graft.Caches.releaseAll()
  }
}
