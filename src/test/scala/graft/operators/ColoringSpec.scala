package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** Pins [[Coloring.run]] to the sequential id-order greedy coloring it
  * claims to parallelize (proper coloring, identical colors), and locks
  * the fixed-round null residue on a chain-shaped graph.
  */
class ColoringSpec extends SparkSpec {
  import spark.implicits._

  private def seqGreedy(edges: Seq[(Long, Long)]): Map[Long, Int] = {
    val adj = edges
      .flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupMap(_._1)(_._2)
      .withDefaultValue(Seq.empty)
    val nodes = edges.flatMap { case (u, v) => Seq(u, v) }.distinct.sorted
    val color = scala.collection.mutable.Map.empty[Long, Int]
    for (v <- nodes) {
      val used = adj(v).filter(_ < v).map(color).toSet
      color(v) = Iterator.from(1).find(!used.contains(_)).get
    }
    color.toMap
  }

  test("enough rounds reproduce the sequential greedy coloring exactly") {
    val rnd = new Random(13)
    val edges = (0 until 300)
      .map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (u, v) => u != v }
      .map { case (u, v) => (math.min(u, v), math.max(u, v)) }
      .distinct
    val exp = seqGreedy(edges)
    // Exact wave count = longest-path depth of the id-oriented DAG.
    val depth = {
      val in = edges.groupMap(_._2)(_._1).withDefaultValue(Seq.empty)
      val layer = scala.collection.mutable.Map.empty[Long, Int]
      for (v <- exp.keys.toSeq.sorted) layer(v) = (in(v).map(layer) :+ 0).max + 1
      layer.values.max
    }
    val got = Coloring.run(edges.toDF("u", "v"), rounds = depth).collect()
    val gotMap = got.map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.forall(!_.isNullAt(1)), "enough rounds must color every node")
    assert(gotMap == exp, s"color mismatch: ${gotMap.toSet.diff(exp.toSet)}")
    // Proper coloring: no edge joins two same-colored endpoints.
    assert(edges.forall { case (u, v) => gotMap(u) != gotMap(v) })
    graft.Caches.releaseAll()
  }

  test("a path graph leaves a null residue under few rounds, decided prefix exact") {
    // Path 0-1-2-…-19: greedy alternates 1,2,1,2,…; round r decides node r−1.
    val edges = (0L until 19L).map(i => (i, i + 1))
    val got = Coloring.run(edges.toDF("u", "v"), rounds = 3).collect()
    val byId = got.map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(byId(0L).contains(1))
    assert(byId(1L).contains(2))
    assert(byId(2L).contains(1))
    assert((3L until 20L).forall(byId(_).isEmpty))
    graft.Caches.releaseAll()
  }
}
