package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** Pins [[TopoLayers.run]] to the sequential longest-path layering it
  * claims to parallelize, and locks the fixed-round null residue on a
  * chain-shaped DAG (a directed path needs ~n rounds).
  */
class TopoLayersSpec extends SparkSpec {
  import spark.implicits._

  /** Longest-path depth by id-order DP (edges are id-oriented u < v, so
    * ascending-id order IS a topological order).
    */
  private def seqLayers(edges: Seq[(Long, Long)]): Map[Long, Int] = {
    val nodes = edges.flatMap { case (u, v) => Seq(u, v) }.distinct.sorted
    val in = edges.groupMap(_._2)(_._1).withDefaultValue(Seq.empty)
    val layer = scala.collection.mutable.Map.empty[Long, Int]
    for (v <- nodes) layer(v) = (in(v).map(layer) :+ 0).max + 1
    layer.toMap
  }

  test("enough rounds reproduce the longest-path layering exactly") {
    val rnd = new Random(11)
    val edges = (0 until 300)
      .map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (u, v) => u != v }
      .map { case (u, v) => (math.min(u, v), math.max(u, v)) }
      .distinct
    val exp = seqLayers(edges)
    val got = TopoLayers.run(edges.toDF("u", "v"), rounds = exp.values.max).collect()
    val gotMap = got.map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.forall(!_.isNullAt(1)), "max-depth rounds must resolve every node")
    assert(gotMap == exp, s"layer mismatch: ${gotMap.toSet.diff(exp.toSet)}")
    graft.Caches.releaseAll()
  }

  test("a directed path leaves a null residue under few rounds, decided prefix exact") {
    // Path 0→1→2→…→19: layer(i) = i+1; round r decides exactly node r−1.
    val edges = (0L until 19L).map(i => (i, i + 1))
    val got = TopoLayers.run(edges.toDF("u", "v"), rounds = 3).collect()
    val byId = got.map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(byId(0L).contains(1))
    assert(byId(1L).contains(2))
    assert(byId(2L).contains(3))
    assert((3L until 20L).forall(byId(_).isEmpty))
    graft.Caches.releaseAll()
  }
}
