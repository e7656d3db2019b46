package graft.operators

import graft.SparkSpec
import scala.util.Random

/** Scc.run vs sequential Tarjan on random digraphs: min-id component
  * labels must agree node-for-node.
  */
class SccSpec extends SparkSpec {

  /** Iterative Tarjan (explicit stacks — no recursion depth limit),
    * returning each node's SCC as the component's minimum node id.
    */
  private def tarjan(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val index = collection.mutable.Map[Long, Int]()
    val low = collection.mutable.Map[Long, Int]()
    val onStack = collection.mutable.Set[Long]()
    val stack = collection.mutable.Stack[Long]()
    val out = collection.mutable.Map[Long, Long]()
    var counter = 0
    for (root <- nodes if !index.contains(root)) {
      // Explicit DFS frame stack: (node, next child offset).
      val frames = collection.mutable.Stack[(Long, Int)]((root, 0))
      index(root) = counter; low(root) = counter; counter += 1
      stack.push(root); onStack += root
      while (frames.nonEmpty) {
        val (v, ci) = frames.pop()
        val children = adj.getOrElse(v, Seq.empty)
        if (ci < children.length) {
          frames.push((v, ci + 1))
          val w = children(ci)
          if (!index.contains(w)) {
            index(w) = counter; low(w) = counter; counter += 1
            stack.push(w); onStack += w
            frames.push((w, 0))
          } else if (onStack(w)) low(v) = low(v).min(index(w))
        } else {
          if (low(v) == index(v)) {
            val comp = collection.mutable.Buffer[Long]()
            var w = -1L
            while ({ w = stack.pop(); onStack -= w; comp += w; w != v }) ()
            val id = comp.min
            comp.foreach(out(_) = id)
          }
          if (frames.nonEmpty) {
            val (p, _) = frames.top
            low(p) = low(p).min(low(v))
          }
        }
      }
    }
    out.toMap
  }

  test("Scc.run equals Tarjan on random digraphs") {
    import spark.implicits._
    val rnd = new Random(7)
    for (trial <- 1 to 5) {
      val n = 12 + trial * 6
      val edges = (1 to n * 2).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter { case (u, v) => u != v }.distinct
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val expect = tarjan(nodes, edges)
      val got = Scc
        .run(edges.toDF("src", "dst"), rounds = 8)
        .as[(Long, Long)]
        .collect()
        .toMap
      assert(got == expect, s"trial $trial: Scc != Tarjan")
      graft.Caches.releaseAll()
    }
  }

  test("two 3-cycles joined by a one-way bridge stay separate SCCs") {
    import spark.implicits._
    val edges = Seq(
      (0L, 1L), (1L, 2L), (2L, 0L), // cycle A
      (3L, 4L), (4L, 5L), (5L, 3L), // cycle B
      (2L, 3L), // one-way bridge: no merge
      (6L, 0L)) // dangling singleton
    val got = Scc.run(edges.toDF("src", "dst"), rounds = 6)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 3L, 5L -> 3L, 6L -> 6L))
    graft.Caches.releaseAll()
  }

  test("a node whose only edges are self-loops is still a singleton SCC") {
    import spark.implicits._
    val edges = Seq((0L, 1L), (1L, 0L), (7L, 7L))
    val got = Scc.run(edges.toDF("src", "dst"), rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 7L -> 7L))
    graft.Caches.releaseAll()
  }

  test("early fixpoint: extra rounds beyond closure change nothing") {
    import spark.implicits._
    val edges = Seq((0L, 1L), (1L, 0L), (1L, 2L))
    val got = Scc.run(edges.toDF("src", "dst"), rounds = 12)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 2L))
    graft.Caches.releaseAll()
  }
}
