package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Strongly connected components of a DIRECTED graph via path-doubling
  * transitive closure: `reach ← reach ∪ (reach ⋈ reach)` squares the
  * reachable-path length each round, so `ceil(log2 d)` rounds close a
  * graph of longest shortest-path `d` — the distributed answer to the
  * fact that Tarjan/Kosaraju's DFS orders are inherently sequential. Two
  * nodes are in the same SCC iff each reaches the other; the component id
  * is the minimum node id among a node and its mutual-reachability
  * partners (well-defined because mutual reachability is an equivalence
  * relation).
  *
  * Scale domain — stated honestly: the closure materializes one row per
  * reachable PAIR, which is Θ(n²) on a strongly-connected graph, so this
  * operator is for the digraphs pipelines actually condense to — event /
  * state-machine transition graphs, host-level link graphs (the Broder
  * bowtie analysis), dependency and schedule graphs, near-dup containment
  * digraphs after clustering — graphs whose node count is bounded even
  * when the edge-weight evidence behind them scans a 100 TB fact table.
  * For billion-node raw digraphs the right algorithm is forward-backward
  * pivoting (recursive reachability splits), which trades the quadratic
  * closure for O(#SCC) full-graph passes; the closure form is the right
  * trade below ~10⁵ reachable pairs per component. Rounds cut their
  * lineage ([[Lineage.cut]]) and short-circuit at the closure fixpoint —
  * the closure row count is monotone, so an unchanged count proves
  * convergence.
  */
object Scc {

  /** `(node, scc)` for every endpoint of `edges` (`src`, `dst` columns of
    * any one orderable type; self-loops allowed and irrelevant): `scc` is
    * the minimum node id of the strongly connected component. `rounds`
    * bounds the path-doubling depth — complete whenever
    * `2^rounds >= longest simple path`; the in-repo callers size it from
    * the (bounded) node universe.
    */
  def run(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val e = edges.select(col("src"), col("dst")).filter(col("src") =!= col("dst"))
    var reach = Lineage.cut(e.distinct())
    var nReach = reach.count()
    var r = 0
    var fixed = false
    while (r < rounds && !fixed) {
      r += 1
      val hop = reach
        .join(reach.select(col("src").as("dst"), col("dst").as("far")), Seq("dst"))
        .select(col("src"), col("far").as("dst"))
      reach = Lineage.cut(reach.union(hop).distinct())
      val n = reach.count()
      // Monotone row count: no new pair means the closure is complete and
      // every further round is bit-identical.
      fixed = n == nReach
      nReach = n
    }
    // Node universe from the UNFILTERED input: a node whose only incident
    // edges are self-loops is still an endpoint and forms its own
    // singleton SCC (the documented contract).
    val nodes = edges
      .select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
    // Mutual pairs: (v, u) with v → u and u → v. A left join keeps
    // singleton SCCs (no mutual partner) with scc = the node itself.
    val mutual = reach
      .join(reach.select(col("dst").as("src"), col("src").as("dst")), Seq("src", "dst"), "left_semi")
      .select(col("src").as("node"), col("dst").as("partner"))
    nodes
      .join(mutual, Seq("node"), "left")
      .groupBy("node")
      .agg(min(col("partner")).as("mp"))
      // `least` skips nulls, so a singleton's null min-partner falls back
      // to the node itself.
      .select(col("node"), least(col("mp"), col("node")).as("scc"))
  }
}
