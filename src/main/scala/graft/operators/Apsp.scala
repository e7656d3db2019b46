package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** All-pairs shortest paths via min-plus path doubling:
  * `D_{r}(u,v) = min(D_{r-1}(u,v), min_k D_{r-1}(u,k) + D_{r-1}(k,v))`
  * squares the covered path length each round, so `ceil(log2 d)` rounds
  * close a graph of (hop-)diameter `d` — the same log-round discipline as
  * [[Scc]]'s reachability closure, carrying an integer distance instead
  * of a bit. Dijkstra/Bellman-Ford frontiers are inherently
  * source-sequential; repeated squaring is the distributed formulation
  * (one self-join + one min-aggregate per round).
  *
  * Scale domain — stated honestly, the [[Scc]] note verbatim: the closure
  * materializes one row per REACHABLE PAIR, Θ(n²) on a connected graph,
  * so this operator is for the node-bounded digraphs pipelines condense
  * to — nation/market networks, event-type transition graphs, host-level
  * link graphs, dependency DAGs — where the 100 TB cost is the fact-table
  * scan that WEIGHTS the edges, not the closure itself. For
  * billion-node graphs the right tool is per-source frontier BFS
  * ([[Bfs]]) on the sources actually queried.
  *
  * Determinism: weights are integers and `+`/`min` are exact, so the
  * distance matrix is hash-exact on any engine — no float-summation
  * tolerance anywhere (the gr_adamic discipline).
  *
  * Rounds cut their lineage ([[Lineage.cut]] — each round references its
  * predecessor three times, so an uncut plan TRIPLES per round) and
  * short-circuit at the fixpoint: the pair count is monotone
  * non-decreasing and the distance sum over a fixed pair set is monotone
  * non-increasing, so an unchanged `(count, sum)` pair proves the closure
  * converged and every further round is bit-identical. That check rides
  * the cached cut frame (one cheap aggregate job per round, the [[Scc]]
  * barrier budget).
  */
object Apsp {

  /** Shortest distances `(src, dst, d)` for every ordered reachable pair
    * of the DIRECTED graph `edges` (`src`, `dst`, positive integral `w`;
    * pass both orientations for an undirected graph; self-loops and
    * parallel edges tolerated — the closure min-folds them). Complete
    * whenever `2^rounds >= the longest shortest path's hop count`; fewer
    * rounds return the (well-defined) `<= 2^rounds`-hop distance matrix.
    */
  def run(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    var dist = Lineage.cut(
      edges
        .select(col("src"), col("dst"), col("w").cast("long").as("d"))
        .filter(col("src") =!= col("dst"))
        .groupBy("src", "dst")
        .agg(min(col("d")).as("d")))
    var sig = dist.agg(count(lit(1)), sum(col("d"))).head()
    var r = 0
    var fixed = false
    while (r < rounds && !fixed) {
      r += 1
      val hop = dist
        .join(
          dist.select(col("src").as("dst"), col("dst").as("far"), col("d").as("d2")),
          Seq("dst"))
        .select(col("src"), col("far").as("dst"), (col("d") + col("d2")).as("d"))
      dist = Lineage.cut(
        dist
          .union(hop)
          .filter(col("src") =!= col("dst"))
          .groupBy("src", "dst")
          .agg(min(col("d")).as("d")))
      val s = dist.agg(count(lit(1)), sum(col("d"))).head()
      fixed = s == sig
      sig = s
    }
    dist
  }
}
