package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Borůvka minimum spanning forest under the strict total order
  * `(w, u, v)`, fixed synchronous rounds — the classic parallel MST: each
  * round every component elects its minimum incident outgoing edge, the
  * elected edges join the forest (tie-broken lexicographically, the
  * elected set is cycle-free — the standard distinct-weights argument,
  * which the composite order restores for arbitrary weights), and the
  * touched components contract. Components at least HALVE per round, so
  * `ceil(log2 n)` rounds complete the forest regardless of graph
  * diameter — the property that makes Borůvka the distributed MST of
  * choice over Prim/Kruskal's sequential frontiers. Because the MSF under
  * a strict total order is UNIQUE, the output is a deterministic function
  * of the edge set alone (round schedule does not matter), which is what
  * lets the oracle verify it by the cut property (Kruskal's
  * characterization) instead of replaying rounds.
  *
  * Over a near-dup/similarity graph with distance weights, the MSF is the
  * single-linkage dendrogram: cutting it at distance t yields exactly the
  * t-threshold connected components for EVERY t at once — one artifact
  * answering the whole threshold sweep that `dd_threshold` prices pair by
  * pair.
  *
  * Scale shape: rounds walk only the LIVE contracted subgraph (the k-core
  * discipline). Per round: one O(live) union + min-aggregate keyed by
  * component (the election), one small distinct over the elected edges
  * (at most one per component), a connected-components contraction over
  * the COMPONENT-sized elected graph (node count halves every round; at
  * any realistic scale past round 1 this rides
  * [[ConnectedComponents]]'s single-task union-find branch), and two
  * relabel joins over the live edges. Inter-component multi-edges are
  * NOT pre-deduplicated: the min-aggregate election already picks one
  * representative per component pair lazily, so a dedup shuffle would
  * pay O(live) to save the election nothing. Barrier budget: two cut
  * frames per round (elected edges — consumed by the forest union, the
  * contraction, and implicitly the relabel; and the relabeled live
  * subgraph), plus the contraction's own internal cut; an exhausted live
  * frame short-circuits the remaining rounds via a cheap limit-1 probe
  * on the just-checkpointed frame.
  */
object Boruvka {

  /** Minimum spanning forest of the undirected multigraph `edges`
    * (columns `u`, `v`, `w`, castable to long; one row per edge, either
    * orientation, self-loops ignored) under the order `(w, u, v)`.
    *
    * @return `(u, v, w)` — the forest's edge rows, exactly as input.
    *         Complete whenever `rounds >= ceil(log2 n)`; fewer rounds
    *         return the (well-defined) partial forest of the rounds run.
    */
  def run(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    // Live edges carry their endpoints' CURRENT component labels; round 0
    // components are the nodes themselves.
    var live = Lineage.cut(
      edges
        .select(
          col("u").cast("long").as("u"),
          col("v").cast("long").as("v"),
          col("w").cast("long").as("w"))
        .filter(col("u") =!= col("v"))
        .withColumn("cu", col("u"))
        .withColumn("cv", col("v")))
    var forest: Option[DataFrame] = None
    var r = 0
    var done = false
    while (r < rounds && !done) {
      r += 1
      // Election: every component with an incident live edge picks its
      // minimum (w, u, v) edge. The struct carries both endpoints' labels
      // so the contraction needs no join back against the live frame.
      val e = struct(col("w"), col("u"), col("v"), col("cu"), col("cv")).as("e")
      val elected = Lineage.cut(
        live
          .select(col("cu").as("c"), e)
          .union(live.select(col("cv").as("c"), e))
          .groupBy("c")
          .agg(min(col("e")).as("m"))
          .select(
            col("m").getField("w").as("w"),
            col("m").getField("u").as("u"),
            col("m").getField("v").as("v"),
            col("m").getField("cu").as("cu"),
            col("m").getField("cv").as("cv"))
          .distinct())
      forest = Some(
        forest
          .map(_.union(elected.select("u", "v", "w")))
          .getOrElse(elected.select("u", "v", "w")))
      if (r < rounds) {
        // Contract: merged component labels = connected components of the
        // COMPONENT graph under the elected edges. Every component with a
        // live edge elected one, so every live cu/cv appears — the
        // relabel joins are total (inner).
        val merged = ConnectedComponents
          .run(elected.select(col("cu").as("src"), col("cv").as("dst")))
        val next = Lineage.cut(
          live
            .join(merged.select(col("node").as("cu"), col("comp").as("ncu")), Seq("cu"))
            .join(merged.select(col("node").as("cv"), col("comp").as("ncv")), Seq("cv"))
            .filter(col("ncu") =!= col("ncv"))
            .select(col("u"), col("v"), col("w"), col("ncu").as("cu"), col("ncv").as("cv")))
        live = next
        // Fixpoint: no inter-component edge survives — the forest is the
        // complete MSF; remaining rounds would elect nothing.
        done = live.isEmpty
      }
    }
    forest.get
  }
}
