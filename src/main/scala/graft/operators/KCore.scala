package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Bounded k-core peeling over an undirected graph.
  *
  * Input is the SYMMETRIC edge frame `(u, v)` (every undirected edge
  * present in both directions, no duplicates), so a node's degree is its
  * row count as `u`. Each synchronous round drops every node whose current
  * degree is below `k` together with its incident edges — the standard
  * iterated-deletion semantics whose fixpoint is the k-core. Rounds are
  * FIXED (not run to convergence) so the result is a deterministic,
  * oracle-replayable function of (graph, k, rounds); a curation pipeline
  * uses the per-round survivor curve to pick the density cutoff before
  * committing to the full fixpoint.
  *
  * Scale shape: each round is one degree aggregation plus two semi-joins,
  * all keyed on node id — O(|E|) shuffle per round, the same budget as one
  * PageRank step. Survivor frames are persisted per round (each round and
  * two stats aggregates read them) and handed to [[graft.Caches.track]]
  * for release after the consuming action; nothing driver-side except the
  * final bounded stats rows.
  */
object KCore {

  /** Per-round survivor stats: `(round, n_nodes, n_edges)` for round 0
    * (the input graph) through `rounds`. `n_nodes` after round r counts
    * the nodes that met the degree bar in round r (some may have lost
    * their last edge when a neighbor was peeled — they peel next round);
    * `n_edges` counts undirected survivor edges.
    */
  def peelStats(sym: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    def stats(round: Int, nodes: DataFrame, edges: DataFrame): DataFrame = {
      val n = nodes.agg(count(lit(1)).as("n_nodes"))
      // Integer halving (the symmetric count is always even) — stays exact
      // past the 2^53 ceiling a double division would impose.
      val m = edges.agg(shiftright(count(lit(1)), 1).as("n_edges"))
      n.crossJoin(m).select(lit(round.toLong).as("round"), col("n_nodes"), col("n_edges"))
    }
    var cur = graft.Caches.track(sym.persist(StorageLevel.MEMORY_AND_DISK))
    val out = Seq.newBuilder[DataFrame]
    out += stats(0, cur.select("u").distinct(), cur)
    for (r <- 1 to rounds) {
      val keep = graft.Caches.track(
        cur
          .groupBy("u")
          .agg(count(lit(1)).as("d"))
          .filter(col("d") >= k)
          .select("u")
          .persist(StorageLevel.MEMORY_AND_DISK))
      val next = graft.Caches.track(
        cur
          .join(keep, Seq("u"), "left_semi")
          .join(keep.select(col("u").as("v")), Seq("v"), "left_semi")
          .select("u", "v")
          .persist(StorageLevel.MEMORY_AND_DISK))
      out += stats(r, keep, next)
      cur = next
    }
    out.result().reduce(_ unionByName _)
  }
}
