package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Triangle counting with degree-ordered orientation.
  *
  * Each undirected edge is directed from its lower to its higher endpoint
  * under the total order (degree, id); every triangle then has exactly one
  * node with two out-edges, so counting wedge closures
  * (e1: a→b, e2: b→c, closed by a→c) counts each triangle exactly once.
  *
  * The orientation is the scale insight, not a nicety: out-degrees in the
  * oriented graph are bounded by O(√m) even on power-law graphs, so the
  * wedge join — the quadratic-in-degree step that explodes on hub nodes
  * in the naive formulation — stays tractable. All steps are equi-joins
  * shuffled on node keys; the oriented edge list is persisted once and
  * reused by all three roles.
  */
object Triangles {

  /** Degree-ordered orientation of a distinct `(u, v)` (u < v) edge frame,
    * plus its sorted out-adjacency table — the shared front half of the
    * census AND of [[KTruss]]'s per-round support pass (one definition so
    * the subtle tie-break and the O(√m) out-degree bound cannot drift
    * between them). The oriented frame is persisted and Caches-tracked;
    * the adjacency holds exactly |E| entries across ≤|V| rows.
    */
  /** The orientation PLAN — no persist, no tracking — so a caller that
    * wants to SHARE the oriented frame across queries (the memoized
    * co-purchase orientation feeding both the census and the k-truss
    * peel) can lay it out and pin it under its own cache policy. The
    * tie-break lives only here; every consumer inherits it.
    */
  private[graft] def orientPlan(e: DataFrame): DataFrame = {
    val deg = e
      .select(col("u").as("x"))
      .union(e.select(col("v").as("x")))
      .groupBy("x")
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("d"))
    e
      .join(deg.withColumnRenamed("x", "u").withColumnRenamed("d", "du"), "u")
      .join(deg.withColumnRenamed("x", "v").withColumnRenamed("d", "dv"), "v")
      .withColumn(
        "u_first",
        col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")))
      .select(
        when(col("u_first"), col("u")).otherwise(col("v")).as("s"),
        when(col("u_first"), col("v")).otherwise(col("u")).as("t"))
  }

  /** Sorted out-adjacency of an oriented frame: exactly |E| entries
    * across ≤|V| rows.
    */
  private[graft] def adjacencyOf(oriented: DataFrame): DataFrame =
    oriented
      .groupBy("s")
      .agg(sort_array(collect_list(col("t"))).as("nbrs"))

  private[operators] def orientedAdjacency(
      e: DataFrame,
      partitionBySrc: Boolean = false): (DataFrame, DataFrame) = {
    // `partitionBySrc` lays the persisted frame out hash(s) BEFORE the
    // persist (single materialized copy) — [[KTruss]]'s round invariant:
    // with the edge frame hash(s)-partitioned, its per-round adjacency
    // groupBy(s), the support groupBy(s,t) (subset rule: hash(s)
    // satisfies the clustered distribution), and the (s,t) peel join
    // against the equally-hash(s) support frame all plan exchange-free.
    val plan = orientPlan(e)
    val oriented = (if (partitionBySrc) plan.repartition(col("s")) else plan)
      .persist(StorageLevel.MEMORY_AND_DISK)
      .transform(graft.Caches.track)
    (oriented, adjacencyOf(oriented))
  }

  /** @param edges distinct undirected edges as (u, v) with u < v.
    * @return one row: (n_edges, n_wedges, n_triangles).
    */
  def count(edges: DataFrame): DataFrame = {
    // The caller's edge build (often a self-join + distinct) feeds four
    // consumers (degree pass x2, orientation, edge count) — pay it once.
    val e = graft.Caches.track(edges.persist(StorageLevel.MEMORY_AND_DISK))
    countOriented(orientedAdjacency(e)._1)
  }

  /** The census over an ALREADY-oriented (and caller-persisted) edge
    * frame — the entry the memoized shared co-purchase orientation uses
    * so gr_triangles and gr_ktruss pay the degree-orientation build once
    * per session, not once per query. Orientation is 1:1 with the edge
    * set, so n_edges reads off the oriented frame directly.
    */
  def countOriented(oriented: DataFrame): DataFrame = {
    val adj = adjacencyOf(oriented)
    // The wedge COUNT is a per-node aggregate — sum of indeg·outdeg in the
    // oriented graph — never materialize the wedge stream just to count it.
    val outd = oriented
      .groupBy(col("s").as("x"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("od"))
    val ind = oriented
      .groupBy(col("t").as("x"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("id"))
    val nWedges = ind
      .join(outd, "x")
      .agg(coalesce(sum(col("id") * col("od")), lit(0L)).as("n_wedges"))
    // Closure pass, intersection form: triangles = Σ over oriented edges
    // (u→v) of |N⁺(u) ∩ N⁺(v)|. The wedge stream (49M rows at sf0.1 on
    // the co-purchase graph) is never enumerated through join machinery —
    // each edge does one sorted-array intersection, and orientation
    // bounds every adjacency array by O(√m), so no hub blowup. The
    // out-adjacency table holds exactly |E| entries across ≤|V| rows
    // (megabytes when the edge list is millions of rows), so both lookups
    // broadcast and the edge stream itself never shuffles; past broadcast
    // scale the same plan degrades to two key shuffles of the edge list.
    val closedPerEdge = oriented
      .join(broadcast(adj.select(col("s"), col("nbrs").as("nu"))), Seq("s"))
      .join(broadcast(adj.select(col("s").as("t"), col("nbrs").as("nv"))), Seq("t"))
      .select(size(array_intersect(col("nu"), col("nv"))).cast("long").as("c"))
    oriented
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n_edges"))
      .crossJoin(nWedges)
      .crossJoin(closedPerEdge.agg(coalesce(sum(col("c")), lit(0L)).as("n_triangles")))
  }
}
