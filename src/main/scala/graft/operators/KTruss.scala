package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Bounded k-truss peeling: iterated deletion of edges whose triangle
  * SUPPORT (number of triangles containing the edge) falls below k-2 —
  * the edge-cohesion sibling of [[KCore]]'s node-degree peel, and the
  * standard next step when a dedup/community graph needs pruning to its
  * strongly-cohesive skeleton (an edge in the k-truss is backed by k-2
  * independent witnesses, not one chance collision).
  *
  * Rounds are FIXED (not run to convergence) for the same reason as
  * k-core: the per-round survivor curve is a deterministic,
  * oracle-replayable function of (graph, k, rounds) that a curation
  * pipeline reads to pick the cohesion cutoff. A round that deletes no
  * edge proves the fixpoint (deletion is monotone) and the remaining
  * rounds' rows are synthesized driver-side.
  *
  * Scale shape (the r10 edge-layout rewrite): the graph is ORIENTED ONCE,
  * on the round-0 degree order ([[Triangles]]' O(√m) bound — the
  * hub-proof census), and every round peels the ORIENTED frame directly.
  * This is exact, not an approximation: an edge's support is its triangle
  * membership count, which no orientation can change, and a fixed total
  * order stays acyclic on every survivor subgraph, so each surviving
  * triangle keeps exactly one 2-out-edge apex. Survivor out-adjacencies
  * are SUBSETS of round-0's, so the O(√m₀) out-degree bound holds in
  * every round. What the fixed orientation deletes vs re-orienting: the
  * per-round degree aggregate (2|E| rows) and the two |E|-row
  * edge-degree joins the old formulation paid to rebuild the orientation
  * each round.
  *
  * The oriented frame is laid out hash(s) at its single persist and the
  * layout is a round invariant: per round, the adjacency `groupBy(s)` is
  * co-partitioned, the two adjacency lookups broadcast (map-side — the
  * adjacency table holds exactly |E| entries across ≤|V| rows; past
  * broadcast scale the same plan degrades to two key shuffles), the
  * exploded triple stream INHERITS hash(s) through the broadcast joins
  * so the support `groupBy(s, t)` satisfies its clustered distribution
  * on the subset rule with NO exchange, and the (s, t) peel join pairs
  * two hash(s) frames — also exchange-free: round 0 (the full graph,
  * which dominates a peel) and the round-1 peel run with no edge-sized
  * exchange and no triple-stream shuffle at all (support attribution is
  * the map-side explode + a local-key aggregate).
  *
  * Survivor rounds MUST [[Lineage.cut]], not lazily persist: support()
  * references its input ~3× (stream + two adjacency broadcasts) and the
  * peel join ~4×, so an uncut logical plan grows GEOMETRICALLY per
  * round — measured on the co-purchase graph: support over the 9,790
  * surviving round-2 edges took 14.1 s of pure Catalyst re-analysis
  * lazily-persisted vs ~1 s cut (KTrussProbe, round 11). The cut frames
  * report UnknownPartitioning, so rounds ≥ 2 re-exchange — the accepted
  * [[KCore]] trade: those graphs are the peeled survivors, orders of
  * magnitude smaller than round 0's.
  */
object KTruss {

  /** Per-round stats: `(round, n_edges, n_triangles)` for round 0 (the
    * input graph) through `rounds`. Round r peels every edge whose
    * support in round r-1's graph is below k-2, then re-censuses.
    *
    * @param edges distinct undirected edges as (u, v) with u < v.
    */
  def peelStats(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    val e = graft.Caches.track(
      edges.select(col("u"), col("v")).persist(StorageLevel.MEMORY_AND_DISK))
    // Orient once on the input graph ([[Triangles]]' shared front half —
    // same tie-break as the census), hash(s)-partitioned at the persist.
    peelStatsOriented(Triangles.orientedAdjacency(e, partitionBySrc = true)._1, k, rounds)
  }

  /** [[peelStats]] over an ALREADY-oriented `(s, t)` frame the caller
    * persisted (ideally hash(s)-partitioned — the layout invariant in the
    * object scaladoc): the entry the memoized shared co-purchase
    * orientation uses, so the census and the peel pay the orientation
    * once per session.
    */
  def peelStatsOriented(oriented: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 3, "k-truss needs k >= 3 (below that no edge can peel)")
    require(rounds >= 1, "rounds must be >= 1")
    val spark = oriented.sparkSession
    import spark.implicits._
    var cur = oriented

    /** Support per surviving ORIENTED edge: (s, t, supp), computed on the
      * hash(s) layout. Every triangle (s, t, c) with c ∈ N⁺(s) ∩ N⁺(t)
      * charges its three edges — and all three ARE oriented edges
      * ((s,t), (s,c), and (t,c), the last because c ∈ N⁺(t)) — so the
      * charge key is the oriented pair directly, no least/greatest
      * renormalization, and the whole pass is exchange-free on the
      * layout (see the object scaladoc).
      */
    def support(g: DataFrame): DataFrame = {
      val adj = g.groupBy("s").agg(sort_array(collect_list(col("t"))).as("nbrs"))
      val triples = g
        .join(broadcast(adj.select(col("s"), col("nbrs").as("nu"))), Seq("s"))
        .join(broadcast(adj.select(col("s").as("t"), col("nbrs").as("nv"))), Seq("t"))
        .select(col("s"), col("t"), explode(array_intersect(col("nu"), col("nv"))).as("c"))
      triples
        .select(explode(array(
          struct(col("s"), col("t")),
          struct(col("s"), col("c").as("t")),
          struct(col("t").as("s"), col("c").as("t"))))
          .as("e"))
        .select(col("e.s").as("s"), col("e.t").as("t"))
        .groupBy("s", "t")
        .agg(count(lit(1)).as("supp"))
    }

    val out = Seq.newBuilder[(Long, Long, Long)]
    // Round 0: census of the input. supp sums to 3 × triangles exactly.
    var supp = graft.Caches.track(support(cur).persist(StorageLevel.MEMORY_AND_DISK))
    val r0 = cur
      .agg(count(lit(1)).as("e"))
      .crossJoin(supp.agg(coalesce(sum(col("supp")), lit(0L)).as("s3")))
      .head()
    var curEdges = r0.getLong(0)
    out += ((0L, curEdges, r0.getLong(1) / 3))
    var r = 1
    var fixed = false
    // Observed metrics only surface in localCheckpoint mode; see
    // [[Lineage.metricsRideCut]].
    val rideCut = Lineage.metricsRideCut(spark)
    while (r <= rounds && !fixed) {
      val obs =
        if (rideCut) Some(org.apache.spark.sql.Observation(s"ktruss_r${r}_${System.nanoTime()}"))
        else None
      val peeled = cur
        .join(supp, Seq("s", "t"), "left")
        .filter(coalesce(col("supp"), lit(0L)) >= (k - 2).toLong)
        .select(col("s"), col("t"))
      // HARD cut per round (see the object scaladoc: support/peel embed
      // their input 3–4×, so a lazy persist blows the plan up
      // geometrically); the survivor count rides the cut's own
      // materializing action (the KCore barrier discipline).
      val next = Lineage.cut(
        obs.map(o => peeled.observe(o, count(lit(1)).as("edges"))).getOrElse(peeled))
      val nextEdges = obs
        .flatMap(o => Lineage.observed(o, "edges"))
        .map(_.asInstanceOf[Long])
        .getOrElse(next.count())
      val nextSupp = graft.Caches.track(support(next).persist(StorageLevel.MEMORY_AND_DISK))
      val s3 = nextSupp
        .agg(coalesce(sum(col("supp")), lit(0L)))
        .head()
        .getLong(0)
      out += ((r.toLong, nextEdges, s3 / 3))
      // Fixpoint: a round that deletes NOTHING leaves supports — hence
      // every later round — bit-identical; synthesize the rest.
      if (nextEdges == curEdges) {
        fixed = true
        for (rr <- (r + 1) to rounds) out += ((rr.toLong, nextEdges, s3 / 3))
      }
      curEdges = nextEdges
      cur = next
      supp = nextSupp
      r += 1
    }
    out.result().toDF("round", "n_edges", "n_triangles")
  }
}
