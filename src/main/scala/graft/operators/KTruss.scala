package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
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
  * Scale shape per round: one degree-ordered orientation ([[Triangles]]'
  * O(√m) out-degree bound — the hub-proof census), one adjacency
  * intersection that ENUMERATES the triangle triples (output-bound:
  * support attribution needs each triangle charged to its three edges,
  * so the triple stream is the honest minimum), one explode(3) +
  * groupBy on the normalized edge key, and one left join back to the
  * edge list. Everything is keyed on node/edge ids; nothing is
  * all-pairs. Each round's survivor frame is [[Lineage.cut]] (the edge
  * frame feeds four consumers per round — degrees twice, orientation,
  * support join — and the round count is data-bounded), with the edge
  * count riding the cut's materializing action via `observe()` (the
  * KCore barrier discipline: one real job per round).
  */
object KTruss {

  /** Per-round stats: `(round, n_edges, n_triangles)` for round 0 (the
    * input graph) through `rounds`. Round r peels every edge whose
    * support in round r-1's graph is below k-2, then re-censuses.
    *
    * @param edges distinct undirected edges as (u, v) with u < v.
    */
  def peelStats(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 3, "k-truss needs k >= 3 (below that no edge can peel)")
    require(rounds >= 1, "rounds must be >= 1")
    val spark = edges.sparkSession
    import spark.implicits._

    var cur = graft.Caches.track(
      edges.select(col("u"), col("v")).persist(StorageLevel.MEMORY_AND_DISK))

    /** Support per surviving edge: (u, v, supp), PLUS the triangle count.
      * One orientation + one adjacency intersection ([[Triangles]]'
      * shared front half — same tie-break, same O(√m) bound); the triple
      * stream is exploded into its three edge roles and re-normalized to
      * (u < v).
      */
    def support(e: DataFrame): DataFrame = {
      val (oriented, adj) = Triangles.orientedAdjacency(e)
      // Triple stream (s, t, c): c ranges over N+(s) ∩ N+(t). Each triple
      // is one triangle, charged to its three undirected edges.
      val triples = oriented
        .join(broadcast(adj.select(col("s"), col("nbrs").as("nu"))), Seq("s"))
        .join(broadcast(adj.select(col("s").as("t"), col("nbrs").as("nv"))), Seq("t"))
        .select(col("s"), col("t"), explode(array_intersect(col("nu"), col("nv"))).as("c"))
      triples
        .select(explode(array(
          struct(least(col("s"), col("t")).as("u"), greatest(col("s"), col("t")).as("v")),
          struct(least(col("s"), col("c")).as("u"), greatest(col("s"), col("c")).as("v")),
          struct(least(col("t"), col("c")).as("u"), greatest(col("t"), col("c")).as("v"))))
          .as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .groupBy("u", "v")
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
      val obs = if (rideCut) Some(Observation(s"ktruss_r${r}_${System.nanoTime()}")) else None
      val peeled = cur
        .join(supp, Seq("u", "v"), "left")
        .filter(coalesce(col("supp"), lit(0L)) >= (k - 2).toLong)
        .select(col("u"), col("v"))
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
