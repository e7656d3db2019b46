package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Sampled betweenness centrality (Brandes' dependency accumulation from
  * a source SAMPLE — the standard estimator; exact Brandes is
  * all-sources and quadratic) with every score an exact BIGINT:
  * the pair dependency σ_sv/σ_sw·(1+δ) is kept in fixed-point via
  * `Δ(v) = Σ_w floor(σ(v)·(SCALE + Δ(w)) / σ(w))`, so the accumulation
  * is integer on both engines — no float-summation order to tolerate —
  * and the DuckDB oracle unrolls the identical rounds.
  *
  * Forward phase: [[Bfs]]-style frontier expansion, but each frontier
  * row carries the shortest-path COUNT σ (sum of predecessor σ —
  * order-free BIGINT); a round ships only newly-reached (source, node,
  * σ) rows. Backward phase: one join per level from the deepest frontier
  * back, each a (level ⋈ edges ⋈ next-level-Δ) aggregate — frontier-
  * proportional shuffles throughout, never graph² anywhere. Per-round
  * [[Lineage.cut]] caps plan growth (the k-core lesson).
  *
  * Input: symmetric `edges(src, dst)`, `sources(id)`. Output per node
  * reached at depth 1..hops−1 from any sampled source with a non-zero
  * dependency: `(id, n_contrib, bc_scaled)` where bc_scaled sums the
  * fixed-point dependencies over sources.
  *
  * Lineage policy (the [[Bfs]] round-7 lesson): the LEVEL chain is a
  * lazy persist per round — each level references its predecessor once,
  * so depth is `hops` and a checkpoint would only add jobs — but the
  * VISITED set and the backward Δ frame are each referenced twice per
  * round (anti-join + union; join + fill-join), which doubles the
  * logical plan per round if persisted lazily: 2^hops copies of the
  * edge-list upstream for the analyzer even at a 3-hop bound (measured
  * 34.5 s on the probe graph, pure driver time). Those two frames are
  * [[Lineage.cut]] per round; the cut's materialization also fills the
  * level caches the next round reads.
  */
object Betweenness {

  val Scale = 1000000L

  /** `broadcastStateUpTo`: when > 0, each per-source state frame (a
    * level, the visited set, the backward Δ table) is counted and
    * BROADCAST into its join while at or under the threshold (the
    * [[Bfs.run]] `broadcastFrontierUpTo` shape). MEASURED at bench scale
    * (1.18M-edge graph, 16 sources, sf0.1, local[32]): the states reach
    * ~|sources|×|V| ≈ 1M rows and broadcasting them LOSES to the shuffle
    * plan at every gate tried (4M: 8.2 s vs 6.8; 200k: 7.3 vs 5.5) —
    * collect+rebuild of a million-row hash relation per round costs more
    * than the exchanges it saves. Default 0 (shuffle) is therefore the
    * SHIPPED config; the knob exists for few-source walks on
    * bounded-reach graphs where the state genuinely stays small.
    *
    * What did win (same measurement): pre-partitioning the edge frame by
    * `src` — all five per-round joins probe that one layout, so only the
    * state side of each join shuffles. One upfront exchange of the edge
    * list (~1 s) buys back ~20–30% of the walk (5.5–6.7 s vs
    * 7.2–10.9 s); at 100 TB this is the bucketed-edges layout a
    * production graph table would already have.
    */
  def scaledBrandes(
      edges: DataFrame,
      sources: DataFrame,
      hops: Int,
      broadcastStateUpTo: Long = 0L,
      preLaidSrc: Option[DataFrame] = None): DataFrame = {
    // `preLaidSrc`: the same edges hash(src)-partitioned and persisted by
    // the caller (session-shared layout, not re-tracked here) — the
    // walk-family contract in [[PageRank.run]].
    val e = preLaidSrc.getOrElse(
      graft.Caches.track(
        edges
          .select(col("src"), col("dst"))
          .repartition(col("src"))
          .persist(StorageLevel.MEMORY_AND_DISK)))
    def gated(state: DataFrame): DataFrame =
      if (broadcastStateUpTo > 0 && state.count() <= broadcastStateUpTo) broadcast(state)
      else state
    var levels = Vector(
      graft.Caches.track(
        sources
          .select(col("id").as("q"), col("id"), lit(1L).as("sg"))
          .persist(StorageLevel.MEMORY_AND_DISK)))
    // Incremental CUT visited set instead of re-unioning every level's
    // plan each round (which embeds level h-1 twice and goes 2^h).
    var visited = levels.head.select("q", "id")
    for (h <- 1 to hops) {
      val next = graft.Caches.track(
        gated(levels.last)
          .join(e, col("id") === col("src"))
          .select(col("q"), col("dst").as("nid"), col("sg"))
          .join(
            gated(visited.select(col("q"), col("id").as("nid"))),
            Seq("q", "nid"),
            "left_anti")
          .groupBy("q", "nid")
          .agg(sum("sg").as("sg"))
          .select(col("q"), col("nid").as("id"), col("sg"))
          .persist(StorageLevel.MEMORY_AND_DISK))
      levels = levels :+ next
      if (h < hops) // the final round's visited set has no consumer
        visited = Lineage.cut(visited.unionByName(next.select("q", "id")))
    }
    // Backward dependency accumulation, deepest level first. A node with
    // no successors in the BFS DAG keeps Δ = 0 (the left join's fill).
    var deltaNext = levels(hops).select(col("q"), col("id"), col("sg"), lit(0L).as("delta"))
    var contribs = Vector.empty[DataFrame]
    for (r <- (hops - 1) to 1 by -1) {
      val d = graft.Caches.track(
        gated(levels(r))
          .join(e, col("id") === col("src"))
          .select(col("q"), col("id"), col("sg"), col("dst").as("wid"))
          .join(
            gated(deltaNext.select(
              col("q"),
              col("id").as("wid"),
              col("sg").as("w_sg"),
              col("delta").as("w_delta"))),
            Seq("q", "wid"))
          .groupBy("q", "id")
          .agg(
            sum(expr(s"(sg * ($Scale + w_delta)) div w_sg")).as("delta"))
          .persist(StorageLevel.MEMORY_AND_DISK))
      contribs = contribs :+ d
      // Cut: Δ_r is referenced by BOTH next round's aggregate and the
      // contribs union — lazily persisted it would stack levels(r)+d into
      // every later round's plan. The round r = 1 has no next consumer,
      // so its Δ (and the cut's materialization job) is skipped entirely.
      if (r > 1)
        deltaNext = Lineage.cut(
          levels(r)
            .join(d.select(col("q"), col("id"), col("delta")), Seq("q", "id"), "left")
            .na.fill(0L, Seq("delta"))
            .select(col("q"), col("id"), col("sg"), col("delta")))
    }
    contribs
      .reduce(_ union _)
      .groupBy("id")
      .agg(count(lit(1)).as("n_contrib"), sum("delta").as("bc_scaled"))
      .filter(col("bc_scaled") > 0)
  }
}
