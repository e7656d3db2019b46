package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Multi-source breadth-first search: minimum hop distance from a seed set,
  * bounded to `maxHops` rounds.
  *
  * Each round is one equi-join of the CURRENT FRONTIER against the edge
  * list plus an anti-join against the visited set — the standard
  * frontier-expansion formulation that ships only newly-reached node ids
  * per round (never the full distance table), so a round's shuffle volume
  * is proportional to the frontier, not the graph. Frontier and visited
  * frames are persisted per round and the superseded round's cache is
  * released; with a small fixed hop bound the lineage stays shallow, so no
  * checkpoint is needed (contrast [[ConnectedComponents]], whose
  * data-dependent round count requires lineage cuts).
  *
  * At 100 TB the dominant cost is the per-round frontier×edges shuffle on
  * `src` — pre-partitioning the edge list by `src` (bucketing in practice)
  * makes every round reuse that layout. Distances are exact minimum hops:
  * a node enters the visited set the first round it is seen and the
  * anti-join keeps later, longer paths from overwriting it.
  *
  * Input: `edges(src, dst)` (directed; pass both directions for an
  * undirected graph), `seeds(id)`. Output: `(id, dist)` for every node
  * within `maxHops` of a seed, seeds at dist 0.
  */
object Bfs {

  /** `broadcastFrontierUpTo`: when > 0, each round counts the (cached)
    * frontier — an O(cached-partitions) action — and BROADCASTS it into
    * the edge join while it stays at or under the threshold, so the
    * persisted edge frame is probed in place and never re-shuffled. This
    * is the same size-adaptive cutover as broadcast-join selection: BFS
    * frontiers on bounded-degree graphs stay far below any shuffle's
    * cost, while a web-graph frontier that outgrows the threshold falls
    * back to the shuffle join that round. 0 (the default) keeps the
    * fully-lazy single-job plan: no per-round action at all.
    *
    * Cost of the per-round count: NOT a wasted job. The broadcast
    * decision must exist at plan time, and the count runs on the PREVIOUS
    * round's persisted frontier — the same materialization the next
    * round's broadcast collect needs anyway, so the count's work (filling
    * the frontier cache) is on the critical path regardless; the marginal
    * overhead is one job LAUNCH per hop (~ms), not recompute. The
    * alternative that keeps the walk one job — let AQE convert the
    * shuffle join at runtime — still shuffle-writes the persisted edge
    * frame every round before the conversion kicks in, which is the exact
    * cost this knob exists to avoid.
    */
  def run(
      edges: DataFrame,
      seeds: DataFrame,
      maxHops: Int,
      broadcastFrontierUpTo: Long = 0L): DataFrame = {
    // Every round joins the same edge list — persist it once instead of
    // recomputing its upstream (often a distinct over a fact table) per
    // round.
    val e = graft.Caches.track(
      edges.select(col("src"), col("dst")).persist(StorageLevel.MEMORY_AND_DISK))
    var visited = graft.Caches.track(
      seeds
        .select(col("id"), lit(0L).as("dist"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK))
    var frontier = visited
    for (h <- 1 to maxHops) {
      // Alias both sides: from round 2 on the frontier's lineage contains
      // the edge frame itself, which trips DetectAmbiguousSelfJoin if
      // columns are addressed through the Dataset handles.
      val fSel = frontier.select(col("id").as("fid"))
      val fSide =
        if (broadcastFrontierUpTo > 0 && frontier.count() <= broadcastFrontierUpTo)
          broadcast(fSel)
        else fSel
      val next = graft.Caches.track(
        fSide
          .as("f")
          .join(e.as("g"), col("f.fid") === col("g.src"))
          .select(col("g.dst").as("id"))
          .distinct()
          .join(visited, Seq("id"), "left_anti")
          .select(col("id"), lit(h.toLong).as("dist"))
          .persist(StorageLevel.MEMORY_AND_DISK))
      visited = graft.Caches.track(
        visited.unionByName(next).persist(StorageLevel.MEMORY_AND_DISK))
      frontier = next
    }
    // No per-round materialization: with a small fixed hop bound, every
    // round's frame is persisted and LAZY — the caller's single consuming
    // action fills each cache on first touch (the anti-join and the union
    // both read the prior round's cached blocks, not its lineage), so the
    // whole walk is one job instead of one blocking count per hop. All
    // round frames stay registered in the ledger; the query wrapper
    // releases them once the consuming action completes. For an unbounded
    // or deep walk, re-introduce per-round materialization + eager release
    // (visited grows monotonically and holding every round would pin
    // O(hops · |V|) cache).
    visited
  }

  /** Per-source (labeled) BFS: minimum hop distance from EACH seed
    * separately — the primitive under per-source centralities (closeness,
    * harmonic) that the set-BFS above cannot express (it collapses the
    * seed set into one wavefront). State is keyed (q, id): the frontier
    * carries its source label through the edge join, and the visited
    * anti-join is on the composite key, so per-round shuffle volume is
    * Σ per-source frontiers — bounded by hops × average reach × |seeds|,
    * which is why callers bound BOTH the hop count and the seed set (a
    * full-graph all-sources BFS is quadratic by definition; sampled
    * sources is the standard estimator at scale).
    *
    * Input: `edges(src, dst)`, `seeds(q)` (each seed is its own source).
    * Output: `(q, id, dist)` per source, the seed itself at dist 0.
    */
  def runLabeled(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    val e = graft.Caches.track(
      edges.select(col("src"), col("dst")).persist(StorageLevel.MEMORY_AND_DISK))
    var visited = graft.Caches.track(
      seeds
        .select(col("q"), col("q").as("id"), lit(0L).as("dist"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK))
    var frontier = visited
    for (h <- 1 to maxHops) {
      val fSel = frontier.select(col("q").as("fq"), col("id").as("fid"))
      val next = graft.Caches.track(
        fSel
          .as("f")
          .join(e.as("g"), col("f.fid") === col("g.src"))
          .select(col("f.fq").as("q"), col("g.dst").as("id"))
          .distinct()
          .join(visited, Seq("q", "id"), "left_anti")
          .select(col("q"), col("id"), lit(h.toLong).as("dist"))
          .persist(StorageLevel.MEMORY_AND_DISK))
      visited = graft.Caches.track(
        visited.unionByName(next).persist(StorageLevel.MEMORY_AND_DISK))
      frontier = next
    }
    visited
  }
}
