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
  * is proportional to the frontier, not the graph. Frontier frames are
  * persisted per round; the visited set is lineage-CUT per round, because
  * it is referenced twice each hop (anti-join + union) and a lazy persist
  * would let the logical plan double per hop — 2^hops analyzer cost even
  * at a 3-hop bound (measured; see the note in [[run]]). Same discipline
  * as [[ConnectedComponents]], for a different reason: there the round
  * count is unbounded, here the per-round fan-out is 2.
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
    * back to the shuffle join that round. 0 (the default) skips the
    * per-round count and the broadcast; note the walk is NOT lazy either
    * way — the per-round visited cut below runs one eager materialization
    * job per hop regardless of this knob.
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
    // round. In shuffle-join mode the persist is src-PARTITIONED (the
    // round-10 edge-layout discipline: every hop probes the one cached
    // layout and only the frontier side exchanges); in broadcast-frontier
    // mode the edge frame never crosses an exchange anyway, so the
    // upfront repartition would be pure cost and is skipped.
    val eSel = edges.select(col("src"), col("dst"))
    val e = graft.Caches.track(
      (if (broadcastFrontierUpTo > 0) eSel else eSel.repartition(col("src")))
        .persist(StorageLevel.MEMORY_AND_DISK))
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
      // Lineage cut per round, NOT a lazy persist — BFS's visited set is
      // referenced TWICE per round (the anti-join above and the union
      // below), so without truncation the logical plan DOUBLES every hop:
      // 2^hops copies of the seed/edge upstream for the analyzer and the
      // cache-lookup canonicalizer to chew on. Measured on the near-dup
      // probe graph (whose upstream is the whole LSH chain): hop counts
      // of 2.1 s → 5.6 s → 19.0 s → 22.1 s on EMPTY frontiers — pure
      // driver-side analysis, zero executor work — vs flat ~0.5 s/hop
      // once cut. Same lesson as k-core: any loop whose round output is
      // referenced more than once downstream needs a real cut, however
      // small its round count. The eager cut job also fills `next`'s
      // cache (the union scans it), so broadcast-mode's count above reads
      // a warm cache — still one materializing job per round.
      visited = Lineage.cut(visited.unionByName(next))
      frontier = next
    }
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
  def runLabeled(
      edges: DataFrame,
      seeds: DataFrame,
      maxHops: Int,
      preLaidSrc: Option[DataFrame] = None): DataFrame = {
    // src-partitioned (the round-10 edge-layout discipline): each hop's
    // expansion probes this one cached layout, so only the (q, id)
    // frontier exchanges per round. `preLaidSrc` supplies it from a
    // session-shared memoized frame (the walk-family contract in
    // [[PageRank.run]]: same rows, hash(src), caller-persisted).
    val e = preLaidSrc.getOrElse(
      graft.Caches.track(
        edges
          .select(col("src"), col("dst"))
          .repartition(col("src"))
          .persist(StorageLevel.MEMORY_AND_DISK)))
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
      // Same double-reference plan doubling as [[run]] — cut, don't stack.
      visited = Lineage.cut(visited.unionByName(next))
      frontier = next
    }
    visited
  }
}
