package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core decomposition by h-index iteration (Lü, Zhou, Zhang, Stanley,
  * "The H-index of a network node", 2016): every node starts at its
  * degree and repeatedly replaces its value with the H-index of its
  * neighbors' current values — the largest `h` such that at least `h`
  * neighbors hold values `>= h`. The sequence is monotone non-increasing
  * per node and converges to the node's CORE NUMBER (the largest k such
  * that the node survives the k-core peel), so this computes the whole
  * coreness spectrum at once where [[KCore]] answers one fixed k — the
  * decomposition a curation pipeline reads off for influence ranking,
  * degeneracy-ordered sampling, and dense-region discovery.
  *
  * Why this formulation scales: the textbook peel removes ONE minimum-
  * degree node at a time (inherently sequential, O(n) rounds); the
  * h-index iteration is a synchronous per-node local update — one
  * neighbor-value join + one per-node H-index aggregate per round — and
  * converges in few rounds on real graphs (bounded by the graph's
  * coreness range, empirically near-constant). The H-index itself is
  * computed distributively over the compressed value multiset:
  * `H = max over distinct neighbor values d of min(d, #values >= d)` — a
  * map-side-combined (node, value) count, a node-keyed running sum over
  * the distinct values descending, and a max aggregate, so the sorted
  * exchange carries one row per (node, distinct value), not one per
  * neighbor; the result is an exact integer, deterministic under any
  * partitioning.
  *
  * All-integer arithmetic — hash-exact on any engine. Rounds cut their
  * lineage ([[Lineage.cut]]) and short-circuit at the fixpoint: the value
  * sum is monotone non-increasing and strictly decreases while any node
  * changes, so an unchanged sum proves convergence (one cheap aggregate
  * per round on the cached cut frame — the [[Scc]] barrier budget).
  */
object Coreness {

  /** `(id, h)` for every node of the SYMMETRIC edge set `edges`
    * (`src`, `dst`; pass both orientations) that carries at least one
    * NON-loop edge — self-loops never count toward a core number and are
    * dropped first, so a node whose only edges are self-loops is absent
    * from the output: `h` is the node's value after at most `rounds`
    * h-index iterations — the exact core number wherever the iteration
    * converged (guaranteed for `rounds` >= the convergence depth; the
    * truncated iterate is itself a well-defined monotone upper bound and
    * is what a fixed-round oracle replays).
    *
    * `broadcastNodesUpTo`: the per-round neighbor-value join pairs the
    * EDGE frame with the NODE-sized value frame — when the node count
    * (constant across rounds, probed once) is at most this bound, the
    * value frame broadcasts and every round is a map-side probe of the
    * cached edges plus one compressed-count shuffle, instead of
    * re-exchanging the full edge frame per round (the
    * [[Bfs]] `broadcastFrontierUpTo` discipline; 0 = never, for
    * billion-node graphs).
    */
  def run(edges: DataFrame, rounds: Int, broadcastNodesUpTo: Long = 0L): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    // Self-loops never count toward the core number (the peel removes a
    // node WITH its loop) — drop them like every sibling operator does.
    val base = edges.select(col("src"), col("dst")).filter(col("src") =!= col("dst"))
    var h = Lineage.cut(
      base.groupBy("src").agg(count(lit(1)).as("h")).select(col("src").as("id"), col("h")))
    // coalesce: sum over an EMPTY node frame is null, not 0.
    var sig = h.agg(coalesce(sum(col("h")), lit(0L))).head().getLong(0)
    // > 0 guard first (the Bfs discipline): bound 0 means "never" — don't
    // pay the count job on exactly the billion-node graphs it exists for.
    val bcastNodes = broadcastNodesUpTo > 0 && h.count() <= broadcastNodesUpTo
    // src-PARTITIONED only in broadcast-node mode (the Betweenness
    // round-10 measurement, gated per the Bfs.run discipline): with the
    // node side broadcast, every round's whole chain keys on src — the
    // (src, nh) count aggregate (subset rule: hash(src) satisfies the
    // clustered distribution), the per-src window, and the final h
    // aggregate — so rounds plan with ZERO exchanges after this one
    // upfront layout. In shuffle mode the per-round join keys on dst and
    // would re-exchange the frame anyway, so the upfront layout would be
    // pure cost there and is skipped.
    val sym = graft.Caches.track(
      (if (bcastNodes) base.repartition(col("src")) else base)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    var r = 0
    var fixed = false
    // The fixpoint signature rides the cut's own materializing action
    // (the KCore barrier discipline): one real job per round, not two.
    // In reliable-checkpoint mode metrics cannot surface from a cut —
    // fall back to the cheap cached aggregate.
    val rideCut = Lineage.metricsRideCut(edges.sparkSession)
    while (r < rounds && !fixed) {
      r += 1
      val hSide = h.select(col("id").as("dst"), col("h").as("nh"))
      val nb = sym
        .join(if (bcastNodes) broadcast(hSide) else hSide, Seq("dst"))
        .select(col("src"), col("nh"))
      // H-index over the COMPRESSED value multiset: H = max over the
      // node's distinct neighbor values d (descending) of
      // min(d, #neighbors with value >= d) — the same integer as ranking
      // every neighbor row, but the sort/window runs over (node, distinct
      // value) pairs (bounded by the node's value RANGE, not its degree),
      // so a hub with a million same-valued neighbors contributes one row
      // to the exchange, not a million. The map-side-combined count
      // aggregate does the compression before anything shuffles.
      val cnt = nb.groupBy("src", "nh").agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("src").orderBy(col("nh").desc)
      val next = cnt
        .withColumn("cum", sum(col("c")).over(w))
        .groupBy("src")
        .agg(max(least(col("nh"), col("cum"))).as("h"))
        .select(col("src").as("id"), col("h"))
      val obs =
        if (rideCut) Some(org.apache.spark.sql.Observation(s"coreness_r${r}_${System.nanoTime()}"))
        else None
      h = Lineage.cut(
        obs
          .map(o => next.observe(o, coalesce(sum(col("h")), lit(0L)).as("sh")))
          .getOrElse(next))
      val s = obs
        .flatMap(o => Lineage.observed(o, "sh"))
        .map(_.asInstanceOf[Long])
        .getOrElse(h.agg(coalesce(sum(col("h")), lit(0L))).head().getLong(0))
      fixed = s == sig
      sig = s
    }
    h
  }
}
