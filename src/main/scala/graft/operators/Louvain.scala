package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous Louvain move phase (Blondel et al. 2008, the local-move
  * half of the method, in the synchronous formulation every distributed
  * Louvain uses): all nodes start in singleton communities and each round
  * EVERY node simultaneously evaluates the modularity gain of joining
  * each adjacent community and takes the best strictly-improving move.
  * Label propagation chases raw majorities; the Louvain move maximizes
  * modularity directly — it resists the giant-component collapse LP is
  * prone to, because joining a huge community is penalized by its total
  * degree.
  *
  * Determinism: for a fixed node i, comparing the gain of community C
  * against community D needs only the INTEGER score
  * `s(C) = 2m·e_i(C) − k_i·Σtot'(C)` (the shared A-side terms of the
  * textbook ΔQ cancel; Σtot'(C) excludes i itself when C is i's own
  * community — the "evaluate with i removed" convention), so the argmax
  * (score DESC, community id ASC) and the strict `s(best) > s(stay)`
  * move rule are integer-decided — hash-exact on any engine, no float
  * anywhere. Products stay in BIGINT while `2m·max_e` and
  * `k_max·Σtot_max` stay under 2⁶³ (~3·10⁹ directed edges); past that
  * the scores move to DECIMAL — a documented boundary, not a silent
  * wrap, since both factors are data-bounded counts.
  *
  * Oscillation control: a fully-synchronous move phase can livelock on
  * symmetric swaps (two mutually-best nodes trade communities every
  * round — the classic star/clique ping-pong). The standard distributed
  * remedy is a coloring schedule; here round r moves ONLY nodes with
  * `id % 2 == r % 2` (an alternating bipartition — deterministic,
  * engine-replayable, and sufficient because a swap needs both parties
  * to move in the same round).
  *
  * Scale shape per round: one probe of the cached symmetric edge frame
  * against the node-sized label frame (broadcast under
  * `broadcastNodesUpTo` — the [[Bfs]]/[[Coreness]] discipline; 0 = never,
  * for billion-node graphs), one map-side-combined (node, community)
  * edge count, one community-sized Σtot aggregate, and node-sized
  * argmax/relabel joins. Rounds cut their lineage ([[Lineage.cut]]).
  */
object Louvain {

  /** `(id, label)` after `rounds` synchronous move rounds over the
    * SYMMETRIC edge set `edges` (`src`, `dst`, NON-NEGATIVE ids — the
    * parity schedule reads `id % 2`; both orientations; self-loops
    * dropped).
    */
  def moveRounds(edges: DataFrame, rounds: Int, broadcastNodesUpTo: Long = 0L): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val base = edges.select(col("src"), col("dst")).filter(col("src") =!= col("dst"))
    // State carries each node's degree (constant) beside its label.
    var lab = Lineage.cut(
      base
        .groupBy("src")
        .agg(count(lit(1)).as("k"))
        .select(col("src").as("id"), col("src").as("c"), col("k")))
    // > 0 guard first (the Bfs discipline): bound 0 means "never" — don't
    // pay the count job on exactly the billion-node graphs it exists for.
    val bcastNodes = broadcastNodesUpTo > 0 && lab.count() <= broadcastNodesUpTo
    // src-partitioned only in broadcast-label mode (the Betweenness/
    // Coreness round-10 measurement, gated per the Bfs.run discipline):
    // with labels broadcast, each round's e_i(C) aggregate keys on
    // (src, cd) — hash(src) satisfies it by the subset rule — so the
    // edge-sized exchange disappears from every round. In shuffle mode
    // the per-round label join keys on dst and re-exchanges the frame
    // anyway, so the upfront layout is skipped.
    val sym = graft.Caches.track(
      (if (bcastNodes) base.repartition(col("src")) else base)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val m2 = sym.count()
    def maybeBcast(df: DataFrame): DataFrame = if (bcastNodes) broadcast(df) else df
    for (r <- 1 to rounds) {
      // e_i(C): edges from i into each adjacent community C.
      val cand = sym
        .join(maybeBcast(lab.select(col("id").as("dst"), col("c").as("cd"))), Seq("dst"))
        .groupBy(col("src"), col("cd"))
        .agg(count(lit(1)).as("e"))
      // Σtot(C): total degree of C's members.
      val stot = lab.groupBy(col("c")).agg(sum(col("k")).as("tot"))
      // Candidate scores: 2m·e − k_i·Σtot'(C), Σtot' excluding i when C
      // is i's own community.
      val scored = cand
        .join(maybeBcast(lab.select(col("id").as("src"), col("c").as("myc"), col("k"))), Seq("src"))
        .join(maybeBcast(stot.select(col("c").as("cd"), col("tot"))), Seq("cd"))
        .select(
          col("src"),
          col("cd"),
          col("myc"),
          col("k"),
          (lit(m2) * col("e") -
            col("k") * (col("tot") - when(col("cd") === col("myc"), col("k")).otherwise(lit(0L))))
            .as("s"))
      // A synthetic zero-edge own-community row per node makes ONE
      // aggregate decide everything: the stay score is the max over
      // own-community rows (the real e_i(A) row dominates the synthetic
      // one when it exists), and if the synthetic row wins the global
      // argmax the strict `best > stay` rule fails anyway — so best,
      // stay, and the relabel fuse into a single groupBy instead of two
      // extra node-sized joins per round.
      val own = lab
        .join(maybeBcast(stot), Seq("c"))
        .select(
          col("id").as("src"),
          col("c").as("cd"),
          col("c").as("myc"),
          col("k"),
          (-col("k") * (col("tot") - col("k"))).as("s"))
      lab = Lineage.cut(
        scored
          .select(col("src"), col("cd"), col("myc"), col("k"), col("s"))
          .union(own)
          .groupBy(col("src"))
          .agg(
            max(struct(col("s"), (-col("cd")).as("negc"))).as("m"),
            max(when(col("cd") === col("myc"), col("s"))).as("ss"),
            max(col("myc")).as("myc"),
            max(col("k")).as("k"))
          .select(
            col("src").as("id"),
            when(
              col("src") % 2 === lit(r % 2) && col("m.s") > col("ss"),
              -col("m.negc"))
              .otherwise(col("myc"))
              .as("c"),
            col("k")))
    }
    lab.select(col("id"), col("c").as("label"))
  }
}
