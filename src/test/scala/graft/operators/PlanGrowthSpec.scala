package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Regression guard for the round-7 structural find: iterative operators
  * whose round output is referenced MORE THAN ONCE downstream (BFS's
  * visited set in anti-join + union, Brandes' Δ in aggregate + fill-join,
  * MMR's picked set in union + join + anti-join) must lineage-cut that
  * frame per round, or the LOGICAL plan grows k^rounds and Catalyst
  * analysis dominates wall time (measured: 19 s hops on EMPTY frontiers).
  *
  * The guard is structural, not timed: run each operator DEEP (more
  * rounds than any production caller) and assert the final analyzed plan
  * stays under a node budget that a doubling chain would blow past by
  * orders of magnitude. Node counts are deterministic — no flakiness.
  */
class PlanGrowthSpec extends SparkSpec {

  private def planNodes(df: DataFrame): Int = {
    var n = 0
    df.queryExecution.analyzed.foreach(_ => n += 1)
    n
  }

  private def edges: DataFrame = {
    import spark.implicits._
    // A long path graph so deep walks genuinely have work at every hop.
    (0L until 200L).map(i => (i, i + 1)).toDF("src", "dst")
  }

  test("Bfs.run at 12 hops keeps an O(1) analyzed plan (visited is cut per round)") {
    import spark.implicits._
    val seeds = Seq(0L).toDF("id")
    val out = Bfs.run(edges, seeds, maxHops = 12)
    val n = planNodes(out)
    // Doubling (pre-fix) reaches ~2^12 * base ≈ 10^5 nodes; the cut keeps
    // the final plan a flat scan-of-checkpoint + trivial projections.
    assert(n < 60, s"Bfs plan grew to $n nodes — visited lineage is stacking again")
    assert(out.count() == 13L, "walk correctness: 12 hops down the path + seed")
    graft.Caches.releaseAll()
  }

  test("Bfs.runLabeled at 10 hops keeps an O(1) analyzed plan") {
    import spark.implicits._
    val seeds = Seq(0L, 5L).toDF("q")
    val out = Bfs.runLabeled(edges, seeds, maxHops = 10)
    val n = planNodes(out)
    assert(n < 60, s"labeled Bfs plan grew to $n nodes")
    assert(out.count() == 22L, "11 rows per source (seed + 10 hops)")
    graft.Caches.releaseAll()
  }

  test("PageRank past RoundCutEvery exercises the indexed cut and stays correct") {
    import spark.implicits._
    // 10 iterations > Lineage.RoundCutEvery (8): the cut branch that no
    // production caller reaches must still preserve the rank chain.
    assert(Lineage.RoundCutEvery < 10, "test must cross the cut boundary")
    val ring = (0L until 20L).map(i => (i, (i + 1) % 20L)).toDF("src", "dst")
    val out = PageRank.run(ring, damping = 0.85, iterations = 10)
    val rows = out.collect()
    assert(rows.length == 20)
    // On a directed ring every node is symmetric: uniform ranks, total 1.
    val prs = rows.map(_.getDouble(1))
    assert(math.abs(prs.sum - 1.0) < 1e-9, s"rank mass leaked: ${prs.sum}")
    assert(prs.forall(p => math.abs(p - 0.05) < 1e-12), "ring ranks must be uniform")
    // And the final plan is flat — the cut at round 8 truncated the chain.
    var n = 0
    out.queryExecution.analyzed.foreach(_ => n += 1)
    assert(n < 80, s"PageRank plan grew to $n nodes despite the round cut")
    graft.Caches.releaseAll()
  }

  test("Mis/TopoLayers/Coloring at 12 rounds keep O(rounds) analyzed plans") {
    import spark.implicits._
    // Each round references its undecided frame 3× — uncut that is a
    // 3^12 plan; the cut keeps the output a flat union of per-round
    // checkpoint scans (linear in rounds).
    val half = (0L until 50L).map(i => (i, i + 1)).toDF("u", "v")
    val sym = half.unionByName(half.select(col("v").as("u"), col("u").as("v")))
    for (
      (name, out) <- Seq(
        "Mis" -> Mis.run(sym, rounds = 12),
        "TopoLayers" -> TopoLayers.run(half, rounds = 12),
        "Coloring" -> Coloring.run(half, rounds = 12),
        "Matching" -> Matching.run(half, rounds = 12))
    ) {
      val n = planNodes(out)
      assert(n < 300, s"$name plan grew to $n nodes — round lineage is stacking again")
      assert(out.count() == 51L, s"$name must report every node")
      graft.Caches.releaseAll()
    }
  }

  test("Boruvka at deep rounds keeps an O(rounds) analyzed plan") {
    import spark.implicits._
    // A path with ascending weights forces maximal round depth for the
    // node count (components merge pairwise); each round references its
    // live frame 3× (election union ×2 + relabel) and the contraction
    // nests a ConnectedComponents run — uncut, the plan is exponential
    // in rounds. The cut keeps the output a flat union of per-round
    // checkpoint scans.
    val edges = (0L until 100L).map(i => (i, i + 1, i)).toDF("u", "v", "w")
    val out = Boruvka.run(edges, rounds = 10)
    val n = planNodes(out)
    assert(n < 300, s"Boruvka plan grew to $n nodes — round lineage is stacking again")
    assert(out.count() == 100L, "path MSF keeps every edge")
    graft.Caches.releaseAll()
  }

  test("Apsp min-plus doubling keeps an O(rounds) analyzed plan") {
    import spark.implicits._
    // A directed weighted cycle: the closure keeps improving distances
    // until every pair is closed, so no early fixpoint before the round
    // bound; each round references `dist` three times (self-join twice +
    // union) — uncut the plan TRIPLES per round.
    val edges = (0L until 33L).map(i => (i, (i + 1) % 33, 1L + (i % 5))).toDF("src", "dst", "w")
    val out = Apsp.run(edges, rounds = 6)
    val n = planNodes(out)
    assert(n < 250, s"Apsp plan grew to $n nodes — closure lineage is stacking again")
    assert(out.count() == 33L * 32L, "cycle closes every ordered pair")
    graft.Caches.releaseAll()
  }

  test("Coreness h-index rounds keep an O(rounds) analyzed plan") {
    import spark.implicits._
    // A long path converges slowly enough to keep all rounds live; each
    // round references `h` twice (neighbor join + signature) and nests a
    // window — uncut the plan compounds per round.
    val edges = (0L until 60L).map(i => (i, i + 1))
    val sym = edges.toDF("src", "dst").union(edges.toDF("dst", "src").select(col("src"), col("dst")))
    val out = Coreness.run(sym, rounds = 10)
    val n = planNodes(out)
    assert(n < 250, s"Coreness plan grew to $n nodes — round lineage is stacking again")
    assert(out.count() == 61L)
    graft.Caches.releaseAll()
  }

  test("Louvain move rounds keep an O(rounds) analyzed plan") {
    import spark.implicits._
    // A ring of cliques keeps moves happening across rounds; each round
    // references `lab` four times (cand, scored, own, stot) — uncut the
    // plan grows 4^rounds.
    val edges = (0L until 8L).flatMap { c =>
      val base = c * 4
      (for (u <- 0L until 4L; v <- (u + 1) until 4L) yield (base + u, base + v)) :+
        ((base + 3, (base + 4) % 32))
    }
    val sym = edges.toDF("src", "dst").union(edges.toDF("dst", "src").select(col("src"), col("dst")))
    val out = Louvain.moveRounds(sym, rounds = 8)
    val n = planNodes(out)
    assert(n < 250, s"Louvain plan grew to $n nodes — round lineage is stacking again")
    assert(out.count() == 32L)
    graft.Caches.releaseAll()
  }

  test("Scc path-doubling closure keeps an O(rounds) analyzed plan") {
    import spark.implicits._
    // A directed cycle forces the closure to keep growing (n² pairs), so
    // no early fixpoint before the round bound; each round references
    // `reach` twice (self-join + union) — uncut that doubles the plan per
    // round.
    val edges = (0L until 40L).map(i => (i, (i + 1) % 40)).toDF("src", "dst")
    val out = Scc.run(edges, rounds = 6)
    val n = planNodes(out)
    assert(n < 250, s"Scc plan grew to $n nodes — closure lineage is stacking again")
    assert(out.as[(Long, Long)].collect().forall(_._2 == 0L), "cycle is one SCC")
    graft.Caches.releaseAll()
  }

  test("Betweenness plan growth is polynomial in hops, not exponential") {
    import spark.implicits._
    val sym = edges.unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
    val sources = Seq(0L, 50L, 100L).toDF("id")
    // The level chain is a lazy persist (linear depth by design) and the
    // contribs union nests each level's chain, so the final plan is
    // O(hops²) nodes — acceptable and bounded. What the round-7 fix
    // forbids is the EXPONENTIAL term from stacking visited/Δ: doubling
    // from 4 to 8 hops must scale the plan ~quadratically (≈4×), nowhere
    // near the ≥2^4 = 16× a doubling chain reintroduces.
    val n4 = planNodes(Betweenness.scaledBrandes(sym, sources, hops = 4))
    graft.Caches.releaseAll()
    val out8 = Betweenness.scaledBrandes(sym, sources, hops = 8)
    val n8 = planNodes(out8)
    assert(
      n8 < 8 * n4,
      s"Brandes plan grew $n4 → $n8 nodes from 4 → 8 hops — visited/delta lineage is stacking again")
    assert(out8.count() > 0, "path interiors must carry betweenness mass")
    graft.Caches.releaseAll()
  }
}
