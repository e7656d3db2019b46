package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Fixed-iteration graph walks in SCALED INTEGER arithmetic — the
  * hash-gate-exact counterpart of [[PageRank]]'s float iteration.
  *
  * Scores are BIGINTs in millionths and every per-edge term is an integer
  * multiply + floor division, so each term is bit-identical on any engine
  * and the per-node sum is an order-free integer sum — the same
  * determinism discipline as `gr_adamic`/`gr_closeness` (a float walk is
  * only 12-significant-digit comparable; an integer walk is hash-exact).
  *
  * Shuffle shape per iteration (both walks): one equi-join of the current
  * score frame against the persisted edge frame on `src`, one aggregate
  * on `dst` — contributions ship as (node, long) pairs, never the edge
  * list, so a round's shuffle volume is score-frame-sized. Each round is
  * a lazy [[Lineage.round]] persist — plan depth grows with the caller's
  * iteration count — with an eager lineage cut every
  * [[Lineage.RoundCutEvery]] rounds so a deep caller's analysis cost
  * stays bounded (the r5 plan-growth lesson, now enforced instead of
  * assumed).
  */
object ScaledWalks {

  /** Score scale: 1.0 == 1e6. */
  val Scale = 1000000L

  /** Personalized PageRank, damping 0.85, truncated at `iterations`
    * rounds: restart mass `0.15 * Scale` lands only on `seeds`, and each
    * edge u→v carries `(p(u) * 85) div (100 * outdeg(u))` — per-term
    * floor, documented and replayed identically by the oracle.
    *
    * Only NONZERO scores are materialized: the score frame starts at
    * |seeds| rows and grows like a BFS frontier closure, so early rounds
    * on a 100 TB graph join a small frame against the edge list instead
    * of walking every node — personalization is exactly the case where
    * the reachable set stays far below the node set.
    *
    * @param edges directed `(src, dst)`; pass both directions for an
    *              undirected graph
    * @param seeds one column `id` — the personalization set
    */
  def personalizedPageRank(
      edges: DataFrame,
      seeds: DataFrame,
      iterations: Int,
      preLaidDeg: Option[DataFrame] = None): DataFrame = {
    // src-partitioned (the Betweenness round-10 measurement): each
    // round's contribution join probes this layout; only the nonzero
    // score frame shuffles. Integer arithmetic — partitioning cannot
    // change a single output bit. `preLaidDeg` is the session-shared
    // variant ([[PageRank.run]]'s contract: same edges, same
    // [[EdgeLayouts.degAnnotated]] schema, hash(src), caller-persisted).
    val edgesDeg = preLaidDeg.getOrElse(
      graft.Caches.track(
        EdgeLayouts
          .degAnnotated(edges)
          .repartition(col("src"))
          .persist(StorageLevel.MEMORY_AND_DISK)))
    val seedBase = graft.Caches.track(
      seeds.select(col("id").cast("long").as("sid")).persist(StorageLevel.MEMORY_AND_DISK))
    var p = seedBase.select(col("sid").as("id"), lit(Scale).as("p"))
    for (i <- 1 to iterations) {
      val contrib = edgesDeg
        .join(p, col("src") === col("id"))
        .groupBy(col("dst"))
        .agg(sum(expr("(p * 85) div (100 * od)")).as("s"))
      p = Lineage.round(
        contrib
          .join(seedBase, col("dst") === col("sid"), "full_outer")
          .select(
            coalesce(col("dst"), col("sid")).as("id"),
            (when(col("sid").isNotNull, lit(Scale * 15 / 100)).otherwise(lit(0L))
              + coalesce(col("s"), lit(0L))).as("p")), i)
    }
    p
  }

  /** Global-walk scale: 1.0 == 1e12. The personalized walk's 1e6 is too
    * coarse for a GLOBAL walk, where the starting mass divides over ALL
    * nodes (at 21k nodes, 1e6/n = 47 — per-edge floor terms on
    * high-degree nodes would truncate to 0 and the walk would collapse
    * to its base rank); at 1e12 the seed is ~5e7 and three rounds keep
    * 7+ exact digits.
    */
  val GlobalScale = 1000000000000L

  /** Global PageRank, damping exactly 85/100, truncated at `iterations`
    * rounds, in scaled-integer arithmetic ([[GlobalScale]]):
    * `p0 = GlobalScale div n`, per-edge term
    * `(p(u) * 85) div (100 * outdeg(u))`, base rank
    * `(GlobalScale * 15) div (100 * n)` — every term an exact integer on
    * any engine, so the walk is hash-exact where [[PageRank.run]]'s
    * float iteration is only 12-significant-digit comparable (its
    * cross-engine sum-order drift surfaced at the r13 sf0.1 gate).
    * Same per-round shuffle shape as [[PageRank.run]], same
    * `assumeNoDangling` fusion; ScaledWalksSpec pins this walk within
    * float tolerance of the float operator on a random graph.
    */
  def pageRank(
      edges: DataFrame,
      iterations: Int,
      assumeNoDangling: Boolean = false,
      preLaidDeg: Option[DataFrame] = None): DataFrame = {
    val nodes = graft.Caches.track(
      edges
        .select(col("src").as("id"))
        .union(edges.select(col("dst").as("id")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK))
    val n = nodes.count()
    val edgesDeg = preLaidDeg.getOrElse(
      graft.Caches.track(
        EdgeLayouts
          .degAnnotated(edges)
          .repartition(col("src"))
          .persist(StorageLevel.MEMORY_AND_DISK)))
    val base = GlobalScale * 15 / (100 * n)
    var p = nodes.withColumn("p", lit(GlobalScale / n))
    for (i <- 1 to iterations) {
      val contrib = edgesDeg
        .join(p, col("src") === col("id"))
        .groupBy(col("dst"))
        .agg(sum(expr("(p * 85) div (100 * od)")).as("s"))
      p = Lineage.round(
        if (assumeNoDangling)
          contrib.select(col("dst").as("id"), (lit(base) + col("s")).as("p"))
        else
          nodes
            .join(contrib, nodes("id") === contrib("dst"), "left")
            .select(col("id"), (lit(base) + coalesce(col("s"), lit(0L))).as("p")), i)
    }
    p
  }

  /** Truncated Katz centrality with attenuation exactly 1/5: after k
    * rounds, `x(v) = Scale * sum over paths of length <= k into v of
    * 5^-len` — path counting with geometric decay, no degree
    * normalization (the signal PageRank's stochastic normalization
    * erases: a node fed by many high-degree hubs still scores high).
    * Per-edge term is `x(u) div 5`, an exact integer on both engines.
    *
    * `assumeEveryNodeHasInEdge`: a SYMMETRIC caller may skip the
    * per-round dangling join-back — the contribution aggregate already
    * emits every node, so the left join's fill is unreachable (the
    * [[PageRank]] round-10 fusion; integer arithmetic, bit-identical).
    */
  def katz(
      edges: DataFrame,
      iterations: Int,
      assumeEveryNodeHasInEdge: Boolean = false,
      preLaidSrc: Option[DataFrame] = None): DataFrame = {
    val nodes = graft.Caches.track(
      edges
        .select(col("src").as("id"))
        .union(edges.select(col("dst").as("id")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK))
    // `preLaidSrc`: the same edges hash(src)-partitioned and persisted by
    // the caller (session-shared layout; not re-tracked here).
    val edgesP = preLaidSrc.getOrElse(
      graft.Caches.track(
        edges.repartition(col("src")).persist(StorageLevel.MEMORY_AND_DISK)))
    var x = nodes.withColumn("x", lit(Scale))
    for (i <- 1 to iterations) {
      val contrib = edgesP
        .join(x, col("src") === col("id"))
        .groupBy(col("dst"))
        .agg(sum(expr("x div 5")).as("s"))
      x = Lineage.round(
        if (assumeEveryNodeHasInEdge)
          contrib.select(col("dst").as("id"), (lit(Scale) + col("s")).as("x"))
        else
          nodes
            .join(contrib, nodes("id") === contrib("dst"), "left")
            .select(col("id"), (lit(Scale) + coalesce(col("s"), lit(0L))).as("x")), i)
    }
    x
  }
}
