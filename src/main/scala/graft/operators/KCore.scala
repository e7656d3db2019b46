package graft.operators

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Bounded k-core peeling over an undirected graph.
  *
  * Input is the SYMMETRIC edge frame `(u, v)` (every undirected edge
  * present in both directions, no duplicates), so a node's degree is its
  * row count as `u`. Each synchronous round drops every node whose current
  * degree is below `k` together with its incident edges — the standard
  * iterated-deletion semantics whose fixpoint is the k-core. Rounds are
  * FIXED (not run to convergence) so the result is a deterministic,
  * oracle-replayable function of (graph, k, rounds); a curation pipeline
  * uses the per-round survivor curve to pick the density cutoff before
  * committing to the full fixpoint. When the peel reaches its fixpoint
  * early (a round removes no edge), the remaining rounds' rows are
  * synthesized driver-side instead of re-running identical jobs —
  * deletion is monotone, so an unchanged edge count proves every later
  * round bit-identical; the OUTPUT is exactly the fixed-round curve.
  *
  * Scale shape: each round is one degree aggregation plus two semi-joins,
  * all keyed on node id — O(|E|) shuffle per round, the same budget as one
  * PageRank step. Each round's survivor frame is MATERIALIZED eagerly
  * behind a [[Lineage.cut]] before the next round builds on it: the cut
  * stops the round-over-round plan embedding that otherwise turns later
  * rounds into pure Catalyst re-analysis (measured: 41 s of planning by
  * round 4 at sf0.1 without the cut, ~4 s with it).
  *
  * Barrier budget (the r7 lesson — `graft.Bench` artifact rows for this
  * query were hypersensitive to scheduling latency because each round
  * paid THREE blocking driver round-trips): the round's edge count now
  * rides the checkpoint-materializing action itself via `observe()`
  * (localCheckpoint mode only — see [[Lineage.metricsRideCut]]), so a
  * round is TWO blocking actions (the keep materialization, whose count
  * is the round's own n_nodes output, plus the eager checkpoint), never
  * three. Only bounded per-round counts reach the driver.
  */
object KCore {

  /** Per-round survivor stats: `(round, n_nodes, n_edges)` for round 0
    * (the input graph) through `rounds`. `n_nodes` after round r counts
    * the nodes that met the degree bar in round r (some may have lost
    * their last edge when a neighbor was peeled — they peel next round);
    * `n_edges` counts undirected survivor edges.
    */
  def peelStats(sym: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val spark: SparkSession = sym.sparkSession
    import spark.implicits._
    // u-partitioned: ROUND 1's degree aggregate and u-semi-join plan with
    // no exchange on the edge frame (a PERSISTED frame's InMemoryRelation
    // preserves partitioning — LineageLayoutSpec locks this), and round 1
    // dominates a peel (the live graph only shrinks). Rounds >= 2 run on
    // cut frames whose partitioning the planner cannot see (under AQE the
    // checkpoint's LogicalRDD reports UnknownPartitioning — also locked
    // by LineageLayoutSpec) and are physically laid out by the LAST
    // semi-join's key; they re-plan their exchanges, which is the
    // accepted cost on the shrunken rounds.
    var cur = graft.Caches.track(
      sym.repartition(col("u")).persist(StorageLevel.MEMORY_AND_DISK))
    val out = Seq.newBuilder[(Long, Long, Long)]
    // Round 0's two counts in ONE job (the symmetric edge count is always
    // even; integer halving stays exact).
    val r0 = cur.agg(count(lit(1)).as("e"), count_distinct(col("u")).as("n")).head()
    var curEdges = r0.getLong(0)
    out += ((0L, r0.getLong(1), curEdges >> 1))
    var r = 1
    var fixed = false
    // Metrics can only surface from a localCheckpoint cut's action; in
    // reliable mode registering an Observation would stall the poll
    // deadline per round AND leak its listener — go straight to counts.
    val rideCut = Lineage.metricsRideCut(spark)
    while (r <= rounds && !fixed) {
      val keep = graft.Caches.track(
        cur
          .groupBy("u")
          .agg(count(lit(1)).as("d"))
          .filter(col("d") >= k)
          .select("u")
          .persist(StorageLevel.MEMORY_AND_DISK))
      // Materialize keep BEFORE the double semi-join: the count is the
      // round's own n_nodes output anyway, and it removes any chance of
      // the two semi-join sides racing to build the degree aggregate's
      // cache. Two blocking actions per round total (this count + the
      // checkpoint) — down from r7's three.
      val nKeep = keep.count()
      // Lineage cut per round ([[Lineage.cut]]): without it the round-r
      // plan embeds round r-1's full plan ~10x over, and by round 4 the
      // job is pure Catalyst re-analysis (41 s vs 4 s at sf0.1). The
      // observe rides the cut's own materializing action, so the edge
      // count costs no third job.
      val obs = if (rideCut) Some(Observation(s"kcore_r${r}_${System.nanoTime()}")) else None
      // u-side semi FIRST (cur and keep are both hash(u) — keep comes off
      // the degree aggregate — so this join plans exchange-free), v-side
      // second (the round's one unavoidable edge exchange).
      val joined = cur
        .join(keep, Seq("u"), "left_semi")
        .join(keep.select(col("u").as("v")), Seq("v"), "left_semi")
        .select("u", "v")
      val next = Lineage.cut(
        obs.map(o => joined.observe(o, count(lit(1)).as("edges"))).getOrElse(joined))
      // Bounded metric read + cached-count fallback ([[Lineage.observed]]).
      val nextEdges = obs
        .flatMap(o => Lineage.observed(o, "edges"))
        .map(_.asInstanceOf[Long])
        .getOrElse(next.count())
      out += ((r.toLong, nKeep, nextEdges >> 1))
      // Fixed-point early exit: deletion is monotone, so a round that
      // removes NO edge leaves the graph — hence every later round's
      // degrees, keep set, and edge count — bit-identical. Emit the
      // remaining rows as copies instead of paying their aggregate +
      // semi-join + checkpoint jobs (output unchanged: the oracle unrolls
      // all rounds and lands on the same constants).
      if (nextEdges == curEdges) {
        fixed = true
        for (rr <- (r + 1) to rounds) out += ((rr.toLong, nKeep, nextEdges >> 1))
      }
      curEdges = nextEdges
      cur = next
      r += 1
    }
    out
      .result()
      .toDF("round", "n_nodes", "n_edges")
  }
}
