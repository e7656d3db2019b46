package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components over a DataFrame edge list.
  *
  * Replaces the reference's driver-side recursive DFS
  * (`/root/reference/src/clustering.py:6-54`), which `collect()`s every
  * matched pair to the driver — a scaling cliff at 100 TB. Size-adaptive,
  * the same way Spark picks a broadcast join by measuring the small side:
  *
  *   - **Small graphs** (symmetrized edge count below [[LocalEdgeThreshold]],
  *     measured AFTER the dedup/persist so it costs one cheap count): a
  *     single-task union-find over the edge partition — one stage, exact,
  *     deterministic. ER match graphs are almost always tiny relative to
  *     the corpus that produced them (1.6 k pairs from 40 M candidates in
  *     the reference), so this is the common case even at 100 TB input.
  *   - **Big graphs**: pure DataFrame min-label propagation with per-round
  *     pointer jumping — O(log d) shuffle rounds, never moves the graph to
  *     one place. Each round: (1) every node takes the min label among
  *     itself + neighbors; (2) labels compress one hop (`comp <-
  *     label(comp)`); (3) lineage is cut per round — RELIABLE
  *     `checkpoint()` when the SparkContext has a checkpoint directory
  *     configured (set an HDFS/object-store dir on a real cluster),
  *     `localCheckpoint` otherwise (right for local mode).
  *     Convergence: label sums strictly decrease until fixed point.
  *
  * Both paths return the identical labeling (min node id per component) —
  * pinned against each other and against GraphX by CcEquivalenceSpec.
  */
object ConnectedComponents {

  /** Edge-count cutoff for the single-task path: ~8 M symmetrized edges is
    * ~128 MB of (long, long) rows — comfortably one task, far below what a
    * shuffle round costs.
    */
  val LocalEdgeThreshold: Long = 8L << 20

  /** @param edges any DataFrame with two castable-to-long columns
    * @return (node: long, comp: long) — comp is the min node id of the
    *         component, a deterministic cluster id.
    */
  def run(
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      maxIter: Int = 50,
      localThreshold: Long = LocalEdgeThreshold): DataFrame = {

    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)

    // Symmetrize once (NO shuffle — union of two narrow projections);
    // persisted because both the size probe and the chosen algorithm
    // consume it. The probe counts the RAW symmetrized edges: an upper
    // bound on the distinct count, so the small-graph decision is safe,
    // and union-find is insensitive to duplicate edges — the small path
    // runs zero O(|E|) shuffles at all. Only the rounds path (where each
    // round re-joins the edges) pays the dedup shuffle.
    val sym = e
      .union(e.select(col("dst").as("src"), col("src").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // The local result is materialized (eager checkpoint) BEFORE the
    // edge cache is released — otherwise the lazy union-find frame would
    // recompute the symmetrize from scratch on the caller's first
    // action. The rounds path materializes per-round already.
    val result =
      if (sym.count() <= localThreshold) cut(runLocal(sym))
      else runRounds(sym.distinct(), maxIter)
    sym.unpersist()
    result
  }

  /** Eager lineage cut between iterations (and for the local result).
    * Conf-driven reliability: when the context has a checkpoint directory
    * configured (`spark.sparkContext.setCheckpointDir(...)` — on a real
    * cluster an HDFS/object-store path), use RELIABLE `checkpoint()`, so a
    * lost executor replays from storage instead of recomputing the whole
    * round chain; without one, `localCheckpoint` (executor-local blocks,
    * lineage-cut only) — the right default for local mode, where blocks
    * and lineage die together anyway.
    *
    * The reliable path persists the frame for the duration of the
    * checkpoint: `checkpoint(eager)` runs an action job AND a separate
    * checkpoint-write job, and without the cache the second job would
    * recompute the whole round chain from lineage — doubling every
    * round's cost in exactly the cluster mode this path serves. (Round
    * snapshot files follow the standard Spark lifecycle: set
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` for GC-driven
    * cleanup, or clean the checkpoint dir between runs.)
    */
  private def cut(df: DataFrame): DataFrame = Lineage.cut(df)

  /** Single-task union-find with path halving: all edges to one partition,
    * one mapPartitions pass, exact min-label output. The classic "small
    * enough to solve in place" branch.
    */
  private def runLocal(sym: DataFrame): DataFrame = {
    val spark = sym.sparkSession
    import spark.implicits._
    sym
      .as[(Long, Long)]
      .repartition(1)
      .mapPartitions { rows =>
        val parent = new scala.collection.mutable.LongMap[Long]()
        def find(x0: Long): Long = {
          var x = x0
          while (parent.getOrElse(x, x) != x) {
            val p = parent(x)
            val gp = parent.getOrElse(p, p)
            parent(x) = gp // path halving
            x = gp
          }
          x
        }
        rows.foreach { case (a, b) =>
          // Register both endpoints so root-only nodes still emit a row.
          parent.getOrElseUpdate(a, a)
          parent.getOrElseUpdate(b, b)
          val ra = find(a); val rb = find(b)
          // Union by MIN root, so the final label is the component's min id
          // without a second normalization pass.
          if (ra < rb) parent(rb) = ra
          else if (rb < ra) parent(ra) = rb
        }
        // Snapshot keys before the final finds (they mutate the map).
        parent.keys.toArray.iterator.map(n => (n, find(n)))
      }
      .toDF("node", "comp")
  }

  private def runRounds(sym0: DataFrame, maxIter: Int): DataFrame = {
    // The iterative frames are label tables (a few columns, one row per
    // node) — far smaller than the session default sized for wide scans.
    // Pin a reduced width via explicit repartition on the persisted /
    // checkpointed frames (NOT a session-conf mutation, which would race
    // with concurrent queries on the same session); AQE coalesces the
    // intermediate shuffles between them. On a real cluster size this to
    // node-count / target-partition-bytes.
    val w = math.max(8, sym0.sparkSession.sessionState.conf.numShufflePartitions / 4)
    val sym = sym0.repartition(w, col("dst")).persist(StorageLevel.MEMORY_AND_DISK)

    var labels = cut(
      sym
        .select(col("src").as("node"))
        .distinct()
        .withColumn("comp", col("node"))
        .repartition(w, col("node")))

    // Labels only ever decrease (least of self + neighbors, then a jump to
    // an even smaller label), so the label sum is strictly decreasing until
    // the fixed point: equal sums across rounds certify convergence without
    // a per-round join against the previous labels. None until round 1 has
    // run — a literal sentinel value could collide with a real label sum
    // (e.g. negative node ids summing to it) and falsely converge.
    var prevSum: Option[BigDecimal] = None
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbrMin = sym
        .join(labels.select(col("node").as("dst"), col("comp")), "dst")
        .groupBy(col("src").as("node"))
        .agg(min("comp").as("nbrComp"))

      val stepped = labels
        .join(nbrMin, Seq("node"), "left")
        .select(
          col("node"),
          least(col("comp"), coalesce(col("nbrComp"), col("comp"))).as("comp"))

      // Pointer jumping: follow the label one extra hop per round. The
      // convergence sum rides the cut's own materializing action via
      // observe() where the mode allows it ([[Lineage.metricsRideCut]] —
      // reliable-checkpoint mode buries the observed node inside the
      // persist, so there the sum is a direct cached-scan aggregate
      // instead of a doomed poll), keeping the round's driver barriers at
      // the minimum (the KCore barrier-cut discipline: every extra
      // blocking action per round is a scheduling-latency exposure a
      // 1000-executor cluster pays in full).
      val obs =
        if (Lineage.metricsRideCut(sym0.sparkSession))
          Some(org.apache.spark.sql.Observation(s"cc_r${i}_${System.nanoTime()}"))
        else None
      val jumped = stepped
        .join(
          stepped.select(col("node").as("comp"), col("comp").as("jumped")),
          Seq("comp"),
          "left")
        .select(col("node"), coalesce(col("jumped"), col("comp")).as("comp"))
        .repartition(w, col("node"))
      val next = cut(
        obs
          .map(o => jumped.observe(
            o,
            org.apache.spark.sql.functions.sum(col("comp").cast("decimal(38,0)")).as("s")))
          .getOrElse(jumped))

      // Exact (decimal) label sum; bounded metric read with a cached-scan
      // aggregate fallback ([[Lineage.observed]]).
      val sum = obs
        .flatMap(o => Lineage.observed(o, "s"))
        .map(v => BigDecimal(v.asInstanceOf[java.math.BigDecimal]))
        .getOrElse(BigDecimal(
          next.agg(org.apache.spark.sql.functions.sum(col("comp").cast("decimal(38,0)")))
            .collect()(0)
            .getDecimal(0)))
      labels = next
      converged = prevSum.contains(sum)
      prevSum = Some(sum)
      i += 1
    }
    sym.unpersist()
    labels
  }
}
