package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Per-round lineage cut for iterative operators (connected components,
  * k-core peeling): without one, every round's logical plan EMBEDS the
  * previous round's full plan inside its `InMemoryRelation`, so the tree
  * Catalyst must re-analyze grows geometrically with the round count even
  * though execution reads the cache (measured on k-core: ~10x plan nodes
  * per round, 41 s of pure planning by round 4 at sf0.1 — vs ~4 s cut).
  *
  * Conf-driven reliability, same policy as ConnectedComponents: with a
  * configured checkpoint directory (the cluster setting — HDFS/object
  * store), RELIABLE `checkpoint()` so recovery replays files, not the
  * round chain; otherwise `localCheckpoint` (executor-local blocks,
  * right for local mode). The pre-checkpoint cache keeps the eager
  * checkpoint's second job (the write) from recomputing the round.
  */
object Lineage {

  def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) {
      val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
      val cp = cached.checkpoint(eager = true)
      cached.unpersist(blocking = false)
      // Reliable-checkpoint files are owned by the checkpoint dir (and
      // reaped by ContextCleaner when cleanCheckpoints is on) — nothing
      // block-resident to ledger here.
      cp
    } else {
      // localCheckpoint data lives in executor storage BLOCKS that the
      // ContextCleaner frees when the RDD object is GC'd — DELIBERATELY
      // not ledgered in Caches for deterministic per-query release:
      // releasing a localCheckpoint is destructive (truncated lineage, no
      // recompute path), and cut frames are NOT provably dead at
      // releaseAll time — a session-shared memoized frame (the LP label
      // frame, the ER cluster frame) may hold a LAZY persist built over
      // this round's checkpoint, and a consumer that merely PLANNED the
      // query (PlanLint, explain tooling) leaves it unmaterialized until
      // a later query executes it, at which point a released block is a
      // CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND query failure (measured: 2
      // cross-suite failures when r8 tried the eager-release ledger). The
      // blocks are bounded (one slim frame per round per in-flight query)
      // and GraftSession lowers spark.cleaner.periodicGC.interval so the
      // cleaner reaps dead cuts on a minutes cadence instead of the
      // 30-minute default.
      df.localCheckpoint(eager = true)
    }

  /** Per-round persist for loops with a FIXED small round count (the
    * Betweenness lesson, generalized): each round caches lazily and the
    * whole chain materializes inside the final action's one job cascade,
    * instead of paying an eager checkpoint's full materialization job
    * per round. Plan depth stays `rounds` (each round references its
    * predecessor once), so analysis cost is bounded by the constant.
    * NOT for data-dependent round counts (connected components, k-core
    * peeling) — those genuinely need [[cut]] to truncate the plan.
    */
  def round(df: DataFrame): DataFrame =
    graft.Caches.track(df.persist(StorageLevel.MEMORY_AND_DISK))

  /** How deep a [[round]] chain may grow before it must be truncated. */
  val RoundCutEvery = 8

  /** Widen a frame to the session's parallelism when its physical plan
    * would otherwise inherit FEWER partitions than cores — the harness
    * tables are single-file, single-row-group parquet, so a map-only
    * chain persisted straight off a scan inherits ONE partition and
    * every downstream pass over the persisted frame runs serial
    * (measured: ds_facility's four greedy rounds each scored
    * candidates × points in one ~750 ms single-core task). A frame at or
    * above the session's width — any real warehouse table — is returned
    * untouched, so the device never narrows and never fires at scale;
    * the round-robin spread is deterministic (sort-before-repartition)
    * and results never depend on partitioning.
    */
  def widen(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= cores) df else df.repartition(cores)
  }

  /** Whether a per-round metric attached via `observe()` can actually
    * surface from a [[cut]]'s materializing action. In localCheckpoint
    * mode yes (the CollectMetrics node is top-level in the executed
    * plan). In RELIABLE-checkpoint mode no: the cut persists first, so
    * the observed node is buried inside the InMemoryRelation and the
    * metric never fires — a caller that registered an Observation anyway
    * would stall a full poll deadline per round, then pay its fallback
    * action on top, and leak the never-completing Observation's listener
    * registration for the session's lifetime. Callers must check this
    * BEFORE creating the Observation and go straight to the fallback
    * action when false.
    */
  def metricsRideCut(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.sparkContext.getCheckpointDir.isEmpty

  /** Bounded read of an observed metric after an eager action (the
    * iterative-operator barrier-cut pattern): the SQLExecutionEnd event
    * that carries observed metrics posts asynchronously a moment after
    * the action returns, so poll the non-blocking `getOrEmpty` (each call
    * waits ≤100 ms) under a deadline instead of `Observation.get`, which
    * blocks FOREVER if the observed node never executed. Only call when
    * [[metricsRideCut]] was true at observe time; the None fallback
    * remains for robustness (correctness never depends on the metric
    * arriving), not as a supported steady state.
    */
  def observed(
      obs: org.apache.spark.sql.Observation,
      key: String,
      deadlineMs: Long = 2000L): Option[Any] = {
    var m = org.apache.spark.sql.graftshim.ColumnBridge.observedOrEmpty(obs).get(key)
    val deadline = System.nanoTime() + deadlineMs * 1000000L
    while (m.isEmpty && System.nanoTime() < deadline)
      m = org.apache.spark.sql.graftshim.ColumnBridge.observedOrEmpty(obs).get(key)
    m
  }

  /** [[round]] for CALLER-SUPPLIED iteration counts (PageRank, HITS, the
    * scaled walks): lazy persist while the chain is shallow, a real
    * [[cut]] every [[RoundCutEvery]] rounds past that, so plan depth —
    * and with it Catalyst analysis cost — is bounded by a constant no
    * matter how deep a caller walks. The in-repo callers run 2–3 rounds
    * and never hit the cut; a 50-round caller pays one eager checkpoint
    * per 8 rounds instead of re-inheriting the r5 plan-analysis blow-up.
    * `i` is the 1-based round index.
    */
  def round(df: DataFrame, i: Int): DataFrame =
    if (i > 0 && i % RoundCutEvery == 0) cut(df) else round(df)
}
