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
      cp
    } else df.localCheckpoint(eager = true)

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
}
