package graft

import org.apache.spark.sql.Dataset

/** Ledger of STRICTLY-INTRA-QUERY persisted frames, released by the query
  * wrappers (Verify / Bench) once the consuming action has materialized.
  *
  * Two persist populations exist in this library and they need opposite
  * lifetimes:
  *
  *  - Session-shared frames (the shingled corpus, parsed props map,
  *    ANN vector frame, k-means inputs, the ER scored-pair frame) are
  *    materialize-once inputs that MANY queries read via SessionMemo or
  *    the CacheManager's canonical-plan dedup. Releasing those per query
  *    would re-pay their build dozens of times across a 144-query run.
  *    They are NOT tracked here; SessionMemo owns their eviction.
  *
  *  - Intra-query intermediates (a BFS visited set, an exploded span
  *    frame feeding a ledger and a rollup, a graph operator's oriented
  *    edge list) are reused only within one query's DAG. Left persisted,
  *    they accumulate for the life of the session across a sequential
  *    many-query run — pure spill pressure, zero reuse. Operators route
  *    those through [[track]], and [[releaseAll]] drops them after each
  *    query's action completes.
  *
  * Unpersisting a frame that a later plan still references is safe —
  * Spark recomputes from lineage — so a missed release point degrades to
  * recompute, never to wrong results.
  */
object Caches {

  // NOT in this ledger: Lineage.cut's localCheckpoint RDDs. Their blocks
  // are freed by the ContextCleaner at driver GC rather than here,
  // because releasing a localCheckpoint is destructive (truncated
  // lineage, no recompute) and a cut frame is not provably dead at
  // releaseAll time — session-shared memoized frames (LP labels, ER
  // clusters) hold LAZY persists built over cut rounds, and a consumer
  // that only PLANNED the query leaves them unmaterialized until a later
  // query executes them (eager release measured as cross-suite
  // CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND failures in r8). GraftSession sets
  // spark.cleaner.periodicGC.interval to a minutes cadence so dead cuts
  // are reaped promptly; see Lineage.cut.
  private val tracked = scala.collection.mutable.ArrayBuffer.empty[Dataset[_]]

  // Identity set: a SESSION-SHARED frame (SessionMemo-owned) that an
  // operator may also hand to track() — e.g. LabelPropagation persists
  // whatever edge frame it is given, which is a no-op on an already-
  // persisted memoized frame, but the subsequent per-query release would
  // evict the shared cache. Pinned frames survive releaseAll.
  private val pinned = java.util.Collections.newSetFromMap(
    new java.util.IdentityHashMap[Dataset[_], java.lang.Boolean]())

  /** Exempt a session-shared persisted frame from [[releaseAll]]. */
  def pin[T <: Dataset[_]](ds: T): T = synchronized {
    pinned.add(ds)
    ds
  }

  /** Drop a pin (no-op if the frame was never pinned). SessionMemo calls
    * this when it evicts or discards a memoized frame — the pin's
    * IdentityHashMap entry is a strong driver-heap reference, so an
    * evict-then-rebuild churn cycle would otherwise leak one Dataset
    * (plus its analyzed plan) per eviction for the process lifetime.
    */
  def unpin(ds: Dataset[_]): Unit = synchronized {
    pinned.remove(ds)
    ()
  }

  /** Register an intra-query persisted frame for deferred release. */
  def track[T <: Dataset[_]](ds: T): T = synchronized {
    tracked += ds
    ds
  }

  /** Unpersist every tracked, unpinned frame. Call after the consuming
    * action.
    */
  def releaseAll(): Unit = synchronized {
    tracked.foreach { ds =>
      try if (!pinned.contains(ds)) ds.unpersist(blocking = false)
      catch { case _: Throwable => () }
    }
    tracked.clear()
  }
}
