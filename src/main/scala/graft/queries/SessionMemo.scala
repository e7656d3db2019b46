package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Process-level memo for DataFrames whose physical construction Spark's
  * CacheManager cannot dedupe by canonical-plan equality — imperative
  * builds (the connected-components rounds, whose plan embeds a measured
  * size probe) and persisted shared frames that several queries consume.
  *
  * Keys are (tag, session UUID, input dir): collision-free across
  * sessions, and no values-pin-the-key cycle a session-keyed weak map
  * would have (a cached DataFrame strongly references its session).
  *
  * Retention: an entry strongly pins its SparkSession object (and any
  * local-checkpoint bookkeeping) for the life of this process even after
  * the session stops — the executor-side blocks themselves are freed by
  * `SparkSession.stop`, so what stays is driver-heap metadata. Past
  * [[MaxEntries]] live frames the LEAST-RECENTLY-USED single entry is
  * evicted (and unpersisted) per insert — NOT a wholesale clear: a
  * one-JVM verify sweep over two sf dirs holds 17 tags x 2 dirs = 34
  * keys, and the r8 wholesale clear dumped every shared frame once
  * mid-run, silently re-paying the shingle-corpus/shortlist builds for
  * the second dir.
  */
object SessionMemo {

  // Above the documented motivating working set (17 tags x 2 dirs = 34
  // keys in a two-dir verify sweep) so a dir-major sweep never evicts a
  // live first-dir entry mid-run; eviction is one-at-a-time, so the
  // headroom costs nothing until a 49th distinct key actually appears.
  private[queries] val MaxEntries = 48

  // Access-ordered LinkedHashMap: `get` refreshes recency, and
  // removeEldestEntry fires on insert when the table is over capacity —
  // exactly one LRU victim per overflowing insert. All access is
  // synchronized on the map (the memo is driver-side metadata; the held
  // lock never spans a Spark action — builds run OUTSIDE it, see below).
  private val memo =
    new java.util.LinkedHashMap[(String, String, String), DataFrame](64, 0.75f, true) {
      override def removeEldestEntry(
          eldest: java.util.Map.Entry[(String, String, String), DataFrame]): Boolean = {
        val evict = size() > MaxEntries
        if (evict) {
          // Unpersist what we evict — dropping the reference alone would
          // leave the cached blocks registered in the BlockManager for
          // the session's lifetime. Unpersisting a frame another caller
          // still holds is safe (it just recomputes on next use). Also
          // drop any Caches.pin entry: the pin is a strong driver-heap
          // reference that would otherwise leak one Dataset per
          // evict-then-rebuild cycle.
          // Unpin FIRST: unpersist can throw on a stopped session (the
          // exact retention scenario documented above), and the pin is a
          // pure driver-side map removal that must happen regardless.
          graft.Caches.unpin(eldest.getValue)
          try eldest.getValue.unpersist(blocking = false)
          catch { case _: Throwable => () }
          // the observed-loaded marker must not outlive the buffers
          loadedKeys.synchronized { loadedKeys -= eldest.getKey; () }
          uncachedKeys.synchronized { uncachedKeys -= eldest.getKey; () }
        }
        evict
      }
    }

  /** One memo access: the tag, whether THIS access paid the build call,
    * the build call's EXCLUSIVE wall seconds (0 for a hit), and — for
    * hits — whether the frame's cached column buffers were already
    * materialized at access time (`bufLoaded = Some(false)` means this
    * consumer is about to pay the lazy persist's materialization even
    * though it "reused" the memo entry; None = the memoized plan has no
    * top-level cache entry). `sec` times the synchronous `build` body
    * MINUS any nested memo builds it invoked (each child is its own
    * Access row — without the subtraction a parent like dd_cc, whose
    * build calls the dd_lsh_pairs build, would double-stamp the child's
    * seconds and a row's summed built time could exceed the row's own
    * duration). A lazily-persisted frame's materialization still lands
    * in whichever action first executes it, i.e. in the recording
    * query's own timed span — which is the attribution claim the record
    * supports: "this row built/materialized frame X first; later
    * consumers read it free".
    */
  final case class Access(tag: String, built: Boolean, sec: Double, bufLoaded: Option[Boolean])

  // Per-thread stack of child-build-seconds accumulators: builds run on
  // the calling thread, so a nested getOrElseUpdate inside a build body
  // credits its total into the enclosing frame, and the parent records
  // total − children. (A build's own Spark ACTIONS may fan out to
  // executor threads, but the build call itself does not.)
  private val buildStack = new ThreadLocal[java.util.ArrayDeque[Array[Double]]] {
    override def initialValue(): java.util.ArrayDeque[Array[Double]] =
      new java.util.ArrayDeque()
  }

  // Memo keys whose cached buffers have been OBSERVED loaded: buffers
  // only unload through the memo's own evict path (memoized frames are
  // pinned against Caches.releaseAll), so once loaded the CacheManager
  // lookup — a canonicalize-and-scan pass under the cache lock, inside
  // the consuming query's timed span — never needs to run again for
  // that key. Bounds the instrumentation at ~one lookup per frame
  // instead of one per hit.
  private val loadedKeys =
    scala.collection.mutable.HashSet.empty[(String, String, String)]

  // Memo keys OBSERVED to have no top-level cache entry at all (the
  // build did not persist the frame): that outcome is terminal — a frame
  // not persisted at build time never acquires a cache entry later — so
  // without this set every hit on an unpersisted memo frame re-paid the
  // CacheManager lookup (plan canonicalization under the cache lock,
  // inside the consuming query's timed span) and the "~one lookup per
  // frame" bound held only for frames that eventually load (r12 advice).
  private val uncachedKeys =
    scala.collection.mutable.HashSet.empty[(String, String, String)]

  // Bounded access ledger for Bench's per-query built-vs-reused
  // attribution (r11 verdict #2: ta_vocab stamped 8.37 s in-run vs
  // 1.22 s warm with no in-artifact way to see it was paying the shared
  // contentWords build). Drained per query; the cap only matters if
  // nobody drains (a Verify run), where it keeps the ledger from
  // growing for the process lifetime.
  private val accessLog = scala.collection.mutable.ArrayBuffer.empty[Access]
  private val AccessLogCap = 4096

  private def record(a: Access): Unit = accessLog.synchronized {
    if (accessLog.size < AccessLogCap) { accessLog += a; () }
  }

  /** Return and clear the accesses recorded since the last drain. */
  private[graft] def drainAccesses(): Seq[Access] = accessLog.synchronized {
    val out = accessLog.toVector
    accessLog.clear()
    out
  }

  /** Shared built-vs-reused summary of one drained span: (tag, summed
    * exclusive build seconds) sorted by tag, plus the distinct tags only
    * HIT in the span. One definition for Bench/Profile/ScaleProbe rows —
    * three hand-rolled copies had already started to drift (r13 review).
    */
  private[graft] def summarizeAccesses(
      accesses: Seq[Access]): (Seq[(String, Double)], Seq[String]) = {
    val built = accesses
      .filter(_.built)
      .groupBy(_.tag)
      .map { case (tag, as) => (tag, as.map(_.sec).sum) }
      .toSeq
      .sortBy(_._1)
    val builtTags = built.map(_._1).toSet
    val reused =
      accesses.filterNot(_.built).map(_.tag).distinct.filterNot(builtTags).sorted
    (built, reused)
  }

  /** Stable per-session key (the session's UUID where exposed; an identity
    * hash otherwise — still unique per live session object).
    */
  def sessionKey(spark: SparkSession): String =
    org.apache.spark.sql.graftshim.ColumnBridge
      .sessionUUID(spark)
      .getOrElse(s"nonclassic-${System.identityHashCode(spark)}")

  def getOrElseUpdate(tag: String, spark: SparkSession, dir: String)(
      build: => DataFrame): DataFrame = {
    val key = (tag, sessionKey(spark), dir)
    val hit = memo.synchronized(memo.get(key))
    if (hit != null) {
      val bufLoaded =
        if (loadedKeys.synchronized(loadedKeys.contains(key))) Some(true)
        else if (uncachedKeys.synchronized(uncachedKeys.contains(key))) None
        else {
          val l = org.apache.spark.sql.graftshim.ColumnBridge.cachedBuffersLoaded(hit)
          if (l.contains(true)) loadedKeys.synchronized { loadedKeys += key; () }
          else if (l.isEmpty) uncachedKeys.synchronized { uncachedKeys += key; () }
          l
        }
      record(Access(tag, built = false, 0.0, bufLoaded))
      hit
    } else {
      // Build outside the lock: a build may run Spark actions (size
      // probes, eager checkpoints) and may itself memoize sub-frames.
      // A racing duplicate build is possible and harmless — the loser's
      // frame is unpersisted and the winner's returned. A race loser
      // still records built=true: it paid the build call's cost.
      val frames = buildStack.get()
      val childAcc = Array(0.0)
      frames.push(childAcc)
      val buildT0 = System.nanoTime()
      val built =
        try build
        finally { frames.pop(); () }
      val totalSec = (System.nanoTime() - buildT0) / 1e9
      val parent = frames.peek()
      if (parent != null) parent(0) += totalSec
      record(Access(tag, built = true, math.max(0.0, totalSec - childAcc(0)), None))
      memo.synchronized {
        val winner = memo.get(key)
        if (winner != null) {
          if (!(winner eq built)) {
            // Spark's CacheManager keys cache entries by CANONICALIZED
            // plan: a deterministic rebuild's loser plan usually
            // canonicalizes equal to the winner's, so its persist was
            // deduped onto the winner's one cache entry — unpersisting
            // the loser would drop the winner's blocks too, leaving the
            // memo returning a permanently-uncached frame (every later
            // hit silently recomputes). Only unpersist a loser whose
            // plan is genuinely distinct.
            graft.Caches.unpin(built) // before unpersist — see the evict path
            try {
              val loserPlan = built.queryExecution.analyzed.canonicalized
              val winnerPlan = winner.queryExecution.analyzed.canonicalized
              if (loserPlan != winnerPlan) built.unpersist(blocking = false)
            } catch { case _: Throwable => () }
          }
          winner
        } else {
          memo.put(key, built)
          built
        }
      }
    }
  }

  /** Whether a memoized frame's cached column buffers are loaded NOW
    * (None when the key is not resident or the frame has no top-level
    * cache entry). Bench's post-action re-check of the "materialized"
    * stamp: an access-time `bufLoaded = Some(false)` only says the
    * buffers were unloaded when the consuming row started — if that
    * row's action pruned the cached subtree, a later row pays the load,
    * and only the row whose action flipped this to Some(true) should be
    * stamped as the materializer. Also seeds the loaded-key marker so
    * the check costs ~one CacheManager lookup per frame, like the hit
    * path.
    */
  private[graft] def buffersLoadedNow(
      tag: String, spark: SparkSession, dir: String): Option[Boolean] = {
    val key = (tag, sessionKey(spark), dir)
    val hit = memo.synchronized(memo.get(key))
    if (hit == null) None
    else if (loadedKeys.synchronized(loadedKeys.contains(key))) Some(true)
    else if (uncachedKeys.synchronized(uncachedKeys.contains(key))) None
    else {
      val l = org.apache.spark.sql.graftshim.ColumnBridge.cachedBuffersLoaded(hit)
      if (l.contains(true)) loadedKeys.synchronized { loadedKeys += key; () }
      else if (l.isEmpty) uncachedKeys.synchronized { uncachedKeys += key; () }
      l
    }
  }

  /** Test-only view of the resident keys, oldest-access first. */
  private[queries] def residentKeys: Seq[(String, String, String)] =
    memo.synchronized {
      import scala.jdk.CollectionConverters._
      memo.keySet().asScala.toVector
    }

  /** A per-session scratch directory root: isolates concurrent drivers (or
    * test suites) on one machine from clobbering each other's sink paths
    * mid-query. Same UUID => same path, so re-runs within a session still
    * get overwrite semantics.
    */
  def tmpDir(spark: SparkSession, tag: String): String =
    s"${System.getProperty("java.io.tmpdir", "/tmp")}/graft-${sessionKey(spark)}/$tag"
}
