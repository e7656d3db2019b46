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
  * `SparkSession.stop`, so what stays is driver-heap metadata. The table
  * is cleared wholesale when it grows past [[MaxEntries]] distinct
  * (session, dir) frames: a process hosts one or two sessions in
  * practice, so the cap documents-and-bounds the retention; callers
  * simply re-memoize on the next access.
  */
object SessionMemo {

  private val MaxEntries = 32

  private val memo =
    scala.collection.concurrent.TrieMap.empty[(String, String, String), DataFrame]

  /** Stable per-session key (the session's UUID where exposed; an identity
    * hash otherwise — still unique per live session object).
    */
  def sessionKey(spark: SparkSession): String =
    org.apache.spark.sql.graftshim.ColumnBridge
      .sessionUUID(spark)
      .getOrElse(s"nonclassic-${System.identityHashCode(spark)}")

  def getOrElseUpdate(tag: String, spark: SparkSession, dir: String)(
      build: => DataFrame): DataFrame = {
    if (memo.size > MaxEntries) {
      // Unpersist what we evict — dropping the reference alone would
      // leave the cached blocks registered in the BlockManager for the
      // session's lifetime. Unpersisting a frame another caller still
      // holds is safe (it just recomputes on next use).
      memo.values.foreach { df =>
        try df.unpersist(blocking = false)
        catch { case _: Throwable => () }
      }
      memo.clear()
    }
    memo.getOrElseUpdate((tag, sessionKey(spark), dir), build)
  }

  /** A per-session scratch directory root: isolates concurrent drivers (or
    * test suites) on one machine from clobbering each other's sink paths
    * mid-query. Same UUID => same path, so re-runs within a session still
    * get overwrite semantics.
    */
  def tmpDir(spark: SparkSession, tag: String): String =
    s"${System.getProperty("java.io.tmpdir", "/tmp")}/graft-${sessionKey(spark)}/$tag"
}
