package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark 4's `private[sql]` Column <-> Expression converters.
  * Lives under `org.apache.spark.sql` solely to satisfy the access scope;
  * all graft code goes through [[graft.functions.Compat]].
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The classic session's `private[sql]` UUID — a collision-free,
    * GC-neutral memoization key (unlike identity hash codes or
    * session-keyed weak maps).
    */
  def sessionUUID(spark: org.apache.spark.sql.SparkSession): Option[String] = spark match {
    case c: org.apache.spark.sql.classic.SparkSession => Some(c.sessionUUID)
    case _ => None
  }

  /** Unset the context's checkpoint directory (`private[spark]` var; there
    * is no public unset). Lets a test restore the no-checkpoint-dir state
    * on a shared session after exercising reliable-checkpoint mode.
    */
  def clearCheckpointDir(sc: org.apache.spark.SparkContext): Unit =
    sc.checkpointDir = None

  /** Spark's internal Bloom-filter runtime-filter expressions, exposed as
    * Columns: `bloom_filter_agg` / `might_contain` power Spark's own
    * row-level runtime filtering but are not registered in the public SQL
    * catalog.
    */
  def bloomFilterAgg(child: Column, estimatedItems: Long, numBits: Long): Column =
    ExpressionUtils.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(
          ExpressionUtils.expression(child),
          org.apache.spark.sql.catalyst.expressions.Literal(estimatedItems),
          org.apache.spark.sql.catalyst.expressions.Literal(numBits))
        .toAggregateExpression())

  def mightContain(bloom: Column, value: Column): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        ExpressionUtils.expression(bloom),
        ExpressionUtils.expression(value)))

  /** Whether `df` resolves to a CacheManager entry whose column buffers
    * are ALREADY materialized: Some(false) = the next action on it pays
    * the lazy persist's build (the Bench attribution signal — the memo
    * registered the frame, but THIS consumer is about to materialize it);
    * None = no top-level cache entry for this exact plan. Both the
    * lookup and `isCachedColumnBuffersLoaded` are `private[sql]`.
    */
  def cachedBuffersLoaded(df: org.apache.spark.sql.DataFrame): Option[Boolean] =
    df.sparkSession match {
      case c: org.apache.spark.sql.classic.SparkSession =>
        try df match {
          case d: org.apache.spark.sql.classic.Dataset[_] =>
            c.sharedState.cacheManager
              .lookupCachedData(d)
              .map(_.cachedRepresentation.cacheBuilder.isCachedColumnBuffersLoaded)
          case _ => None
        } catch { case _: Throwable => None }
      case _ => None
    }

  /** `Observation.getOrEmpty` is `private[sql]`: a NON-blocking (≤100 ms
    * wait) read of observed metrics. The public `get` blocks forever if
    * the observed node never executed — e.g. when a plan lands entirely
    * inside an already-built `InMemoryRelation` — so iterative operators
    * that read per-round metrics need the bounded form plus a fallback.
    */
  def observedOrEmpty(o: org.apache.spark.sql.Observation): Map[String, _] =
    o.getOrEmpty
}
