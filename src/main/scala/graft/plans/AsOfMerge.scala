package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Ascending, Attribute, AttributeReference, AttributeSet, Descending, GenericInternalRow,
  JoinedRow, SortOrder, UnsafeProjection
}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

/** Sort-merge backend for the backward as-of join — the repo's one custom
  * physical operator, demonstrating tier (c) of the extension ladder
  * (logical node → planner Strategy → SparkPlan, injected through
  * `SparkSessionExtensions` in [[graft.GraftSession]]).
  *
  * The default [[graft.operators.AsOfJoin]] composes built-ins: union both
  * sides, run one per-key running `last(ignoreNulls)` window. Correct and
  * AQE-friendly, but it materializes the union (every probe row widens to
  * carry a null build struct and vice versa) and pays the window
  * machinery's frame bookkeeping. This exec asks the planner for exactly
  * what the semantics need — both children hash-clustered on the key and
  * sorted by (key, time) — and then streams ONE forward pass per
  * partition, carrying a single build row of state, emitting probe rows
  * 1:1. Same exchange count as the window plan, no union widening, no
  * sort beyond what EnsureRequirements already inserts, O(1) state.
  *
  * Scope: LongType key and time (epoch micros), both directions;
  * tolerance is a post-pass projection. The window backend stays the
  * general API; [[AsOfMergeSpec]] pins the two backends equal on
  * randomized inputs, the CcEquivalence pattern.
  */
object AsOfMerge {

  /** As-of join `probe` with `build` on equal `key`: attach the build row
    * with the greatest `time` at-or-before the probe row's `time`, as
    * `asof_<time>` plus `buildValues`. Left-join semantics (unmatched
    * probe rows keep nulls). Build rows sharing (key, time) are resolved
    * by greatest `tieBreak` (sorted last wins); pass a unique tieBreak or
    * pre-aggregate the build side for full determinism.
    *
    * Null semantics (SQL equality): a null key or time matches NOTHING —
    * null build rows are skipped without becoming state, null probe rows
    * pass through unmatched. Pinned equal to the window backend's
    * explicit null handling by AsOfMergeSpec's nullable-input test.
    */
  def asOf(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      time: String,
      buildValues: Seq[String],
      tieBreak: Option[String] = None,
      forward: Boolean = false,
      tolerance: Option[Column] = None): DataFrame = {
    val spark = probe.sparkSession
    val bCols = (Seq(key, time) ++ tieBreak ++ buildValues).distinct
    val bNarrow = build.select(bCols.map(col): _*)

    val pPlan = probe.queryExecution.analyzed
    // Re-alias every build column: fresh exprIds make the node safe when
    // probe and build derive from the same cached frame (self-as-of).
    val bAnalyzed = bNarrow.queryExecution.analyzed
    val bPlan = Project(bAnalyzed.output.map(a => Alias(a, a.name)()), bAnalyzed)

    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output
        .find(_.name == name)
        .getOrElse(throw new IllegalArgumentException(s"column $name not found"))
    val (pk, pt) = (attr(pPlan, key), attr(pPlan, time))
    val (bk, bt) = (attr(bPlan, key), attr(bPlan, time))
    require(pk.dataType == LongType && pt.dataType == LongType &&
      bk.dataType == LongType && bt.dataType == LongType,
      s"AsOfMerge requires LongType key/time; got ${pk.dataType}/${pt.dataType}")
    require(!probe.columns.contains(s"asof_$time"),
      s"probe already has a column named asof_$time")
    require(buildValues.forall(v => !probe.columns.contains(v)),
      "buildValues collide with probe column names")

    val node = AsOfMergeJoin(
      pPlan,
      bPlan,
      pk,
      pt,
      bk,
      bt,
      tieBreak.map(attr(bPlan, _)),
      buildValues.map(attr(bPlan, _)),
      AttributeReference(s"asof_$time", LongType, nullable = true)(),
      forward)
    val joinedDf = GraftBridge.ofRows(spark, node)
    // Tolerance is a post-pass projection, not exec logic: mask the
    // attachment when the probe-to-build gap exceeds the bound (row kept,
    // build columns nulled — pandas merge_asof(tolerance=...) semantics).
    tolerance match {
      case None => joinedDf
      case Some(tol) =>
        val asofCol = s"asof_$time"
        val gap =
          if (forward) col(asofCol) - col(time) else col(time) - col(asofCol)
        val within = col(asofCol).isNotNull && gap <= tol
        val keep = probe.columns.map(col).toSeq
        val masked = (asofCol +: buildValues).map(c =>
          org.apache.spark.sql.functions.when(within, col(c)).otherwise(
            org.apache.spark.sql.functions.lit(null)).as(c))
        joinedDf.select(keep ++ masked: _*)
    }
  }
}

/** Logical as-of merge join; planned by [[AsOfMergeStrategy]]. Built from
  * already-analyzed children, so it is born resolved.
  */
case class AsOfMergeJoin(
    probe: LogicalPlan,
    build: LogicalPlan,
    probeKey: Attribute,
    probeTime: Attribute,
    buildKey: Attribute,
    buildTime: Attribute,
    buildTie: Option[Attribute],
    buildValues: Seq[Attribute],
    asofTimeOut: AttributeReference,
    forward: Boolean)
    extends BinaryNode {
  override def left: LogicalPlan = probe
  override def right: LogicalPlan = build
  override def output: Seq[Attribute] =
    probe.output ++ (asofTimeOut +: buildValues.map(_.withNullability(true)))
  // asof_<time> is minted by this node, not read from a child — declare
  // it produced or CheckAnalysis reports it missing from the input.
  override def producedAttributes: AttributeSet = AttributeSet(asofTimeOut)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan,
      newRight: LogicalPlan): AsOfMergeJoin =
    copy(probe = newLeft, build = newRight)
}

/** Plans [[AsOfMergeJoin]] to [[AsOfMergeJoinExec]]; injected via
  * `injectPlannerStrategy` in [[graft.GraftSession]].
  */
object AsOfMergeStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfMergeJoin =>
      AsOfMergeJoinExec(
        j.probeKey, j.probeTime, j.buildKey, j.buildTime, j.buildTie,
        j.buildValues, j.asofTimeOut, j.forward, planLater(j.probe), planLater(j.build)) :: Nil
    case _ => Nil
  }
}

/** Physical streaming-merge as-of: requiredChildDistribution/-Ordering let
  * EnsureRequirements place the exchanges and sorts (reusing any existing
  * partitioning/order, exactly like SortMergeJoinExec), then doExecute
  * zips co-partitioned children and walks both sorted streams once.
  */
case class AsOfMergeJoinExec(
    probeKey: Attribute,
    probeTime: Attribute,
    buildKey: Attribute,
    buildTime: Attribute,
    buildTie: Option[Attribute],
    buildValues: Seq[Attribute],
    asofTimeOut: AttributeReference,
    forward: Boolean,
    left: SparkPlan,
    right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (asofTimeOut +: buildValues.map(_.withNullability(true)))

  override def producedAttributes: AttributeSet = AttributeSet(asofTimeOut)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(probeKey)) :: ClusteredDistribution(Seq(buildKey)) :: Nil

  // Time order flips for the Forward direction (the pass then retains
  // the SMALLEST at-or-after time). The build side additionally orders by
  // the tiebreak so the LAST row at an equal (key, time) — the one the
  // merge pass retains — is the greatest tiebreak, matching the window
  // backend's resolution in both directions.
  private def timeOrder = if (forward) Descending else Ascending
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(probeKey, Ascending), SortOrder(probeTime, timeOrder)) ::
      (Seq(SortOrder(buildKey, Ascending), SortOrder(buildTime, timeOrder)) ++
        buildTie.map(SortOrder(_, Ascending))) :: Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def withNewChildrenInternal(
      newLeft: SparkPlan,
      newRight: SparkPlan): AsOfMergeJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val pKeyIdx = left.output.indexWhere(_.exprId == probeKey.exprId)
    val pTimeIdx = left.output.indexWhere(_.exprId == probeTime.exprId)
    val bKeyIdx = right.output.indexWhere(_.exprId == buildKey.exprId)
    val bTimeIdx = right.output.indexWhere(_.exprId == buildTime.exprId)
    val bWidth = right.output.size
    val projExprs = left.output ++
      (buildTime.withNullability(true) +: buildValues.map(_.withNullability(true)))
    val inputSchema = left.output ++ right.output.map(_.withNullability(true))

    left.execute().zipPartitions(right.execute()) { (pIter, bIter) =>
      val proj = UnsafeProjection.create(projExprs, inputSchema)
      val joined = new JoinedRow
      val nullBuild = new GenericInternalRow(bWidth)

      new Iterator[InternalRow] {
        // One-row build lookahead, copied out of the unsafe iterator.
        private var aheadRow: InternalRow = _
        private var aheadKey = 0L
        private var aheadTime = 0L
        private var aheadValid = false
        // Last consumed build row (the as-of candidate) and its key.
        private var candRow: InternalRow = _
        private var candKey = 0L
        advance()

        private def advance(): Unit = {
          aheadValid = false
          while (!aheadValid && bIter.hasNext) {
            val r = bIter.next()
            // Null key/time rows match nothing under SQL equality; they
            // are skipped wherever the sort placed them (position is
            // irrelevant — nothing here depends on a null ordering) and
            // never become state. The window backend drops the same rows
            // pre-union, so both backends agree on nullable inputs.
            if (!r.isNullAt(bKeyIdx) && !r.isNullAt(bTimeIdx)) {
              aheadRow = r.copy()
              aheadKey = aheadRow.getLong(bKeyIdx)
              aheadTime = aheadRow.getLong(bTimeIdx)
              aheadValid = true
            }
          }
        }

        override def hasNext: Boolean = pIter.hasNext

        override def next(): InternalRow = {
          val p = pIter.next()
          if (p.isNullAt(pKeyIdx) || p.isNullAt(pTimeIdx)) proj(joined(p, nullBuild))
          else {
            val k = p.getLong(pKeyIdx)
            val t = p.getLong(pTimeIdx)
            // Probe rows arrive in (key, time-ordered) sequence, so
            // consuming every build row at-or-before (backward) /
            // at-or-after (forward) (k, t) is monotone: state never
            // rewinds, each build row is touched exactly once.
            while (aheadValid && (aheadKey < k || (aheadKey == k &&
                (if (forward) aheadTime >= t else aheadTime <= t)))) {
              candRow = aheadRow
              candKey = aheadKey
              advance()
            }
            val matched = candRow != null && candKey == k
            proj(joined(p, if (matched) candRow else nullBuild))
          }
        }
      }
    }
  }
}
