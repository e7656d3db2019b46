package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Distributed as-of (point-in-time) join.
  *
  * For every probe row, attach the single build row with the greatest
  * build time at-or-before the probe time (`Backward`, the default) or
  * the smallest build time at-or-after it (`Forward`), within the same
  * key group — the temporal-attribution join (latest price for a trade,
  * last purchase before a click) that Spark has no built-in operator for.
  *
  * NOT a range join: a naive `probe JOIN build ON key AND bTime <= pTime`
  * explodes to every qualifying pair and needs a top-1 filter afterwards,
  * paying O(pairs) shuffle. This is the union-window formulation instead:
  * tag both sides, union them, and run ONE running `last(ignoreNulls)`
  * window over the merged per-key timeline — each build row is carried
  * forward (or backward) to the probe rows it answers, so the cost is one
  * shuffle of |probe| + |build| rows and a per-key sort, independent of
  * how many build rows precede each probe. That is the plan a
  * 1000-executor cluster wants: hash-exchange on the key, in-partition
  * sort, no pair blowup. Remaining scale caveat: a single pathologically
  * hot key serializes its own timeline into one task (the window cannot
  * be salted without breaking carry-forward); mitigation at 100 TB is
  * time-bucketing such keys with per-bucket seed rows, not needed here.
  *
  * Build rows that share (key, time) are made deterministic by
  * `tieBreak` (greatest wins, in either direction); pre-aggregating the
  * build side to unique (key, time) sidesteps the question entirely and
  * is what the shipped queries do.
  *
  * `tolerance` (optional) masks the attachment when the probe-to-build
  * gap exceeds the given duration — the row is kept with null build
  * columns, same as pandas `merge_asof(tolerance=...)`.
  */
object AsOfJoin {

  sealed trait Direction
  case object Backward extends Direction
  case object Forward extends Direction

  /** As-of join `probe` with `build` on equal `key`, attaching
    * `buildValues` columns plus the matched build time as `asof_<time>`.
    * Probe columns pass through unchanged; unmatched probe rows keep
    * nulls (left-join semantics).
    *
    * Null semantics (SQL equality, pinned equal to [[graft.plans.AsOfMerge]]
    * by AsOfMergeSpec): a null key or time matches NOTHING — build rows
    * with null key/time are dropped before the union (they could
    * otherwise seed a partition's running state), and probe rows with
    * null key/time pass through unmatched (the window's NULL-grouping
    * partition would otherwise attach them to each other).
    */
  def asOf(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      time: String,
      buildValues: Seq[String],
      direction: Direction = Backward,
      tolerance: Option[Column] = None,
      tieBreak: Option[String] = None): DataFrame = {
    require(
      !buildValues.contains(time),
      s"'$time' is attached automatically as asof_$time; don't list it in buildValues")
    require(
      !probe.columns.contains(s"asof_$time"),
      s"probe already has a column named asof_$time")
    val sideCol = "__graft_side"
    val probeStruct = "__graft_p"
    val buildStruct = "__graft_b"

    val probePayload = probe.columns.toSeq
    val pSchema = StructType(probe.schema.fields)
    val bFields = time +: buildValues
    val bSchema = StructType(build.select(bFields.map(col): _*).schema.fields)

    val p = probe.select(
      col(key),
      col(time).as("__t"),
      lit(1).as(sideCol),
      struct(probePayload.map(col): _*).as(probeStruct),
      lit(null).cast(bSchema).as(buildStruct),
      lit(null).cast("long").as("__tb"))
    val b = build.filter(col(key).isNotNull && col(time).isNotNull).select(
      col(key),
      col(time).as("__t"),
      lit(0).as(sideCol),
      lit(null).cast(pSchema).as(probeStruct),
      struct(bFields.map(col): _*).as(buildStruct),
      tieBreak.map(col(_).cast("long")).getOrElse(lit(0L)).as("__tb"))

    // Per-key timeline: build rows sort strictly before probe rows at the
    // same instant (side 0 < 1 ascending, and the reverse ordering flips
    // both columns), which is what makes the match INCLUSIVE at equal
    // times in both directions. Among equal-time build rows the greatest
    // tie-break lands nearest the probe row and wins the running last().
    val ordering: Seq[Column] = direction match {
      case Backward => Seq(col("__t").asc, col(sideCol).asc, col("__tb").asc)
      // __tb stays ASCENDING under the reversed time order too: the last
      // build row the running last() sees at an equal instant is then the
      // greatest tie-break in BOTH directions.
      case Forward => Seq(col("__t").desc, col(sideCol).asc, col("__tb").asc)
    }
    val w = Window
      .partitionBy(col(key))
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val attached = p
      .unionByName(b)
      .withColumn(buildStruct, last(col(buildStruct), ignoreNulls = true).over(w))
      .filter(col(sideCol) === 1)

    // A probe row with a null key or time matches nothing (the window
    // itself can't express that: a NULL key forms its own partition and
    // a NULL time sorts to one end, either of which could attach state).
    val probeNullSafe = col(key).isNotNull && col("__t").isNotNull
    val withinTolerance: Column = tolerance match {
      case None => probeNullSafe && col(buildStruct).isNotNull
      case Some(tol) =>
        val gap = direction match {
          case Backward => col("__t") - col(buildStruct)(time)
          case Forward => col(buildStruct)(time) - col("__t")
        }
        probeNullSafe && col(buildStruct).isNotNull && gap <= tol
    }
    val masked = attached.withColumn(
      buildStruct,
      when(withinTolerance, col(buildStruct)).otherwise(lit(null).cast(bSchema)))

    val outCols =
      probePayload.map(c => col(s"$probeStruct.$c").as(c)) ++
        (col(s"$buildStruct.$time").as(s"asof_$time") +:
          buildValues.map(c => col(s"$buildStruct.$c").as(c)))
    masked.select(outCols: _*)
  }
}
