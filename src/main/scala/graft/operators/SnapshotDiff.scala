package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed snapshot reconciliation: classify every row of two table
  * versions as added / removed / changed (with the list of changed
  * columns) — the regression gate a pipeline runs between yesterday's and
  * today's output, and the verification step after a migration or
  * backfill.
  *
  * One full-outer sort-merge join on the key — both sides shuffle once on
  * the same partitioning, every comparison is a null-safe column equality
  * inside the join's project, and unchanged rows are dropped BEFORE the
  * result leaves the join stage, so the output is proportional to the
  * CHANGE set, not the table (the 100 TB property: diffing two 100 TB
  * snapshots that agree on 99.9% of rows emits only the 0.1%).
  *
  * `changed_cols` is a comma-joined string in declaration order, not an
  * array, so downstream consumers (and the hash-gate driver) can sort and
  * compare it as a scalar.
  */
object SnapshotDiff {

  def diff(
      before: DataFrame,
      after: DataFrame,
      keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    // The presence markers below are injected by NAME; a user column that
    // shadows one would silently break presence detection (duplicate
    // column names resolve unpredictably through the aliased join).
    require(
      !(keys ++ compareCols).exists(c => c == "_bp" || c == "_ap"),
      "column names _bp/_ap are reserved by SnapshotDiff's presence markers")
    // Presence rides explicit marker columns, NOT key-null checks: the
    // null-safe join condition admits rows whose key columns are null, and
    // inferring presence from key nulls would misclassify them (an
    // all-null-key row present only in `before` would read "added").
    val b = before
      .select((keys ++ compareCols).map(col) :+ lit(true).as("_bp"): _*)
      .alias("b")
    val a = after
      .select((keys ++ compareCols).map(col) :+ lit(true).as("_ap"): _*)
      .alias("a")
    val joined = b.join(a, keys.map(k => col(s"b.$k") <=> col(s"a.$k")).reduce(_ && _), "full_outer")

    val bPresent = col("b._bp").isNotNull
    val aPresent = col("a._ap").isNotNull
    val changedList: Column = concat(compareCols.map { c =>
      when(!(col(s"b.$c") <=> col(s"a.$c")), lit(c + ",")).otherwise(lit(""))
    }: _*)
    val status = when(!bPresent, lit("added"))
      .when(!aPresent, lit("removed"))
      .when(changedList =!= "", lit("changed"))
      .otherwise(lit("unchanged"))

    joined
      .select(
        keys.map(k => coalesce(col(s"b.$k"), col(s"a.$k")).as(k)) ++
          Seq(
            status.as("status"),
            when(bPresent && aPresent, rtrim(changedList, ","))
              .otherwise(lit(""))
              .as("changed_cols")): _*)
      .filter(col("status") =!= "unchanged")
  }
}
