package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Apply a keyed changeset to a snapshot — the batch MERGE INTO / CDC
  * apply step, and the inverse of [[SnapshotDiff]]: `diff` extracts the
  * drift between two snapshots, `applyChanges` replays it.
  *
  * The changeset carries the full payload for `upsert` rows and only the
  * key for `delete` rows; a key must appear at most once (the caller's
  * CDC compaction — e.g. the keep-latest-per-key operator — guarantees
  * that upstream).
  *
  * Plan shape: one left-anti join of the base against the changeset keys
  * (drops deleted AND replaced rows) plus a union of the upsert payloads
  * — the anti join hashes only the changeset's slim key column against
  * the base, so a 100 TB base with a KB-scale changeset broadcasts the
  * keys and never shuffles (AQE picks the broadcast side automatically;
  * the base never moves in either strategy).
  */
object Merge {

  def applyChanges(
      base: DataFrame,
      changes: DataFrame,
      keys: Seq[String],
      opCol: String = "op"): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    val upserts = changes.filter(col(opCol) === "upsert").drop(opCol)
    val changedKeys = changes.select(keys.map(col): _*)
    base
      .join(changedKeys, keys, "left_anti")
      .unionByName(upserts.select(base.columns.map(col): _*))
  }

  /** Version-aware CDC apply: keep, per key, the row with the highest
    * version (the `versionCols` tuple, compared lexicographically); if
    * that winner is a `delete` tombstone the key disappears. Because the
    * winner is decided by version — not by arrival — sequential
    * application over ANY micro-batch partitioning of the changeset
    * yields the same state as one global pass IF the state retains
    * tombstones between applications: use [[applyVersionedRetained]] for
    * that (the streaming-merge kernel,
    * [[graft.streaming.StreamingQueries]] st_cdc). This tombstone-
    * DROPPING form is the one-shot batch MERGE: correct when the whole
    * changeset is merged in a single call, but an upsert older than an
    * already-applied delete would resurrect the key if applied in a
    * later call — retain tombstones for the out-of-order horizon when
    * applying incrementally.
    *
    * One shuffle on the key columns; the per-key window is a top-1, which
    * Spark executes as a running filter, not a full sort of the state.
    */
  def applyVersioned(
      base: DataFrame,
      changes: DataFrame,
      keys: Seq[String],
      versionCols: Seq[String],
      opCol: String = "op"): DataFrame =
    applyVersionedRetained(
      base.withColumn(opCol, lit("upsert")),
      changes, keys, versionCols, opCol)
      .filter(col(opCol) =!= "delete")
      .drop(opCol)

  /** Tombstone-RETAINING version-aware apply: `state` and `changes` both
    * carry `opCol`; the output keeps the version-winning row per key —
    * including winning `delete` tombstones — so the result is a valid
    * `state` for the next incremental application. Retention is what
    * makes sequential application over ANY partitioning of the changeset
    * equal to one global pass: a retained tombstone still out-versions an
    * older upsert that arrives in a later batch. Presentation reads
    * filter `opCol != 'delete'`.
    *
    * Version ties break deterministically: `opCol` descending (an upsert
    * out-ranks a delete carrying the identical version — an upstream
    * ambiguity either way, pinned so reruns agree), then a hash of the
    * full row, so the winner never depends on plan or partitioning.
    */
  def applyVersionedRetained(
      state: DataFrame,
      changes: DataFrame,
      keys: Seq[String],
      versionCols: Seq[String],
      opCol: String = "op"): DataFrame = {
    require(keys.nonEmpty && versionCols.nonEmpty)
    val all = state.unionByName(changes)
    val tieBreak = xxhash64(all.columns.map(col): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(versionCols.map(c => col(c).desc) ++ Seq(col(opCol).desc, tieBreak.asc): _*)
    all
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }
}
