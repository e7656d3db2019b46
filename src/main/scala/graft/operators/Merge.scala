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
}
