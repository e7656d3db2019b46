package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

class MergeSpec extends SparkSpec {
  import spark.implicits._

  test("upserts replace, deletes drop, new keys insert, untouched rows pass through") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (2L, "B", "upsert"), // replace
      (3L, null.asInstanceOf[String], "delete"), // drop
      (9L, "z", "upsert") // insert
    ).toDF("k", "v", "op")
    val got = Merge
      .applyChanges(base, changes, Seq("k"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1)
      .toSeq
    assert(got == Seq((1L, "a"), (2L, "B"), (9L, "z")))
  }

  test("deleting an absent key is a no-op") {
    val base = Seq((1L, "a")).toDF("k", "v")
    val changes = Seq((42L, null.asInstanceOf[String], "delete")).toDF("k", "v", "op")
    assert(Merge.applyChanges(base, changes, Seq("k")).count() == 1)
  }

  test("diff then merge round-trips: applyChanges(before, changeset(diff)) == after") {
    val rnd = new Random(41)
    def snap(seed: Int) = {
      val r = new Random(seed)
      (0L until 150L).flatMap { k =>
        if (r.nextInt(8) == 0) None else Some((k, r.nextInt(4).toString, r.nextInt(50).toLong))
      }
    }
    val before = snap(5)
    val after = snap(6)
    val b = before.toDF("k", "s", "v")
    val a = after.toDF("k", "s", "v")

    // changeset straight from the diff classification: upserts carry the
    // AFTER payload, removals carry only the key
    val statuses = SnapshotDiff.diff(b, a, Seq("k"), Seq("s", "v"))
    val changes = statuses
      .join(a, Seq("k"), "left")
      .select(
        col("k"),
        col("s"),
        col("v"),
        when(col("status") === "removed", "delete").otherwise("upsert").as("op"))

    val merged = Merge
      .applyChanges(b, changes, Seq("k"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(merged == after.toSet)
  }
}
