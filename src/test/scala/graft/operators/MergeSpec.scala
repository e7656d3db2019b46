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

  test("applyVersioned: same final state under any batch partitioning of the changeset") {
    val rnd = new scala.util.Random(331)
    // random change log: key 1..8, version = unique v, ~1/4 deletes
    val log = (1L to 60L).map { v =>
      (rnd.nextInt(8).toLong + 1, s"p$v", v, if (rnd.nextInt(4) == 0) "delete" else "upsert")
    }
    val empty = Seq.empty[(Long, String, Long)].toDF("k", "payload", "v")
    def state(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Long)] =
      df.as[(Long, String, Long)].collect().toSet
    def applyAll(batches: Seq[Seq[(Long, String, Long, String)]]) =
      batches.foldLeft(empty) { (cur, b) =>
        Merge.applyVersioned(cur, b.toDF("k", "payload", "v", "op"), Seq("k"), Seq("v"))
      }
    val oneShot = state(applyAll(Seq(log)))
    val twoBatches = state(applyAll(log.grouped(30).toSeq))
    val manyBatches = state(applyAll(log.grouped(7).toSeq))
    assert(oneShot == twoBatches)
    assert(oneShot == manyBatches)
    // and it equals the driver-side replay: latest version wins, delete drops
    val want = log.groupBy(_._1).flatMap { case (k, cs) =>
      val latest = cs.maxBy(_._3)
      if (latest._4 == "upsert") Some((k, latest._2, latest._3)) else None
    }.toSet
    assert(oneShot == want)
  }

  test("applyVersioned: a newer upsert resurrects a deleted key in a later batch") {
    val empty = Seq.empty[(Long, String, Long)].toDF("k", "payload", "v")
    val afterDelete = Merge.applyVersioned(
      empty, Seq((1L, "x", 1L, "upsert"), (1L, "", 2L, "delete")).toDF("k", "payload", "v", "op"),
      Seq("k"), Seq("v"))
    assert(afterDelete.count() == 0)
    val resurrected = Merge.applyVersioned(
      afterDelete, Seq((1L, "y", 3L, "upsert")).toDF("k", "payload", "v", "op"),
      Seq("k"), Seq("v"))
    assert(resurrected.as[(Long, String, Long)].collect().toSet == Set((1L, "y", 3L)))
  }

  test("applyVersionedRetained: a retained tombstone beats an OLDER upsert arriving later") {
    // The case the tombstone-dropping form gets wrong across batches:
    // delete@v2 applied in batch 1, upsert@v1 arrives in batch 2. With
    // retention the key stays dead; without, it would resurrect.
    val empty = Seq.empty[(Long, String, Long, String)].toDF("k", "payload", "v", "op")
    val s1 = Merge.applyVersionedRetained(
      empty, Seq((1L, "", 2L, "delete")).toDF("k", "payload", "v", "op"), Seq("k"), Seq("v"))
    val s2 = Merge.applyVersionedRetained(
      s1, Seq((1L, "stale", 1L, "upsert")).toDF("k", "payload", "v", "op"), Seq("k"), Seq("v"))
    val live = s2.filter(col("op") =!= "delete")
    assert(live.count() == 0, "older upsert resurrected a tombstoned key")
    // the tombstone itself is still in the state, still at v2
    assert(s2.as[(Long, String, Long, String)].collect().toSet == Set((1L, "", 2L, "delete")))
  }

  test("applyVersionedRetained: same state under ANY assignment of changes to batches") {
    val rnd = new scala.util.Random(77)
    // random change log with unique versions, keys 1..6, ~1/3 deletes
    val log = rnd.shuffle((1L to 48L).toList).map { v =>
      (v % 6 + 1, s"p$v", v, if (v % 3 == 0) "delete" else "upsert")
    }
    val empty = Seq.empty[(Long, String, Long, String)].toDF("k", "payload", "v", "op")
    def applyAll(batches: Seq[Seq[(Long, String, Long, String)]]) =
      batches
        .foldLeft(empty) { (cur, b) =>
          Merge.applyVersionedRetained(
            cur, b.toDF("k", "payload", "v", "op"), Seq("k"), Seq("v"))
        }
        .as[(Long, String, Long, String)]
        .collect()
        .toSet
    // one global pass vs sequential batches over a SHUFFLED log: versions
    // arrive out of order across batches, the partitioning-dependence trap
    val oneShot = applyAll(Seq(log))
    assert(oneShot == applyAll(log.grouped(5).toSeq))
    assert(oneShot == applyAll(log.grouped(13).toSeq))
    // equals the driver-side replay INCLUDING the retained tombstones
    val want = log.groupBy(_._1).map { case (_, cs) => cs.maxBy(_._3) }.toSet
    assert(oneShot == want)
  }

  test("applyVersionedRetained: full-version ties break deterministically (upsert over delete)") {
    val empty = Seq.empty[(Long, String, Long, String)].toDF("k", "payload", "v", "op")
    val tied = Seq((1L, "a", 5L, "delete"), (1L, "a", 5L, "upsert")).toDF("k", "payload", "v", "op")
    // op desc pins the winner regardless of input order or partitioning
    (1 to 3).foreach { _ =>
      val got = Merge
        .applyVersionedRetained(empty, tied.repartition(4), Seq("k"), Seq("v"))
        .as[(Long, String, Long, String)]
        .collect()
        .toSet
      assert(got == Set((1L, "a", 5L, "upsert")))
    }
  }
}
