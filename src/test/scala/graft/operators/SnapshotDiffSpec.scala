package graft.operators

import graft.SparkSpec

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  test("classifies added, removed, changed with the changed-column list") {
    val before = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, null.asInstanceOf[String], 40.0)
    ).toDF("k", "s", "v")
    val after = Seq(
      (1L, "a", 10.0), // unchanged -> dropped
      (2L, "B", 21.0), // both cols changed
      (4L, "d", 40.0), // null -> value is a change
      (5L, "e", 50.0) // added
    ).toDF("k", "s", "v")

    val got = SnapshotDiff
      .diff(before, after, Seq("k"), Seq("s", "v"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
      .toSeq

    assert(got == Seq(
      (2L, "changed", "s,v"),
      (3L, "removed", ""),
      (4L, "changed", "s"),
      (5L, "added", "")))
  }

  test("identical snapshots diff to empty") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("k", "s")
    val again = Seq((1L, "x"), (2L, "y")).toDF("k", "s")
    assert(SnapshotDiff.diff(df, again, Seq("k"), Seq("s")).isEmpty)
  }

  test("composite keys join null-safely") {
    val before = Seq((1L, Option.empty[String], 1.0)).toDF("k1", "k2", "v")
    val after = Seq((1L, Option.empty[String], 2.0)).toDF("k1", "k2", "v")
    val got = SnapshotDiff.diff(before, after, Seq("k1", "k2"), Seq("v")).collect()
    // null key matches null key (one changed row, not removed+added)
    assert(got.length == 1 && got.head.getString(2) == "changed")
  }

  test("an all-null-key row classifies by PRESENCE, not by key nulls") {
    // Regression: presence used to be inferred from key-column nulls, so a
    // row whose key is null and that exists only in `before` read "added".
    val before = Seq((Option.empty[Long], "x"), (Some(1L), "y")).toDF("k", "s")
    val after = Seq((Some(1L), "y")).toDF("k", "s")
    val got = SnapshotDiff
      .diff(before, after, Seq("k"), Seq("s"))
      .collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getString(1)))
      .toSeq
    assert(got == Seq((-1L, "removed")))
    // and the mirror: only-in-after with a null key is "added"
    val got2 = SnapshotDiff
      .diff(after, before, Seq("k"), Seq("s"))
      .collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getString(1)))
      .toSeq
    assert(got2 == Seq((-1L, "added")))
  }

  test("reserved marker column names are rejected up front") {
    // A user column named _bp/_ap would silently break presence detection
    // (duplicate names through the aliased join) — must fail loudly.
    val df = Seq((1L, "x")).toDF("k", "_bp")
    val e = intercept[IllegalArgumentException] {
      SnapshotDiff.diff(df, df, Seq("k"), Seq("_bp"))
    }
    assert(e.getMessage.contains("_bp"))
  }

  test("diff of same-lineage frames resolves without ambiguity") {
    val base = Seq((1L, 5.0), (2L, 6.0)).toDF("k", "v")
    val mod = base.withColumn("v", org.apache.spark.sql.functions.col("v") * 2)
    val got = SnapshotDiff.diff(base, mod, Seq("k"), Seq("v")).collect()
    assert(got.length == 2 && got.forall(_.getString(1) == "changed"))
  }
}
