package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // probe: (key, time, pid)   build: (key, time, value)
  private lazy val probeDf: DataFrame =
    Seq(
      (1L, 10L, "p1"), (1L, 20L, "p2"), (1L, 5L, "p0"),
      (2L, 7L, "p3"), (3L, 100L, "p4")
    ).toDF("k", "t", "pid")

  private lazy val buildDf: DataFrame =
    Seq(
      (1L, 10L, 100.0), (1L, 15L, 150.0), (1L, 1L, 10.0),
      (2L, 8L, 80.0), (9L, 1L, 999.0)
    ).toDF("k", "t", "v")

  /** Reference semantics via the naive pair join + top-1 window. */
  private def bruteAsOf(backward: Boolean): DataFrame = {
    val b = buildDf.select(col("k"), col("t").as("bt"), col("v"))
    val cond =
      if (backward) col("bt") <= col("t") else col("bt") >= col("t")
    val rankOrder =
      if (backward) col("bt").desc else col("bt").asc
    val w = Window.partitionBy(col("pid")).orderBy(rankOrder)
    probeDf
      .join(b, probeDf("k") === b("k") && cond, "left")
      .drop(b("k"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 || col("bt").isNull)
      .select(col("k"), col("t"), col("pid"), col("bt").as("asof_t"), col("v"))
  }

  private def normalize(df: DataFrame): Set[(Long, Long, String, Option[Long], Option[Double])] =
    df.select(col("k"), col("t"), col("pid"), col("asof_t"), col("v"))
      .collect()
      .map(r =>
        (r.getLong(0), r.getLong(1), r.getString(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .toSet

  test("backward as-of matches the brute-force pair join") {
    val fast = AsOfJoin.asOf(probeDf, buildDf, "k", "t", Seq("v"))
    assert(normalize(fast) == normalize(bruteAsOf(backward = true)))
    // spot checks: inclusive at equal time; no-match probe keeps nulls
    val m = fast.collect().map(r => r.getString(2) -> Option(r.get(3))).toMap
    assert(m("p1").contains(10L)) // equal instant matches
    assert(m("p0").contains(1L))
    assert(m("p4").isEmpty) // key 3 has no build rows
  }

  test("forward as-of matches the brute-force pair join") {
    val fast =
      AsOfJoin.asOf(probeDf, buildDf, "k", "t", Seq("v"), AsOfJoin.Forward)
    assert(normalize(fast) == normalize(bruteAsOf(backward = false)))
  }

  test("tolerance masks too-distant matches but keeps the row") {
    val fast = AsOfJoin.asOf(
      probeDf, buildDf, "k", "t", Seq("v"),
      AsOfJoin.Backward, tolerance = Some(lit(5L)))
    val m = fast.collect().map(r => r.getString(2) -> Option(r.get(3))).toMap
    assert(m.size == 5) // every probe row survives
    assert(m("p1").contains(10L)) // gap 0 <= 5
    assert(m("p2").contains(15L)) // gap 5 <= 5 (inclusive)
    assert(m("p0").contains(1L)) // gap 4 <= 5
    assert(m("p3").isEmpty) // key 2's only build row is in the future

    val tight = AsOfJoin.asOf(
      probeDf, buildDf, "k", "t", Seq("v"),
      AsOfJoin.Backward, tolerance = Some(lit(3L)))
    val mt = tight.collect().map(r => r.getString(2) -> Option(r.get(3))).toMap
    assert(mt.size == 5)
    assert(mt("p0").isEmpty) // gap 4 > 3 -> masked, row kept
  }

  test("equal-time build ties resolve to the greatest tie-break in both directions") {
    val b = Seq((1L, 10L, 1.0, 7L), (1L, 10L, 2.0, 9L), (1L, 10L, 3.0, 3L))
      .toDF("k", "t", "v", "tb")
    val back = AsOfJoin
      .asOf(Seq((1L, 12L, "x")).toDF("k", "t", "pid"), b, "k", "t", Seq("v"), tieBreak = Some("tb"))
      .collect()
      .head
    assert(back.getAs[Double]("v") == 2.0)
    val fwd = AsOfJoin
      .asOf(
        Seq((1L, 8L, "x")).toDF("k", "t", "pid"), b, "k", "t", Seq("v"),
        AsOfJoin.Forward, tieBreak = Some("tb"))
      .collect()
      .head
    assert(fwd.getAs[Double]("v") == 2.0)
  }

  test("timestamp typed time column works end-to-end") {
    val p = Seq((1L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), "a"))
      .toDF("k", "t", "pid")
    val b = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 5.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-03 00:00:00"), 9.0))
      .toDF("k", "t", "v")
    val r = AsOfJoin.asOf(p, b, "k", "t", Seq("v")).collect().head
    assert(r.getAs[Double]("v") == 5.0)
  }
}
