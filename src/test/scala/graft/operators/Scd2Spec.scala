package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  test("change log collapses to versioned ranges") {
    // key 1: gold -> gold -> silver -> silver -> gold (3 versions)
    // key 2: one row (1 open version)
    val log = Seq(
      (1L, 10L, "gold"), (1L, 20L, "gold"), (1L, 30L, "silver"),
      (1L, 40L, "silver"), (1L, 50L, "gold"),
      (2L, 15L, "bronze")
    ).toDF("k", "t", "tier")

    val dim = Scd2
      .build(log, "k", "t", Seq("tier"))
      .select("k", "tier", "effective_from", "effective_to", "is_current", "version")
      .collect()
      .map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          r.getBoolean(4), r.getLong(5)))
      .sortBy(r => (r._1, r._6))

    assert(dim.toSeq == Seq(
      (1L, "gold", 10L, Some(30L), false, 1L),
      (1L, "silver", 30L, Some(50L), false, 2L),
      (1L, "gold", 50L, None, true, 3L),
      (2L, "bronze", 15L, None, true, 1L)))
  }

  test("null attribute values are values, not wildcards") {
    val log = Seq(
      (1L, 1L, Some("a")), (1L, 2L, None), (1L, 3L, None), (1L, 4L, Some("a"))
    ).toDF("k", "t", "attr")
    val versions = Scd2
      .build(log, "k", "t", Seq("attr"))
      .orderBy("version")
      .collect()
      .map(r => (Option(r.getAs[String]("attr")), r.getAs[Long]("effective_from")))
    // a -> null (change) -> null (no change) -> a (change): 3 versions
    assert(versions.toSeq == Seq(
      (Some("a"), 1L), (None, 2L), (Some("a"), 4L)))
  }

  test("multi-attribute tracking opens a version when any attr changes") {
    val log = Seq(
      (1L, 1L, "x", 10L), (1L, 2L, "x", 10L), (1L, 3L, "x", 20L), (1L, 4L, "y", 20L)
    ).toDF("k", "t", "a", "b")
    val n = Scd2.build(log, "k", "t", Seq("a", "b")).count()
    assert(n == 3)
  }

  test("version ranges tile the timeline: from(v+1) == to(v)") {
    val log = (1L to 40L)
      .map(i => (i % 3, i, (i % 5).toString))
      .toDF("k", "t", "attr")
    val dim = Scd2.build(log, "k", "t", Seq("attr"))
    val bad = dim
      .withColumn(
        "next_from",
        lead(col("effective_from"), 1)
          .over(org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy("version")))
      .filter(col("next_from").isNotNull && col("effective_to") =!= col("next_from"))
      .count()
    assert(bad == 0)
    // exactly one current row per key
    val cur = dim.filter(col("is_current")).groupBy("k").count().collect()
    assert(cur.forall(_.getLong(1) == 1))
  }

  test("plans one exchange: the three window passes share the key sort") {
    val log = Seq((1L, 1L, "a")).toDF("k", "t", "attr")
    val plan = Scd2
      .build(log, "k", "t", Seq("attr"))
      .queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val exchanges = "(?m)^\\(\\d+\\) Exchange".r.findAllIn(plan).length
    assert(exchanges <= 1, s"SCD2 re-shuffles between windows:\n${plan.take(700)}")
  }
}
