package graft.operators

import graft.SparkSpec

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("profile: nulls, distincts, and type-aware min/max render per column") {
    val df = Seq(
      (1L, Some(2.5), Some("b")),
      (2L, None, Some("a")),
      (2L, Some(1.0), None),
      (3L, Some(2.5), Some("a")))
      .toDF("id", "score", "tag")
    val p = Profiler.profile(df)
      .as[(String, Long, Long, Long, String, String)]
      .collect()
      .map(r => r._1 -> r)
      .toMap
    assert(p("id") == (("id", 4L, 0L, 3L, "1", "3")))
    assert(p("score") == (("score", 4L, 1L, 2L, "1.00", "2.50")))
    assert(p("tag") == (("tag", 4L, 1L, 2L, "a", "b")))
  }

  test("profile is a single aggregate job (one pass over the input)") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "tag")
    val plan = Profiler.profile(df).queryExecution.optimizedPlan.toString
    // one scan of the input, not one per column
    assert("LocalRelation|Scan".r.findAllIn(plan).size <= 2, plan)
  }
}
