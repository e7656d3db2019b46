package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** The events corpus happens to carry single-key props maps; q60's oracle
  * was generalized to any key set, and this fixture pins the Spark-side
  * chain on a genuinely multi-key map so the generalization can't silently
  * regress to a single-key assumption.
  */
class MapHofSpec extends SparkSpec {

  test("q60's map-HOF chain handles multi-key maps") {
    import spark.implicits._
    val df = Seq(
      (1L, """{"a": 1, "bb": 4, "ccc": 3}"""),
      (2L, """{"k": 7}"""),
      (3L, """{}"""))
      .toDF("event_id", "props")
    val out = df
      .select(
        col("event_id"),
        explode(
          RelationalQueries.mapHofChain(
            from_json(col("props"), DataType.fromDDL("map<string,bigint>"))))
          .as(Seq("key", "value")))
      .as[(Long, String, Long)]
      .collect()
      .toSet
    // a: 1*2+1 = 3 (keep), bb: 4*2+2 = 10 (drop), ccc: 3*2+3 = 9 (keep),
    // k: 7*2+1 = 15 (keep); {} contributes nothing.
    assert(out == Set((1L, "a", 3L), (1L, "ccc", 9L), (2L, "k", 15L)))
  }
}
