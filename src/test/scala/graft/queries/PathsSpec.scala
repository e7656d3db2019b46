package graft.queries

import graft.SparkSpec

/** Driver-side replay of q80_paths: sessions re-derived with plain Scala
  * (30-min gap, (ts, event_id) order), paths re-assembled, distribution
  * compared exactly.
  */
class PathsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("path distribution replays exactly") {
    val ev = Tables
      .events(spark, dir)
      .selectExpr("user_id", "event_id", "event_type", "unix_micros(ts) AS us")
      .as[(Long, Long, String, Long)]
      .collect()
    val paths = ev
      .groupBy(_._1)
      .values
      .flatMap { es =>
        val ordered = es.sortBy(e => (e._4, e._2))
        val sessions = scala.collection.mutable.ArrayBuffer.empty[List[String]]
        var cur = List.empty[String]
        var prev = Long.MinValue
        ordered.foreach { case (_, _, tpe, us) =>
          if (prev == Long.MinValue || us - prev > 1800L * 1000000L) {
            if (cur.nonEmpty) sessions += cur.reverse
            cur = Nil
          }
          cur = tpe :: cur
          prev = us
        }
        if (cur.nonEmpty) sessions += cur.reverse
        sessions.map(_.take(3).mkString(">"))
      }
      .groupBy(identity)
      .map { case (p, g) => p -> g.size.toLong }
    val got = RelationalQueries.q80Paths(spark, dir).as[(String, Long)].collect()
    assert(got.toMap == paths)
    // ordering: count desc then path asc
    assert(got.sortBy(r => (-r._2, r._1)).toSeq == got.toSeq)
    assert(got.exists(_._1.count(_ == '>') == 2), "three-step paths exist")
  }
}
