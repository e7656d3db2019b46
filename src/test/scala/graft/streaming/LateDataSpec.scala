package graft.streaming

import graft.SparkSpec

class LateDataSpec extends SparkSpec {
  import spark.implicits._

  test("watermark late-drop accounting: drops are real, bounded, and consistent") {
    val rows = StreamingQueries.stLate(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // consistency: dropped = all - final, never negative, never exceeds
    // the straggler share of the hour
    rows.foreach { case (hour, nAll, nFinal, nDropped) =>
      assert(nDropped == nAll - nFinal, hour)
      assert(nDropped >= 0 && nFinal >= 0, hour)
    }
    // the watermark genuinely drops something across the replay
    assert(rows.map(_._4).sum > 0, "no rows were dropped — late filter not exercised")
    // and most on-time data survives (drops are only the staged stragglers)
    val (all, fin) = (rows.map(_._2).sum, rows.map(_._3).sum)
    assert(fin >= all * 9 / 10, s"final $fin vs all $all")
  }
}
