package graft.queries

import graft.SparkSpec

/** Pins q121's carry-forward semantics on BOTH one-sided-month directions
  * — the sf0.01 corpus only exercises lineitem-only trailing months, so
  * the orders-only arm is locked here on a synthetic spine.
  */
class CumulativeLeadsSpec extends SparkSpec {
  import spark.implicits._

  test("a month one channel skips carries that channel's running total forward") {
    // orders: m1=10, m3=10 (skips m2); lineitem: m1=4, m2=4 (skips m3)
    val om = Seq(("m1", 10L), ("m3", 10L)).toDF("month", "orev")
    val lm = Seq(("m1", 4L), ("m2", 4L)).toDF("month", "lrev")
    val got = RelationalQueries
      .cumulativeLeads(om, lm)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .toSeq
    // cumulative spine: m1 (10, 4), m2 (10, 8)  <- ocum CARRIES 10, not 0
    //                   m3 (20, 8)              <- lcum CARRIES 8, not 0
    // orders leads in every month here
    assert(got == Seq(("m1", 10.0, 4.0), ("m2", 10.0, 8.0), ("m3", 20.0, 8.0)))
  }

  test("a leading skipped month starts that channel at 0, not null") {
    // lineitem starts BEFORE orders: the m1 row must compare 0 > 3 = false
    // (a null ocum would silently drop or mis-compare the month)
    val om = Seq(("m2", 5L)).toDF("month", "orev")
    val lm = Seq(("m1", 3L), ("m2", 1L)).toDF("month", "lrev")
    val got = RelationalQueries
      .cumulativeLeads(om, lm)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .toSeq
    // m1: (0, 3) not emitted; m2: (5, 4) emitted
    assert(got == Seq(("m2", 5.0, 4.0)))
  }
}
