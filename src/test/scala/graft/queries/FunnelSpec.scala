package graft.queries

import graft.SparkSpec

/** Driver-side replay of the first-touch funnel: per user, the step times
  * are recomputed from the raw event list with plain Scala mins, including
  * the strictly-after ordering and the 2 h completion window.
  */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val W = 48L * 3600L * 1000000L

  test("funnel steps, depth, and completion replay exactly per user") {
    val ev = Tables
      .events(spark, dir)
      .selectExpr("user_id", "event_type", "unix_micros(ts) AS us")
      .as[(Long, String, Long)]
      .collect()
      .groupBy(_._1)
    val got = RelationalQueries
      .q78Funnel(spark, dir)
      .as[(Long, Option[Long], Option[Long], Option[Long], Long, Boolean)]
      .collect()
    assert(got.map(_._1).toSet == ev.keySet)
    got.foreach { case (u, t1, t2, t3, depth, completed) =>
      val es = ev(u)
      def step(tpe: String, after: Option[Long]): Option[Long] = after match {
        case None => None
        case Some(a) =>
          val c = es.collect { case (_, `tpe`, us) if us > a => us }
          if (c.isEmpty) None else Some(c.min)
      }
      val e1 = {
        val v = es.collect { case (_, "view", us) => us }
        if (v.isEmpty) None else Some(v.min)
      }
      val e2 = step("click", e1)
      val e3 = step("purchase", e2)
      assert(t1 == e1 && t2 == e2 && t3 == e3, s"user $u steps")
      assert(depth == Seq(e1, e2, e3).count(_.isDefined).toLong, s"user $u depth")
      val expectDone = e3.isDefined && e3.get - e1.get <= W
      assert(completed == expectDone, s"user $u completion")
    }
    // fixture exercises every depth somewhere
    assert(got.exists(_._5 == 3) && got.exists(_._6), "full conversions exist")
  }
}
