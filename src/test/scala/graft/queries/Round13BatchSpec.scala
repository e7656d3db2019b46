package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.math.{BigDecimal => JBig, RoundingMode}

/** Round-13 closures: the two new TPC-DS shapes (Q23 frequent-buyer
  * reuse, Q78 three-channel full-outer alignment) pinned against
  * independent plain-Scala replays over the collected base tables —
  * the oracle gate proves Spark==DuckDB; these prove both equal the
  * arithmetic the Scaladoc claims (threshold compares in exact decimal,
  * HALF_UP money rounding, null-channel coalescing into ratios).
  */
class Round13BatchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // The q36/q117 money device, replayed: double → shortest-repr
  // BigDecimal → HALF_UP to the target scale (Spark's Cast semantics).
  private def dec(v: Double, scale: Int): JBig =
    JBig.valueOf(v).setScale(scale, RoundingMode.HALF_UP)

  private case class Ord(orderkey: Long, custkey: Long, price: Double, yr: Int, prio: String)
  private case class Li(
      orderkey: Long, partkey: Long, qty: Double, ext: Double, disc: Double,
      flag: String, shipYr: Int)

  private def loadOrders(): Seq[Ord] =
    Tables.t(spark, dir, "orders")
      .select(
        col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        year(col("o_orderdate")).cast("int"), col("o_orderpriority"))
      .collect()
      .toSeq
      .map(r => Ord(r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3), r.getString(4)))

  private def loadLineitem(): Seq[Li] =
    Tables.t(spark, dir, "lineitem")
      .select(
        col("l_orderkey"), col("l_partkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_returnflag"), year(col("l_shipdate")).cast("int"))
      .collect()
      .toSeq
      .map(r => Li(r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getString(5), r.getInt(6)))

  test("q132_dsfreqbuyer replays: decimal thresholds, keysets, channel split") {
    val orders = loadOrders()
    val lis = loadLineitem()
    val spend: Map[Long, JBig] = orders
      .groupBy(_.custkey)
      .view.mapValues(_.map(o => dec(o.price, 2)).reduce(_.add(_))).toMap
    val maxSpend = spend.values.max
    // the exact-decimal threshold: spend * 2 > max (never a double compare)
    val best = spend.filter { case (_, s) => s.multiply(JBig.valueOf(2)).compareTo(maxSpend) > 0 }
      .keySet
    val freq = lis
      .filter(_.shipYr == 1996)
      .groupBy(_.partkey)
      .filter { case (_, ls) => ls.map(_.orderkey).distinct.size > 6 }
      .keySet
    val byOrder = orders.map(o => o.orderkey -> o).toMap
    val fact = lis.filter(l =>
      l.shipYr == 1996 && byOrder.contains(l.orderkey) &&
        best.contains(byOrder(l.orderkey).custkey) && freq.contains(l.partkey))
    val expected = fact
      .groupBy(l =>
        if (Set("1-URGENT", "2-HIGH").contains(byOrder(l.orderkey).prio)) "urgent"
        else "regular")
      .view.mapValues { ls =>
        (ls.size.toLong,
          ls.map(l => dec(l.ext * (1.0 - l.disc), 4)).reduce(_.add(_)).doubleValue)
      }.toMap
    val got = RelationalQueries.q132Dsfreqbuyer(spark, dir).collect()
    assert(got.map(_.getString(0)).toSeq == expected.keys.toSeq.sorted)
    got.foreach { r =>
      val (nLines, rev) = expected(r.getString(0))
      assert(r.getLong(1) == nLines, s"${r.getString(0)} n_lines")
      assert(r.getDouble(2) == rev, s"${r.getString(0)} revenue")
      assert(r.getLong(3) == best.size.toLong, "n_best_cust scalar")
      assert(r.getDouble(4) == maxSpend.doubleValue, "max_spend scalar")
    }
    graft.Caches.releaseAll()
  }

  test("q133_dsalign3 replays: full-outer channel alignment and coalesced ratios") {
    val orders = loadOrders()
    val lis = loadLineitem()
    val byOrder = orders.map(o => o.orderkey -> o).toMap
    val ord = orders.groupBy(o => (o.custkey, o.yr))
      .view.mapValues(_.map(o => dec(o.price, 2)).reduce(_.add(_))).toMap
    val withCust = lis.filter(l => byOrder.contains(l.orderkey))
    val shp = withCust.groupBy(l => (byOrder(l.orderkey).custkey, l.shipYr))
      .view.mapValues(_.map(l => dec(l.ext * (1.0 - l.disc), 4)).reduce(_.add(_))).toMap
    val ret = withCust.filter(_.flag == "R")
      .groupBy(l => (byOrder(l.orderkey).custkey, l.shipYr))
      .view.mapValues(_.map(l => dec(l.qty, 4)).reduce(_.add(_))).toMap
    // anchored on the ord channel; absent channels coalesce into ratios
    val expected = ord.map { case (k @ (cust, yr), o) =>
      val s = shp.get(k)
      val r = ret.get(k)
      val shipRatio = s.map(_.doubleValue / o.doubleValue).getOrElse(0.0)
      val retRatio = s.map(sv => r.map(_.doubleValue).getOrElse(0.0) / sv.doubleValue)
        .getOrElse(0.0)
      (cust, yr) -> (o.doubleValue, s.map(_.doubleValue).getOrElse(0.0),
        r.map(_.doubleValue).getOrElse(0.0), shipRatio, retRatio)
    }
    val top = expected.toSeq
      .sortBy { case ((cust, yr), (_, _, _, shipRatio, _)) => (-shipRatio, cust, yr) }
      .take(100)
    val got = RelationalQueries.q133Dsalign3(spark, dir).collect()
    assert(got.length == top.length, s"expected ${top.length} rows, got ${got.length}")
    // at least one aligned row must have a genuinely ABSENT channel, or
    // the null-coalescing path was never exercised by this corpus
    assert(expected.values.exists(v => v._2 == 0.0 || v._3 == 0.0),
      "corpus produced no null channels — the alignment test is vacuous")
    got.zip(top).foreach { case (r, ((cust, yr), (o, s, q, shipRatio, retRatio))) =>
      assert(r.getLong(0) == cust && r.getInt(1) == yr,
        s"row order: got (${r.getLong(0)},${r.getInt(1)}) want ($cust,$yr)")
      assert(r.getDouble(2) == o && r.getDouble(3) == s && r.getDouble(4) == q)
      assert(r.getDouble(5) == shipRatio && r.getDouble(6) == retRatio)
    }
  }
}
