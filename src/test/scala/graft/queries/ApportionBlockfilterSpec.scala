package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariant locks for the round-10 batch-2 queries: ds_apportion's
  * largest-remainder accounting identities and ta_blockfilter's suffix
  * semantics, both checked against the planting/apportionment rules
  * directly rather than against row snapshots.
  */
class ApportionBlockfilterSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("ds_apportion: allocations sum EXACTLY to the budget, each within 1 of its floor") {
    val rows = DedupQueries
      .dsApportion(spark, dir)
      .select("lang", "n", "base", "alloc")
      .collect()
    val budget = 1000000L
    assert(rows.map(_.getLong(3)).sum == budget, "largest-remainder must apportion exactly")
    // every allocation is its floor quota or floor+1 (the Hamilton bound)
    rows.foreach { r =>
      val d = r.getLong(3) - r.getLong(2)
      assert(d == 0L || d == 1L, s"${r.getString(0)}: alloc-base=$d")
    }
    // quota monotonicity: floor(budget*n/N) is reproducible from n alone
    val n = rows.map(_.getLong(1)).sum
    rows.foreach { r =>
      assert(r.getLong(2) == budget * r.getLong(1) / n)
    }
  }

  test("ta_blockfilter: suffix semantics follow the planting rule exactly") {
    val rows = WebQueries
      .taBlockfilter(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nUrls, nBlocked, keep) =>
      // the planting rule: %4 docs link www.site(id%7).example.com,
      // %10 docs link cdn(id%3).example.org (%20 both)
      val expectUrls = (if (id % 4 == 0) 1 else 0) + (if (id % 10 == 0) 1 else 0)
      // blocked: the example.org ZONE (suffix match over subdomains) and
      // the single host site3.example.com
      val expectBlocked =
        (if (id % 10 == 0) 1 else 0) + (if (id % 4 == 0 && id % 7 == 3) 1 else 0)
      assert(nUrls == expectUrls, s"doc $id urls")
      assert(nBlocked == expectBlocked, s"doc $id blocked")
      assert(keep == (expectBlocked == 0), s"doc $id keep")
    }
    // non-vacuity: the corpus exercises both block paths and a kept doc
    assert(rows.exists(_._3 > 0), "no blocked doc in corpus")
    assert(rows.exists(r => r._4 && r._2 > 0), "no kept doc with urls")
    assert(
      rows.exists { case (id, _, nb, _) => id % 4 == 0 && id % 7 == 3 && id % 10 != 0 && nb == 1 },
      "no doc blocked via the exact-host rule alone")
    graft.Caches.releaseAll()
  }
}
