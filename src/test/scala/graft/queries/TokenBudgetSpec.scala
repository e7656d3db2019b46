package graft.queries

import graft.SparkSpec

class TokenBudgetSpec extends SparkSpec {
  import spark.implicits._

  test("token budget: greedy quality prefix per domain, boundary exact") {
    val rows = DedupQueries.dsTokenbudget(spark, "/root/testdata/sf0.001")
      .as[(Long, String, Double, Long, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      // replay the greedy prefix: quality desc, doc_id tiebreak
      val ordered = rs.sortBy(r => (-r._3, r._1))
      var cum = 0L
      ordered.foreach { case (id, _, _, nTok, cumTok, kept) =>
        cum += nTok
        assert(cumTok == cum, s"$lang doc $id cumsum")
        assert(kept == (cum <= 2000L), s"$lang doc $id kept flag")
      }
      // the kept set is a prefix of the quality order: once over budget,
      // nothing later is kept
      val keptFlags = ordered.map(_._6)
      val firstDrop = keptFlags.indexOf(false)
      if (firstDrop >= 0) assert(!keptFlags.drop(firstDrop).contains(true), lang)
      // budget actually bites somewhere and keeps something
      assert(keptFlags.head, s"$lang keeps its best doc")
    }
    // at least one domain exceeds its budget in the fixture
    assert(rows.exists(!_._6))
  }
}
