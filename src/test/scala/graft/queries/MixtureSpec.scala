package graft.queries

import graft.SparkSpec

class MixtureSpec extends SparkSpec {
  import spark.implicits._

  test("mixture plan: realized fractions normalize, caps hold, uncapped hits target") {
    val rows = DedupQueries.dsMixture(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Double, Double, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    val realizedSum = rows.map(_._8).sum
    assert(math.abs(realizedSum - 1.0) < 1e-9)
    rows.foreach { case (lang, _, chars, target, rate, capped, realized, _) =>
      assert(capped <= 3.0 + 1e-12, lang)
      assert(capped <= rate + 1e-12, lang)
      assert(math.abs(realized - capped * chars) < 1e-6, lang)
      // where the cap did not bite, the plan hits the target exactly
      if (rate < 3.0) {
        val total = rows.map(_._3).sum.toDouble
        assert(math.abs(rate * chars / total - target) < 1e-12, lang)
      }
    }
  }

  test("interleave: positions are a permutation and domains spread, not clump") {
    val rows = DedupQueries.dsInterleave(spark, "/root/testdata/sf0.001")
      .as[(Long, String, Long, Double, Long)].collect()
    val n = rows.length
    assert(rows.map(_._5).sorted.toSeq == (1L to n.toLong))
    // within each domain the order keys are strictly increasing in
    // domain_rank, so the domain appears in deterministic-shuffle order
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      val byRank = rs.sortBy(_._3)
      assert(byRank.map(_._5).toSeq == byRank.map(_._5).sorted.toSeq, lang)
    }
    // fair interleave: in the first half of the sequence every domain has
    // emitted at least a third of its fair share (a clumped order fails)
    val half = rows.filter(_._5 <= n / 2).groupBy(_._2).view.mapValues(_.size).toMap
    val totals = rows.groupBy(_._2).view.mapValues(_.size).toMap
    totals.foreach { case (lang, tot) =>
      assert(half.getOrElse(lang, 0) >= tot / 6, s"$lang clumps: ${half.getOrElse(lang, 0)}/$tot in first half")
    }
  }
}
