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

  test("curriculum: balanced contiguous phases ordered by descending quality") {
    val rows = DedupQueries.dsCurriculum(spark, "/root/testdata/sf0.001")
      .as[(Long, Double, Long, Long)].collect()
    val n = rows.length
    assert(rows.map(_._3).toSeq == (1L to n.toLong)) // rank is a permutation
    // quality non-increasing along the rank
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 >= b._2, s"quality increases at rank ${b._3}")
    }
    // 3 phases, contiguous in rank, sizes within 1 of each other
    val sizes = rows.groupBy(_._4).view.mapValues(_.size).toMap
    assert(sizes.keySet == Set(1L, 2L, 3L))
    assert(sizes.values.max - sizes.values.min <= 1, sizes.toString)
    rows.groupBy(_._4).foreach { case (ph, rs) =>
      val ranks = rs.map(_._3).sorted.toSeq
      assert(ranks == (ranks.head to ranks.last).toSeq, s"phase $ph not contiguous")
    }
  }
}
