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
}
