package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Pins the Misra–Gries guarantees across arbitrary partition/merge
  * shapes: the SUMMARY differs with merge order, the GUARANTEES must not.
  */
class MisraGriesSpec extends AnyFunSuite {

  private def guaranteesHold(tokens: Seq[String], k: Int, pieces: Int, rnd: Random): Unit = {
    val mg = new MisraGries(k)
    // Split the stream into random pieces, reduce each, merge in a
    // random tree order — the distributed shapes the aggregator meets.
    val parts = tokens.grouped(math.max(1, tokens.length / pieces)).toIndexedSeq
    var summaries = parts.map(_.foldLeft(mg.zero)(mg.reduce))
    while (summaries.length > 1) {
      val i = rnd.nextInt(summaries.length - 1)
      summaries = summaries.patch(i, Seq(mg.merge(summaries(i), summaries(i + 1))), 2)
    }
    val summary = summaries.headOption.getOrElse(mg.zero)
    assert(summary.size <= k - 1, "summary exceeded its size bound")
    val n = tokens.length.toLong
    val exact = tokens.groupBy(identity).view.mapValues(_.length.toLong).toMap
    exact.foreach { case (t, c) =>
      val est = summary.getOrElse(t, 0L)
      assert(est <= c, s"over-count for '$t': est $est > exact $c")
      assert((c - est) * k <= n, s"undercount bound broken for '$t': $c - $est vs n/$k of $n")
      if (c * k > n) assert(summary.contains(t), s"true heavy hitter '$t' missing")
    }
  }

  test("guarantees hold on skewed and uniform streams under random merge trees") {
    val rnd = new Random(103)
    (1 to 20).foreach { _ =>
      val vocabSize = 2 + rnd.nextInt(40)
      val n = 200 + rnd.nextInt(2000)
      // Zipf-ish skew: low token indexes dominate.
      val tokens = Seq.fill(n)(s"t${(math.pow(rnd.nextDouble(), 2.5) * vocabSize).toInt}")
      guaranteesHold(tokens, k = 2 + rnd.nextInt(19), pieces = 1 + rnd.nextInt(12), rnd = rnd)
    }
  }

  test("single dominant token survives any k") {
    val tokens = Seq.fill(900)("dominant") ++ Seq.tabulate(100)(i => s"rare$i")
    (2 to 20).foreach { k =>
      val mg = new MisraGries(k)
      val s = tokens.foldLeft(mg.zero)(mg.reduce)
      assert(s.contains("dominant"))
      assert(s("dominant") <= 900L && (900L - s("dominant")) * k <= 1000L)
    }
  }
}
