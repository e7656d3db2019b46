package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-15 brute replays (the Round11/14 pattern): each new query's
  * result re-derived driver-side with independent scalar code, not the
  * query's own expressions.
  */
class Round15BatchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("er_emstep replays: quantized EM posteriors and re-estimated parameters") {
    val S = 100000L
    val docs = Tables
      .t(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"), col("text"))
      .collect()
      .map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
          r.getString(4).split("\\s+")(0), r.getLong(3) / 50))
    // labeled matched pairs from the shipped full matcher (its own replay
    // lives in earlier round specs; here it is the INPUT contract)
    val matched = ErQueries
      .matchFull(spark, dir)
      .select("a_id", "b_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byId = docs.map(d => d._1 -> d).toMap
    val mDen = matched.length.toLong
    def agree(p: (Long, Long), f: ((Long, String, String, Long, String, Long)) => Any): Long = {
      val (a, b) = (byId(p._1), byId(p._2))
      if (f(a) == f(b)) 1L else 0L
    }
    val mS = matched.map(agree(_, _._2)).sum
    val mB = matched.map(agree(_, _._6)).sum
    val mF = matched.map(agree(_, _._5)).sum
    val n = docs.length.toLong
    val uDen = n * (n - 1)
    def uNum(f: ((Long, String, String, Long, String, Long)) => Any): Long =
      docs.groupBy(f).values.map(g => g.length.toLong * (g.length - 1)).sum
    val (uS, uB, uF) = (uNum(_._2), uNum(_._6), uNum(_._5))
    // blocked candidates: same lang, |Δbucket| <= 1, a < b
    val cand = for {
      a <- docs; b <- docs
      if a._1 < b._1 && a._3 == b._3 && math.abs(a._6 - b._6) <= 1
    } yield (
      (if (a._2 == b._2) 4L else 0L) + (if (a._6 == b._6) 2L else 0L) +
        (if (a._5 == b._5) 1L else 0L))
    val nAll = cand.length.toLong
    val patN = (0L until 8L).map(p => p -> cand.count(_ == p).toLong).toMap
    def q(num: Long, den: Long): Long = math.max(1L, math.min(S - 1, num * S / den))
    val (m0s, m0b, m0f) = (q(mS, mDen), q(mB, mDen), q(mF, mDen))
    val (u0s, u0b, u0f) = (q(uS, uDen), q(uB, uDen), q(uF, uDen))
    val lam0 = q(mDen, nAll)
    def term(g: Long, p: Long): Double = (if (g == 1L) p else S - p).toDouble
    val ew = (0L until 8L).map { p =>
      val (gs, gb, gf) = ((p / 4) % 2, (p / 2) % 2, p % 2)
      val ma = lam0.toDouble * term(gs, m0s) * term(gb, m0b) * term(gf, m0f)
      val ub = (S - lam0).toDouble * term(gs, u0s) * term(gb, u0b) * term(gf, u0f)
      val wq = math.floor(S.toDouble * ma / (ma + ub)).toLong
      (gs, gb, gf, patN(p), wq)
    }
    val wm = math.max(1L, ew.map(r => r._5 * r._4).sum)
    val wu = math.max(1L, ew.map(r => (S - r._5) * r._4).sum)
    def mAfter(g: ((Long, Long, Long, Long, Long)) => Long): Long =
      ew.map(r => r._5 * r._4 * g(r)).sum * S / wm
    def uAfter(g: ((Long, Long, Long, Long, Long)) => Long): Long =
      ew.map(r => (S - r._5) * r._4 * g(r)).sum * S / wu
    val expected = Map(
      "lambda" -> (lam0, wm / nAll),
      "m_source" -> (m0s, mAfter(_._1)),
      "m_bucket" -> (m0b, mAfter(_._2)),
      "m_firstword" -> (m0f, mAfter(_._3)),
      "u_source" -> (u0s, uAfter(_._1)),
      "u_bucket" -> (u0b, uAfter(_._2)),
      "u_firstword" -> (u0f, uAfter(_._3)))
    val got = ErQueries.queries("er_emstep")(spark, dir).collect()
    assert(got.length == 7)
    got.foreach { r =>
      val (b, a) = expected(r.getString(0))
      assert(r.getLong(1) == b, s"before for ${r.getString(0)}")
      assert(r.getLong(2) == a, s"after for ${r.getString(0)}")
    }
    // the E-step must actually MOVE the estimates on this corpus, or the
    // query is a vacuous identity
    val lam = got.find(_.getString(0) == "lambda").get
    assert(lam.getLong(2) != lam.getLong(1), "EM left lambda unchanged — degenerate input")
    val mb = got.find(_.getString(0) == "m_bucket").get
    assert(mb.getLong(2) > mb.getLong(1),
      "bucket-blocked candidates must pull m_bucket up")
    graft.Caches.releaseAll()
  }

  test("er_emstep candidate enumeration joins on block keys — no pair cartesian") {
    val plan = ErQueries
      .queries("er_emstep")(spark, dir)
      .queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("CartesianProduct"),
      s"candidates must come from the (lang, window) equi join:\n${plan.take(800)}")
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"pattern counts must pre-aggregate map-side:\n${plan.take(800)}")
    graft.Caches.releaseAll()
  }
}
