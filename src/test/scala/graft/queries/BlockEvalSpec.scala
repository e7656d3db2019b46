package graft.queries

import graft.SparkSpec

/** Pins er_blockeval's closed-form candidate accounting against a brute
  * driver-side pair enumeration, and its match counts against the
  * er_match_* queries it claims to summarize.
  */
class BlockEvalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("closed-form candidate volume equals brute pair enumeration") {
    val row = ErQueries.blockEval(spark, dir).head()
    val docs = spark.read
      .parquet(s"$dir/documents.parquet")
      .select("lang", "n_chars")
      .collect()
      .map(r => (r.getString(0), r.getLong(1) / 50))
    var comparable = 0L
    var blocked = 0L
    for (i <- docs.indices; j <- (i + 1) until docs.length) {
      if (docs(i)._1 == docs(j)._1) {
        comparable += 1
        if (math.abs(docs(i)._2 - docs(j)._2) <= 1) blocked += 1
      }
    }
    // BIGINT emits since r11 (the DECIMAL(38,0) math stays internal).
    assert(row.getLong(0) == comparable, "n_comparable")
    assert(row.getLong(1) == blocked, "n_blocked_cand")
    assert(row.getDouble(2) == 1.0 - blocked.toDouble / comparable.toDouble, "rr")
    graft.Caches.releaseAll()
  }

  test("match counts agree with er_match_full / er_match_blocked") {
    val row = ErQueries.blockEval(spark, dir).head()
    val full = ErQueries.matchFull(spark, dir).count()
    val blk = ErQueries.matchBlocked(spark, dir).count()
    assert(row.getLong(3) == full, "n_matches")
    assert(row.getLong(4) == blk, "n_matches_blocked")
    assert(row.getDouble(5) == blk.toDouble / full.toDouble, "pc")
    assert(row.getDouble(5) >= 0.0 && row.getDouble(5) <= 1.0)
    graft.Caches.releaseAll()
  }
}
