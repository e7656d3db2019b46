package graft.operators

import graft.SparkSpec

class ScaledWalksSpec extends SparkSpec {
  import spark.implicits._

  // 1→2→3→1 cycle plus a feeder 4→2; every node has out-degree 1.
  private def edges =
    Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 2L)).toDF("src", "dst")

  test("personalized pagerank matches hand-computed scaled-integer rounds") {
    val seeds = Seq(1L).toDF("id")
    val got = ScaledWalks
      .personalizedPageRank(edges, seeds, 3)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    // p1 = {1:150000, 2:850000}; p2 = {1:150000, 2:127500, 3:722500};
    // p3 = {1:150000+614125, 2:127500, 3:108375}; node 4 is unreachable
    // from the seed and must be ABSENT, not zero.
    assert(got == Map(1L -> 764125L, 2L -> 127500L, 3L -> 108375L))
  }

  test("katz matches hand-computed rounds and scores dangling nodes") {
    val got = ScaledWalks
      .katz(edges, 2)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    // x1 = {1:1.2e6, 2:1.4e6, 3:1.2e6, 4:1e6}
    // x2 = {1:1e6+240000, 2:1e6+240000+200000, 3:1e6+280000, 4:1e6}
    assert(got == Map(1L -> 1240000L, 2L -> 1440000L, 3L -> 1280000L, 4L -> 1000000L))
  }

  test("ppr conserves no more than the seeded mass") {
    val seeds = Seq(1L, 4L).toDF("id")
    val total = ScaledWalks
      .personalizedPageRank(edges, seeds, 4)
      .agg(org.apache.spark.sql.functions.sum("p"))
      .collect()(0)
      .getLong(0)
    // Each round multiplies circulating mass by <= 0.85 and re-injects
    // 0.15 per seed; the floor in every term only loses mass. Total can
    // never exceed the stationary bound n_seeds * Scale.
    assert(total <= 2L * ScaledWalks.Scale)
    assert(total > 0L)
  }
}
