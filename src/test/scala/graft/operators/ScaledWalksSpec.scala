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

  test("scaled global pagerank tracks the float operator within float tolerance") {
    // The two implementations are deliberate twins: PageRank.run is the
    // float production operator, ScaledWalks.pageRank the hash-exact
    // gate-side walk (gr_pagerank switched to it when the float walk's
    // cross-engine sum-order drift surfaced at the r13 sf0.1 gate). Pin
    // them together on a random graph so neither can drift semantically.
    val rnd = new scala.util.Random(4177)
    val es = (1 to 120)
      .map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter(e => e._1 != e._2)
      .distinct
    val df = es.toDF("src", "dst")
    val float = PageRank.run(df, 0.85, 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val scaled = ScaledWalks.pageRank(df, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scaled.keySet == float.keySet)
    scaled.foreach { case (id, p) =>
      // per-term floors lose < 1 unit per edge per round; at 1e12 scale
      // a 1e-6 relative tolerance is orders of magnitude of headroom
      assert(math.abs(p.toDouble / ScaledWalks.GlobalScale - float(id)) < 1e-6,
        s"node $id: scaled ${p.toDouble / ScaledWalks.GlobalScale} vs float ${float(id)}")
    }
    graft.Caches.releaseAll()
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
