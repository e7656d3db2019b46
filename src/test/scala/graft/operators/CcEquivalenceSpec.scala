package graft.operators

import graft.SparkSpec

import scala.util.Random

class CcEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  test("local and distributed CC agree on a 10k-edge random graph") {
    val rnd = new Random(61)
    val edges = Seq.fill(10000)((rnd.nextInt(4000).toLong, rnd.nextInt(4000).toLong))
      .filter { case (a, b) => a != b }
      .toDF("src", "dst")
      .repartition(16)
    val local = ConnectedComponents.run(edges).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dist = ConnectedComponents
      .run(edges, localThreshold = 0L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(local == dist, "local union-find and distributed rounds disagree at 10k edges")
  }

  test("local union-find, distributed min-label, and GraphX CC all agree on random graphs") {
    val rnd = new Random(29)
    (1 to 2).foreach { trial =>
      val edges = Seq.fill(120)((rnd.nextInt(70).toLong, rnd.nextInt(70).toLong))
        .filter { case (a, b) => a != b }
        .toDF("src", "dst")
      // Default run takes the single-task union-find path (tiny graph);
      // localThreshold = 0 forces the distributed label-propagation rounds.
      val local = ConnectedComponents.run(edges).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val dist = ConnectedComponents
        .run(edges, localThreshold = 0L)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toSet
      val gx = GraphXConnectedComponents.run(edges).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(local == gx, s"trial $trial: local union-find CC != GraphX CC")
      assert(dist == gx, s"trial $trial: distributed CC != GraphX CC")
    }
  }
}
