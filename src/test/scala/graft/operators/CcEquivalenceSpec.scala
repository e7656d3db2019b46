package graft.operators

import graft.SparkSpec

import scala.util.Random

class CcEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  test("DataFrame and GraphX connected components agree on random graphs") {
    val rnd = new Random(29)
    (1 to 2).foreach { trial =>
      val edges = Seq.fill(120)((rnd.nextInt(70).toLong, rnd.nextInt(70).toLong))
        .filter { case (a, b) => a != b }
        .toDF("src", "dst")
      val df = ConnectedComponents.run(edges).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val gx = GraphXConnectedComponents.run(edges).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(df == gx, s"trial $trial: DataFrame CC != GraphX CC")
    }
  }
}
