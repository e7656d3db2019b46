package graft.operators

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents
      .run(edges.toDF("src", "dst"))
      .as[(Long, Long)]
      .collect()
      .toMap

  test("report.pdf §4 example: chain A-B, B-C, A-D collapses to one cluster") {
    val comp = components(Seq((1L, 2L), (2L, 3L), (1L, 4L)))
    assert(comp.values.toSet.size == 1)
    assert(comp.keySet == Set(1L, 2L, 3L, 4L))
    assert(comp.values.head == 1L) // min-label id
  }

  test("two disjoint components keep distinct labels") {
    val comp = components(Seq((1L, 2L), (10L, 11L), (11L, 12L)))
    assert(comp(1L) == comp(2L))
    assert(comp(10L) == comp(11L) && comp(11L) == comp(12L))
    assert(comp(1L) != comp(10L))
    assert(comp(1L) == 1L && comp(10L) == 10L)
  }

  test("long chain converges (pointer jumping beats diameter rounds)") {
    val n = 64L
    val chain = (0L until n - 1).map(i => (i, i + 1))
    val comp = components(chain)
    assert(comp.size == n)
    assert(comp.values.forall(_ == 0L))
  }

  test("CC invariants: every endpoint labeled; edge endpoints share a label") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(60)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }
    val comp = components(edges)
    edges.foreach { case (a, b) =>
      assert(comp.contains(a) && comp.contains(b))
      assert(comp(a) == comp(b))
    }
    // labels are fixed points: label of a label is itself
    comp.values.foreach(c => assert(comp(c) == c))
  }
}
