package graft.operators

import graft.SparkSpec

class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  private def run(undirected: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val e = undirected ++ undirected.map(_.swap)
    LabelPropagation.run(e.toDF("src", "dst"), iters)
      .as[(Long, Long)].collect().toMap
  }

  /** Driver-side synchronous replay: most frequent neighbor label, ties to
    * the smallest label.
    */
  private def replay(undirected: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val e = (undirected ++ undirected.map(_.swap)).distinct
    val nodes = e.flatMap(x => Seq(x._1, x._2)).distinct
    val inbound = e.groupBy(_._2).map { case (d, es) => d -> es.map(_._1) }
    var l = nodes.map(v => v -> v).toMap
    for (_ <- 1 to iters) {
      l = nodes.map { v =>
        inbound.get(v) match {
          case Some(srcs) =>
            val freq = srcs.map(l).groupBy(identity).map { case (lab, xs) => (lab, xs.size) }
            v -> freq.toSeq.map { case (lab, c) => (-c, lab) }.min._2
          case None => v -> l(v)
        }
      }.toMap
    }
    l
  }

  test("matches a synchronous driver replay on a random graph") {
    val rnd = new scala.util.Random(5501)
    val edges = (1 to 150)
      .map(_ => (rnd.nextInt(30).toLong + 1, rnd.nextInt(30).toLong + 1))
      .filter(e => e._1 != e._2)
      .map(e => (e._1 min e._2, e._1 max e._2))
      .distinct
    for (iters <- Seq(1, 2, 4)) {
      assert(run(edges, iters) == replay(edges, iters), s"iters=$iters")
    }
  }

  test("two disjoint cliques resolve to their own min-label communities") {
    val c1 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val c2 = for { a <- 11L to 14L; b <- 11L to 14L if a < b } yield (a, b)
    val l = run(c1 ++ c2, 4)
    assert(l.filter(_._1 <= 4L).values.toSet == Set(1L))
    assert(l.filter(_._1 >= 11L).values.toSet == Set(11L))
  }
}
