package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KTrussSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force truss peel on an in-memory edge set. */
  private def bruteCurve(
      edges0: Set[(Long, Long)],
      k: Int,
      rounds: Int): Seq[(Long, Long, Long)] = {
    def triangles(e: Set[(Long, Long)]): Seq[(Long, Long, Long)] = {
      val nodes = e.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
      for {
        a <- nodes; b <- nodes if a < b && e((a, b))
        c <- nodes if b < c && e((b, c)) && e((a, c))
      } yield (a, b, c)
    }
    val out = Seq.newBuilder[(Long, Long, Long)]
    var cur = edges0
    out += ((0L, cur.size.toLong, triangles(cur).size.toLong))
    for (r <- 1 to rounds) {
      val supp = triangles(cur)
        .flatMap { case (a, b, c) => Seq((a, b), (a, c), (b, c)) }
        .groupBy(identity)
        .map { case (e, xs) => e -> xs.size }
      cur = cur.filter(e => supp.getOrElse(e, 0) >= k - 2)
      out += ((r.toLong, cur.size.toLong, triangles(cur).size.toLong))
    }
    out.result()
  }

  private def curve(edges: Set[(Long, Long)], k: Int, rounds: Int): Seq[(Long, Long, Long)] = {
    val df = edges.toSeq.toDF("u", "v")
    val got = KTruss
      .peelStats(df, k, rounds)
      .orderBy("round")
      .as[(Long, Long, Long)]
      .collect()
      .toSeq
    graft.Caches.releaseAll()
    got
  }

  test("peelStats matches brute-force iterated support deletion on a random graph") {
    val rnd = new scala.util.Random(11)
    val edges = (0 until 300).map { _ =>
      val u = rnd.nextInt(25).toLong
      val v = rnd.nextInt(25).toLong
      (math.min(u, v), math.max(u, v))
    }.filter { case (u, v) => u != v }.toSet
    for (k <- Seq(3, 5, 9)) {
      val got = curve(edges, k, 3)
      val want = bruteCurve(edges, k, 3)
      assert(got == want, s"k=$k: $got vs $want")
    }
  }

  test("a clique is its own truss: the fixpoint short-circuit synthesizes identical rows") {
    // K5: every edge sits in 3 triangles, so k=5 (support bar 3) peels
    // nothing — round 1 hits the fixpoint and rounds 2..5 are synthesized.
    val nodes = 0L until 5L
    val edges = (for (u <- nodes; v <- nodes if u < v) yield (u, v)).toSet
    val got = curve(edges, 5, 5)
    assert(got == bruteCurve(edges, 5, 5), got.toString)
    assert(got.length == 6 && got.forall { case (_, e, t) => e == 10L && t == 10L })
  }

  test("reliable-checkpoint mode (no observable metrics) produces the identical curve") {
    val rnd = new scala.util.Random(17)
    val edges = (0 until 200).map { _ =>
      val u = rnd.nextInt(22).toLong
      val v = rnd.nextInt(22).toLong
      (math.min(u, v), math.max(u, v))
    }.filter { case (u, v) => u != v }.toSet
    val localMode = curve(edges, 4, 2)
    val cpDir = java.nio.file.Files.createTempDirectory("graft-ktruss-cp")
    spark.sparkContext.setCheckpointDir(cpDir.toString)
    try {
      val reliable = curve(edges, 4, 2)
      assert(reliable == localMode, s"$reliable vs $localMode")
    } finally {
      org.apache.spark.sql.graftshim.ColumnBridge.clearCheckpointDir(spark.sparkContext)
      graft.Caches.releaseAll()
    }
  }

  test("a restricted FULL-GRAPH orientation peels identically to re-orienting the stratum") {
    // gr_ktruss's shared-frame argument: support is orientation-
    // independent and a fixed total order restricted to a subgraph stays
    // acyclic, so peeling a parity stratum of the full graph's
    // orientation must be bit-identical to orienting the stratum by its
    // OWN degrees — even though the two orientations disagree on edges
    // whose endpoints' degree ORDER flips inside the stratum.
    val rnd = new scala.util.Random(23)
    val edges = (0 until 400).map { _ =>
      val u = rnd.nextInt(30).toLong
      val v = rnd.nextInt(30).toLong
      (math.min(u, v), math.max(u, v))
    }.filter { case (u, v) => u != v }.toSet
    val full = edges.toSeq.toDF("u", "v")
    val stratum = edges.filter { case (u, v) => u % 2 == 0 && v % 2 == 0 }
    for (k <- Seq(3, 4)) {
      val viaRestriction = KTruss
        .peelStatsOriented(
          graft.Caches.track(
            Triangles.orientPlan(full)
              .filter(col("s") % 2 === 0 && col("t") % 2 === 0)
              .repartition(col("s"))
              .persist()),
          k, 3)
        .orderBy("round")
        .as[(Long, Long, Long)]
        .collect()
        .toSeq
      graft.Caches.releaseAll()
      assert(viaRestriction == bruteCurve(stratum, k, 3), s"k=$k: $viaRestriction")
      assert(viaRestriction == curve(stratum, k, 3), s"k=$k")
    }
  }

  test("over-demanding k empties the graph and stays empty") {
    val edges = Set((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val got = curve(edges, 6, 2)
    assert(got == bruteCurve(edges, 6, 2), got.toString)
    assert(got.last == (2L, 0L, 0L))
  }
}
