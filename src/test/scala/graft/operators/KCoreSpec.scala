package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force iterated deletion on an in-memory adjacency map. */
  private def bruteCurve(
      edges: Set[(Long, Long)],
      k: Int,
      rounds: Int): Seq[(Long, Long, Long)] = {
    val sym = edges.flatMap { case (u, v) => Seq((u, v), (v, u)) }
    val out = Seq.newBuilder[(Long, Long, Long)]
    out += ((0L, sym.map(_._1).size.toLong, (sym.size / 2).toLong))
    var cur = sym
    for (r <- 1 to rounds) {
      val deg = cur.groupBy(_._1).map { case (n, es) => n -> es.size }
      val keep = deg.filter(_._2 >= k).keySet
      cur = cur.filter { case (u, v) => keep(u) && keep(v) }
      out += ((r.toLong, keep.size.toLong, (cur.size / 2).toLong))
    }
    out.result()
  }

  test("peelStats matches brute-force iterated deletion on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = (0 until 400).map { _ =>
      val u = rnd.nextInt(40).toLong
      val v = rnd.nextInt(40).toLong
      if (u < v) (u, v) else (v, u)
    }.filter { case (u, v) => u != v }.toSet
    val half = edges.toSeq.toDF("u", "v")
    val sym = half.union(half.select(col("v").as("u"), col("u").as("v")))
    for (k <- Seq(2, 5, 12)) {
      val got = KCore
        .peelStats(sym, k, 3)
        .orderBy("round")
        .as[(Long, Long, Long)]
        .collect()
        .toSeq
      val want = bruteCurve(edges, k, 3)
      assert(got == want, s"k=$k: $got vs $want")
      graft.Caches.releaseAll()
    }
  }

  test("fixpoint short-circuit synthesizes rows identical to the brute unrolled loop") {
    // Triangle + pendant: k=2 peels the pendant in round 1 and reaches the
    // fixpoint in round 2 — rounds 3..6 are driver-synthesized copies
    // (KCore.peelStats's early exit), while bruteCurve genuinely unrolls
    // all six rounds. The curves must be identical row for row.
    val edges = Set((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val half = edges.toSeq.toDF("u", "v")
    val sym = half.union(half.select(col("v").as("u"), col("u").as("v")))
    val got = KCore.peelStats(sym, 2, 6).orderBy("round").as[(Long, Long, Long)].collect().toSeq
    val want = bruteCurve(edges, 2, 6)
    assert(got == want, s"$got vs $want")
    assert(got.length == 7, "short-circuit must still emit every fixed round's row")
    graft.Caches.releaseAll()
  }

  test("a graph already inside the core is a fixpoint: rounds change nothing") {
    // K5 (complete graph on 5 nodes): every degree is 4, so k=4 peels nothing.
    val nodes = (0L until 5L).toSeq
    val edges = for (u <- nodes; v <- nodes if u < v) yield (u, v)
    val half = edges.toDF("u", "v")
    val sym = half.union(half.select(col("v").as("u"), col("u").as("v")))
    val got = KCore.peelStats(sym, 4, 2).orderBy("round").as[(Long, Long, Long)].collect()
    assert(got.toSeq == Seq((0L, 5L, 10L), (1L, 5L, 10L), (2L, 5L, 10L)))
    graft.Caches.releaseAll()
  }

  test("reliable-checkpoint mode (no observable metrics) produces the identical curve") {
    // With a checkpoint dir configured, Lineage.cut buries the observed
    // node inside the persist, so KCore must skip the Observation and
    // take the direct-count path — same output either way.
    val rnd = new scala.util.Random(13)
    val edges = (0 until 200).map { _ =>
      val u = rnd.nextInt(30).toLong
      val v = rnd.nextInt(30).toLong
      if (u < v) (u, v) else (v, u)
    }.filter { case (u, v) => u != v }.toSet
    val half = edges.toSeq.toDF("u", "v")
    val sym = half.union(half.select(col("v").as("u"), col("u").as("v")))
    val localMode = KCore.peelStats(sym, 4, 3).orderBy("round").as[(Long, Long, Long)].collect().toSeq
    graft.Caches.releaseAll()
    val cpDir = java.nio.file.Files.createTempDirectory("graft-kcore-cp")
    spark.sparkContext.setCheckpointDir(cpDir.toString)
    try {
      val reliable =
        KCore.peelStats(sym, 4, 3).orderBy("round").as[(Long, Long, Long)].collect().toSeq
      assert(reliable == localMode, s"$reliable vs $localMode")
    } finally {
      org.apache.spark.sql.graftshim.ColumnBridge.clearCheckpointDir(spark.sparkContext)
      graft.Caches.releaseAll()
    }
  }

  test("peeling an over-dense bar empties the graph and stays empty") {
    val half = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    val sym = half.union(half.select(col("v").as("u"), col("u").as("v")))
    val got = KCore.peelStats(sym, 10, 3).orderBy("round").as[(Long, Long, Long)].collect()
    assert(got.toSeq == Seq((0L, 3L, 2L), (1L, 0L, 0L), (2L, 0L, 0L), (3L, 0L, 0L)))
    graft.Caches.releaseAll()
  }
}
