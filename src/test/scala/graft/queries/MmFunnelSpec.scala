package graft.queries

import graft.SparkSpec
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Property locks for the multimodal dedup funnels — guards the round-7
  * restructure (one decode pass, distinct-hash banding, reduced CC edge
  * set) with invariants stated against brute force, not against the
  * implementation's own internals.
  */
class MmFunnelSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  /** Brute-force Hamming-≤3 doc pairs straight from the hashes — no
    * banding, no grouping. The candidate-generation ground truth.
    */
  private def brutePairs = {
    val h = Multimodal
      .dhash56(Multimodal.synthesizeImages(
        Tables.t(spark, dir, "documents"), "doc_id", "text"))
      .select("doc_id", "dhash")
    val a = h.select(col("doc_id").as("a_id"), col("dhash").as("ha"))
    val b = h.select(col("doc_id").as("b_id"), col("dhash").as("hb"))
    a.crossJoin(b)
      .filter(col("a_id") < col("b_id"))
      .withColumn("hamming", expr("bit_count(ha ^ hb)").cast("long"))
      .filter(col("hamming") <= 3)
      .select("a_id", "b_id", "hamming")
  }

  test("mm_phash pre-grouped banding emits exactly the brute-force pair set") {
    val got = SourceQueries.mmPhash(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = brutePairs.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, s"pair sets differ: ${(got diff want).take(3)} extra, ${(want diff got).take(3)} missing")
    assert(want.nonEmpty, "vacuous lock: the sf0.001 corpus must contain near-dup images")
  }

  test("mm_dedup keepers form a maximal-resolution SDR over the pair-graph components") {
    // Components from the ORIGINAL pair graph (not the reduced edge set
    // the implementation clusters) — the reduction must be invisible.
    val comps = graft.operators.ConnectedComponents
      .run(brutePairs.select("a_id", "b_id"), "a_id", "b_id")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap // node -> comp
    val px = Multimodal
      .dhash56(Multimodal.synthesizeImages(
        Tables.t(spark, dir, "documents"), "doc_id", "text"))
      .select("doc_id", "px")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val members: Map[Long, Set[Long]] =
      px.keySet.groupBy(id => comps.getOrElse(id, id)) // singletons: own cluster
    val rows = SourceQueries.mmDedup(spark, dir).collect()
    assert(rows.length == members.size, "one output row per component (singletons included)")
    for (r <- rows) {
      val (cid, n, keep, keepPx) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val m = members(cid)
      assert(cid == m.min, s"cluster_id must be the component minimum: $cid vs ${m.min}")
      assert(n == m.size.toLong, s"n_members wrong for $cid")
      assert(m.contains(keep), s"keeper $keep not a member of its component $cid")
      val best = m.map(id => (px(id), -id)).max
      assert(keep == -best._2 && keepPx == best._1,
        s"keeper must be the max-px (ties→min id) member of $cid")
    }
  }

  test("mm_audiodedup emits exactly one keeper per distinct contour") {
    val nContours = Multimodal
      .audioFingerprints(Tables.t(spark, dir, "documents"), "doc_id", "text", 25)
      .toDF()
      .select("fp")
      .distinct()
      .count()
    val out = SourceQueries.mmAudiodedup(spark, dir)
    assert(out.count() == nContours, "cluster count == distinct contour count")
    assert(out.select("keep_id").distinct().count() == nContours, "keepers are distinct")
  }

  test("video cut fingerprint distinguishes clips past frame 63 (the shiftleft alias)") {
    import spark.implicits._
    // 70-frame clips. The r7 positional bitmask `shiftleft(1, frame)`
    // wraps the shift distance mod 64, so a cut at frame 65 aliased a cut
    // at frame 1: docs 1 and 2 below would have hashed to the SAME mask
    // and been falsely clustered. The md5-XOR fingerprint keeps them
    // apart, while genuinely identical cut structures (docs 2 and 3)
    // still cluster — with the higher-luma copy elected keeper.
    def clip(id: Long, cuts: Set[Int], lumaScale: Long): Seq[(Long, Long, Long)] = {
      var level = 1L
      (0 until 70).map { f =>
        if (cuts(f)) level += 1
        (id, f.toLong, level * lumaScale)
      }
    }
    val frames = (clip(1L, Set(1, 5), 10L) ++
      clip(2L, Set(5, 65), 10L) ++
      clip(3L, Set(5, 65), 100L)).toDF("doc_id", "frame", "luma")
    val out = SourceQueries
      .videoSignatureDedup(frames)
      .select("cluster_id", "n_members", "keep_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(
      out == Set((1L, 1L, 1L), (2L, 2L, 3L)),
      s"expected doc 1 alone and docs {2,3} clustered with keeper 3, got $out")
  }
}
