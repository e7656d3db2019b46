package graft.queries

import graft.SparkSpec
import graft.operators.Multimodal

/** dd_cdc chunk-dedup election and mm_audiofp fingerprint replay. */
class CdcAudiofpSpec extends SparkSpec {
  import spark.implicits._

  test("dd_cdc: an identical document's chunks are all duplicates of the first copy") {
    val dir = java.nio.file.Files.createTempDirectory("cdc").toString
    val rnd = new scala.util.Random(9)
    val s = (1 to 1000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val uniq = (1 to 900).map(_ => ('A' + rnd.nextInt(26)).toChar).mkString
    Seq((1L, s), (2L, s), (3L, uniq))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = DedupQueries.queries("dd_cdc")(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val Seq(d1, d2, d3) = got
    assert(d1._1 === 1L && d2._1 === 2L && d3._1 === 3L)
    assert(d1._2 === d2._2 && d1._3 === d2._3) // same chunking
    assert(d1._4 === 0L && d1._5 === 0L) // first copy owns everything
    assert(d2._4 === d2._2 && d2._5 === d2._3) // full duplicate
    assert(d3._4 === 0L) // unique content
  }

  test("mm_audiofp: fingerprints replay the decoded energy contour") {
    val dir = java.nio.file.Files.createTempDirectory("afp").toString
    val docsSeq = Seq((1L, "alpha doc"), (2L, "beta document text"), (3L, "gamma"))
    docsSeq.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SourceQueries.queries("mm_audiofp")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq

    val nFrames = 25
    def fp(id: Long, textLen: Int): Long = {
      val n = Multimodal.audioSamples(id, textLen)
      val flen = n / nFrames
      val e = (0 until nFrames).map(f =>
        (f * flen until (f + 1) * flen)
          .map(k => math.abs(Multimodal.audioSample(id, k).toLong)).sum)
      (0 until nFrames - 1).foldLeft(0L)((acc, f) =>
        if (e(f) > e(f + 1)) acc | (1L << f) else acc)
    }
    val want = docsSeq.map { case (id, t) => id -> fp(id, t.getBytes("UTF-8").length) }.toMap
    got.foreach { case (id, f, nCand, nDup) =>
      assert(f === want(id))
      assert(nDup <= nCand)
    }
    // candidate counts replay the banded self-join
    def bands(f: Long) = (0 until 3).map(b => (b, (f >> (8 * b)) & 0xff))
    got.foreach { case (id, f, nCand, _) =>
      val cand = want.count { case (oid, of) =>
        oid != id && bands(f).intersect(bands(of)).nonEmpty
      }
      assert(nCand === cand.toLong)
    }
  }
}
