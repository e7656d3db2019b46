package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("BMP encode -> ImageIO decode round-trips dimensions and every pixel") {
    val w = 13 // odd width exercises the 4-byte row padding
    val h = 7
    val bytes = Multimodal.encodeGrayBmp(w, h, (x, y) => Multimodal.pixel(42L, x, y))
    assert(bytes.length == 54 + ((3 * w + 3) / 4) * 4 * h)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "JDK ImageIO must decode the synthesized BMP")
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val p = Multimodal.pixel(42L, x, y)
      val rgb = img.getRGB(x, y)
      // gray: all three channels carry the value (row order NOT flipped)
      assert((rgb & 0xff) == p && ((rgb >> 8) & 0xff) == p && ((rgb >> 16) & 0xff) == p)
    }
  }

  test("dhash56 matches the closed-form gradient hash of the decoded raster") {
    import spark.implicits._
    val docs = Seq((7L, "some document text"), (8L, "x" * 100), (9L, ""))
      .toDF("doc_id", "text")
    val got = Multimodal
      .dhash56(Multimodal.synthesizeImages(docs, "doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    for ((id, text) <- Seq((7L, "some document text"), (8L, "x" * 100), (9L, ""))) {
      val (w, h) = Multimodal.dims(id, text.getBytes("UTF-8").length)
      var expect = 0L
      for (y <- 0 until 8; x <- 0 until 7) {
        val g0 = Multimodal.pixel(id, x * w / 8, y * h / 8)
        val g1 = Multimodal.pixel(id, (x + 1) * w / 8, y * h / 8)
        if (g1 > g0) expect |= 1L << (y * 7 + x)
      }
      assert(got(id) == expect, s"doc $id: got ${got(id)}, expect $expect")
      assert(got(id) >= 0L, "56-bit hash must stay positive")
    }
  }

  test("binaryFile source feeds the media pipeline end-to-end") {
    import spark.implicits._
    // Real media ingestion path: opaque image files on disk -> binaryFile
    // source -> (id, digest, payload) -> partition-wise REAL decode.
    val dir = java.nio.file.Files.createTempDirectory("graft-media")
    java.nio.file.Files.write(
      dir.resolve("a.bmp"),
      Multimodal.encodeGrayBmp(4, 3, (x, y) => Multimodal.pixel(1L, x, y)))
    java.nio.file.Files.write(
      dir.resolve("b.bmp"),
      Multimodal.encodeGrayBmp(5, 2, (x, y) => Multimodal.pixel(2L, x, y)))
    val files = spark.read.format("binaryFile").load(dir.toString)
    assert(files.columns.toSet == Set("path", "modificationTime", "length", "content"))
    val images = files
      .select(
        xxhash64(col("path")).as("doc_id"),
        sha2(col("content"), 256).as("src_sha"),
        col("content").as("payload"))
      .as[ImageRecord]
    val feats = Multimodal.decodeFeatures(images).collect()
    assert(feats.length == 2)
    assert(feats.map(f => (f.width, f.height)).toSet == Set((4L, 3L), (5L, 2L)))
    assert(feats.forall(f => f.src_sha.length == 64))
  }

  test("synthesized images decode to the closed-form dims and checksum") {
    import spark.implicits._
    val docs = Seq((1L, "hello"), (2L, ""), (3L, "héllo")).toDF("doc_id", "text")
    val got = Multimodal
      .decodeFeatures(Multimodal.synthesizeImages(docs, "doc_id", "text"))
      .collect()
      .map(f => f.doc_id -> f)
      .toMap

    // known digest of "hello"
    assert(
      got(1L).src_sha ==
        "2cf24dba5fb0a30e26e83b2ac5b9e29e1b161e5c1fa7425e73043362938b9824")
    Seq((1L, 5), (2L, 0), (3L, 6)).foreach { case (id, len) =>
      val f = got(id)
      val (w, h) = Multimodal.dims(id, len) // é is 2 UTF-8 bytes
      assert(f.width == w.toLong && f.height == h.toLong)
      assert(f.n_bytes == 54L + ((3 * w + 3) / 4) * 4 * h)
      var cks = 0L
      for (y <- 0 until h; x <- 0 until w)
        cks += Multimodal.pixel(id, x, y).toLong * (y.toLong * w + x + 1)
      assert(f.px_checksum == cks, s"decoded raster checksum for doc $id")
    }
  }

  test("resize keeps aspect ratio, resamples the decoded pixels") {
    import spark.implicits._
    val docs = Seq((1L, "x" * 100), (2L, "a longer payload with more bytes")).toDF("doc_id", "text")
    val out = Multimodal
      .resizeImages(Multimodal.synthesizeImages(docs, "doc_id", "text"), maxDim = 16)
      .collect()
      .map(r => r.doc_id -> r)
      .toMap
    out.values.foreach { r =>
      assert(r.thumb_w <= 16 && r.thumb_h <= 16 && r.thumb_w >= 1 && r.thumb_h >= 1)
      val m = math.max(r.width, r.height)
      if (m <= 16) assert(r.thumb_w == r.width && r.thumb_h == r.height)
      else {
        assert(r.thumb_w == math.max(1L, r.width * 16 / m))
        assert(r.thumb_h == math.max(1L, r.height * 16 / m))
      }
      // nearest-neighbor replay of the closed-form pixels
      var cks = 0L
      for (y <- 0 until r.thumb_h.toInt; x <- 0 until r.thumb_w.toInt) {
        val sx = (x * r.width / r.thumb_w).toInt
        val sy = (y * r.height / r.thumb_h).toInt
        cks += Multimodal.pixel(r.doc_id, sx, sy).toLong * (y.toLong * r.thumb_w + x + 1)
      }
      assert(r.thumb_checksum == cks)
    }
    // deterministic across runs
    val again = Multimodal
      .resizeImages(Multimodal.synthesizeImages(docs, "doc_id", "text"), maxDim = 16)
      .collect()
      .map(r => r.doc_id -> r.thumb_checksum)
      .toMap
    assert(out.view.mapValues(_.thumb_checksum).toMap == again)
  }

  test("WAV encode -> javax.sound decode round-trips format and samples") {
    import spark.implicits._
    val docs = Seq((7L, "some audio-backing text"), (8L, "")).toDF("doc_id", "text")
    val got = Multimodal
      .decodeAudioFeatures(Multimodal.synthesizeAudio(docs, "doc_id", "text"))
      .collect()
      .map(f => f.doc_id -> f)
      .toMap
    Seq((7L, 23), (8L, 0)).foreach { case (id, len) =>
      val f = got(id)
      val n = Multimodal.audioSamples(id, len)
      assert(f.sample_rate == Multimodal.SampleRate.toLong, s"doc $id decoded rate")
      assert(f.n_samples == n.toLong, s"doc $id decoded frame count")
      assert(f.n_bytes == 44L + 2L * n)
      var cks = 0L
      for (k <- 0 until n) cks += Multimodal.audioSample(id, k).toLong * (k + 1)
      assert(f.s_checksum == cks, s"doc $id decoded sample checksum")
    }
  }

  test("frame sampling emits strided fixed-size windows") {
    import spark.implicits._
    val docs = Seq((1L, "abcdefghijklmnopqrstuvwxyz")).toDF("doc_id", "text") // 26 bytes
    val frames = Multimodal
      .frameSample(Multimodal.toMedia(docs, "doc_id", "text"), frameBytes = 4, stride = 2)
      .collect()
      .sortBy(_.frame_no)
    // windows start at 0, 8, 16 (stride of 2 x 4 bytes), last full window start is 22
    assert(frames.map(_.offset).toSeq == Seq(0L, 8L, 16L))
    assert(frames.map(_.frame_no).toSeq == Seq(0L, 1L, 2L))
    assert(frames.map(_.frame_sha).distinct.length == 3)
  }

  test("scene-cut detection recovers exactly the planted cuts") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val byDoc = Multimodal
      .videoFrameLumas(docs, "doc_id", "text")
      .collect()
      .groupBy(_.doc_id)
    assert(byDoc.nonEmpty)
    var cutsSeen = 0
    byDoc.foreach { case (id, frames) =>
      val sorted = frames.sortBy(_.frame)
      assert(sorted.map(_.frame).toSeq == sorted.indices.map(_.toLong), s"doc $id frame gap")
      // planted: cut at f >= 1 iff (id*13 + f*7) % 5 == 0; detected: luma change
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val planted = math.floorMod(id * 13L + b.frame * 7L, 5L) == 0L
          val detected = a.luma != b.luma
          assert(detected == planted, s"doc $id frame ${b.frame}: planted=$planted detected=$detected")
          if (detected) cutsSeen += 1
        case _ => ()
      }
    }
    assert(cutsSeen > 0, "fixture planted no cuts at all")
  }

  test("patchify crops to full patches and each patch sum replays the closed form") {
    import spark.implicits._
    val docs = Seq((3L, "patch me"), (11L, "a longer text body for bigger dims")).toDF("doc_id", "text")
    val got = Multimodal
      .patchify(Multimodal.synthesizeImages(docs, "doc_id", "text"), 8)
      .collect()
      .map(r => (r.doc_id, r.patch_row, r.patch_col) -> r.patch_sum)
      .toMap
    val expect = Seq((3L, "patch me"), (11L, "a longer text body for bigger dims")).flatMap {
      case (id, text) =>
        val (w, h) = Multimodal.dims(id, text.getBytes("UTF-8").length)
        for {
          pr <- 0 until h / 8
          pc <- 0 until w / 8
        } yield {
          var s = 0L
          for (y <- pr * 8 until pr * 8 + 8; x <- pc * 8 until pc * 8 + 8)
            s += Multimodal.pixel(id, x, y)
          (id, pr.toLong, pc.toLong) -> s
        }
    }.toMap
    assert(got == expect)
    // crop check: no patch index at or past dim/8
    val (w3, h3) = Multimodal.dims(3L, "patch me".getBytes("UTF-8").length)
    assert(!got.keys.exists { case (id, pr, pc) => id == 3L && (pr >= h3 / 8 || pc >= w3 / 8) })
  }
}
