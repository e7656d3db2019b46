package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("binaryFile source feeds the media pipeline end-to-end") {
    import spark.implicits._
    // Real media ingestion path: opaque files on disk -> binaryFile source
    // -> (id, payload) -> partition-wise feature extraction.
    val dir = java.nio.file.Files.createTempDirectory("graft-media")
    java.nio.file.Files.write(dir.resolve("a.bin"), Array[Byte](1, 2, 3, 4))
    java.nio.file.Files.write(dir.resolve("b.bin"), "hello".getBytes("UTF-8"))
    val files = spark.read.format("binaryFile").load(dir.toString)
    assert(files.columns.toSet == Set("path", "modificationTime", "length", "content"))
    val media = files
      .select(xxhash64(col("path")).as("doc_id"), col("content").as("payload"))
      .as[MediaRecord]
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 2)
    assert(feats.map(_.n_bytes).sorted.toSeq == Seq(4L, 5L))
    assert(feats.forall(f => f.sha_hex.length == 64))
  }

  test("resize keeps aspect ratio within the bounding box") {
    import spark.implicits._
    val docs = Seq((1L, "x" * 100), (2L, "a longer payload with more bytes")).toDF("doc_id", "text")
    val out = Multimodal.resize(Multimodal.toMedia(docs, "doc_id", "text"), maxDim = 64).collect()
    out.foreach { r =>
      assert(r.width <= 64 && r.height <= 64 && r.width >= 1 && r.height >= 1)
      assert(r.thumb_sha.length == 64)
    }
    // deterministic across runs
    val again = Multimodal.resize(Multimodal.toMedia(docs, "doc_id", "text"), maxDim = 64).collect()
    assert(out.map(_.thumb_sha).toSeq == again.map(_.thumb_sha).toSeq)
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

  test("binary payload features: length, sha256, stub dimensions") {
    import spark.implicits._
    val docs = Seq((1L, "hello"), (2L, ""), (3L, "héllo")).toDF("doc_id", "text")
    val got = Multimodal
      .extractFeatures(Multimodal.toMedia(docs, "doc_id", "text"))
      .collect()
      .map(f => f.doc_id -> f)
      .toMap

    // utf-8 byte counts (é is 2 bytes)
    assert(got(1L).n_bytes == 5L && got(2L).n_bytes == 0L && got(3L).n_bytes == 6L)
    // known digest of "hello"
    assert(
      got(1L).sha_hex ==
        "2cf24dba5fb0a30e26e83b2ac5b9e29e1b161e5c1fa7425e73043362938b9824")
    // stub dims are pure functions of the digest and stay in range
    got.values.foreach { f =>
      assert(f.width >= 1L && f.width <= 512L && f.height >= 1L && f.height <= 512L)
      assert(f.width == 1L + java.lang.Long.parseLong(f.sha_hex.substring(0, 4), 16) % 512L)
    }
  }
}
