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
