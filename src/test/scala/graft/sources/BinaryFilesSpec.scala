package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BinaryFilesSpec extends SparkSpec {
  import spark.implicits._

  test("export writes one file per row and ingest round-trips content exactly") {
    val dir = java.nio.file.Files.createTempDirectory("binfiles").toString
    val payloads = Seq(
      (7L, Array[Byte](1, 2, 3, 0, -1)),
      (42L, "hello bytes".getBytes("UTF-8")),
      (99L, Array[Byte]()))
    BinaryFiles.export(payloads.toDF("doc_id", "payload"), dir, ".bin")
    val back = BinaryFiles.ingest(spark, dir, "*.bin")
      .select(
        regexp_extract(col("path"), "(\\d+)\\.bin$", 1).cast("long").as("id"),
        col("length"),
        col("content"))
      .as[(Long, Long, Array[Byte])].collect()
      .map(r => r._1 -> ((r._2, r._3.toSeq))).toMap
    // Spark's file-source planning skips zero-byte files, so 99 is
    // (by stock binaryFile semantics) absent from the scan — but its file
    // exists on disk.
    assert(back.keySet == Set(7L, 42L))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "99.bin")))
    payloads.filter(_._2.nonEmpty).foreach { case (id, bytes) =>
      assert(back(id) == ((bytes.length.toLong, bytes.toSeq)), s"doc $id")
    }
  }

  test("glob filter excludes foreign files; metadata-only scan never reads content") {
    val dir = java.nio.file.Files.createTempDirectory("binfiles2").toString
    BinaryFiles.export(Seq((1L, Array[Byte](9))).toDF("id", "p"), dir, ".bin")
    BinaryFiles.export(Seq((2L, Array[Byte](8))).toDF("id", "p"), dir, ".other")
    val scan = BinaryFiles.ingest(spark, dir, "*.bin").select("path", "length")
    assert(scan.count() == 1)
    // column pruning: the content column must not survive into the scan schema
    val plan = scan.queryExecution.executedPlan.toString
    assert(!plan.contains("content"), plan)
  }
}
