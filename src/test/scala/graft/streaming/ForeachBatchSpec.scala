package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** foreachBatch sink coverage: the escape hatch for sinks Structured
  * Streaming lacks natively (JDBC upserts, multi-table writes). Each
  * micro-batch arrives as an ordinary DataFrame with its batch id; here the
  * batches append to partitioned parquet and the union of all batches must
  * equal what streamed in.
  */
class ForeachBatchSpec extends SparkSpec {

  test("foreachBatch lands every micro-batch exactly once in parquet") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dest = java.nio.file.Files.createTempDirectory("graft-feb").toString
    val source = MemoryStream[(Long, String)]

    val q = source
      .toDS()
      .toDF("id", "payload")
      .writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch
          .withColumn("batch_id", lit(batchId))
          .write
          .mode(SaveMode.Append)
          .parquet(dest)
      }
      .start()

    source.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    source.addData((3L, "c"))
    q.processAllAvailable()
    q.stop()

    val landed = spark.read.parquet(dest)
    assert(landed.count() == 3)
    assert(landed.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    // batches are distinguishable (exactly-once bookkeeping handle)
    assert(landed.select("batch_id").distinct().count() == 2)
  }

  test("IdempotentSink makes redelivered batches exactly-once") {
    import spark.implicits._
    val dest = java.nio.file.Files.createTempDirectory("graft-idem").toString
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "payload")
    val b1 = Seq((3L, "c")).toDF("id", "payload")

    // Normal flow, then a retry storm: batch 1 is redelivered twice —
    // first as a PARTIAL attempt (the failure that triggered the retry),
    // then complete. At-least-once delivery, exactly-once result.
    IdempotentSink.write(b0, 0L, dest)
    IdempotentSink.write(b1.limit(0), 1L, dest)
    IdempotentSink.write(b1, 1L, dest)
    IdempotentSink.write(b1, 1L, dest)

    val landed = spark.read.parquet(dest)
    assert(landed.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    // the partition layout keeps the batch lineage queryable + prunable
    assert(
      landed.filter(col("batch_id") === 1).select("id").as[Long].collect().toSeq == Seq(3L))
  }
}
