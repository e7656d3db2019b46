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
}
