package graft.streaming

import org.apache.spark.sql.DataFrame

/** Exactly-once-under-retry foreachBatch writer: each micro-batch lands in
  * its own `batch_id=<id>` partition directory with OVERWRITE semantics, so
  * a redelivered batch (Structured Streaming replays the last batch id
  * after a failure — delivery to foreachBatch is at-least-once) replaces
  * its previous partial/complete attempt instead of appending a duplicate.
  * This is the standard batch-id-keyed idempotence contract that upgrades
  * foreachBatch's at-least-once delivery to exactly-once results for any
  * deterministic batch.
  *
  * Scale shape: a directory-scoped overwrite touches ONLY the redelivered
  * batch's partition (no global commit lock, no table rewrite), and the
  * destination stays a plain partitioned parquet table any batch reader
  * scans with partition pruning on `batch_id`.
  */
object IdempotentSink {

  def write(batch: DataFrame, batchId: Long, dest: String): Unit =
    batch.write.mode("overwrite").parquet(s"$dest/batch_id=$batchId")
}
