package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra–Gries heavy-hitters summary (Agarwal et al.,
  * "Mergeable Summaries", PODS '12): at most `k - 1` (token, weight)
  * counters; any element with true frequency > n/k is guaranteed present
  * in the final summary, and every weight underestimates its true count
  * by at most n/k — REGARDLESS of how the partial summaries were merged.
  *
  * That merge-order-insensitive guarantee is what makes a distributed
  * frequent-items pass correct on a cluster: the summary CONTENTS may
  * differ run to run with partitioning, but the guarantees cannot, so
  * verification (ta_heavyhitters) asserts the guarantees against exact
  * counts rather than the summary bytes. O(k) state per partition, one
  * map-side combine pass — the shape that finds frequent tokens in a
  * 100 TB corpus where the exact (token, count) table would itself be
  * huge.
  */
class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 2, "k must be >= 2")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], tok: String): Map[String, Long] =
    b.get(tok) match {
      case Some(c) => b.updated(tok, c + 1)
      case None if b.size < k - 1 => b.updated(tok, 1L)
      case None =>
        // Decrement-all step: drops every counter by one, evicting zeros.
        b.collect { case (t, c) if c > 1 => t -> (c - 1) }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (t, c)) => m.updated(t, m.getOrElse(t, 0L) + c) }
    if (sum.size <= k - 1) sum
    else {
      // Subtract the k-th largest weight from every counter and evict
      // non-positives — the mergeable-summaries combine step (keeps at
      // most k - 1 counters, adds at most that weight to the global
      // undercount budget of n/k).
      val kth = sum.values.toIndexedSeq.sortBy(-_).apply(k - 1)
      sum.collect { case (t, c) if c - kth > 0 => t -> (c - kth) }
    }
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
