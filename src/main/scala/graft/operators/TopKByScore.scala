package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate flowing into the top-k aggregation. */
case class ScoredId(score: Double, id: Long)

/** Bounded top-k buffer: parallel arrays sorted by (score desc, id asc). */
case class TopKBuf(scores: Seq[Double], ids: Seq[Long])

/** Bounded top-k aggregator: keeps only the k best (score desc, ties to the
  * lower id) entries in the aggregation buffer, so partial (map-side)
  * aggregation ships at most k rows per group per partition — the scalable
  * reduction for ANN search, replacing a window `row_number` that would
  * shuffle EVERY scored pair to sort whole per-query partitions. Ordering
  * is total (score bits, then id), so results are deterministic across any
  * partitioning.
  */
class TopKByScore(k: Int) extends Aggregator[ScoredId, TopKBuf, TopKBuf] {
  require(k > 0, "k must be positive")

  private def trim(scores: Seq[Double], ids: Seq[Long]): TopKBuf = {
    val sorted = scores.zip(ids).sortBy { case (s, i) => (-s, i) }.take(k)
    TopKBuf(sorted.map(_._1), sorted.map(_._2))
  }

  override def zero: TopKBuf = TopKBuf(Nil, Nil)

  override def reduce(b: TopKBuf, x: ScoredId): TopKBuf =
    trim(b.scores :+ x.score, b.ids :+ x.id)

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
    trim(a.scores ++ b.scores, a.ids ++ b.ids)

  override def finish(b: TopKBuf): TopKBuf = b

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]

  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}
