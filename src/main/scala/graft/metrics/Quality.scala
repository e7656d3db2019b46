package graft.metrics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocking-quality metrics: precision/recall/F1 of a blocked match run
  * against the exhaustive run as oracle. Port of
  * `/root/reference/src/performance.py:4-32` (F1 rounded to 3, the
  * standalone-harness convention that defines the published Table 1).
  */
object Quality {

  case class Metrics(
      trueDuplicates: Long,
      blockedDuplicates: Long,
      truePositives: Long,
      falseNegatives: Long,
      falsePositives: Long,
      precision: Double,
      recall: Double,
      f1: Double)

  def measure(full: DataFrame, blocked: DataFrame): Metrics = {
    val f = full.select("dblp_id", "acm_id")
    val b = blocked.select("dblp_id", "acm_id")
    val tp = f.intersect(b).count()
    val fn = f.except(b).count()
    val fp = b.except(f).count()
    val precision = tp.toDouble / (tp + fp)
    val recall = tp.toDouble / (tp + fn)
    val f1 = 2 * precision * recall / (precision + recall)
    def r3(x: Double) = BigDecimal(x).setScale(3, BigDecimal.RoundingMode.HALF_EVEN).toDouble
    Metrics(f.count(), b.count(), tp, fn, fp, r3(precision), r3(recall), r3(f1))
  }
}
