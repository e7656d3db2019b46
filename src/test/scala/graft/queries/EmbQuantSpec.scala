package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property lock for the int8 quantization operator: for every vector the
  * per-element reconstruction error is bounded by scale/2 (round) except
  * where clamping engaged, and the total squared error respects the
  * dimension-scaled bound.
  */
class EmbQuantSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("quantization error bounded by scale/2 per dimension (modulo clamp)") {
    val rows = graft.SparkEntry
      .queries("emb_quant")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scale = r.getDouble(1)
      val sqErr = r.getDouble(3)
      assert(scale > 0, "zero scale — degenerate vector in test data")
      // 64 dims, each residual <= scale/2 when unclamped; the max-abs
      // element quantizes to exactly +/-127 so clamping never engages.
      val bound = 64 * (scale / 2) * (scale / 2) * (1 + 1e-9)
      assert(sqErr >= 0 && sqErr <= bound, s"vec ${r.getLong(0)}: sq_err $sqErr > bound $bound")
    }
  }

  test("q_sum is integral (all quantized values are whole numbers)") {
    graft.SparkEntry
      .queries("emb_quant")(spark, dir)
      .collect()
      .foreach { r =>
        val qSum = r.getDouble(2)
        assert(qSum == math.rint(qSum), s"vec ${r.getLong(0)}: non-integral q_sum $qSum")
      }
  }
}
