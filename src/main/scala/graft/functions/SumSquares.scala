package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregation function (the engine's UDAF surface): exact
  * sum of squares over a double column, accumulated in BigDecimal so the
  * result is order-independent — partial aggregation across any partition
  * split produces identical bits, which also makes it replayable by the
  * DuckDB oracle's DECIMAL arithmetic.
  *
  * `BigDecimal.valueOf(x)` uses the double's shortest decimal rendering;
  * exact as long as inputs carry few decimal digits (true of the harness's
  * integral quantities — document the contract for other inputs).
  */
object SumSquares extends Aggregator[Double, java.math.BigDecimal, Double] {

  override def zero: java.math.BigDecimal = java.math.BigDecimal.ZERO

  override def reduce(b: java.math.BigDecimal, x: Double): java.math.BigDecimal = {
    val d = java.math.BigDecimal.valueOf(x)
    b.add(d.multiply(d))
  }

  override def merge(a: java.math.BigDecimal, b: java.math.BigDecimal): java.math.BigDecimal =
    a.add(b)

  override def finish(b: java.math.BigDecimal): Double = b.doubleValue()

  override def bufferEncoder: Encoder[java.math.BigDecimal] = Encoders.DECIMAL

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
