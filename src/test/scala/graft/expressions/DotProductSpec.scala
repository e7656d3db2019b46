package graft.expressions

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

import scala.util.Random

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  test("native dot product is bit-identical to the HOF fold") {
    val rnd = new Random(7)
    val rows = Seq.fill(50)(
      (Array.fill(64)(rnd.nextDouble() * 2 - 1), Array.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val out = df
      .select(
        Dedup.dotFold(col("a"), col("b")).as("native"),
        Dedup.dotFoldHof(col("a"), col("b")).as("hof"))
      .collect()
    out.foreach { r =>
      // Bitwise equality, not approximate: same multiply-accumulate order.
      assert(
        java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("null array, length mismatch, and null element all yield null") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))), // 11.0
      (None, Some(Seq(1.0))), // null side
      (Some(Seq(1.0, 2.0)), Some(Seq(1.0))) // length mismatch
    ).toDF("a", "b")
    val got = df
      .select(Dedup.dotFold(col("a").cast("array<double>"), col("b").cast("array<double>")))
      .collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq == Seq(Some(11.0), None, None))

    val withNullElem = spark.sql("SELECT array(1.0d, cast(null as double)) a, array(1.0d, 2.0d) b")
    val r = withNullElem.select(Dedup.dotFold(col("a"), col("b"))).collect()
    assert(r.head.isNullAt(0))
  }

  test("interpreted eval path matches codegen") {
    // Force the interpreted path through a filter on a literal-free plan is
    // brittle; instead check nullSafeEval directly.
    import org.apache.spark.sql.catalyst.util.ArrayData
    import graft.functions.Compat
    // children unused for the direct eval call
    val e = DotProduct(Compat.expression(lit(1)), Compat.expression(lit(1)))
    val a = ArrayData.toArrayData(Array(1.0, 2.0, 3.0))
    val b = ArrayData.toArrayData(Array(4.0, 5.0, 6.0))
    assert(e.nullSafeEval(a, b) == 32.0)
  }
}
