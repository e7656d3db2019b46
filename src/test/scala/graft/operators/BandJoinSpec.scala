package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the bucketed band join equal to the naive crossJoin+filter on
  * randomized inputs (the CcEquivalence pattern): negative times, exact
  * boundary gaps (|diff| == width), duplicate times, and null times.
  */
class BandJoinSpec extends SparkSpec {

  private def naive(l: DataFrame, r: DataFrame, lt: String, rt: String, w: Long): DataFrame =
    l.crossJoin(r).filter(abs(col(lt) - col(rt)) <= lit(w))

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select(col("l_id"), col("r_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("banded equals naive cross+filter on randomized inputs (incl. negatives and boundaries)") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val w = 10L
    // clustered around a few hot spots so cells get real multi-occupancy,
    // spanning negative and positive times; exact ±w gaps planted
    val lRows = (1L to 120L).map(i =>
      (i, rnd.nextInt(40) - 20L + (if (i % 3 == 0) 1000L else 0L)))
    val rRows = (1L to 140L).map(i =>
      (i, rnd.nextInt(40) - 20L + (if (i % 2 == 0) 1000L else 0L))) ++
      Seq((900L, -20L + w), (901L, -20L - w), (902L, 1000L + w))
    val l = lRows.toDF("l_id", "lt")
    val r = rRows.toDF("r_id", "rt")
    assert(pairs(BandJoin.banded(l, r, "lt", "rt", w)) == pairs(naive(l, r, "lt", "rt", w)))
    // a width that does not divide the time range (cells straddle zero)
    assert(pairs(BandJoin.banded(l, r, "lt", "rt", 7L)) == pairs(naive(l, r, "lt", "rt", 7L)))
    // width 1: only exact/adjacent micros pair
    assert(pairs(BandJoin.banded(l, r, "lt", "rt", 1L)) == pairs(naive(l, r, "lt", "rt", 1L)))
  }

  test("null times match nothing, same as the naive formulation") {
    import spark.implicits._
    val l = Seq((1L, Some(5L)), (2L, None), (3L, Some(-5L))).toDF("l_id", "lt")
    val r = Seq((10L, Some(6L)), (11L, None), (12L, Some(-7L))).toDF("r_id", "rt")
    val got = pairs(BandJoin.banded(l, r, "lt", "rt", 3L))
    assert(got == pairs(naive(l, r, "lt", "rt", 3L)))
    assert(got == Set((1L, 10L), (3L, 12L)))
  }

  test("each matching pair is emitted exactly once (no cross-cell dupes)") {
    import spark.implicits._
    val l = Seq((1L, 10L), (2L, 19L), (3L, 20L)).toDF("l_id", "lt")
    val r = Seq((10L, 10L), (11L, 20L), (12L, 29L)).toDF("r_id", "rt")
    val out = BandJoin.banded(l, r, "lt", "rt", 10L)
    assert(out.count() == out.distinct().count())
    assert(out.count() == naive(l, r, "lt", "rt", 10L).count())
  }

  test("contract violations fail fast") {
    import spark.implicits._
    val l = Seq((1L, 1L)).toDF("l_id", "lt")
    val r = Seq((2L, 2L)).toDF("r_id", "rt")
    intercept[IllegalArgumentException](BandJoin.banded(l, r, "lt", "rt", 0L))
    intercept[IllegalArgumentException](
      BandJoin.banded(l, l.withColumnRenamed("l_id", "x"), "lt", "lt", 1L))
    intercept[IllegalArgumentException](
      BandJoin.banded(l.toDF("l_id", "__band_cell"), r, "__band_cell", "rt", 1L))
    // non-long time column
    intercept[IllegalArgumentException](
      BandJoin.banded(l.withColumn("lt", col("lt").cast("int")), r, "lt", "rt", 1L))
  }
}
