package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Pure band join — pairs within a time distance, with NO equi key.
  *
  * Spark has no physical operator for this: a join whose only condition
  * is `|l.t - r.t| <= w` plans as BroadcastNestedLoopJoin when one side
  * fits the driver and as a cartesian product otherwise — |L|×|R|
  * comparisons at any scale. (The equi+band case is q45's territory:
  * SMJ on the key with the band as residual. This operator is the
  * keyless case — cross-entity temporal correlation, burst detection,
  * log alignment.)
  *
  * Rewrite (compose-existing-ops, the extension ladder's first rung):
  * bucket the time axis into cells of exactly `width` micros
  * (cell = t - pmod(t, width), the floored cell start — exact Long
  * arithmetic, no double division, correct for negative times). Any
  * pair within `width` lands in the same or adjacent cells, so the
  * RIGHT side replicates to its cell and both neighbors (one narrow
  * 3-row explode), the join becomes a plain equi-join on the cell, and
  * the exact band is re-checked as a residual. Each matching pair
  * matches in EXACTLY one exploded cell (the left row's cell), so no
  * dedup pass is needed.
  *
  * Scale: one 3× replication of the slimmer side + one hash shuffle on
  * the cell key — never |L|×|R|. Per-cell cost is the cell's own
  * density product (bounded by choosing `width` at the correlation
  * scale); a pathological hot cell is a plain equi-join hot key, which
  * AQE's skew-join split already handles. The ScaleProbe `band_join`
  * row pins pair-linear growth when replicas extend the time axis
  * (constant density — the honest 100 TB scale-up).
  *
  * Contract: both time columns are LongType (epoch micros by
  * convention), |t| must stay at least `width` away from Long
  * overflow, and the two inputs' column names must be disjoint. Null
  * times match nothing (their cell is null; SQL equality never
  * matches), exactly like the naive formulation — BandJoinSpec pins
  * equality against crossJoin+filter on randomized inputs including
  * negatives, exact-boundary gaps, and nulls.
  */
object BandJoin {

  private val CellCol = "__band_cell"
  private val RightCellCol = "__band_rc"

  def banded(
      left: DataFrame,
      right: DataFrame,
      leftTime: String,
      rightTime: String,
      width: Long): DataFrame = {
    require(width > 0, s"band width must be positive, got $width")
    val lt = left.schema(leftTime).dataType
    val rt = right.schema(rightTime).dataType
    require(lt == LongType && rt == LongType,
      s"band join requires LongType epoch times; got $lt / $rt")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty, s"input column names must be disjoint, both have: $overlap")
    require(!(left.columns ++ right.columns).exists(Set(CellCol, RightCellCol)),
      s"inputs must not use the reserved working columns $CellCol/$RightCellCol")

    // Floored cell start in exact Long arithmetic: pmod is non-negative,
    // so this floors correctly for negative times too.
    def cellOf(c: Column): Column = c - pmod(c, lit(width))

    val l = left.withColumn(CellCol, cellOf(col(leftTime)))
    val r = right
      .withColumn(RightCellCol, cellOf(col(rightTime)))
      .withColumn(
        CellCol,
        explode(array(
          col(RightCellCol) - lit(width),
          col(RightCellCol),
          col(RightCellCol) + lit(width))))
      .drop(RightCellCol)
    l.join(r, Seq(CellCol))
      .filter(abs(col(leftTime) - col(rightTime)) <= lit(width))
      .drop(CellCol)
  }
}
