package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel

/** Global row_number over a total order WITHOUT a single-partition window.
  *
  * `Window.orderBy(...)` with no partition key funnels the whole input
  * through one task — fine at test scale, a cliff at 100 TB. The scalable
  * equivalent is the classic two-pass rank:
  *
  *   1. range-repartition + sort within partitions on the order key
  *      (a distributed sort — the same shape `ORDER BY` planning uses);
  *   2. count rows per partition (a cheap per-partition pass; only the
  *      per-partition counts — one long each — reach the driver);
  *   3. broadcast the cumulative offsets and add `offset + local index`
  *      per partition.
  *
  * The order must be TOTAL (include a tiebreaker column): ranks are then
  * exact and deterministic regardless of where range boundaries fall.
  */
object GlobalRank {

  /** @param df input frame
    * @param sortCols total-order sort expressions (include a tiebreaker)
    * @param rankName name of the appended 1-based long rank column
    */
  def withRank(df: DataFrame, sortCols: Seq[Column], rankName: String): DataFrame = {
    val spark = df.sparkSession
    val n = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val sorted = df
      .repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Long fold, not Iterator.size — an Int count silently wraps past 2^31
    // rows per partition, exactly the scale this operator exists for.
    val counts = sorted.rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.foldLeft(0L)((c, _) => c + 1))))
      .collect()
      .sortBy(_._1)
      .map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _).dropRight(1)
    val bc = spark.sparkContext.broadcast(offsets)
    val ranked = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var r = bc.value(i)
      it.map { row =>
        r += 1
        Row.fromSeq(row.toSeq :+ r)
      }
    }
    // Materialize the ranked result eagerly so the sorted intermediate can
    // be released here — otherwise every call would pin a full sorted copy
    // of its input in the cache forever.
    val out = spark
      .createDataFrame(ranked, df.schema.add(rankName, LongType, nullable = false))
      .localCheckpoint(true)
    sorted.unpersist(blocking = false)
    out
  }

  /** Global rank AND running sum of a long column over a total order —
    * the distributed prefix sum. Same two-pass shape as [[withRank]]:
    * the first pass collects one (count, sum) pair per partition (two
    * longs each — never data), the offsets are broadcast, and each
    * partition resumes its rank and running total from its offset. The
    * scalable replacement for `sum(x) OVER (ORDER BY ...)`, whose empty
    * partitionBy funnels everything through one task.
    *
    * @param df       input frame
    * @param sortCols total-order sort expressions (include a tiebreaker)
    * @param valueCol name of the LongType column to prefix-sum
    * @param rankName appended 1-based long rank column
    * @param sumName  appended inclusive running-sum column
    */
  def withRunningSum(
      df: DataFrame,
      sortCols: Seq[Column],
      valueCol: String,
      rankName: String,
      sumName: String): DataFrame = {
    val spark = df.sparkSession
    val n = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val vIdx = df.schema.fieldIndex(valueCol)
    val sorted = df
      .repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val stats = sorted.rdd
      .mapPartitionsWithIndex { (i, it) =>
        var c = 0L
        var s = 0L
        it.foreach { row => c += 1; s += row.getLong(vIdx) }
        Iterator((i, c, s))
      }
      .collect()
      .sortBy(_._1)
    val rankOffsets = stats.map(_._2).scanLeft(0L)(_ + _).dropRight(1)
    val sumOffsets = stats.map(_._3).scanLeft(0L)(_ + _).dropRight(1)
    val bc = spark.sparkContext.broadcast((rankOffsets, sumOffsets))
    val out = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var r = bc.value._1(i)
      var s = bc.value._2(i)
      it.map { row =>
        r += 1
        s += row.getLong(vIdx)
        Row.fromSeq(row.toSeq :+ r :+ s)
      }
    }
    val res = spark
      .createDataFrame(
        out,
        df.schema.add(rankName, LongType, nullable = false).add(sumName, LongType, nullable = false))
      .localCheckpoint(true)
    sorted.unpersist(blocking = false)
    res
  }
}
