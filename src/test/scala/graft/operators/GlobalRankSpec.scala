package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.util.Random

class GlobalRankSpec extends SparkSpec {
  import spark.implicits._

  test("two-pass global rank equals the single-partition window row_number") {
    val rnd = new Random(53)
    val df = Seq
      .fill(500)((rnd.nextInt(40).toLong, rnd.alphanumeric.take(8).mkString))
      .toDF("score", "key")
      .repartition(7) // deliberately scattered input
    val expected = df
      .withColumn("rank", row_number().over(Window.orderBy(col("score").desc, col("key"))).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    val actual = GlobalRank
      .withRank(df, Seq(col("score").desc, col("key")), "rank")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(actual == expected)
  }

  test("two-pass running sum equals the single-partition window prefix sum") {
    val rnd = new Random(71)
    val df = Seq
      .fill(400)((rnd.nextInt(1000).toLong, rnd.nextInt(100000).toLong))
      .toDF("v", "key")
      .repartition(9)
    val w = Window
      .orderBy(col("v").desc, col("key"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df
      .withColumn("rank", row_number().over(Window.orderBy(col("v").desc, col("key"))).cast("long"))
      .withColumn("cum", sum(col("v")).over(w))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val actual = GlobalRank
      .withRunningSum(df, Seq(col("v").desc, col("key")), "v", "rank", "cum")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(actual == expected)
  }

  test("ranks are a 1..n permutation even with heavy ties") {
    val df = Seq.fill(300)(1L).zipWithIndex.map { case (v, i) => (v, i % 5) }.toDF("v", "tie")
    val ranks = GlobalRank
      .withRank(df, Seq(col("v"), col("tie")), "rank")
      .select("rank")
      .collect()
      .map(_.getLong(0))
      .sorted
    assert(ranks.toSeq == (1L to 300L))
  }
}
