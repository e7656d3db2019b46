package graft.expressions

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

import scala.util.Random

class RewriteDotFoldSpec extends SparkSpec {
  import spark.implicits._

  private def randomDf(n: Int, seed: Int) = {
    val rnd = new Random(seed)
    Seq.fill(n)((Array.fill(16)(rnd.nextDouble()), Array.fill(16)(rnd.nextDouble())))
      .toDF("a", "b")
  }

  test("HOF dot-fold pattern is rewritten to the native graft_dot expression") {
    // repartition keeps ConvertToLocalRelation from constant-folding the
    // whole plan away before the optimized tree can be inspected
    val df = randomDf(5, 1).repartition(2).select(Dedup.dotFoldHof(col("a"), col("b")).as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_dot"), s"rewrite did not fire:\n$optimized")
    assert(!optimized.contains("aggregate("), s"HOF survived:\n$optimized")
  }

  test("rewritten plan returns bit-identical results") {
    val df = randomDf(100, 2)
    val rows = df
      .select(Dedup.dotFoldHof(col("a"), col("b")).as("hof"), Dedup.dotFold(col("a"), col("b")).as("native"))
      .collect()
    rows.foreach { r =>
      assert(
        java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("non-matching folds are left alone") {
    // sum fold without the multiply (plain array sum) must NOT be rewritten
    val df = randomDf(3, 3)
      .select(aggregate(col("a"), lit(0.0), (acc, x) => acc + x).as("s"))
    assert(!df.queryExecution.optimizedPlan.toString.contains("graft_dot"))
    // and a fold with a non-zero seed must survive as-is
    val df2 = randomDf(3, 4)
      .select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(1.0), (acc, x) => acc + x).as("s"))
    assert(!df2.queryExecution.optimizedPlan.toString.contains("graft_dot"))
  }
}
