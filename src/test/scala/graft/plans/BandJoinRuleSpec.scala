package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Locks the RewriteBandJoin optimizer rule (r13 #3 / r14 #5): a
  * user-written pure band join — SQL frontend or DataFrame API — must
  * plan as Generate + equi join (never BNLJ/cartesian), return results
  * bit-equal to an independent driver-side brute force, and leave
  * non-band shapes untouched.
  */
class BandJoinRuleSpec extends SparkSpec {

  private def planOf(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  private def lFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    ((1L to 150L).map(i => (i, rnd.nextInt(60) - 30L + (if (i % 3 == 0) 500L else 0L))) ++
      Seq((900L, 17L), (901L, -13L))).toDF("l_id", "lt")
  }
  private def rFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    ((1L to 170L).map(i => (i + 10000L, rnd.nextInt(60) - 30L + (if (i % 2 == 0) 500L else 0L))) ++
      Seq((10900L, 17L + 10L), (10901L, 17L - 10L), (10902L, -13L + 11L))).toDF("r_id", "rt")
  }

  /** Independent ground truth: driver-side brute force over collected
    * rows — not Spark, not the BandJoin operator, not the rule.
    */
  private def brute(w: Long, strict: Boolean): Set[(Long, Long)] = {
    val ls = lFrame.collect().map(r => (r.getLong(0), r.getLong(1)))
    val rs = rFrame.collect().map(r => (r.getLong(0), r.getLong(1)))
    (for {
      (li, lt) <- ls
      (ri, rt) <- rs
      d = math.abs(lt - rt)
      if (strict && d < w) || (!strict && d <= w)
    } yield (li, ri)).toSet
  }

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def assertRewritten(df: DataFrame): Unit = {
    val plan = planOf(df)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"band join still plans a product:\n${plan.take(900)}")
    assert(plan.contains("Generate"), s"no cell replication in plan:\n${plan.take(900)}")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"no equi join on the cell:\n${plan.take(900)}")
  }

  test("SQL-frontend band join is rewritten to the cell plan, results bit-equal to brute force") {
    lFrame.createOrReplaceTempView("bj_l")
    rFrame.createOrReplaceTempView("bj_r")
    val df = spark.sql("SELECT l_id, r_id FROM bj_l JOIN bj_r ON abs(lt - rt) <= 10")
    assertRewritten(df)
    assert(pairs(df) == brute(10L, strict = false))
    // the comma-join + WHERE spelling reaches the same shape via pushdown
    val df2 = spark.sql("SELECT l_id, r_id FROM bj_l, bj_r WHERE abs(rt - lt) <= 7")
    assertRewritten(df2)
    assert(pairs(df2) == brute(7L, strict = false))
  }

  test("DataFrame-API band join is rewritten; strict < keeps its own boundary") {
    val l = lFrame; val r = rFrame
    val le = l.join(r, abs(col("lt") - col("rt")) <= lit(10L))
    assertRewritten(le)
    assert(pairs(le) == brute(10L, strict = false))
    val lt = l.join(r, abs(col("lt") - col("rt")) < lit(10L))
    assertRewritten(lt)
    assert(pairs(lt) == brute(10L, strict = true))
    assert(pairs(lt) != pairs(le), "planted exact-boundary pairs must split < from <=")
    // mirrored literal side
    val ge = l.join(r, lit(10L) >= abs(col("rt") - col("lt")))
    assertRewritten(ge)
    assert(pairs(ge) == brute(10L, strict = false))
  }

  test("an explicit broadcast hint survives the rewrite") {
    val df = lFrame.join(broadcast(rFrame), abs(col("lt") - col("rt")) <= lit(10L))
    val plan = planOf(df)
    assertRewritten(df)
    assert(plan.contains("BroadcastHashJoin"),
      s"the user's broadcast() request was dropped by the rewrite:\n${plan.take(900)}")
    assert(pairs(df) == brute(10L, strict = false))
  }

  test("rule output equals the library operator bit-for-bit") {
    val viaRule = lFrame.join(rFrame, abs(col("lt") - col("rt")) <= lit(10L))
    val viaOp = graft.operators.BandJoin.banded(lFrame, rFrame, "lt", "rt", 10L)
    assert(pairs(viaRule) == pairs(viaOp))
  }

  test("null times match nothing through the rewrite") {
    import spark.implicits._
    val l = Seq((1L, Some(5L)), (2L, None), (3L, Some(-5L))).toDF("l_id", "lt")
    val r = Seq((10L, Some(6L)), (11L, None), (12L, Some(-7L))).toDF("r_id", "rt")
    val df = l.join(r, abs(col("lt") - col("rt")) <= lit(3L))
    assertRewritten(df)
    assert(pairs(df) == Set((1L, 10L), (3L, 12L)))
  }

  test("non-band shapes are left alone (narrow matcher)") {
    import spark.implicits._
    val l = Seq((1L, 5), (2L, 9)).toDF("l_id_i", "lti") // IntegerType times
    val r = Seq((10L, 6), (11L, -7)).toDF("r_id_i", "rti")
    val intBand = l.join(r, abs(col("lti") - col("rti")) <= lit(3))
    assert(planOf(intBand).contains("BroadcastNestedLoopJoin"),
      "Int-typed band is outside the operator contract and must not rewrite")
    val orCond = lFrame.join(rFrame,
      abs(col("lt") - col("rt")) <= lit(3L) || col("l_id") === col("r_id"))
    assert(planOf(orCond).contains("BroadcastNestedLoopJoin"),
      "a band under OR is not a pure band join")
    // an explicit crossJoin stays what the caller asked for
    val explicitCross = lFrame.crossJoin(rFrame).filter(abs(col("lt") - col("rt")) <= lit(3L))
    assert(pairs(explicitCross) == brute(3L, strict = false))
  }
}
