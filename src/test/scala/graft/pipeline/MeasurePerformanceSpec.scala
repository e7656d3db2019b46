package graft.pipeline

import graft.SparkSpec
import graft.output.Writers
import java.nio.file.Files

/** S5: the missing-input branch of the quality CLI. The reference catches
  * AnalysisException, prints a message, and exits 1
  * (`measure_performance.py:35-44`); here `MeasurePerformance.run` returns
  * Left for exactly that case and `main` maps Left to exit 1.
  */
class MeasurePerformanceSpec extends SparkSpec {

  test("missing input path yields Left with the path in the message (exit-1 branch)") {
    val missing = Files.createTempDirectory("graft_mp").toString + "/does_not_exist"
    val res = MeasurePerformance.run(spark, missing, missing)
    assert(res.isLeft)
    assert(res.left.toOption.get.startsWith("[graft] input path missing:"))
    assert(res.left.toOption.get.contains("does_not_exist"))
  }

  test("present inputs yield the Right summary line") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_mp_ok").toString
    val pairs = Seq(("a1", "b1"), ("a2", "b2")).toDF("dblp_id", "acm_id")
    Writers.writeParquet(pairs, s"$dir/full")
    Writers.writeParquet(pairs.limit(1), s"$dir/blocked")
    val res = MeasurePerformance.run(spark, s"$dir/full", s"$dir/blocked")
    assert(res.isRight)
    val line = res.toOption.get
    assert(line.contains("duplicates=2") && line.contains("precision=1.0"))
  }
}
