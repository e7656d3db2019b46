package graft.expressions

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

import scala.util.Random

class ShingleHashesSpec extends SparkSpec {
  import spark.implicits._

  test("native window hashing equals the composable fold, incl. short docs") {
    val rnd = new Random(31)
    val words = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg")
    val texts = Seq("", "one", "one two", "a b c") ++
      Seq.fill(100)(Seq.fill(1 + rnd.nextInt(30))(words(rnd.nextInt(words.size))).mkString(" "))
    val df = texts.toDF("text")
    val out = df
      .select(
        Dedup.hashedShingleSet(col("text"), 3).as("native"),
        Dedup.hashedShingleSetHof(col("text"), 3).as("hof"))
      .collect()
    out.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }
}
