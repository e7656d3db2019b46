package graft.expressions

import graft.SparkSpec
import graft.functions.Hashing
import org.apache.spark.sql.functions._

import scala.util.Random

class Md5Long60Spec extends SparkSpec {
  import spark.implicits._

  test("native digest-to-long equals the hex-parse form on random strings") {
    val rnd = new Random(23)
    val strs = Seq.fill(300)(rnd.alphanumeric.take(1 + rnd.nextInt(40)).mkString) ++
      Seq("", " ", "héllo wörld", "é́ combining")
    val out = strs.toDF("s")
      .select(Hashing.md5Long60(col("s")).as("native"), Hashing.md5Long60Hof(col("s")).as("hof"))
      .collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("null input yields null; values stay within 60 bits") {
    val r = Seq(Option.empty[String], Some("x")).toDF("s")
      .select(Hashing.md5Long60(col("s")).as("h"))
      .collect()
    assert(r(0).isNullAt(0))
    assert(r(1).getLong(0) >= 0L && r(1).getLong(0) < (1L << 60))
  }
}
