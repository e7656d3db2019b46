package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

class GraftFunctionsSpec extends SparkSpec {

  test("native expressions are callable from SQL") {
    val r = spark
      .sql("""SELECT
        graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        graft_md5long60('abc') AS h,
        graft_shingle_hashes(array(1L, 2L, 3L, 4L), 3) AS sh,
        graft_simhash32(array(1L, 1L, 2L)) AS sim""")
      .collect()(0)
    assert(r.getDouble(0) == 11.0)
    // = parsing the first 15 hex chars of md5('abc')
    assert(r.getLong(1) == java.lang.Long.parseLong("900150983cd24fb", 16))
    assert(r.getSeq[Long](2).length == 2) // two 3-windows of a 4-array
    assert(r.getLong(3) == 1L) // bit 0 set in 2 of 3 hashes (strict majority)
  }

  test("native SimHash32 equals the HOF column form on random feature sets") {
    import spark.implicits._
    val rnd = new Random(97)
    val rows = Seq.fill(60)(Seq.fill(1 + rnd.nextInt(40))(rnd.alphanumeric.take(6).mkString))
    val df = rows.zipWithIndex.map { case (fs, i) => (i.toLong, fs) }.toDF("id", "features")
    val both = df
      .select(
        col("id"),
        graft.operators.Dedup.simhash32(col("features")).as("hof"),
        graft.operators.Dedup
          .simhash32Native(transform(col("features"), t => graft.functions.Hashing.md5Long60(t)))
          .as("native"))
      .collect()
    both.foreach(r => assert(r.getLong(1) == r.getLong(2), s"mismatch at id=${r.getLong(0)}"))
  }
}
