package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain join's rows") {
    // Skewed: 90% of left rows share key 1.
    val left = (1L to 200L).map(i => (if (i <= 180) 1L else i, i)).toDF("k", "id")
    val right = Seq((1L, "hot"), (190L, "cold"), (999L, "unmatched")).toDF("k", "v")

    val plain = left.join(right, Seq("k")).select("k", "id", "v")
    val salted = SkewJoin
      .saltedInnerJoin(left, right, "k", col("id"), salt = 8)
      .select("k", "id", "v")

    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("salting spreads a hot key across buckets") {
    val left = (1L to 1000L).map(i => (1L, i)).toDF("k", "id")
    val buckets = left
      .withColumn("_salt", pmod(xxhash64(col("id")), lit(8L)))
      .groupBy("_salt")
      .count()
      .collect()
      .map(_.getLong(1))
    assert(buckets.length == 8)
    // no bucket hoards the key: each within 3x of fair share
    assert(buckets.forall(c => c < 3 * 1000 / 8))
  }
}
