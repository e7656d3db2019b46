package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

class ZOrderSpec extends SparkSpec {

  test("Column interleave matches the reference bit loop") {
    import spark.implicits._
    val rnd = new Random(59)
    val rows = Seq.fill(300)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong)) ++
      Seq((0L, 0L), (65535L, 65535L), (65535L, 0L), (0L, 65535L))
    val got = rows
      .toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.interleave16(col("x"), col("y")).as("z"))
      .collect()
    got.foreach { r =>
      assert(
        r.getLong(2) == ZOrder.interleave16Ref(r.getLong(0), r.getLong(1)),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("locality: neighbors in both dims interleave to nearby z values") {
    // The defining property Morton codes are used for: a small box in
    // (x, y) space maps into a bounded z range, so range-partitioned
    // files cover spatial neighborhoods.
    val base = ZOrder.interleave16Ref(1000, 1000)
    val box = for (dx <- 0 to 3; dy <- 0 to 3) yield ZOrder.interleave16Ref(1000 + dx, 1000 + dy)
    assert(box.max - box.min < 64, "4x4 box spilled outside its 64-cell z block")
    assert(box.min >= base)
  }

  test("z-ordered write produces disjoint per-file z ranges (file skipping works)") {
    import spark.implicits._
    val rnd = new Random(71)
    val df = Seq
      .fill(20000)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
      .toDF("x", "y")
      .withColumn("z", ZOrder.interleave16(col("x"), col("y")))
    val dest = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    df.repartitionByRange(8, col("z"))
      .sortWithinPartitions("z")
      .write
      .mode("overwrite")
      .parquet(dest)
    val ranges = spark.read
      .parquet(dest)
      .groupBy(input_file_name().as("f"))
      .agg(min("z").as("lo"), max("z").as("hi"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(ranges.length > 1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, "adjacent files overlap in z — range layout broken")
      case _ => ()
    }
  }
}
