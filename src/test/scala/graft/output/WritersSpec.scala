package graft.output

import graft.SparkSpec
import org.apache.hadoop.fs.{FileSystem, Path}

class WritersSpec extends SparkSpec {
  import spark.implicits._

  test("compactParquet rewrites many small files into few, preserving rows") {
    val src = "/tmp/graft_writers_spec_small"
    val dst = "/tmp/graft_writers_spec_compacted"
    (1 to 10000).map(i => (i.toLong, s"row-$i")).toDF("id", "payload")
      .repartition(24)
      .write.mode("overwrite").parquet(src)
    val fs = FileSystem.get(new java.net.URI(src), spark.sparkContext.hadoopConfiguration)
    val srcFiles = fs.globStatus(new Path(src, "part-*")).length
    assert(srcFiles == 24)

    Writers.compactParquet(spark, src, dst, targetFileBytes = 1L << 20)

    val dstFiles = fs.globStatus(new Path(dst, "part-*")).length
    assert(dstFiles < srcFiles, s"expected fewer files, got $dstFiles vs $srcFiles")
    val back = spark.read.parquet(dst)
    assert(back.count() == 10000)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).collect()(0).getLong(0)
      == (1 to 10000).map(_.toLong).sum)
  }
}
