package graft.output

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame

/** Sinks. Ports `/root/reference/src/utils.py:31-54`. */
object Writers {

  /** Snappy parquet, overwrite; `coalesce1` emits a single file (document the
    * parallelism loss — only for small final artifacts).
    */
  def writeParquet(df: DataFrame, dest: String, coalesce1: Boolean = false): Unit = {
    val out = if (coalesce1) df.coalesce(1) else df
    out.write.option("compression", "snappy").mode("overwrite").parquet(dest)
  }

  /** Small-file compaction: rewrite a parquet directory into
    * `ceil(totalBytes / targetFileBytes)` files. The maintenance operator a
    * 100 TB store runs continuously — streaming sinks and fine-grained
    * partitioning accrete small files, and scan throughput dies on per-file
    * open/footer overhead. `coalesce` (not `repartition`): compaction
    * should not pay a shuffle, it only narrows parallelism for the write.
    * Returns the target file count.
    */
  def compactParquet(
      spark: org.apache.spark.sql.SparkSession,
      srcDir: String,
      destDir: String,
      targetFileBytes: Long): Int = {
    // In-place or overlapping compaction would truncate the source before
    // the lazy scan runs (overwrite deletes destDir first) — data loss, so
    // reject it on QUALIFIED paths (scheme/relative aliases resolved) and
    // reject ancestor/descendant overlap both ways.
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = FileSystem.get(new java.net.URI(srcDir), conf)
    val srcQ = fs.makeQualified(new Path(srcDir))
    val dstQ = fs.makeQualified(new Path(destDir))
    def contains(a: Path, b: Path): Boolean = {
      var p: Path = b
      while (p != null) { if (p == a) return true; p = p.getParent }
      false
    }
    require(
      !contains(srcQ, dstQ) && !contains(dstQ, srcQ),
      s"compactParquet: destDir ($dstQ) must not equal or overlap srcDir ($srcQ); write aside, then swap")
    val parts = fs.globStatus(new Path(srcDir, "part-*"))
    require(parts != null && parts.nonEmpty, s"compactParquet: no part files under $srcDir")
    val totalBytes = parts.map(_.getLen).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    spark.read
      .parquet(srcDir)
      .coalesce(nFiles)
      .write
      .option("compression", "snappy")
      .mode("overwrite")
      .parquet(destDir)
    nFiles
  }

  /** Single-file TSV with header, then rename the part file to `fileName` —
    * the Hadoop-FS portable version of the reference's `os.rename`
    * (`utils.py:49-54`).
    */
  def writeCsvRenamed(
      df: DataFrame,
      dest: String,
      fileName: String = "Matched_Entities.csv",
      delimiter: String = "\t"): Unit = {
    df.coalesce(1)
      .write
      .option("header", "true")
      .option("delimiter", delimiter)
      .mode("overwrite")
      .csv(dest)
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val fs = FileSystem.get(new java.net.URI(dest), conf)
    val parts = fs.globStatus(new Path(dest, "part-*.csv"))
    if (parts != null && parts.nonEmpty) {
      fs.rename(parts.head.getPath, new Path(dest, fileName))
    }
  }
}
