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
