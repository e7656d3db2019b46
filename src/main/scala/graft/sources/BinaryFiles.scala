package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** File-based multimodal ingestion: export per-record binary payloads as
  * individual files and scan them back with Spark's built-in `binaryFile`
  * source — the entry point of a real multimodal corpus, where media
  * arrives as files, not as parquet cells.
  *
  * The export runs executor-side through the Hadoop FileSystem API
  * (partition-parallel, one stream per record), so the identical code
  * writes local disk in tests and HDFS/object stores on a cluster; Spark
  * has no row-per-file binary writer, and collecting payloads to the
  * driver would serialize the corpus through one process. The read side
  * is the stock `binaryFile` format: a distributed file scan that prunes
  * the `content` column when only metadata is selected.
  */
object BinaryFiles {

  /** Write one `<first-column><suffix>` file per row. `records` must have
    * an integral id as its first column and a binary payload as its
    * second.
    */
  def export(records: DataFrame, dir: String, suffix: String): Unit = {
    val cols = records.columns
    require(cols.length == 2, s"want (id, payload), got ${cols.mkString(",")}")
    records.foreachPartition { (it: Iterator[Row]) =>
      // Fresh Configuration per partition: Hadoop conf is not serializable,
      // and the default picks up the cluster's site files from the
      // executor classpath.
      val conf = new org.apache.hadoop.conf.Configuration()
      val base = new org.apache.hadoop.fs.Path(dir)
      val fs = base.getFileSystem(conf)
      fs.mkdirs(base)
      it.foreach { r =>
        val p = new org.apache.hadoop.fs.Path(base, s"${r.getLong(0)}$suffix")
        val out = fs.create(p, true)
        try out.write(r.getAs[Array[Byte]](1))
        finally out.close()
      }
    }
  }

  /** Scan a directory of binary files: (path, modificationTime, length,
    * content).
    */
  def ingest(spark: SparkSession, dir: String, glob: String): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(dir)
}
