package graft.operators

import org.apache.spark.sql.DataFrame

/** Scan-parallelism guard for compute-heavy map stages.
  *
  * A single parquet file with one row group is unsplittable, so a scan of
  * it arrives as ONE partition — and every downstream narrow
  * transformation (hashing, tokenization, shingling) runs on one core no
  * matter how many the cluster has. At real scale inputs span many files
  * and this never triggers; on a small or freshly-ingested dataset it is
  * the difference between 1x and Nx cores.
  *
  * `ensureWidth` measures (planning-time only — no job) and repartitions
  * ONLY when the scan is starved: the shuffle it introduces costs far less
  * than the serialized compute it unblocks, and when parallelism is
  * already adequate it is a no-op. The same measure-then-choose shape as
  * broadcast-join selection and [[ConnectedComponents]]' algorithm pick.
  */
object Partitioning {

  def ensureWidth(df: DataFrame, minPartitions: Int): DataFrame =
    if (df.rdd.getNumPartitions >= minPartitions) df
    else df.repartition(minPartitions)

  /** Default target: the session's shuffle width. */
  def ensureWidth(df: DataFrame): DataFrame =
    ensureWidth(df, df.sparkSession.sessionState.conf.numShufflePartitions)
}
