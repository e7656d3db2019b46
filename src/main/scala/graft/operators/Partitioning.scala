package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Deduplicate, Join, RepartitionOperation, Sort, Window}

/** Scan-parallelism guard for compute-heavy map stages.
  *
  * A single parquet file with one row group is unsplittable, so a scan of
  * it arrives as ONE partition — and every downstream narrow
  * transformation (hashing, tokenization, shingling) runs on one core no
  * matter how many the cluster has. At real scale inputs span many files
  * and this never triggers; on a small or freshly-ingested dataset it is
  * the difference between 1x and Nx cores.
  *
  * `ensureWidth` only probes (and possibly repartitions) plans that are
  * shuffle-free narrow chains over their sources — there `df.rdd` is pure
  * planning (no query stages to materialize, no job). When the plan
  * already contains a shuffle-introducing operator the probe is skipped
  * outright: the shuffle re-partitions to the session width anyway, and
  * under AQE building the RDD of a shuffling plan would materialize its
  * upstream query stages (real jobs) at composition time.
  */
object Partitioning {

  private def shufflesAlready(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists {
      case _: Join | _: Aggregate | _: Sort | _: Window => true
      case _: RepartitionOperation | _: Deduplicate => true
      case _ => false
    }

  def ensureWidth(df: DataFrame, minPartitions: Int): DataFrame =
    if (shufflesAlready(df)) df
    else if (df.rdd.getNumPartitions >= minPartitions) df
    else df.repartition(minPartitions)

  /** Default target: the session's shuffle width. */
  def ensureWidth(df: DataFrame): DataFrame =
    ensureWidth(df, df.sparkSession.sessionState.conf.numShufflePartitions)
}
