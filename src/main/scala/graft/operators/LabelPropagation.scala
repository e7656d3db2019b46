package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Synchronous label propagation (community detection): every node starts
  * as its own label; each iteration every node adopts the most frequent
  * label among its neighbors, ties to the smallest label. Fixed iteration
  * count keeps the result deterministic and oracle-replayable (classic
  * async LPA is order-dependent by design — this is the synchronous
  * variant used when reproducibility matters).
  *
  * Per iteration: one join of the (persisted) edge list against the
  * current label frame on the source key, then a two-level aggregate —
  * (node, label) counts, then an argmax per node via a single
  * `max(struct(count, -label))`, which Spark executes as one hash
  * aggregate with partial combine — no window, no sort. Label frames are
  * (node, long) pairs: at 100 TB of edges the per-iteration shuffle is
  * node-proportional, not edge-proportional, beyond the initial join.
  */
object LabelPropagation {

  /** @param edges DIRECTED edges (src, dst) — pass both directions for an
    *              undirected graph.
    */
  def run(edges: DataFrame, iterations: Int): DataFrame = {
    val e = graft.Caches.track(edges.persist(StorageLevel.MEMORY_AND_DISK))
    val nodes = graft.Caches.track(
      e
        .select(col("src").as("id"))
        .union(e.select(col("dst").as("id")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK))
    var labels = nodes.withColumn("label", col("id"))
    for (_ <- 1 to iterations) {
      val adopted = e
        .join(labels, col("src") === col("id"))
        .groupBy(col("dst"), col("label"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("dst"))
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("dst").as("id"), (-col("m.nl")).as("label"))
      // nodes with no in-edges this round (none once both directions are
      // present) keep their CURRENT label via the left join + coalesce.
      // Lineage.cut per round: the next round's plan references THIS
      // frame twice (the adopted subtree and the left-join base), so an
      // uncut chain doubles the embedded plan per iteration and recomputes
      // the previous round's labels in both branches.
      labels = Lineage.cut(
        labels
          .withColumnRenamed("label", "cur")
          .join(adopted.withColumnRenamed("label", "new_label"), Seq("id"), "left")
          .select(col("id"), coalesce(col("new_label"), col("cur")).as("label")))
    }
    labels
  }
}
