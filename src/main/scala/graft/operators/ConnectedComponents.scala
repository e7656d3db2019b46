package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components over a DataFrame edge list.
  *
  * Replaces the reference's driver-side recursive DFS
  * (`/root/reference/src/clustering.py:6-54`), which `collect()`s every
  * matched pair to the driver — a scaling cliff at 100 TB. This
  * implementation is pure DataFrame min-label propagation with per-round
  * path compression (pointer jumping), so it needs O(log d) shuffle rounds
  * on typical entity-resolution graphs (tiny diameters) and never moves the
  * graph off the executors.
  *
  * Each round:
  *   1. every node takes the min component label among itself + neighbors;
  *   2. labels are compressed one hop (`comp <- label(comp)`);
  *   3. lineage is cut with `localCheckpoint` (on a real cluster swap in
  *      reliable `checkpoint` + an HDFS checkpoint dir).
  *
  * Convergence: label sums are strictly decreasing until fixed point, and we
  * stop when no label changed.
  */
object ConnectedComponents {

  /** @param edges any DataFrame with two castable-to-long columns
    * @return (node: long, comp: long) — comp is the min node id of the
    *         component, a deterministic cluster id.
    */
  def run(
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      maxIter: Int = 50): DataFrame =
    runRounds(edges, srcCol, dstCol, maxIter)

  private def runRounds(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int): DataFrame = {

    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)

    // The iterative frames are label tables (a few columns, one row per
    // node) — far smaller than the session default sized for wide scans.
    // Pin a reduced width via explicit repartition on the persisted /
    // checkpointed frames (NOT a session-conf mutation, which would race
    // with concurrent queries on the same session); AQE coalesces the
    // intermediate shuffles between them. On a real cluster size this to
    // node-count / target-partition-bytes.
    val w = math.max(8, e.sparkSession.sessionState.conf.numShufflePartitions / 4)

    // Symmetrize once; this is the only shuffle whose size is O(|E|) per round.
    val sym = e
      .union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .repartition(w, col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = sym
      .select(col("src").as("node"))
      .distinct()
      .withColumn("comp", col("node"))
      .repartition(w, col("node"))
      .localCheckpoint()

    // Labels only ever decrease (least of self + neighbors, then a jump to
    // an even smaller label), so the label sum is strictly decreasing until
    // the fixed point: equal sums across rounds certify convergence without
    // a per-round join against the previous labels. None until round 1 has
    // run — a literal sentinel value could collide with a real label sum
    // (e.g. negative node ids summing to it) and falsely converge.
    var prevSum: Option[BigDecimal] = None
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbrMin = sym
        .join(labels.select(col("node").as("dst"), col("comp")), "dst")
        .groupBy(col("src").as("node"))
        .agg(min("comp").as("nbrComp"))

      val stepped = labels
        .join(nbrMin, Seq("node"), "left")
        .select(
          col("node"),
          least(col("comp"), coalesce(col("nbrComp"), col("comp"))).as("comp"))

      // Pointer jumping: follow the label one extra hop per round.
      val next = stepped
        .join(
          stepped.select(col("node").as("comp"), col("comp").as("jumped")),
          Seq("comp"),
          "left")
        .select(col("node"), coalesce(col("jumped"), col("comp")).as("comp"))
        .repartition(w, col("node"))
        .localCheckpoint()

      // Exact (decimal) sum over the cached labels — one cheap aggregate.
      val sum = BigDecimal(
        next.agg(org.apache.spark.sql.functions.sum(col("comp").cast("decimal(38,0)")))
          .collect()(0)
          .getDecimal(0))
      labels = next
      converged = prevSum.contains(sum)
      prevSum = Some(sum)
      i += 1
    }
    sym.unpersist()
    labels
  }
}
