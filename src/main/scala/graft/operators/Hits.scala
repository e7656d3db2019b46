package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Fixed-iteration HITS (hubs & authorities) over a directed edge
  * DataFrame (`src`, `dst`) — the second classic link-analysis signal
  * next to [[PageRank]]: on a bipartite source→item graph the hub score
  * ranks sources by how much authoritative content they point at, and
  * the authority score ranks items by how well-regarded their sources
  * are (a crawl-frontier / source-reputation primitive for a web-scale
  * curation pipeline).
  *
  * Arithmetic is EXACT BIGINT throughout (the [[graft.queries.AnnQueries]]
  * emb_pca doctrine): h₀ = 1 and every half-step is an integer sum over
  * in-/out-edges, so scores are order-independent — bit-identical across
  * partitionings and engines, with no float-summation tolerance anywhere.
  * The classic per-round normalization only rescales (HITS rankings are
  * scale-invariant), so it is deferred to presentation: one correctly-
  * rounded IEEE division by the exact integer L1 total. Unnormalized
  * growth per round is bounded by max_in_deg × max_out_deg; two rounds
  * stay under 2⁵³ for degrees up to ~10⁶ a side, and callers running
  * deeper iterate on the normalized-double variant instead.
  *
  * Each iteration is two shuffles, both on node keys, against the one
  * persisted static edge frame — per-round payload is a (node, long)
  * pair per node, the same 100 TB shape as [[PageRank]].
  */
object Hits {

  /** @return one row per node: (id, hub_raw, auth_raw, hub_frac,
    *         auth_frac). A node appearing only as a source has authority
    *         0, and vice versa.
    */
  def run(
      edges: DataFrame,
      iterations: Int,
      preLaidSrc: Option[DataFrame] = None): DataFrame = {
    // HITS alternates join keys (auth half-step probes src, hub half-step
    // probes dst), so ONE layout can't serve both — persist the edge
    // frame TWICE, once per key (the round-10 edge-layout discipline;
    // 2×|E| cache for exchange-free edge sides on every half-step —
    // exactly the two sort orders a production store would bucket).
    // `preLaidSrc` supplies the src half from a session-shared layout
    // (same rows as `edges`, hash(src), caller-persisted, not re-tracked
    // here); the dst half has no second consumer and stays per-run.
    val eSrc = preLaidSrc.getOrElse(
      graft.Caches.track(
        edges.select(col("src"), col("dst"))
          .repartition(col("src")).persist(StorageLevel.MEMORY_AND_DISK)))
    val eDst = graft.Caches.track(
      edges.select(col("src"), col("dst"))
        .repartition(col("dst")).persist(StorageLevel.MEMORY_AND_DISK))
    var hubs = eSrc.select(col("src").as("id")).distinct().withColumn("h", lit(1L))
    var auths = eDst.select(col("dst").as("id")).distinct().withColumn("a", lit(0L))
    for (i <- 1 to iterations) {
      auths = Lineage.round(
        eSrc.join(hubs, col("src") === col("id"))
          .groupBy(col("dst"))
          .agg(sum(col("h")).as("a"))
          .select(col("dst").as("id"), col("a")), i)
      hubs = Lineage.round(
        eDst.join(auths, col("dst") === col("id"))
          .groupBy(col("src"))
          .agg(sum(col("a")).as("h"))
          .select(col("src").as("id"), col("h")), i)
    }
    // Materialize the final round before assembly: the two broadcast
    // total aggregates below launch as concurrent broadcast jobs, and two
    // concurrent scans of a not-yet-populated cache each recompute the
    // whole round chain. Two cheap jobs here beat that double compute
    // (and still replace the four eager per-round checkpoint jobs the
    // loop used to pay).
    hubs.count()
    auths.count()
    hubs
      .join(auths.withColumnRenamed("id", "aid"), col("id") === col("aid"), "full_outer")
      .select(
        coalesce(col("id"), col("aid")).as("id"),
        coalesce(col("h"), lit(0L)).as("hub_raw"),
        coalesce(col("a"), lit(0L)).as("auth_raw"))
      .crossJoin(broadcast(hubs.agg(sum(col("h")).as("h_tot"))))
      .crossJoin(broadcast(auths.agg(sum(col("a")).as("a_tot"))))
      .select(
        col("id"),
        col("hub_raw"),
        col("auth_raw"),
        (col("hub_raw") / col("h_tot")).as("hub_frac"),
        (col("auth_raw") / col("a_tot")).as("auth_frac"))
  }
}
