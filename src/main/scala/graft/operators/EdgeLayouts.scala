package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared edge-layout PLANS (no persist — the caller owns the cache
  * policy, exactly like [[Triangles.orientPlan]]): the round-10/11
  * edge-layout discipline showed each iterative operator wants its
  * static edge frame partitioned once on its round-join key, and several
  * operators over the SAME session-shared graph want the SAME layout —
  * building it per query re-pays the exchange+persist per run. These
  * helpers keep the construction single-sourced so a memoized shared
  * frame and an operator's internal fallback can never drift.
  */
object EdgeLayouts {

  /** `(src, dst, od)` — every edge annotated with its source's
    * out-degree: the per-round probe frame of [[PageRank.run]] AND
    * [[ScaledWalks.personalizedPageRank]] (one definition, two
    * consumers). Lay out with `.repartition(col("src"))` + persist at
    * the call site.
    */
  def degAnnotated(edges: DataFrame): DataFrame =
    edges.join(edges.groupBy("src").agg(count(lit(1)).as("od")), "src")
}
