package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers:
  *   - [[bruteTopK]] — exact cosine top-k: broadcast the (small) query set
  *     against the full vector table; one pass over the vectors, a window
  *     top-k per query. The correctness baseline.
  *   - [[ivfTopK]] — IVF (inverted-file) search: assign every vector to its
  *     nearest coarse centroid once (broadcast centroids — the vector table
  *     never shuffles), then probe only the `nprobe` nearest cells per
  *     query. At 100 TB the assignment is a map-side pass and the search
  *     joins on cell id, touching ~nprobe/nCells of the data.
  *
  * Cosine scores divide the native [[Dedup.dotFold]] dot product by norms
  * precomputed once per row (`sqrt(dot(v,v))` — the identical expression a
  * per-pair computation would use, so every score, and therefore every
  * ranking, is bit-for-bit reproducible by the DuckDB oracle).
  */
object Ann {

  /** (id, v, nrm) projection: vector cast to array<double>, norm computed
    * once. Persisted — both the query side and the data side scan it.
    */
  private def vecs(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(Dedup.dotFold(col("v"), col("v"))))
      .persist(StorageLevel.MEMORY_AND_DISK)

  private def cos(qv: Column, qn: Column, nv: Column, nn: Column): Column =
    Dedup.dotFold(qv, nv) / (qn * nn)

  /** Exact top-k neighbors (cosine) for every vector matching `queryPred`;
    * ties break to the lower neighbor id. Excludes self-matches.
    */
  def bruteTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryPred: Column,
      k: Int): DataFrame = {
    val v = vecs(emb, idCol, vecCol)
    val q = v.filter(queryPred).select(col("id").as("q_id"), col("v").as("q_v"), col("nrm").as("q_nrm"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    broadcast(q)
      .crossJoin(v.select(col("id").as("n_id"), col("v").as("n_v"), col("nrm").as("n_nrm")))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cos", cos(col("q_v"), col("q_nrm"), col("n_v"), col("n_nrm")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "rank", "cos")
  }

  /** Nearest-centroid cell per vector: ties break to the lower centroid id. */
  def assignCells(v: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy("id").orderBy(col("cos").desc, col("c_id"))
    v.crossJoin(broadcast(centroids))
      .withColumn("cos", cos(col("v"), col("nrm"), col("c_v"), col("c_nrm")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("id"), col("v"), col("nrm"), col("c_id").as("cell"))
  }

  /** IVF search: `centroidPred` picks the coarse centroids (deterministic —
    * e.g. the lowest ids), every vector is assigned to its nearest centroid
    * cell, and each query probes its `nprobe` nearest cells for the true
    * top-k by cosine. Approximate by design: neighbors outside the probed
    * cells are missed; recall grows with nprobe.
    */
  def ivfTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      centroidPred: Column,
      queryPred: Column,
      nprobe: Int,
      k: Int): DataFrame = {
    val v = vecs(emb, idCol, vecCol)
    val centroids = v
      .filter(centroidPred)
      .select(col("id").as("c_id"), col("v").as("c_v"), col("nrm").as("c_nrm"))
    val assigned = assignCells(v, centroids)
    val probeW = Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))
    val probes = v
      .filter(queryPred)
      .select(col("id").as("q_id"), col("v").as("q_v"), col("nrm").as("q_nrm"))
      .crossJoin(broadcast(centroids))
      .withColumn("cos", cos(col("q_v"), col("q_nrm"), col("c_v"), col("c_nrm")))
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nprobe)
      .select(col("q_id"), col("q_v"), col("q_nrm"), col("c_id").as("cell"))
    val rankW = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    probes
      .join(
        assigned.select(col("id").as("n_id"), col("v").as("n_v"), col("nrm").as("n_nrm"), col("cell")),
        Seq("cell"))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cos", cos(col("q_v"), col("q_nrm"), col("n_v"), col("n_nrm")))
      .withColumn("rank", row_number().over(rankW).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "rank", "cos")
  }
}
