package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  * Cosine scores use [[Dedup.dotFold]]'s ordered double fold so the DuckDB
  * oracle reproduces every score (and therefore every ranking) exactly.
  */
object Ann {

  private def byScore(part: String*): Window.type => Nothing = ???

  /** (id, v) projection with the vector cast to array<double>. */
  private def vecs(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))

  def bruteTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryPred: Column,
      k: Int): DataFrame = {
    val v = vecs(emb, idCol, vecCol)
    val q = v.filter(queryPred).select(col("id").as("q_id"), col("v").as("q_v"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    broadcast(q)
      .crossJoin(v.select(col("id").as("n_id"), col("v").as("n_v")))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cos", Dedup.cosine(col("q_v"), col("n_v")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "rank", "cos")
  }

  /** Nearest-centroid cell per vector: ties break to the lower centroid id. */
  def assignCells(v: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy("id").orderBy(col("cos").desc, col("c_id"))
    v.crossJoin(broadcast(centroids))
      .withColumn("cos", Dedup.cosine(col("v"), col("c_v")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("id"), col("v"), col("c_id").as("cell"))
  }

  def ivfTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      centroidPred: Column,
      queryPred: Column,
      nprobe: Int,
      k: Int): DataFrame = {
    val v = vecs(emb, idCol, vecCol)
    val centroids = v.filter(centroidPred).select(col("id").as("c_id"), col("v").as("c_v"))
    val assigned = assignCells(v, centroids)
    val probeW = Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))
    val probes = v
      .filter(queryPred)
      .select(col("id").as("q_id"), col("v").as("q_v"))
      .crossJoin(broadcast(centroids))
      .withColumn("cos", Dedup.cosine(col("q_v"), col("c_v")))
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nprobe)
      .select(col("q_id"), col("q_v"), col("c_id").as("cell"))
    val rankW = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    probes
      .join(assigned.select(col("id").as("n_id"), col("v").as("n_v"), col("cell")), Seq("cell"))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cos", Dedup.cosine(col("q_v"), col("n_v")))
      .withColumn("rank", row_number().over(rankW).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "rank", "cos")
  }
}
