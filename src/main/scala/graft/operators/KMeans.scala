package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over an embedding column, built to be
  * bit-reproducible (and therefore oracle-verifiable) across engines:
  *
  *   - init: the vectors with the `k` smallest ids (deterministic, no
  *     sampling RNG — k-means++ would add seed-replay machinery for no
  *     verification gain on synthetic fixtures);
  *   - assign: each round's centroids (k rows, KBs) are collected to the
  *     driver and re-embedded as a LITERAL array column — assignment is
  *     then a pure map-side `array_min` over per-centroid squared-L2
  *     structs, zero shuffle, zero row inflation. This is the classic
  *     1000-executor Lloyd shape (Spark MLlib does the same collect):
  *     only the centroids ever cross the driver, never the vectors.
  *   - update: per-cluster element-wise mean as an ORDERED fold over the
  *     members sorted by id — float sums are order-dependent, and the
  *     fixed order is what makes the result independent of partitioning
  *     (cell-sized groups collect fine; huge cells would move to a
  *     fixed-tree pairwise reduction, as the centroid op documents). One
  *     hash exchange on the cluster label per round — the only shuffle.
  *
  * Distances fold in element order, so both engines produce IDENTICAL
  * doubles (not merely close) and the `(d, cid)` tie-break picks the same
  * cell; empty clusters drop out (standard Lloyd), deterministically.
  */
object KMeans {

  /** Squared L2 between two equal-length double arrays, left-folded in
    * element order (IEEE-reproducible; `0.0 + x == x` exactly, so this
    * matches a fold without initial accumulator too).
    */
  def sqDist(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0),
      (acc, d) => acc + d)

  /** Nearest centroid of a literal `(cid, cv)` array for vector column
    * `v`: one squared-L2 per centroid, then a lexicographic `array_min`
    * on `(d, cid)` — exact ties break to the lower centroid id.
    */
  def nearest(v: Column, centroidsLit: Column): Column =
    array_min(
      transform(
        centroidsLit,
        c =>
          struct(
            sqDist(v, c.getField("cv")).as("d"),
            c.getField("cid").as("cid"))))
      .getField("cid")

  /** Element-wise mean per cluster of `(id, v, cluster)` rows, members
    * folded in id order. Returns `(cid, cv, n)`.
    */
  def recompute(assigned: DataFrame, dims: Int): DataFrame =
    assigned
      .groupBy(col("cluster").as("cid"))
      .agg(
        sort_array(collect_list(struct(col("id"), col("v")))).as("lst"),
        count(lit(1)).as("n"))
      .select(
        col("cid"),
        transform(
          aggregate(
            col("lst"),
            array_repeat(lit(0.0), dims),
            (acc, e) => zip_with(acc, e.getField("v"), (x, y) => x + y)),
          s => s / col("n")).as("cv"),
        col("n"))

  /** Collect `(cid, cv)` rows into a literal array-of-structs column,
    * sorted by cid (so `nearest`'s min sees ascending ids). Public so a
    * serving path (batch or STREAMING ingest) can embed a trained
    * index's centroids as the same map-side literal — the k-bounded
    * collect is the one driver pull this operator family allows.
    */
  def literal(centroids: DataFrame): Column = {
    val rows = centroids
      .select(col("cid").cast("long"), col("cv"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1)
    array(rows.map { case (cid, cv) =>
      struct(
        lit(cid).as("cid"),
        array(cv.map(lit(_)): _*).as("cv"))
    }: _*)
  }

  /** Run `iters` Lloyd rounds; returns the final assignment
    * `(id, v, cluster)`. `vectors` must be `(id, v: array<double>)` and
    * should be persisted by the caller — it is scanned every round.
    */
  def fit(vectors: DataFrame, k: Int, dims: Int, iters: Int): DataFrame = {
    require(k > 0 && iters >= 0, "k must be positive, iters non-negative")
    var centroids = vectors
      .orderBy("id")
      .limit(k)
      .select(col("id").as("cid"), col("v").as("cv"))
    var assigned = vectors.withColumn("cluster", nearest(col("v"), literal(centroids)))
    for (_ <- 1 to iters) {
      centroids = recompute(assigned, dims).select("cid", "cv")
      assigned = vectors.withColumn("cluster", nearest(col("v"), literal(centroids)))
    }
    assigned
  }

  /** The centroid frame the FINAL [[fit]] assignment used (init + `iters`
    * recomputes) — the trained index a serving/ingest path assigns
    * against. Assigning any vector set with `nearest(v, literal(this))`
    * reproduces `fit`'s own final assignment bit-for-bit.
    */
  def fitCentroids(vectors: DataFrame, k: Int, dims: Int, iters: Int): DataFrame = {
    require(k > 0 && iters >= 0, "k must be positive, iters non-negative")
    var centroids = vectors
      .orderBy("id")
      .limit(k)
      .select(col("id").as("cid"), col("v").as("cv"))
    for (_ <- 1 to iters) {
      val assigned = vectors.withColumn("cluster", nearest(col("v"), literal(centroids)))
      centroids = recompute(assigned, dims).select("cid", "cv")
    }
    centroids
  }
}
