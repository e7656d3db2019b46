package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers:
  *   - [[bruteTopK]] — exact cosine top-k: broadcast the (small) query set
  *     against the full vector table; one pass over the vectors. The
  *     correctness baseline.
  *   - [[ivfTopK]] — IVF (inverted-file) search: assign every vector to its
  *     nearest coarse centroid once (broadcast centroids — the vector table
  *     never shuffles), then probe only the `nprobe` nearest cells per
  *     query. At 100 TB the assignment is a map-side pass and the search
  *     joins on cell id, touching ~nprobe/nCells of the data.
  *
  * Every per-query ranking uses the bounded [[TopKByScore]] aggregator —
  * map-side partial top-k, so at most k rows per query per partition reach
  * the shuffle (a window `row_number` would shuffle every scored pair).
  * Ties break to the lower id everywhere, and cosine scores divide the
  * native [[Dedup.dotFold]] dot product by norms precomputed once per row,
  * so every score and every ranking is bit-for-bit reproducible by the
  * DuckDB oracle.
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

  /** Unpack a TopKBuf column into (rank, n_id, cos) rows. */
  private[graft] def explodeTopK(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.select(
      keyCols.map(col) :+
        posexplode(zip_with(col("top.scores"), col("top.ids"), (s, i) =>
          struct(s.as("cos"), i.as("n_id")))): _*)
      .select(
        keyCols.map(col) :+
          (col("pos") + 1).cast("long").as("rank") :+
          col("col.n_id").as("n_id") :+
          col("col.cos").as("cos"): _*)

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
    val topk = (s: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =>
      TopKByScore.applied(k, s, i)
    broadcast(q)
      .crossJoin(v.select(col("id").as("n_id"), col("v").as("n_v"), col("nrm").as("n_nrm")))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cos", cos(col("q_v"), col("q_nrm"), col("n_v"), col("n_nrm")))
      .groupBy("q_id")
      .agg(topk(col("cos"), col("n_id")).as("top"))
      .transform(explodeTopK(_, Seq("q_id")))
      .select("q_id", "n_id", "rank", "cos")
  }

  /** Multi-probe LSH search: every vector hashes to a `bits`-bit SIGN
    * bucket (bit i set iff v[i+1] > 0 — the same deterministic
    * hyperplane family as the Hamming tier), and each query probes its
    * own bucket plus every bucket at Hamming distance 1 (`bits + 1`
    * probes total — the multi-probe trick that buys recall WITHOUT
    * growing the table the way more hash tables would). Candidates come
    * from a bucket EQUI-join (never a corpus scan), are re-ranked under
    * exact cosine, and reduce through the bounded top-k aggregate.
    *
    * Scale: the broadcast probe list is queries×(bits+1) two-long rows
    * (q_id, code) — the query VECTOR is not in it (it would multiply the
    * broadcast by probes×dims); vectors re-attach through a second
    * queries-sized broadcast join on q_id, one copy per query. The
    * corpus side ships one bucket-code long per vector into a hash join
    * keyed on the code, so per-query work is proportional to the
    * occupancy of its probed buckets, not to the corpus.
    */
  def multiprobeTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryPred: Column,
      bits: Int,
      k: Int): DataFrame = {
    require(bits >= 1 && bits <= 62, "bits must be in 1..62")
    val v = vecs(emb, idCol, vecCol)
    val code = (0 until bits)
      .map(i => when(element_at(col("v"), i + 1) > lit(0.0), lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    val coded = v.withColumn("code", code)
    val q = coded
      .filter(queryPred)
      .select(
        col("id").as("q_id"),
        col("v").as("q_v"),
        col("nrm").as("q_nrm"),
        col("code").as("q_code"))
    val flips = array((lit(0L) +: (0 until bits).map(i => lit(1L << i))): _*)
    // The broadcast probe list carries (q_id, code) ONLY — exploding the
    // full query vector into every probe row would copy it bits+1 times
    // and grow the broadcast as queries × probes × dims (r14 ADVICE);
    // the vector rides a SECOND broadcast join on q_id, one copy per
    // query. A neighbor meets a query at most once (its single code
    // equals at most one of the query's bits+1 distinct probe codes), so
    // no dedup pass is needed between the two joins.
    val probes = q.select(col("q_id"), col("q_code"), explode(flips).as("flip"))
      .select(col("q_id"), col("q_code").bitwiseXOR(col("flip")).as("code"))
    val topk = (s: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =>
      TopKByScore.applied(k, s, i)
    broadcast(probes)
      .join(
        coded.select(col("id").as("n_id"), col("v").as("n_v"), col("nrm").as("n_nrm"), col("code")),
        Seq("code"))
      .filter(col("n_id") =!= col("q_id"))
      .join(broadcast(q.select(col("q_id"), col("q_v"), col("q_nrm"))), Seq("q_id"))
      .withColumn("cos", cos(col("q_v"), col("q_nrm"), col("n_v"), col("n_nrm")))
      .groupBy("q_id")
      .agg(topk(col("cos"), col("n_id")).as("top"))
      .transform(explodeTopK(_, Seq("q_id")))
      .select("q_id", "n_id", "rank", "cos")
  }

  /** Nearest-centroid cell per vector: a k=1 bounded aggregate (ties break
    * to the lower centroid id). `first(v)` is safe: every row of a group
    * carries the same vector.
    */
  def assignCells(v: DataFrame, centroids: DataFrame): DataFrame = {
    val top1 = (s: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =>
      TopKByScore.applied(1, s, i)
    v.crossJoin(broadcast(centroids))
      .withColumn("cos", cos(col("v"), col("nrm"), col("c_v"), col("c_nrm")))
      .groupBy("id")
      .agg(
        top1(col("cos"), col("c_id")).as("t"),
        first(col("v")).as("v"),
        first(col("nrm")).as("nrm"))
      .select(col("id"), col("v"), col("nrm"), element_at(col("t.ids"), 1).as("cell"))
  }

  /** IVF search: `centroidPred` picks the coarse centroids (deterministic —
    * e.g. the lowest ids), every vector is assigned to its nearest centroid
    * cell, and each query probes its `nprobe` nearest cells for the true
    * top-k by cosine. Approximate by design: neighbors outside the probed
    * cells are missed; recall grows with nprobe.
    */
  /** Pre-filtered variant: `allowed` (single id column) restricts the
    * CANDIDATE side by left-semi join before scoring — the "filtered
    * vector search" serving shape. Filtering before the top-k (rather
    * than post-filtering an unfiltered top-k) keeps exactly k qualifying
    * results per query; the semi join ships ids only, and the centroid
    * set / cell assignment stay those of the FULL corpus, so the index is
    * built once and shared across arbitrary predicates.
    */
  def ivfTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      centroidPred: Column,
      queryPred: Column,
      nprobe: Int,
      k: Int,
      allowed: Option[DataFrame] = None): DataFrame = {
    val v = vecs(emb, idCol, vecCol)
    val centroids = v
      .filter(centroidPred)
      .select(col("id").as("c_id"), col("v").as("c_v"), col("nrm").as("c_nrm"))
    val assigned = assignCells(v, centroids)
    val topProbe = (s: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =>
      TopKByScore.applied(nprobe, s, i)
    val probes = v
      .filter(queryPred)
      .select(col("id").as("q_id"), col("v").as("q_v"), col("nrm").as("q_nrm"))
      .crossJoin(broadcast(centroids))
      .withColumn("cos", cos(col("q_v"), col("q_nrm"), col("c_v"), col("c_nrm")))
      .groupBy("q_id")
      .agg(
        topProbe(col("cos"), col("c_id")).as("t"),
        first(col("q_v")).as("q_v"),
        first(col("q_nrm")).as("q_nrm"))
      .select(col("q_id"), col("q_v"), col("q_nrm"), explode(col("t.ids")).as("cell"))
    val topk = (s: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =>
      TopKByScore.applied(k, s, i)
    val cands0 =
      assigned.select(col("id").as("n_id"), col("v").as("n_v"), col("nrm").as("n_nrm"), col("cell"))
    val cands = allowed.fold(cands0) { a =>
      cands0.join(a.select(col(a.columns.head).as("n_id")), Seq("n_id"), "left_semi")
    }
    probes
      .join(cands, Seq("cell"))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cos", cos(col("q_v"), col("q_nrm"), col("n_v"), col("n_nrm")))
      .groupBy("q_id")
      .agg(topk(col("cos"), col("n_id")).as("top"))
      .transform(explodeTopK(_, Seq("q_id")))
      .select("q_id", "n_id", "rank", "cos")
  }

  /** Range (radius) search: EVERY neighbor with cosine >= `tau` for each
    * query, excluding self — the retrieval mode where the result set is
    * similarity-bounded instead of count-bounded (duplicate sweeps, recall
    * floors, "everything at least this close" audits).
    *
    * Scale shape: the query batch is the broadcast side, so the corpus is
    * scanned exactly once, map-only — score + threshold filter inside one
    * codegen stage, no shuffle at any corpus size (the final sort is the
    * presentation step). Unlike top-k there is no per-query bound on the
    * OUTPUT; a production variant caps pathological queries by routing
    * through the IVF cell join ([[ivfTopK]]'s machinery) so a query only
    * scores its probed cells.
    */
  def rangeSearch(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryPred: Column,
      tau: Double): DataFrame = {
    val v = vecs(emb, idCol, vecCol)
    val q =
      v.filter(queryPred).select(col("id").as("q_id"), col("v").as("q_v"), col("nrm").as("q_nrm"))
    broadcast(q)
      .crossJoin(v.select(col("id").as("n_id"), col("v").as("n_v"), col("nrm").as("n_nrm")))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cos", cos(col("q_v"), col("q_nrm"), col("n_v"), col("n_nrm")))
      .filter(col("cos") >= tau)
      .select("q_id", "n_id", "cos")
  }
}
