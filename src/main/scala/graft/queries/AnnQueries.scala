package graft.queries

import graft.operators.Ann
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity-search queries over the `embeddings` table, each with a DuckDB
  * oracle that replays the exact double arithmetic (ordered-fold dot
  * products, precomputed norms) — so not just the id sets but every score
  * and rank hash-matches.
  *
  * Determinism: queries are `vec_id % 50 == 0`, IVF centroids are the 16
  * lowest ids, and all rankings tie-break on the neighbor/centroid id.
  */
object AnnQueries {

  private[graft] val K = 5
  private val NProbe = 2
  private val NCentroids = 16
  private[graft] val QueryMod = 50

  /** Materialize the session-shared persisted ANN frames untimed (the
    * bench warm policy for every memoized multi-consumer frame): the
    * brute-force shortlist feeds ann_brute, ann_recall, and ds_nearleak,
    * and the PQ codes→LUT→shortlist chain feeds BOTH ann_pq and
    * ann_rerank — before this landed, `ann_rerank` (the alphabetically
    * early consumer in the bench's sorted order) was billed the whole PQ
    * build (13.5 s in the r7 driver artifact vs its ~3 s marginal).
    */
  def warm(spark: SparkSession, dir: String): Unit = {
    annBrute(spark, dir).count()
    annPq(spark, dir).count()
    // The binary-code shortlist joined the shared set when ann_hamrecall
    // became its second consumer.
    annHamming(spark, dir).count()
    ()
  }

  // Both top-k result frames are persisted (K rows per query point — tiny)
  // AND memoized by OBJECT through SessionMemo: CacheManager canonical
  // matching cannot dedupe them across calls, because `ScalaAggregator`
  // (the TopKByScore udaf expression) re-resolves its encoders per
  // analysis and the resolved encoder objects never compare equal — an
  // identically-printing rebuilt plan misses the cache and silently
  // re-runs the whole scoring join (measured: ann_pq run 2 at 3–4 s
  // against a "cached" 400-row frame). Same-object reuse sidesteps plan
  // matching entirely — the r7 lpLabels/copurchase policy.
  def annBrute(spark: SparkSession, dir: String): DataFrame =
    SessionMemo.getOrElseUpdate("ann_brute_topk", spark, dir) {
      Ann
        .bruteTopK(
          Tables.t(spark, dir, "embeddings"),
          "vec_id",
          "embedding",
          col("id") % QueryMod === 0,
          K)
        .orderBy("q_id", "rank")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  def annIvf(spark: SparkSession, dir: String): DataFrame =
    SessionMemo.getOrElseUpdate("ann_ivf_topk", spark, dir) {
      Ann
        .ivfTopK(
          Tables.t(spark, dir, "embeddings"),
          "vec_id",
          "embedding",
          col("id") < NCentroids,
          col("id") % QueryMod === 0,
          NProbe,
          K)
        .orderBy("q_id", "rank")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  /** Per-group embedding centroids (element-wise mean), computed as an
    * ORDERED fold over the group's vectors sorted by id — floating-point
    * sums are order-dependent, so the deterministic order is what makes a
    * distributed centroid reproducible (and oracle-replayable). At scale
    * the collect_list per group is fine for cell-sized groups (IVF
    * centroids update); genuinely huge groups would switch to a fixed-tree
    * pairwise reduction.
    *
    * Output is exploded to one (g, n, dim, val) row per centroid element —
    * scalar columns the verification driver can sort and hash, instead of
    * an array cell it cannot.
    */
  def embCentroid(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables
      .t(spark, dir, "embeddings")
      .select(
        (col("vec_id") % 10).as("g"),
        col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("v"))
    v.groupBy("g")
      .agg(
        sort_array(collect_list(struct(col("id"), col("v")))).as("lst"),
        count(lit(1)).as("n"))
      .select(
        col("g"),
        col("n"),
        posexplode(
          transform(
            aggregate(
              col("lst"),
              array_repeat(lit(0.0), 64),
              (acc, e) => zip_with(acc, e.getField("v"), (x, y) => x + y)),
            s => s / col("n"))).as(Seq("dim", "val")))
      .orderBy("g", "dim")
  }

  val embCentroidSql: String =
    """WITH v AS (SELECT vec_id % 10 AS g, vec_id AS id, embedding::DOUBLE[] AS vv FROM embeddings),
      s AS (SELECT g, count(*) AS n, list(vv ORDER BY id) AS lst FROM v GROUP BY g),
      c AS (SELECT g, n,
        list_transform(
          list_reduce(lst, (a, b) -> list_transform(range(1, len(a) + 1), i -> a[i] + b[i])),
          x -> x / n) AS centroid
      FROM s)
      SELECT g, n, d.dim::INT AS dim, centroid[d.dim + 1] AS val
      FROM c CROSS JOIN range(0, 64) d(dim) ORDER BY g, dim"""

  /** Embedding-table health audit — the pre-flight check an embedding
    * pipeline runs before indexing/training: failed encoder calls land as
    * ZERO vectors, half-trained or truncation-damaged rows as COLLAPSED
    * norms, and either poisons cosine math downstream (a zero denominator
    * or a vector that dominates nothing). The synthetic table is
    * unit-norm, so the two damage classes are PLANTED deterministically
    * (`vec_id % 97` → zeroed, `vec_id % 41` → scaled by 1e-4; the zero
    * arm wins when both hit, in both engines' CASE order). Per label:
    * row count, zero count, collapsed count (0 < ‖v‖ < 0.01), exact
    * min/max norm, and the mean norm as an ordered fold over the
    * label's norms sorted by id (the [[embCentroid]] determinism device —
    * per-label lists are cell-sized; genuinely huge labels would switch
    * to a fixed-tree reduction). Map-only scoring + one map-side-combined
    * aggregate per label.
    */
  def embAudit(spark: SparkSession, dir: String): DataFrame = {
    val planted = Tables
      .t(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v0"))
      .withColumn(
        "v",
        when(col("vec_id") % 97 === 0, transform(col("v0"), _ => lit(0.0)))
          .when(col("vec_id") % 41 === 0, transform(col("v0"), x => x * 0.0001))
          .otherwise(col("v0")))
    planted
      .select(
        col("vec_id"),
        col("label"),
        sqrt(aggregate(transform(col("v"), x => x * x), lit(0.0), (a, e) => a + e)).as("nrm"))
      .groupBy("label")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("nrm") === 0.0, 1L).otherwise(0L)).as("n_zero"),
        sum(when(col("nrm") > 0.0 && col("nrm") < 0.01, 1L).otherwise(0L)).as("n_collapsed"),
        min(col("nrm")).as("min_norm"),
        max(col("nrm")).as("max_norm"),
        sort_array(collect_list(struct(col("vec_id"), col("nrm")))).as("lst"))
      .select(
        col("label"),
        col("n"),
        col("n_zero"),
        col("n_collapsed"),
        col("min_norm"),
        col("max_norm"),
        (aggregate(col("lst"), lit(0.0), (a, e) => a + e.getField("nrm")) / col("n"))
          .as("mean_norm"))
      .orderBy("label")
  }

  val embAuditSql: String =
    """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v0 FROM embeddings),
      p AS (SELECT vec_id, label,
          CASE WHEN vec_id % 97 = 0 THEN list_transform(v0, x -> 0.0)
               WHEN vec_id % 41 = 0 THEN list_transform(v0, x -> x * 0.0001)
               ELSE v0 END AS v
        FROM e),
      n AS (SELECT vec_id, label,
          sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, 65), i -> v[i] * v[i])), (x, y) -> x + y)) AS nrm
        FROM p),
      s AS (SELECT label, count(*) AS n,
          sum(CASE WHEN nrm = 0.0 THEN 1 ELSE 0 END)::BIGINT AS n_zero,
          sum(CASE WHEN nrm > 0.0 AND nrm < 0.01 THEN 1 ELSE 0 END)::BIGINT AS n_collapsed,
          min(nrm) AS min_norm, max(nrm) AS max_norm,
          list(nrm ORDER BY vec_id) AS lst
        FROM n GROUP BY label)
      SELECT label, n, n_zero, n_collapsed, min_norm, max_norm,
        list_reduce(list_prepend(0.0, lst), (x, y) -> x + y) / n AS mean_norm
      FROM s ORDER BY label"""

  /** Per-vector symmetric int8 quantization — the storage/serving format an
    * embedding pipeline materializes (4x smaller than float32, 8x smaller
    * than the double arrays here). scale = max|v| / 127, q_i =
    * round(v_i / scale) clamped to [-127, 127]; the query reports each
    * vector's scale, quantized-value checksum, and exact reconstruction
    * error (ordered-fold sum of squared residuals) — all IEEE-replayable,
    * no approximation in the VERIFICATION even though the operator itself
    * is lossy.
    */
  def embQuant(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables
      .t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn(
        "scale",
        aggregate(col("v"), lit(0.0), (m, x) => greatest(m, abs(x))) / 127.0)
      .withColumn(
        "q",
        transform(col("v"), x => least(greatest(round(x / col("scale")), lit(-127.0)), lit(127.0))))
    v.select(
      col("vec_id"),
      col("scale"),
      aggregate(col("q"), lit(0.0), (acc, x) => acc + x).as("q_sum"),
      aggregate(
        zip_with(col("v"), col("q"), (x, qi) => (x - qi * col("scale")) * (x - qi * col("scale"))),
        lit(0.0),
        (acc, e) => acc + e).as("sq_err"))
      .orderBy("vec_id")
  }

  val embQuantSql: String =
    """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      s AS (SELECT vec_id, v,
              list_reduce(list_prepend(0.0, list_transform(v, x -> abs(x))), (m, x) -> greatest(m, x)) / 127.0 AS scale
            FROM v),
      q AS (SELECT vec_id, v, scale,
              list_transform(v, x -> least(greatest(round(x / scale), -127.0), 127.0)) AS q
            FROM s)
      SELECT vec_id, scale,
        list_reduce(list_prepend(0.0, q), (a, x) -> a + x) AS q_sum,
        list_reduce(list_prepend(0.0,
          list_transform(range(1, len(v) + 1), i -> (v[i] - q[i] * scale) * (v[i] - q[i] * scale))),
          (a, e) -> a + e) AS sq_err
      FROM q ORDER BY vec_id"""

  // ---- DuckDB oracle ------------------------------------------------------

  /** Ordered-fold dot product — the IEEE twin of the Spark side's
    * DotProduct expression / HOF fold.
    */
  private def dot(x: String, y: String): String =
    s"list_reduce(list_transform(range(1, len($x) + 1), i -> $x[i] * $y[i]), (p, q) -> p + q)"

  /** `n(id, v, nrm)` — vectors with precomputed norms. */
  private val vecCte =
    s"n AS (SELECT vec_id AS id, v, sqrt(${dot("v", "v")}) AS nrm FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings))"

  private def cosExpr(qv: String, qn: String, nv: String, nn: String): String =
    s"${dot(qv, nv)} / ($qn * $nn)"

  val annBruteSql: String = {
    val c = cosExpr("q.v", "q.nrm", "x.v", "x.nrm")
    s"""WITH $vecCte,
      q AS (SELECT id, v, nrm FROM n WHERE id % $QueryMod = 0)
      SELECT q_id, n_id, rank, cos FROM (
        SELECT q.id AS q_id, x.id AS n_id, $c AS cos,
          row_number() OVER (PARTITION BY q.id ORDER BY $c DESC, x.id) AS rank
        FROM q CROSS JOIN n x WHERE x.id <> q.id)
      WHERE rank <= $K ORDER BY q_id, rank"""
  }

  // ---- multi-probe LSH search ------------------------------------------------

  private[graft] val MultiprobeBits = 6

  /** Multi-probe LSH ([[Ann.multiprobeTopK]]): sign-bucket the corpus on
    * [[MultiprobeBits]] hyperplane bits, probe each query's bucket plus
    * all Hamming-1 perturbations, re-rank candidates under exact cosine.
    * The serving-tier alternative to `ann_ivf` when the index must be a
    * hash table instead of a centroid scan — candidate generation is a
    * bucket equi-join, so per-query cost tracks bucket occupancy
    * (corpus/2^bits × probes), not corpus size.
    */
  def annMultiprobe(spark: SparkSession, dir: String): DataFrame =
    Ann
      .multiprobeTopK(
        Tables.t(spark, dir, "embeddings"),
        "vec_id",
        "embedding",
        col("id") % QueryMod === 0,
        MultiprobeBits,
        K)
      .orderBy("q_id", "rank")

  val annMultiprobeSql: String = {
    val codeBits = (1 to MultiprobeBits)
      .map(i => s"CASE WHEN v[$i] > 0 THEN ${1L << (i - 1)}::BIGINT ELSE 0::BIGINT END")
      .mkString(" + ")
    val flips = (0L +: (0 until MultiprobeBits).map(i => 1L << i)).mkString(", ")
    val c = cosExpr("p.q_v", "p.q_nrm", "x.v", "x.nrm")
    s"""WITH $vecCte,
      c AS (SELECT id, v, nrm, ($codeBits) AS code FROM n),
      q AS (SELECT id, v, nrm, code FROM c WHERE id % $QueryMod = 0),
      p AS (SELECT q.id AS q_id, q.v AS q_v, q.nrm AS q_nrm,
          xor(q.code, f.flip) AS code
        FROM q, (SELECT unnest([$flips]::BIGINT[]) AS flip) f),
      cand AS (SELECT p.q_id, x.id AS n_id, $c AS cos
        FROM p JOIN c x USING (code) WHERE x.id <> p.q_id)
      SELECT q_id, n_id, rank, cos FROM (
        SELECT q_id, n_id, cos,
          row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
        FROM cand)
      WHERE rank <= $K ORDER BY q_id, rank"""
  }

  // ---- binary sign codes + Hamming search -----------------------------------

  /** Binary-hash similarity search: every 64-dim embedding collapses to a
    * 64-bit SIGN CODE (bit i set iff v[i] > 0 — the simplest LSH family
    * for cosine, one bit per random-projection sign; here the dims
    * themselves act as the projections), packed as two BIGINT halves so
    * no shift touches the sign bit on either engine, and search is exact
    * top-[[K]] by HAMMING distance — `bit_count(xor(lo)) +
    * bit_count(xor(hi))`, two codegen'd popcounts per candidate, ties to
    * the lower id. This is the production memory tier below
    * `ann_sq`'s int8 and `ann_pq`'s codebooks: 16x smaller than float32,
    * distance is pure integer ALU (SIMD-friendly), and the Hamming
    * shortlist re-ranks under the exact metric downstream (the
    * `ann_rerank` pattern). Everything integer — the code build, the
    * distances, the ranking — so the result is hash-exact with no float
    * tolerance anywhere.
    *
    * Scale shape: the codes frame is the smallest possible scan (two
    * longs per vector); queries broadcast; the bounded
    * [[graft.operators.TopKByScore]] aggregator keeps map-side partials
    * at K rows per query, so the shuffle is K-bounded per query
    * regardless of corpus size.
    */
  def annHamming(spark: SparkSession, dir: String): DataFrame =
    // Memoized + persisted (the annBrute policy — two consumers now:
    // ann_hamming itself and ann_hamrecall; the udaf-topped plan makes
    // CacheManager matching impossible, so reuse MUST be object-identity).
    SessionMemo.getOrElseUpdate("ann_hamming_topk", spark, dir) {
      annHammingBuild(spark, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  private def annHammingBuild(spark: SparkSession, dir: String): DataFrame = {
    val powers = array((0 until 32).map(i => lit(1L << i)): _*)
    def code(v: Column, from: Int): Column =
      aggregate(
        zip_with(slice(v, from, 32), powers, (x, p) =>
          when(x > lit(0.0), p).otherwise(lit(0L))),
        lit(0L),
        (acc, e) => acc + e)
    val c = Tables
      .t(spark, dir, "embeddings")
      .select(
        col("vec_id").as("id"),
        code(col("embedding"), 1).as("lo"),
        code(col("embedding"), 33).as("hi"))
    val q = c
      .filter(col("id") % QueryMod === 0)
      .select(col("id").as("q_id"), col("lo").as("q_lo"), col("hi").as("q_hi"))
    val topk = (s: Column, i: Column) => graft.operators.TopKByScore.applied(K, s, i)
    broadcast(q)
      .crossJoin(c.select(col("id").as("n_id"), col("lo"), col("hi")))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn(
        "ham",
        expr("bit_count(q_lo ^ lo) + bit_count(q_hi ^ hi)").cast("long"))
      .groupBy("q_id")
      // TopKByScore keeps the HIGHEST scores (ties to the lower id), so
      // the negated distance makes it a nearest-by-Hamming buffer; the
      // negation is exact (ham <= 64 fits a double losslessly).
      .agg(topk(-col("ham").cast("double"), col("n_id")).as("top"))
      .select(
        col("q_id"),
        posexplode(zip_with(col("top.scores"), col("top.ids"), (s, i) =>
          struct(s.as("negham"), i.as("n_id")))))
      .select(
        col("q_id"),
        (col("pos") + 1).cast("long").as("rank"),
        col("col.n_id").as("n_id"),
        (-col("col.negham")).cast("long").as("ham"))
      .orderBy("q_id", "rank")
  }

  /** Recall of the binary Hamming shortlist against the exact cosine
    * top-k ([[annBrute]]) — the quantization-loss measurement that
    * decides whether the 16x-smaller binary tier can serve as the
    * first-stage filter (the same harness shape as `ann_recall` for IVF
    * and `emb_mrl` for truncation). Both inputs are session-shared
    * persisted shortlists, so this costs two K-bounded joins.
    */
  def annHamrecall(spark: SparkSession, dir: String): DataFrame = {
    val b = annBrute(spark, dir).select(col("q_id"), col("n_id"))
    val h = annHamming(spark, dir).select(col("q_id"), col("n_id"))
    val hits = b.join(h, Seq("q_id", "n_id"), "left_semi").groupBy("q_id").count()
    b.select("q_id")
      .distinct()
      .join(hits, Seq("q_id"), "left")
      .select(
        col("q_id"),
        coalesce(col("count"), lit(0L)).as("n_hit"),
        (coalesce(col("count"), lit(0L)).cast("double") / K).as("ham_recall"))
      .orderBy("q_id")
  }

  val annHammingSql: String = {
    def code(from: Int) =
      s"""list_reduce(list_prepend(0::BIGINT,
        list_transform(range(1, 33),
          i -> CASE WHEN v[i + $from] > 0 THEN (1::BIGINT << (i - 1)) ELSE 0::BIGINT END)),
        (a, b) -> a + b)"""
    s"""WITH c AS (
        SELECT vec_id AS id, ${code(0)} AS lo, ${code(32)} AS hi
        FROM (SELECT vec_id, embedding AS v FROM embeddings)),
      q AS (SELECT id, lo, hi FROM c WHERE id % $QueryMod = 0)
      SELECT q_id, rank, n_id, ham FROM (
        SELECT q.id AS q_id, x.id AS n_id,
          (bit_count(xor(q.lo, x.lo)) + bit_count(xor(q.hi, x.hi)))::BIGINT AS ham,
          row_number() OVER (PARTITION BY q.id
            ORDER BY bit_count(xor(q.lo, x.lo)) + bit_count(xor(q.hi, x.hi)), x.id) AS rank
        FROM q CROSS JOIN c x WHERE x.id <> q.id)
      WHERE rank <= $K ORDER BY q_id, rank"""
  }

  val annHamrecallSql: String =
    s"""WITH b AS ($annBruteSql),
      h AS ($annHammingSql),
      hits AS (SELECT b.q_id, count(*) AS c
               FROM b JOIN h ON b.q_id = h.q_id AND b.n_id = h.n_id
               GROUP BY b.q_id)
      SELECT q.q_id AS q_id, coalesce(c, 0) AS n_hit,
        coalesce(c, 0)::DOUBLE / $K AS ham_recall
      FROM (SELECT DISTINCT q_id FROM b) q LEFT JOIN hits ON q.q_id = hits.q_id
      ORDER BY q.q_id"""

  // ---- kNN label-vote classification ---------------------------------------

  /** kNN classification over the session-shared brute shortlist
    * ([[annBrute]] — K exact cosine neighbors per query vector): each
    * query's predicted label is the majority vote of its neighbors'
    * labels, tie-broken by the smaller label — the standard
    * label-propagation baseline an embedding pipeline runs to sanity-check
    * a space (are same-label points actually near each other?) and the
    * weak-supervision primitive for labeling fresh data from a labeled
    * pool. The emitted rows carry prediction, vote count, ground truth,
    * and an integer `correct` flag — `sum(correct)/count(*)` is the kNN
    * accuracy a training pipeline trends per ingest batch.
    *
    * Determinism: votes are integers over the deterministic shortlist
    * (integer-decided argmax, never float-ordered); the float cosine only
    * ever ordered the shortlist itself, which ties exactly on
    * (cos DESC, id). Scale shape: the shortlist is K-bounded per query,
    * so everything here — the label join (broadcast-sized: slim
    * (id, label) pairs), the vote aggregate, the per-query argmax window —
    * touches at most K rows per query; the corpus-sized cost lives in the
    * memoized shortlist build shared with ann_brute/ann_recall/ds_nearleak.
    */
  def embKnn(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val labels = Tables
      .t(spark, dir, "embeddings")
      .select(col("vec_id"), col("label").cast("long").as("label"))
    val votes = annBrute(spark, dir)
      .join(
        labels.select(col("vec_id").as("n_id"), col("label").as("n_label")),
        Seq("n_id"))
      .groupBy("q_id", "n_label")
      .agg(count(lit(1)).as("votes"))
    votes
      .withColumn(
        "rk",
        row_number().over(
          w.partitionBy("q_id").orderBy(col("votes").desc, col("n_label"))))
      .filter(col("rk") === 1)
      .join(labels.select(col("vec_id").as("q_id"), col("label").as("truth")), Seq("q_id"))
      .select(
        col("q_id"),
        col("n_label").as("pred"),
        col("votes"),
        col("truth"),
        when(col("n_label") === col("truth"), lit(1L)).otherwise(lit(0L)).as("correct"))
      .orderBy("q_id")
  }

  val embKnnSql: String =
    s"""WITH b AS ($annBruteSql),
      lb AS (SELECT vec_id, label::BIGINT AS label FROM embeddings),
      votes AS (
        SELECT b.q_id, lb.label AS n_label, count(*) AS votes
        FROM b JOIN lb ON lb.vec_id = b.n_id
        GROUP BY 1, 2),
      pred AS (
        SELECT q_id, n_label, votes,
          row_number() OVER (PARTITION BY q_id ORDER BY votes DESC, n_label) AS rk
        FROM votes)
      SELECT p.q_id, p.n_label AS pred, p.votes, t.label AS truth,
        CASE WHEN p.n_label = t.label THEN 1 ELSE 0 END::BIGINT AS correct
      FROM pred p JOIN lb t ON t.vec_id = p.q_id
      WHERE p.rk = 1 ORDER BY p.q_id"""

  // ---- hybrid retrieval: reciprocal-rank fusion ----------------------------
  // The standard RAG serving shape: a lexical ranking (inverted-index
  // token-overlap retrieval — posting-list equi-join over max-df-pruned
  // tokens, the distributed sparse-retrieval plan) and a dense ranking
  // (the INDEX-BACKED IVFPQ shortlist, shared with `ann_ivfpq` — the
  // serving path never touches the brute scan) are fused by reciprocal
  // rank: rrf = Σ_lists round(1e12 / (60 + rank)). Each term is ONE
  // correctly-rounded IEEE division then a round — integer-exact across
  // engines (the gr_adamic lesson: ranks are exact ints, no transcendental
  // in the compare path) — so the fused ordering is bit-deterministic.
  //
  // Scale shape: both input lists are k-BOUNDED per query (the dense side
  // by the IVFPQ top-k, the lexical side by TopKByScore), so the fusion
  // join and the final re-rank each touch at most 2k rows per query
  // regardless of corpus size; the corpus-sized legs are the IVF/PQ index
  // probe (~nprobe/nCells of a codes-only table) and the capped posting
  // join below.

  private val RrfK0 = 60

  /** Denominator of the lexical leg's max-document-frequency cap: a token
    * present in more than 1/[[RrfMaxDfDenom]] of the corpus (stopwords,
    * template boilerplate) is pruned BEFORE the posting-list self-join.
    * Without the cap, candidate volume is Σ_t df_query(t)·df_corpus(t) —
    * quadratic in the corpus for hot tokens, the classic posting-join
    * blow-up. With it, every surviving posting list is ≤ |corpus|/denom
    * AND the hot-token ledger is tiny by construction: each pruned token
    * has df > N/denom, and token occurrences total T, so there are fewer
    * than denom·T/N ≈ denom × (average doc length) hot tokens — a
    * corpus-size-INDEPENDENT broadcast, the same measured-bound shape as
    * [[graft.operators.Dedup.BoilerplateBroadcastThreshold]].
    */
  private[graft] val RrfMaxDfDenom = 10

  /** The RRF lexical leg, shared verbatim with the ScaleProbe `rrf_fused`
    * row: distinct-token postings, max-df prune (see [[RrfMaxDfDenom]]),
    * token-keyed posting join restricted to `queryPred` rows on the query
    * side, overlap count, bounded top-`k` per query. `queryPred` sees the
    * id as `col("id")` (the [[Ann.bruteTopK]] convention). Output:
    * `(q_id, n_id, l_rank)`.
    */
  def rrfLexicalTopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryPred: Column,
      k: Int): DataFrame = {
    val tok = docs.select(
      col(idCol).as("id"),
      explode(array_distinct(graft.functions.TextAnalysis.tokens(col(textCol)))).as("tok"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    // Hot-token ledger: bounded by denom × avg-doc-length rows (see
    // RrfMaxDfDenom), so the broadcast anti-join is safe at any corpus
    // size — unlike a broadcast of the KEPT vocabulary, which grows with
    // the corpus.
    val hot = tok
      .groupBy("tok")
      .agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") * RrfMaxDfDenom > col("n_docs"))
      .select("tok")
    val kept = graft.Caches.track(
      tok
        .join(broadcast(hot), Seq("tok"), "left_anti")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val topk = (s: Column, i: Column) => graft.operators.TopKByScore.applied(k, s, i)
    kept
      .filter(queryPred)
      .select(col("id").as("q_id"), col("tok"))
      .join(kept.select(col("id").as("n_id"), col("tok")), Seq("tok"))
      .filter(col("n_id") =!= col("q_id"))
      .groupBy("q_id", "n_id")
      .agg(count(lit(1)).cast("double").as("overlap"))
      .groupBy("q_id")
      .agg(topk(col("overlap"), col("n_id")).as("top"))
      .transform(Ann.explodeTopK(_, Seq("q_id")))
      .select(col("q_id"), col("n_id"), col("rank").as("l_rank"))
  }

  def annRrf(spark: SparkSession, dir: String): DataFrame = {
    // Dense leg: the IVFPQ index shortlist (cell-pruned, codes-only scan)
    // — not the brute baseline — so the fused serving path is index-backed
    // end to end.
    val vec = annIvfPq(spark, dir).select(col("q_id"), col("n_id"), col("rank").as("v_rank"))
    val lex = rrfLexicalTopK(
      Tables.t(spark, dir, "documents"),
      "doc_id",
      "text",
      col("id") % QueryMod === 0,
      K)
    def term(rank: Column): Column =
      coalesce(round(lit(1e12) / (lit(RrfK0) + rank)).cast("long"), lit(0L))
    val fused = vec
      .join(lex, Seq("q_id", "n_id"), "full_outer")
      .select(
        col("q_id"),
        col("n_id"),
        coalesce(col("v_rank"), lit(0L)).as("v_rank"),
        coalesce(col("l_rank"), lit(0L)).as("l_rank"),
        (term(col("v_rank")) + term(col("l_rank"))).as("rrf"))
    // The window input is ≤ 2k rows per query BY CONSTRUCTION (union of two
    // k-bounded lists), so this row_number is not a corpus-sized funnel.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id")
      .orderBy(col("rrf").desc, col("n_id"))
    fused
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .orderBy("q_id", "rank")
  }

  // lazy: annIvfPqSql initializes later in this object's source order.
  lazy val annRrfSql: String =
    s"""WITH ivfpq_r AS ($annIvfPqSql),
      vr AS (SELECT q_id, n_id, rank AS v_rank FROM ivfpq_r),
      tok AS (SELECT doc_id AS id,
          unnest(list_distinct(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''))) AS tok
        FROM documents),
      nd AS (SELECT count(*) AS n_docs FROM documents),
      hot AS (SELECT tok FROM (SELECT tok, count(*) AS df FROM tok GROUP BY 1)
        CROSS JOIN nd WHERE df * $RrfMaxDfDenom > n_docs),
      kept AS (SELECT id, tok FROM tok WHERE tok NOT IN (SELECT tok FROM hot)),
      ov AS (SELECT tq.id AS q_id, tx.id AS n_id, count(*) AS overlap
        FROM kept tq JOIN kept tx USING (tok)
        WHERE tq.id % $QueryMod = 0 AND tx.id <> tq.id
        GROUP BY 1, 2),
      lr AS (SELECT q_id, n_id, l_rank FROM (
          SELECT q_id, n_id,
            row_number() OVER (PARTITION BY q_id ORDER BY overlap DESC, n_id) AS l_rank
          FROM ov)
        WHERE l_rank <= $K),
      f AS (SELECT coalesce(vr.q_id, lr.q_id) AS q_id, coalesce(vr.n_id, lr.n_id) AS n_id,
          coalesce(vr.v_rank, 0)::BIGINT AS v_rank, coalesce(lr.l_rank, 0)::BIGINT AS l_rank,
          (coalesce(round(1e12 / ($RrfK0 + vr.v_rank)), 0)
            + coalesce(round(1e12 / ($RrfK0 + lr.l_rank)), 0))::BIGINT AS rrf
        FROM vr FULL JOIN lr ON vr.q_id = lr.q_id AND vr.n_id = lr.n_id)
      SELECT q_id, n_id, v_rank, l_rank, rrf, rank FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY rrf DESC, n_id)::BIGINT AS rank
        FROM f)
      WHERE rank <= $K ORDER BY q_id, rank"""

  val annIvfSql: String = {
    val assignCos = cosExpr("x.v", "x.nrm", "c.v", "c.nrm")
    val searchCos = cosExpr("p.q_v", "p.q_nrm", "a.v", "a.nrm")
    s"""WITH $vecCte,
      c AS (SELECT id, v, nrm FROM n WHERE id < $NCentroids),
      assigned AS (
        SELECT id, v, nrm, cell FROM (
          SELECT x.id, x.v, x.nrm, c.id AS cell,
            row_number() OVER (PARTITION BY x.id ORDER BY $assignCos DESC, c.id) AS rn
          FROM n x CROSS JOIN c)
        WHERE rn = 1),
      probes AS (
        SELECT q_id, q_v, q_nrm, cell FROM (
          SELECT x.id AS q_id, x.v AS q_v, x.nrm AS q_nrm, c.id AS cell,
            row_number() OVER (PARTITION BY x.id ORDER BY $assignCos DESC, c.id) AS rn
          FROM n x CROSS JOIN c WHERE x.id % $QueryMod = 0)
        WHERE rn <= $NProbe)
      SELECT q_id, n_id, rank, cos FROM (
        SELECT p.q_id, a.id AS n_id, $searchCos AS cos,
          row_number() OVER (PARTITION BY p.q_id ORDER BY $searchCos DESC, a.id) AS rank
        FROM probes p JOIN assigned a ON p.cell = a.cell AND a.id <> p.q_id)
      WHERE rank <= $K ORDER BY q_id, rank"""
  }

  /** Filtered vector search: IVF top-k restricted to candidates passing a
    * metadata predicate (English documents, joined on vec_id = doc_id) —
    * the serving shape where a vector index answers "nearest neighbors
    * AMONG rows matching a filter". The filter is applied PRE-scoring via
    * a left-semi allow-list join ([[Ann.ivfTopK]]'s `allowed`), so every
    * query still gets exactly k qualifying results; post-filtering an
    * unfiltered top-k would return fewer (or biased) rows. The index
    * (centroids + cell assignment) stays that of the full corpus —
    * built once, shared across predicates.
    */
  def annFiltered(spark: SparkSession, dir: String): DataFrame = {
    val allowed = Tables
      .t(spark, dir, "documents")
      .filter(col("lang") === "en")
      .select(col("doc_id"))
    Ann
      .ivfTopK(
        Tables.t(spark, dir, "embeddings"),
        "vec_id",
        "embedding",
        col("id") < NCentroids,
        col("id") % QueryMod === 0,
        NProbe,
        K,
        Some(allowed))
      .orderBy("q_id", "rank")
  }

  val annFilteredSql: String = {
    val assignCos = cosExpr("x.v", "x.nrm", "c.v", "c.nrm")
    val searchCos = cosExpr("p.q_v", "p.q_nrm", "a.v", "a.nrm")
    s"""WITH $vecCte,
      c AS (SELECT id, v, nrm FROM n WHERE id < $NCentroids),
      assigned AS (
        SELECT id, v, nrm, cell FROM (
          SELECT x.id, x.v, x.nrm, c.id AS cell,
            row_number() OVER (PARTITION BY x.id ORDER BY $assignCos DESC, c.id) AS rn
          FROM n x CROSS JOIN c)
        WHERE rn = 1),
      allowed AS (SELECT doc_id FROM documents WHERE lang = 'en'),
      probes AS (
        SELECT q_id, q_v, q_nrm, cell FROM (
          SELECT x.id AS q_id, x.v AS q_v, x.nrm AS q_nrm, c.id AS cell,
            row_number() OVER (PARTITION BY x.id ORDER BY $assignCos DESC, c.id) AS rn
          FROM n x CROSS JOIN c WHERE x.id % $QueryMod = 0)
        WHERE rn <= $NProbe)
      SELECT q_id, n_id, rank, cos FROM (
        SELECT p.q_id, a.id AS n_id, $searchCos AS cos,
          row_number() OVER (PARTITION BY p.q_id ORDER BY $searchCos DESC, a.id) AS rank
        FROM probes p JOIN assigned a ON p.cell = a.cell AND a.id <> p.q_id
        WHERE a.id IN (SELECT doc_id FROM allowed))
      WHERE rank <= $K ORDER BY q_id, rank"""
  }

  /** IVF recall against the exact brute-force top-k, per query point —
    * the approximation-quality harness for the ANN operator, the same way
    * er_metrics grades blocking against the exhaustive match. Fully
    * deterministic: both result sets are rank-pinned, so the intersection
    * count (and recall = hits / k) replays exactly.
    */
  def annRecall(spark: SparkSession, dir: String): DataFrame = {
    val b = annBrute(spark, dir).select(col("q_id"), col("n_id"))
    val i = annIvf(spark, dir).select(col("q_id"), col("n_id"))
    val hits = b.join(i, Seq("q_id", "n_id"), "left_semi").groupBy("q_id").count()
    b.select("q_id")
      .distinct()
      .join(hits, Seq("q_id"), "left")
      .select(
        col("q_id"),
        coalesce(col("count"), lit(0L)).as("n_hit"),
        (coalesce(col("count"), lit(0L)).cast("double") / K).as("recall"))
      .orderBy("q_id")
  }

  val annRecallSql: String =
    s"""WITH b AS ($annBruteSql),
      i AS ($annIvfSql),
      hits AS (SELECT b.q_id, count(*) AS c
               FROM b JOIN i ON b.q_id = i.q_id AND b.n_id = i.n_id
               GROUP BY b.q_id)
      SELECT q.q_id AS q_id, coalesce(c, 0) AS n_hit, coalesce(c, 0)::DOUBLE / $K AS recall
      FROM (SELECT DISTINCT q_id FROM b) q LEFT JOIN hits ON q.q_id = hits.q_id
      ORDER BY q.q_id"""

  /** Matryoshka-style truncation eval: search quality of the first
    * [[MrlDims]] dimensions against the full 64-dim brute-force top-k —
    * the retrieval-vs-cost tradeoff check an embedding pipeline runs
    * before committing to truncated vectors (MRL). Reuses the persisted
    * full search; the truncated search is the same broadcast-query
    * brute-force over sliced vectors.
    */
  private val MrlDims = 16

  def embMrl(spark: SparkSession, dir: String): DataFrame = {
    val full = annBrute(spark, dir).select(col("q_id"), col("n_id"))
    val truncated = Ann
      .bruteTopK(
        Tables
          .t(spark, dir, "embeddings")
          .select(col("vec_id"), slice(col("embedding"), 1, MrlDims).as("embedding")),
        "vec_id",
        "embedding",
        col("id") % QueryMod === 0,
        K)
      .select(col("q_id"), col("n_id"))
    val hits = full
      .join(truncated, Seq("q_id", "n_id"), "left_semi")
      .groupBy("q_id")
      .count()
    full
      .select("q_id")
      .distinct()
      .join(hits, Seq("q_id"), "left")
      .select(
        col("q_id"),
        coalesce(col("count"), lit(0L)).as("n_hit"),
        (coalesce(col("count"), lit(0L)).cast("double") / K).as("mrl_recall"))
      .orderBy("q_id")
  }

  val embMrlSql: String = {
    val c = cosExpr("q.v", "q.nrm", "x.v", "x.nrm")
    val tCte =
      s"""nt AS (SELECT id, v, sqrt(${dot("v", "v")}) AS nrm
          FROM (SELECT vec_id AS id, list_slice(embedding::DOUBLE[], 1, $MrlDims) AS v
                FROM embeddings))"""
    s"""WITH $vecCte,
      $tCte,
      full_k AS (SELECT q_id, n_id FROM (
          SELECT q.id AS q_id, x.id AS n_id,
            row_number() OVER (PARTITION BY q.id ORDER BY $c DESC, x.id) AS rank
          FROM (SELECT * FROM n WHERE id % $QueryMod = 0) q CROSS JOIN n x
          WHERE x.id <> q.id)
        WHERE rank <= $K),
      trunc_k AS (SELECT q_id, n_id FROM (
          SELECT q.id AS q_id, x.id AS n_id,
            row_number() OVER (PARTITION BY q.id ORDER BY $c DESC, x.id) AS rank
          FROM (SELECT * FROM nt WHERE id % $QueryMod = 0) q CROSS JOIN nt x
          WHERE x.id <> q.id)
        WHERE rank <= $K),
      hits AS (SELECT f.q_id, count(*) AS c
        FROM full_k f JOIN trunc_k t ON f.q_id = t.q_id AND f.n_id = t.n_id
        GROUP BY f.q_id)
      SELECT q.q_id, coalesce(c, 0) AS n_hit, coalesce(c, 0)::DOUBLE / $K AS mrl_recall
      FROM (SELECT DISTINCT q_id FROM full_k) q LEFT JOIN hits ON q.q_id = hits.q_id
      ORDER BY q.q_id"""
  }

  // ---- product quantization ----------------------------------------------

  private val PqM = 8 // subspaces
  private val PqK = 16 // centroids per subspace
  private val PqD = 8 // dims per subspace (PqM * PqD = 64)

  /** Deterministic md5-derived centroid component in [-1, 1) — the same
    * derivation family as the SRP hyperplanes, so DuckDB reconstructs the
    * identical codebook from the same strings.
    */
  private def pqCentroid(m: Int, c: Int): Seq[Double] =
    (0 until PqD).map { d =>
      graft.expressions.Md5Long60.hash(s"pq|$m|$c|$d".getBytes("UTF-8")).toDouble /
        (1L << 59).toDouble - 1.0
    }

  /** Product quantization: each vector's 64 dims split into [[PqM]]
    * 8-dim subvectors, each assigned the nearest of [[PqK]] codebook
    * centroids (squared L2, ordered fold; ties to the lower code via
    * struct min — the compressed representation an ANN serving layer
    * stores at PqM bytes per vector). Codebook is broadcast as literals;
    * assignment is a pure map — no shuffle until the final sort. Emits
    * (vec_id, subspace, code, dist) scalars, every distance
    * IEEE-replayable by the oracle.
    */
  def embPq(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables
      .t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val perM = (0 until PqM).map { m =>
      val sub = slice(col("v"), m * PqD + 1, PqD)
      val best = array_min(array((0 until PqK).map { c =>
        struct(
          aggregate(
            zip_with(sub, typedlit(pqCentroid(m, c)), (x, y) => (x - y) * (x - y)),
            lit(0.0),
            (a, x) => a + x).as("dist"),
          lit(c.toLong).as("code"))
      }: _*))
      struct(lit(m.toLong).as("m"), best.as("b"))
    }
    v.select(col("vec_id"), explode(array(perM: _*)).as("s"))
      .select(
        col("vec_id"),
        col("s.m").as("m"),
        col("s.b.code").as("code"),
        col("s.b.dist").as("dist"))
      .orderBy("vec_id", "m")
  }

  val embPqSql: String = {
    val md5l = graft.functions.Hashing.sqlMd5Long60Duck("'pq|' || m || '|' || c || '|' || d")
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      cent AS (SELECT m, c, list(($md5l) / ${(1L << 59).toDouble} - 1.0 ORDER BY d) AS cv
               FROM range(0, $PqM) tm(m), range(0, $PqK) tc(c), range(0, $PqD) td(d)
               GROUP BY m, c),
      dist AS (SELECT vec_id, m, c,
          list_reduce(list_prepend(0.0,
            list_transform(range(1, ${PqD + 1}),
              i -> (v[m * $PqD + i] - cv[i]) * (v[m * $PqD + i] - cv[i]))),
            (a, b) -> a + b) AS dist
        FROM v, cent),
      r AS (SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, c) AS rn FROM dist)
      SELECT vec_id, m, c AS code, dist FROM r WHERE rn = 1 ORDER BY vec_id, m"""
  }

  // ---- distributed Lloyd k-means + semantic dedup -------------------------

  private val KmK = 8
  private val KmIters = 2
  private val KmDims = 64
  private val SemCos = 0.45

  /** `(id, v)` double vectors, persisted — scanned once per Lloyd round
    * plus the final aggregate, and shared between emb_kmeans and
    * dd_semantic via the CacheManager's canonical-plan dedup.
    */
  private def kmVectors(spark: SparkSession, dir: String): DataFrame =
    Tables
      .t(spark, dir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  private def kmAssigned(spark: SparkSession, dir: String): DataFrame =
    graft.operators.KMeans
      .fit(kmVectors(spark, dir), KmK, KmDims, KmIters)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** The trained index for serving/ingest paths (st_annindex): the final
    * centroid literal of the SAME Lloyd run every km-backed query here
    * assigns against, so a streaming ingest that assigns with it lands
    * every vector in exactly the cell the batch fit would.
    *
    * Memoized per (session, dir): the Lloyd chain behind it is `KmIters`
    * distributed assign+recompute rounds, and before round 7 every caller
    * (st_annindex, its spec, any replay) re-ran the whole fit just to
    * rebuild a k-bounded literal. The Column is a pure literal plan
    * fragment, so reuse across queries in one session is safe.
    */
  private val servingCentroidsMemo =
    scala.collection.concurrent.TrieMap.empty[(String, String), org.apache.spark.sql.Column]

  private[graft] def servingCentroidsLit(
      spark: SparkSession, dir: String): org.apache.spark.sql.Column = {
    // Plain clear (no unpersist counterpart): the memoized value is a
    // literal Column — pure plan fragment, no BlockManager-registered
    // cached blocks to release (contrast TextQueries.bpeMemo, which
    // holds persisted frames and must unpersist on eviction).
    if (servingCentroidsMemo.size > 16) servingCentroidsMemo.clear()
    servingCentroidsMemo.getOrElseUpdate(
      (SessionMemo.sessionKey(spark), dir),
      graft.operators.KMeans.literal(
        graft.operators.KMeans.fitCentroids(kmVectors(spark, dir), KmK, KmDims, KmIters)))
  }

  /** Oracle building blocks for cross-file consumers (st_annindex's
    * DuckDB mirror replays the same Lloyd chain). */
  private[graft] def kmeansOracleCtes: String = kmeansCtes
  private[graft] def kmeansFinalRelation: String = s"a$KmIters"

  /** Final centroids after [[KmIters]] Lloyd rounds, exploded to scalar
    * (cid, n, dim, val) rows. Every double is an ordered fold, so the
    * oracle (which unrolls the same rounds as SQL CTEs) hash-matches the
    * full iteration chain, not just the last step.
    */
  def embKmeans(spark: SparkSession, dir: String): DataFrame =
    graft.operators.KMeans
      .recompute(kmAssigned(spark, dir), KmDims)
      .select(
        col("cid"),
        col("n"),
        posexplode(col("cv")).as(Seq("dim", "val")))
      .orderBy("cid", "dim")

  /** SemDeDup-style semantic near-dup pairs: cosine >= [[SemCos]] among
    * vectors in the SAME k-means cell — the cluster-bucketed scale path
    * for the exact `dd_embcos` baseline (candidate pairs per cell, not
    * all-pairs). Membership is decided entirely in products
    * (`dp^2 >= T^2*aa*bb`, same association both engines) so no sqrt
    * rounding can flip a boundary pair; the reported cosine uses sqrt
    * only for display, inside the gate's 12-digit tolerance.
    */
  def ddSemantic(spark: SparkSession, dir: String): DataFrame = {
    val a = kmAssigned(spark, dir)
    def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, d) => acc + d)
    val l = a.select(col("cluster"), col("id").as("a_id"), col("v").as("va"))
    val r = a.select(col("cluster"), col("id").as("b_id"), col("v").as("vb"))
    l.join(r, Seq("cluster"))
      .filter(col("a_id") < col("b_id"))
      .select(
        col("cluster"),
        col("a_id"),
        col("b_id"),
        dot(col("va"), col("vb")).as("dp"),
        dot(col("va"), col("va")).as("aa"),
        dot(col("vb"), col("vb")).as("bb"))
      .filter(
        col("dp") > 0 &&
          col("dp") * col("dp") >= lit(SemCos * SemCos) * col("aa") * col("bb"))
      .select(
        col("cluster"),
        col("a_id"),
        col("b_id"),
        (col("dp") / (sqrt(col("aa")) * sqrt(col("bb")))).as("cos_sim"))
      .orderBy("a_id", "b_id")
  }

  /** DuckDB replay of the full Lloyd chain: init = k lowest ids, then
    * [[KmIters]] x (assign via row_number over exact folded distances,
    * recompute via ordered list fold), plus one final assign — the same
    * rounds `KMeans.fit` runs.
    */
  private def kmeansCtes: String = {
    def dist(v: String, c: String) =
      s"""list_reduce(list_prepend(0.0, list_transform(range(1, ${KmDims + 1}),
          i -> ($v[i] - $c[i]) * ($v[i] - $c[i]))), (a, b) -> a + b)"""
    def assign(n: Int, cents: String) =
      s"""a$n AS (SELECT id, vv, cid AS cluster FROM (
            SELECT v.id, v.vv, c.cid,
              row_number() OVER (PARTITION BY v.id
                ORDER BY ${dist("v.vv", "c.cv")}, c.cid) AS rn
            FROM v CROSS JOIN $cents c) WHERE rn = 1)"""
    def recompute(n: Int, assigned: String) =
      s"""c$n AS (SELECT cid, n, list_transform(s, x -> x / n) AS cv FROM (
            SELECT cluster AS cid, count(*) AS n,
              list_reduce(list_prepend(list_transform(range(1, ${KmDims + 1}), i -> 0.0), list(vv ORDER BY id)),
                (a, b) -> list_transform(range(1, ${KmDims + 1}), i -> a[i] + b[i])) AS s
            FROM $assigned GROUP BY cluster))"""
    val rounds = (1 to KmIters)
      .map(i => s"${recompute(i, s"a${i - 1}")},\n ${assign(i, s"c$i")}")
      .mkString(",\n ")
    s"""v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS vv FROM embeddings),
      c0 AS (SELECT id AS cid, vv AS cv FROM v ORDER BY id LIMIT $KmK),
      ${assign(0, "c0")},
      $rounds"""
  }

  val embKmeansSql: String =
    s"""WITH $kmeansCtes,
      cf AS (SELECT cid, n, list_transform(s, x -> x / n) AS cv FROM (
        SELECT cluster AS cid, count(*) AS n,
          list_reduce(list_prepend(list_transform(range(1, ${KmDims + 1}), i -> 0.0), list(vv ORDER BY id)),
            (a, b) -> list_transform(range(1, ${KmDims + 1}), i -> a[i] + b[i])) AS s
        FROM a$KmIters GROUP BY cluster))
      SELECT cid, n, d.dim::INT AS dim, cv[d.dim + 1] AS val
      FROM cf CROSS JOIN range(0, $KmDims) d(dim) ORDER BY cid, dim"""

  /** IVF/k-means index health audit: per-cell occupancy plus the load
    * factor (n·k / total — 1.0 is perfectly balanced, big values mean a
    * hot cell that will dominate probe latency and needs splitting or
    * re-training). The audit every vector index runs after (re)build,
    * before serving traffic. One count per cell over the memoized
    * assignment frame; the total arrives as a broadcast one-row
    * aggregate, and the load factor is one exact-integer IEEE division.
    */
  def annCellstats(spark: SparkSession, dir: String): DataFrame = {
    val cells = kmAssigned(spark, dir)
      .groupBy(col("cluster").as("cid"))
      .agg(count(lit(1)).as("n_vectors"))
    cells
      .crossJoin(broadcast(cells.agg(sum(col("n_vectors")).as("total"))))
      .select(
        col("cid"),
        col("n_vectors"),
        (col("n_vectors") * lit(KmK) / col("total")).as("load_factor"))
      .orderBy("cid")
  }

  val annCellstatsSql: String =
    s"""WITH $kmeansCtes,
      cells AS (SELECT cluster AS cid, count(*) AS n_vectors FROM a$KmIters GROUP BY cluster),
      t AS (SELECT sum(n_vectors)::BIGINT AS total FROM cells)
      SELECT cid, n_vectors::BIGINT AS n_vectors,
        (n_vectors::BIGINT * $KmK)::BIGINT / t.total::BIGINT AS load_factor
      FROM cells, t ORDER BY cid"""

  val ddSemanticSql: String = {
    def dotSql(x: String, y: String) =
      s"""list_reduce(list_prepend(0.0, list_transform(range(1, ${KmDims + 1}),
          i -> $x[i] * $y[i])), (a, b) -> a + b)"""
    s"""WITH $kmeansCtes,
      p AS (SELECT a.cluster, a.id AS a_id, b.id AS b_id,
              ${dotSql("a.vv", "b.vv")} AS dp,
              ${dotSql("a.vv", "a.vv")} AS aa,
              ${dotSql("b.vv", "b.vv")} AS bb
            FROM a$KmIters a JOIN a$KmIters b
              ON a.cluster = b.cluster AND a.id < b.id)
      SELECT cluster, a_id, b_id, dp / (sqrt(aa) * sqrt(bb)) AS cos_sim
      FROM p WHERE dp > 0 AND dp * dp >= ${SemCos * SemCos} * aa * bb
      ORDER BY a_id, b_id"""
  }

  /** PQ asymmetric-distance search (the IVFPQ/FAISS serving pattern): the
    * database side is ONLY the PQ codes ([[embPq]]'s assignment — PqM
    * bytes per vector), the query side precomputes its per-subspace
    * lookup table against the codebook (PqM × PqK distances per query —
    * a few hundred rows, broadcast), and each candidate's approximate
    * distance is the m-ORDERED fold of LUT entries, so the score is
    * bit-identical on both engines and the top-k ranking can't flip on
    * summation order. Map-side scoring — codes join a broadcast LUT —
    * then one per-query top-k.
    */
  private val PqTopK = 10

  /** Per-query PQ lookup table: for a `(q_id, qv)` query frame, the
    * squared-L2 distance from each query subvector to every codebook
    * centroid — PqM x PqK rows per query, the broadcast side of every
    * asymmetric-distance scoring join.
    */
  private def pqLutFor(q: DataFrame): DataFrame = {
    val lutRows = (0 until PqM).flatMap { m =>
      (0 until PqK).map { c =>
        struct(
          lit(m.toLong).as("m"),
          lit(c.toLong).as("code"),
          aggregate(
            zip_with(
              slice(col("qv"), m * PqD + 1, PqD),
              typedlit(pqCentroid(m, c)),
              (x, y) => (x - y) * (x - y)),
            lit(0.0),
            (a, x) => a + x).as("qd"))
      }
    }
    q.select(col("q_id"), explode(array(lutRows: _*)).as("l"))
      .select(col("q_id"), col("l.m").as("m"), col("l.code").as("code"), col("l.qd").as("qd"))
  }

  def annPq(spark: SparkSession, dir: String): DataFrame = SessionMemo
    .getOrElseUpdate("ann_pq_topk", spark, dir) { annPqBuild(spark, dir) }

  private def annPqBuild(spark: SparkSession, dir: String): DataFrame = {
    val codes = embPq(spark, dir).select(col("vec_id"), col("m"), col("code"))
    val lut = pqLutFor(
      Tables
        .t(spark, dir, "embeddings")
        .filter(col("vec_id") % QueryMod === 0)
        .select(col("vec_id").as("q_id"), col("embedding").cast("array<double>").as("qv")))
    val scored = codes
      .join(broadcast(lut), Seq("m", "code"))
      .groupBy("q_id", "vec_id")
      .agg(
        aggregate(
          transform(
            array_sort(collect_list(struct(col("m"), col("qd")))),
            s => s.getField("qd")),
          lit(0.0),
          (a, x) => a + x).as("adist"))
    // Rank with the bounded top-k aggregator (negated distance, max-first
    // keeps the k smallest; (score desc, id asc) == (adist asc, vec_id
    // asc)) — the same partial-aggregating funnel ann_ivfpq uses, so the
    // corpus-sized scored frame never feeds a per-query window sort
    // (r5 verdict #6: that window was the most expensive healthy plan).
    // Persisted AND SessionMemo'd like annBrute (ann_rerank reads the
    // same shortlist): object reuse, because the udaf's re-resolved
    // encoders defeat CacheManager canonical matching (see annBrute).
    val topk = (s: Column, i: Column) => graft.operators.TopKByScore.applied(PqTopK, s, i)
    scored
      .groupBy("q_id")
      .agg(topk(-col("adist"), col("vec_id")).as("top"))
      .transform(Ann.explodeTopK(_, Seq("q_id")))
      .select(
        col("q_id"),
        col("n_id").as("vec_id"),
        (-col("cos")).as("adist"),
        col("rank").as("rnk"))
      .orderBy("q_id", "rnk")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** The PQ-search CTE chain (codes, per-query LUT, asymmetric-distance
    * scores, rank) — shared by [[annPqSql]] and [[annRerankSql]].
    */
  private val pqSearchCtes: String = {
    val md5l = graft.functions.Hashing.sqlMd5Long60Duck("'pq|' || m || '|' || c || '|' || d")
    s"""v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      cent AS (SELECT m, c, list(($md5l) / ${(1L << 59).toDouble} - 1.0 ORDER BY d) AS cv
               FROM range(0, $PqM) tm(m), range(0, $PqK) tc(c), range(0, $PqD) td(d)
               GROUP BY m, c),
      dist AS (SELECT vec_id, m, c,
          list_reduce(list_prepend(0.0,
            list_transform(range(1, ${PqD + 1}),
              i -> (v[m * $PqD + i] - cv[i]) * (v[m * $PqD + i] - cv[i]))),
            (a, b) -> a + b) AS dist
        FROM v, cent),
      codes AS (SELECT vec_id, m, c AS code FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, c) AS rn FROM dist)
        WHERE rn = 1),
      lut AS (SELECT vec_id AS q_id, m, c AS code, dist AS qd
        FROM dist WHERE vec_id % $QueryMod = 0),
      scored AS (SELECT l.q_id, codes.vec_id,
          list_reduce(list_prepend(0.0, list(l.qd ORDER BY l.m)), (a, b) -> a + b) AS adist
        FROM codes JOIN lut l ON codes.m = l.m AND codes.code = l.code
        GROUP BY l.q_id, codes.vec_id),
      pq_ranked AS (
        SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY adist, vec_id) AS rnk
        FROM scored)"""
  }

  val annPqSql: String =
    s"""WITH $pqSearchCtes
      SELECT q_id, vec_id, adist, rnk FROM pq_ranked
      WHERE rnk <= $PqTopK ORDER BY q_id, rnk"""

  private val RerankK = 5

  /** Two-stage serving search: the PQ asymmetric-distance shortlist
    * ([[annPq]]'s top [[PqTopK]], self excluded) reranked by EXACT cosine
    * — the canonical compressed-scan-then-rerank recipe. The database side
    * of stage 1 is the codes table alone (PqM bytes/vector); stage 2
    * touches full vectors for only the shortlist, fetched by two slim
    * id-equi joins, so a 100 TB corpus pays exact-arithmetic cost on
    * L·|queries| rows, never on the corpus. The rerank ranking is a
    * per-query window over <= [[PqTopK]] rows — bounded by construction.
    */
  def annRerank(spark: SparkSession, dir: String): DataFrame = {
    val sl = annPq(spark, dir)
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"))
    val v = Tables
      .t(spark, dir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(graft.operators.Dedup.dotFold(col("v"), col("v"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id")
      .orderBy(col("cos").desc, col("n_id"))
    sl.join(v.select(col("id").as("q_id"), col("v").as("q_v"), col("nrm").as("q_nrm")), "q_id")
      .join(v.select(col("id").as("n_id"), col("v").as("n_v"), col("nrm").as("n_nrm")), "n_id")
      .withColumn(
        "cos",
        graft.operators.Dedup.dotFold(col("q_v"), col("n_v")) / (col("q_nrm") * col("n_nrm")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= RerankK)
      .select("q_id", "n_id", "rank", "cos")
      .orderBy("q_id", "rank")
  }

  val annRerankSql: String = {
    val c = cosExpr("q.v", "q.nrm", "x.v", "x.nrm")
    s"""WITH $pqSearchCtes,
      sl AS (SELECT q_id, vec_id AS n_id FROM pq_ranked
             WHERE rnk <= $PqTopK AND vec_id <> q_id),
      vn AS (SELECT vec_id AS id, v, sqrt(${dot("v", "v")}) AS nrm FROM v)
      SELECT q_id, n_id, rank, cos FROM (
        SELECT sl.q_id, sl.n_id, $c AS cos,
          row_number() OVER (PARTITION BY sl.q_id ORDER BY $c DESC, sl.n_id) AS rank
        FROM sl JOIN vn q ON q.id = sl.q_id JOIN vn x ON x.id = sl.n_id)
      WHERE rank <= $RerankK ORDER BY q_id, rank"""
  }

  // ---- IVFPQ composed search + cell-bucketed kNN graph ---------------------

  private val IvfPqTopK = 10

  /** IVFPQ search — the two FAISS index legs composed into the canonical
    * serving shape: the IVF coarse quantizer prunes candidates to each
    * query's [[NProbe]] nearest cells, and scoring INSIDE the probed cells
    * reads only the PQ codes table against the query's broadcast lookup
    * table. At 100 TB the search scans ~nprobe/nCells of a table that is
    * [[PqM]] bytes per vector — full vectors are never touched (the exact
    * rerank over a shortlist is [[annRerank]]). Candidate generation is an
    * equi-join on cell id, scoring a broadcast-LUT join, ranking the
    * bounded top-k aggregator; every distance is an m-ordered fold of LUT
    * entries, so scores and ranks replay bit-identically in DuckDB.
    */
  def annIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables
      .t(spark, dir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(graft.operators.Dedup.dotFold(col("v"), col("v"))))
    val centroids = v
      .filter(col("id") < NCentroids)
      .select(col("id").as("c_id"), col("v").as("c_v"), col("nrm").as("c_nrm"))
    val cells = Ann.assignCells(v, centroids).select(col("id").as("n_id"), col("cell"))
    val topProbe = (s: Column, i: Column) => graft.operators.TopKByScore.applied(NProbe, s, i)
    val probes = v
      .filter(col("id") % QueryMod === 0)
      .select(col("id").as("q_id"), col("v").as("q_v"), col("nrm").as("q_nrm"))
      .crossJoin(broadcast(centroids))
      .withColumn(
        "cos",
        graft.operators.Dedup.dotFold(col("q_v"), col("c_v")) / (col("q_nrm") * col("c_nrm")))
      .groupBy("q_id")
      .agg(topProbe(col("cos"), col("c_id")).as("t"))
      .select(col("q_id"), explode(col("t.ids")).as("cell"))
    val cand = probes
      .join(cells, Seq("cell"))
      .filter(col("n_id") =!= col("q_id"))
      .select("q_id", "n_id")
    val codes = embPq(spark, dir).select(col("vec_id").as("n_id"), col("m"), col("code"))
    val lut = pqLutFor(
      Tables
        .t(spark, dir, "embeddings")
        .filter(col("vec_id") % QueryMod === 0)
        .select(col("vec_id").as("q_id"), col("embedding").cast("array<double>").as("qv")))
    val topk = (s: Column, i: Column) => graft.operators.TopKByScore.applied(IvfPqTopK, s, i)
    cand
      .join(codes, Seq("n_id"))
      .join(broadcast(lut), Seq("q_id", "m", "code"))
      .groupBy("q_id", "n_id")
      .agg(
        aggregate(
          transform(
            array_sort(collect_list(struct(col("m"), col("qd")))),
            s => s.getField("qd")),
          lit(0.0),
          (a, x) => a + x).as("adist"))
      // Rank by NEGATED distance so the max-first bounded aggregator keeps
      // the k smallest; (score desc, id asc) == oracle (adist asc, id asc).
      .groupBy("q_id")
      .agg(topk(-col("adist"), col("n_id")).as("top"))
      .transform(Ann.explodeTopK(_, Seq("q_id")))
      .select(col("q_id"), col("n_id"), (-col("cos")).as("adist"), col("rank"))
      .orderBy("q_id", "rank")
  }

  val annIvfPqSql: String = {
    val assignCos = cosExpr("x.v", "x.nrm", "c.v", "c.nrm")
    s"""WITH $pqSearchCtes,
      $vecCte,
      c AS (SELECT id, v, nrm FROM n WHERE id < $NCentroids),
      assigned AS (
        SELECT id, cell FROM (
          SELECT x.id, c.id AS cell,
            row_number() OVER (PARTITION BY x.id ORDER BY $assignCos DESC, c.id) AS rn
          FROM n x CROSS JOIN c)
        WHERE rn = 1),
      probes AS (
        SELECT q_id, cell FROM (
          SELECT x.id AS q_id, c.id AS cell,
            row_number() OVER (PARTITION BY x.id ORDER BY $assignCos DESC, c.id) AS rn
          FROM n x CROSS JOIN c WHERE x.id % $QueryMod = 0)
        WHERE rn <= $NProbe),
      cand AS (SELECT p.q_id, a.id AS n_id
               FROM probes p JOIN assigned a ON a.cell = p.cell AND a.id <> p.q_id),
      ivfpq AS (SELECT cd.q_id, cd.n_id,
          list_reduce(list_prepend(0.0, list(l.qd ORDER BY l.m)), (a, b) -> a + b) AS adist
        FROM cand cd
        JOIN codes co ON co.vec_id = cd.n_id
        JOIN lut l ON l.q_id = cd.q_id AND l.m = co.m AND l.code = co.code
        GROUP BY cd.q_id, cd.n_id)
      SELECT q_id, n_id, adist, rank FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY adist, n_id) AS rank
        FROM ivfpq)
      WHERE rank <= $IvfPqTopK ORDER BY q_id, rank"""
  }

  private val KnnK = 3

  /** Mutual k-NN graph within k-means cells — the candidate graph semantic
    * clustering and graph-based dedup build on (each vector's [[KnnK]]
    * nearest cell-mates by cosine, flagged mutual when the edge exists in
    * both directions). The all-pairs work is bucketed per cell (never a
    * corpus cross join), the per-vector ranking is the bounded top-k
    * aggregator, and the mutuality check is a self-join of the k·|V|-row
    * edge list on the reversed pair — edge-proportional, not
    * corpus-proportional. Persisted once for the reverse join.
    */
  def annKnnGraph(spark: SparkSession, dir: String): DataFrame = {
    val w = kmAssigned(spark, dir)
      .withColumn("nrm", sqrt(graft.operators.Dedup.dotFold(col("v"), col("v"))))
    val l =
      w.select(col("cluster"), col("id").as("q_id"), col("v").as("q_v"), col("nrm").as("q_nrm"))
    val r =
      w.select(col("cluster"), col("id").as("n_id"), col("v").as("n_v"), col("nrm").as("n_nrm"))
    val topk = (s: Column, i: Column) => graft.operators.TopKByScore.applied(KnnK, s, i)
    val knn = graft.Caches.track(
      l.join(r, Seq("cluster"))
        .filter(col("n_id") =!= col("q_id"))
        .withColumn(
          "cos",
          graft.operators.Dedup.dotFold(col("q_v"), col("n_v")) / (col("q_nrm") * col("n_nrm")))
        .groupBy("q_id")
        .agg(topk(col("cos"), col("n_id")).as("top"))
        .transform(Ann.explodeTopK(_, Seq("q_id")))
        .select("q_id", "n_id", "rank", "cos")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // Edge (q, n) is mutual iff the edge list also contains (n, q):
    // probe the renamed copy on the REVERSED pair.
    val rev = knn.select(col("q_id").as("rq2"), col("n_id").as("rn2"))
    knn
      .join(rev, col("n_id") === col("rq2") && col("q_id") === col("rn2"), "left")
      .select(
        col("q_id"),
        col("n_id"),
        col("rank"),
        col("cos"),
        col("rq2").isNotNull.as("mutual"))
      .orderBy("q_id", "rank")
  }

  val annKnnGraphSql: String = {
    val c = cosExpr("a.vv", "a.nrm", "b.vv", "b.nrm")
    s"""WITH $kmeansCtes,
      wn AS (SELECT id, cluster, vv, sqrt(${dot("vv", "vv")}) AS nrm FROM a$KmIters),
      knn AS (SELECT q_id, n_id, rank, cos FROM (
          SELECT a.id AS q_id, b.id AS n_id, $c AS cos,
            row_number() OVER (PARTITION BY a.id ORDER BY $c DESC, b.id) AS rank
          FROM wn a JOIN wn b ON a.cluster = b.cluster AND b.id <> a.id)
        WHERE rank <= $KnnK)
      SELECT k.q_id, k.n_id, k.rank, k.cos, (r.q_id IS NOT NULL) AS mutual
      FROM knn k LEFT JOIN knn r ON r.q_id = k.n_id AND r.n_id = k.q_id
      ORDER BY k.q_id, k.rank"""
  }

  // ---- dominant direction via quantized power iteration --------------------
  // The corpus-level "what direction dominates these embeddings" probe (top
  // principal direction of the uncentered second-moment matrix E^T E),
  // computed WITHOUT ever materializing the 64x64 Gram matrix: two power-
  // iteration steps, each one narrow per-row dot product plus one 64-group
  // elementwise sum — the matrix-free formulation that scales to any row
  // count.
  //
  // Reproducibility design: float power iteration is not distributed-
  // deterministic (per-dim sums over all rows are order-dependent), so the
  // iteration runs in EXACT BIGINT arithmetic over the int8-quantized
  // vectors (emb_quant's grid): q0 = all-ones, w1 = Q^T(Q q0), downscale by
  // the exact power-of-two floor(w1 / 2^16) to bound the next magnitude,
  // w2 = Q^T(Q q1). Integer sums commute, so any partitioning/AQE plan
  // hash-matches the oracle exactly — no 12-digit float tolerance needed.
  // Magnitude budget: |dot1| <= 64*127 = 8128, |w1| <= rows*127*8128,
  // max|q1| = |w1|/2^16, |dot2| <= 64*127*max|q1|, and
  // |w2| <= rows*127*|dot2| — ~4.1e16 at 50k rows (sf1: 500k rows ->
  // ~4.1e18, 2.3x under int64 max; past that, widen the downscale shift
  // to 2^20, which this grid's |w1| magnitudes make exact just the same).

  /** Per-dimension moment audit of the embedding space — the feature-
    * scaling / dead-dimension report a training pipeline reads before
    * normalizing or truncating a space (complements `emb_audit`, which
    * audits per-VECTOR norms): each of the 64 dims gets its count, the
    * exact integer moments of the 1e4-quantized values, the floor-scaled
    * ppm mean, and the variance numerator `n·Q − S²` — a dim with a tiny
    * numerator is (near-)constant and carries no signal.
    *
    * Cross-engine discipline: values quantize to BIGINT via one
    * `round(x·10⁴)` (both engines round halves away from zero, and the
    * product is the same IEEE double), so every aggregate is an exact
    * integer and sum order cannot matter. Scale: one explode + one
    * map-side-combinable 64-group aggregate — nothing else.
    */
  def embDimstats(spark: SparkSession, dir: String): DataFrame =
    dimMomentsFinish(dimMomentsRaw(Tables.t(spark, dir, "embeddings")))

  /** The quantize + moment aggregation stage — streamable (one stateful
    * 64-group aggregate), shared with the streaming ingest-monitor twin
    * `st_dimstats` so stream and batch cannot drift.
    */
  private[graft] def dimMomentsRaw(emb: DataFrame): DataFrame =
    emb
      .select(posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "x")))
      .select(col("dim").cast("long").as("dim"), round(col("x") * 10000).cast("long").as("qd"))
      .groupBy("dim")
      .agg(
        count(lit(1)).as("n"),
        sum(col("qd")).as("s"),
        sum(col("qd") * col("qd")).as("q"))

  /** Derived columns over the (dim, n, s, q) moments — batch-side.
    *
    * Magnitude budget (r14 ADVICE — the sibling-query discipline): with
    * |x| ≤ 1 the quantized |qd| ≤ 10⁴, so |s| ≤ n·10⁴ and q ≤ n·10⁸;
    * the variance numerator's products obey |n·q| ≤ n²·10⁸ and
    * |s²| ≤ n²·10⁸, crossing int64 (9.2·10¹⁸) at n ≈ 3·10⁵ vectors per
    * dim — where Spark would wrap silently while DuckDB raises, i.e.
    * the oracle gate would DIVERGE rather than flag. 2000 rows here is
    * 150× under the bound. Past it: halve the quantization to 10²
    * (buys 10⁴× headroom, n ≈ 3·10⁹) or stage the reduction by
    * centering on the integer mean first — do NOT just widen to double
    * (the whole point is an exact integer numerator).
    */
  private[graft] def dimMomentsFinish(m: DataFrame): DataFrame =
    m.select(
        col("dim"),
        col("n"),
        col("s"),
        col("q"),
        expr("(s * CAST(1000000 AS BIGINT)) div n").as("mean_ppm"),
        (col("n") * col("q") - col("s") * col("s")).as("var_num"))
      .orderBy("dim")

  val embDimstatsSql: String =
    """WITH e AS (SELECT t.dim - 1 AS dim, round(t.x * 10000)::BIGINT AS qd
        FROM (SELECT unnest(embedding::DOUBLE[]) AS x,
                generate_subscripts(embedding, 1) AS dim FROM embeddings) t),
      m AS (SELECT dim::BIGINT AS dim, count(*)::BIGINT AS n, sum(qd)::BIGINT AS s,
          sum(qd * qd)::BIGINT AS q
        FROM e GROUP BY 1)
      SELECT dim, n, s, q, (s * 1000000 // n)::BIGINT AS mean_ppm,
        (n * q - s * s)::BIGINT AS var_num
      FROM m ORDER BY dim"""

  def embPca(spark: SparkSession, dir: String): DataFrame =
    embPcaFrom(Tables.t(spark, dir, "embeddings"))

  /** The iteration core over any `(vec_id, embedding)` frame — shared with
    * the scale probe.
    */
  def embPcaFrom(emb: DataFrame): DataFrame = {
    // NOT widened (r15): both widen placements measured SLOWER than the
    // serial build (1.6 s → 2.2–3.2 s) — at this corpus's exploded volume
    // the blocked-stage overlap already hides the serial cost and an
    // exchange only adds to it.
    val qvec = emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn(
        "scale",
        aggregate(col("v"), lit(0.0), (m, x) => greatest(m, abs(x))) / 127.0)
      .select(
        col("vec_id"),
        transform(
          col("v"),
          x => least(greatest(round(x / col("scale")), lit(-127.0)), lit(127.0)).cast("long"))
          .as("q"))
    val e = graft.Caches.track(
      qvec
        .select(col("vec_id"), posexplode(col("q")).as(Seq("dim", "qd")))
        .select(col("vec_id"), col("dim").cast("long").as("dim"), col("qd"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val dot1 = e.groupBy("vec_id").agg(sum(col("qd")).as("dot1")) // q0 = ones
    val w1 = e
      .join(dot1, "vec_id")
      .groupBy("dim")
      .agg(sum(col("qd") * col("dot1")).as("w1"))
    val q1 = w1.select(
      col("dim"),
      floor(col("w1") / 65536.0).cast("long").as("v1")) // exact: /2^16 then floor
    val dot2 = e
      .join(broadcast(q1), "dim")
      .groupBy("vec_id")
      .agg(sum(col("qd") * col("v1")).as("dot2"))
    val w2 = e
      .join(dot2, "vec_id")
      .groupBy("dim")
      .agg(sum(col("qd") * col("dot2")).as("v2"))
    q1.join(w2, "dim").select(col("dim"), col("v1"), col("v2")).orderBy("dim")
  }

  val embPcaSql: String =
    """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      s AS (SELECT vec_id, v,
              list_reduce(list_prepend(0.0, list_transform(v, x -> abs(x))), (m, x) -> greatest(m, x)) / 127.0 AS scale
            FROM v),
      q AS (SELECT vec_id,
              list_transform(v, x -> least(greatest(round(x / scale), -127.0), 127.0)::BIGINT) AS q
            FROM s),
      e AS (SELECT vec_id, d.i - 1 AS dim, q[d.i] AS qd FROM q CROSS JOIN range(1, 65) d(i)),
      dot1 AS (SELECT vec_id, sum(qd)::BIGINT AS dot1 FROM e GROUP BY vec_id),
      w1 AS (SELECT dim, sum(qd * dot1)::BIGINT AS w1
             FROM e JOIN dot1 USING (vec_id) GROUP BY dim),
      q1 AS (SELECT dim, floor(w1 / 65536.0)::BIGINT AS v1 FROM w1),
      dot2 AS (SELECT vec_id, sum(qd * v1)::BIGINT AS dot2
               FROM e JOIN q1 USING (dim) GROUP BY vec_id),
      w2 AS (SELECT dim, sum(qd * dot2)::BIGINT AS v2
             FROM e JOIN dot2 USING (vec_id) GROUP BY dim)
      SELECT q1.dim::BIGINT AS dim, q1.v1, w2.v2
      FROM q1 JOIN w2 ON q1.dim = w2.dim ORDER BY dim"""

  private val RangeTau = 0.25

  /** Similarity-bounded retrieval: every neighbor with cosine >= τ for the
    * standard query set — the "radius search" serving mode where result
    * size is data-dependent, not count-bounded. The query batch broadcasts,
    * so the corpus is scanned once, map-only: score + threshold inside one
    * codegen stage, zero shuffles before the presentation sort. τ = 0.25 is
    * exactly representable in binary, and the cosine is the same ordered
    * fold both engines replay, so boundary membership is bit-stable.
    */
  def annRange(spark: SparkSession, dir: String): DataFrame =
    Ann
      .rangeSearch(
        Tables.t(spark, dir, "embeddings"),
        "vec_id",
        "embedding",
        col("id") % QueryMod === 0,
        RangeTau)
      .orderBy("q_id", "n_id")

  val annRangeSql: String = {
    val c = cosExpr("q.v", "q.nrm", "x.v", "x.nrm")
    s"""WITH $vecCte,
      q AS (SELECT id, v, nrm FROM n WHERE id % $QueryMod = 0)
      SELECT q.id AS q_id, x.id AS n_id, $c AS cos
      FROM q CROSS JOIN n x
      WHERE x.id <> q.id AND $c >= $RangeTau
      ORDER BY q_id, n_id"""
  }

  // ---- scalar-quantized (int8) search -------------------------------------

  private val SqTopK = 10

  /** Symmetric scalar-quantization search: every vector compresses to one
    * int8 code per dimension against per-dimension [min, max] ranges (the
    * classic SQ8 index — 8× smaller than float32, 1 byte/dim at rest),
    * and search ranks by the inner product of the DEQUANTIZED codes
    * (code midpoint: mn + (c+0.5)·span/255). The range table is one tiny
    * (dims × 2) frame broadcast to every task; the database side at scale
    * stores only codes, so a 100 TB vector corpus scans at 1/8 the bytes
    * of brute force with no cell-pruning recall risk (the IVF/PQ legs
    * cover that trade). Quantization uses floor (never round — .5 ties
    * are engine lore), spans of zero quantize to code 0, and the
    * dequantized dot is the same left-associated fold both engines run,
    * so scores and ranks replay bit-identically. Ranking uses the bounded
    * top-k aggregator — no corpus-sized window.
    */
  def annSq(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables
      .t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val stats = v
      .select(posexplode(col("v")).as(Seq("d", "x")))
      .groupBy("d")
      .agg(min("x").as("mn"), max("x").as("mx"))
      .groupBy()
      .agg(sort_array(collect_list(struct(col("d"), col("mn"), col("mx")))).as("st"))
      .select(
        transform(col("st"), s => s.getField("mn")).as("mins"),
        transform(col("st"), s => s.getField("mx")).as("maxs"))
    def dequant(vc: Column, mins: Column, maxs: Column): Column =
      zip_with(
        zip_with(vc, mins, (x, mn) => struct(x.as("x"), mn.as("mn"))),
        maxs,
        (s, mx) => {
          val mn = s.getField("mn")
          val sp = mx - mn
          val code = when(sp === 0.0, lit(0.0))
            .otherwise(floor(lit(255.0) * (s.getField("x") - mn) / sp).cast("double"))
          mn + (code + lit(0.5)) * sp / lit(255.0)
        })
    val dq = v
      .crossJoin(broadcast(stats))
      .select(col("vec_id"), dequant(col("v"), col("mins"), col("maxs")).as("dv"))
    val q = dq
      .filter(col("vec_id") % QueryMod === 0)
      .select(col("vec_id").as("q_id"), col("dv").as("qv"))
    val topk = (s: Column, i: Column) => graft.operators.TopKByScore.applied(SqTopK, s, i)
    broadcast(q)
      .crossJoin(dq.select(col("vec_id").as("n_id"), col("dv").as("nv")))
      .filter(col("n_id") =!= col("q_id"))
      .select(
        col("q_id"),
        col("n_id"),
        graft.operators.Dedup.dotFold(col("qv"), col("nv")).as("ip"))
      .groupBy("q_id")
      .agg(topk(col("ip"), col("n_id")).as("top"))
      .transform(Ann.explodeTopK(_, Seq("q_id")))
      .select(col("q_id"), col("n_id"), col("cos").as("approx_ip"), col("rank"))
      .orderBy("q_id", "rank")
  }

  val annSqSql: String =
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      ex AS (SELECT unnest(range(1, len(v) + 1)) AS d, unnest(v) AS x FROM v),
      st AS (SELECT d, min(x) AS mn, max(x) AS mx FROM ex GROUP BY d),
      stats AS (SELECT list(mn ORDER BY d) AS mins, list(mx ORDER BY d) AS maxs FROM st),
      dq AS (SELECT vec_id, list_transform(range(1, len(v) + 1), i ->
          mins[i] + (CASE WHEN maxs[i] - mins[i] = 0 THEN 0.0
                          ELSE floor(255.0 * (v[i] - mins[i]) / (maxs[i] - mins[i])) END
                     + 0.5) * (maxs[i] - mins[i]) / 255.0) AS dv
        FROM v, stats),
      scored AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id,
          list_reduce(list_transform(range(1, len(a.dv) + 1), i -> a.dv[i] * b.dv[i]),
            (p, q) -> p + q) AS approx_ip
        FROM dq a JOIN dq b ON a.vec_id % $QueryMod = 0 AND b.vec_id <> a.vec_id)
      SELECT q_id, n_id, approx_ip, rank FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY approx_ip DESC, n_id) AS rank
        FROM scored)
      WHERE rank <= $SqTopK ORDER BY q_id, rank"""

  private val MmrRounds = 3

  /** Maximal-marginal-relevance diversified re-ranking over the shared
    * brute-force shortlist: from each query's top-[[K]] candidates, pick
    * [[MmrRounds]] results greedily by `0.7·rel − 0.3·max_sim_to_picked`
    * — the RAG serving step that stops a result page being five copies
    * of the same near-duplicate. All work after the (session-shared,
    * CacheManager-deduped) shortlist is K-bounded per query: candidate
    * pairwise sims are K² small rows, each selection round is one join +
    * one per-query argmax over ≤K rows — at 100 TB the cost lives in the
    * ANN stage, and MMR adds a constant-factor tail.
    *
    * Determinism: cosines are the same left-associated IEEE fold on both
    * engines (bit-identical), so score comparisons and the (score desc,
    * id) argmax are EXACT — no tolerance anywhere in the selection path.
    */
  def annMmr(spark: SparkSession, dir: String): DataFrame = {
    val cand = annBrute(spark, dir).select("q_id", "n_id", "rank", "cos")
    val emb = Tables
      .t(spark, dir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(graft.operators.Dedup.dotFold(col("v"), col("v"))))
    val cv = cand
      .join(emb, col("n_id") === col("id"))
      .select(col("q_id"), col("n_id"), col("v"), col("nrm"))
    val pair = graft.Caches.track(
      cv
        .join(
          cv.select(
            col("q_id").as("q2"),
            col("n_id").as("b_id"),
            col("v").as("b_v"),
            col("nrm").as("b_nrm")),
          col("q_id") === col("q2") && col("n_id") =!= col("b_id"))
        .select(
          col("q_id"),
          col("n_id").as("a_id"),
          col("b_id"),
          (graft.operators.Dedup.dotFold(col("v"), col("b_v")) / (col("nrm") * col("b_nrm")))
            .as("sim"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // Round 1 is pure relevance; the brute rank already encodes the
    // (cos desc, id) order.
    var out = cand
      .filter(col("rank") === 1)
      .select(
        col("q_id"),
        col("n_id"),
        lit(1L).as("mmr_round"),
        col("cos").as("rel"),
        col("cos").as("mmr_score"))
    var selected = out.select(col("q_id"), col("n_id"))
    for (r <- 2 to MmrRounds) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("q_id")
        .orderBy(col("mmr_score").desc, col("n_id"))
      // max similarity of every candidate to the already-picked set:
      // pair rows whose b-side is picked, grouped on the a-side.
      val msim = pair
        .join(
          selected.select(col("q_id").as("sq"), col("n_id").as("s_id")),
          col("q_id") === col("sq") && col("b_id") === col("s_id"))
        .groupBy(col("q_id"), col("a_id").as("n_id"))
        .agg(max(col("sim")).as("msim"))
      val pick = cand
        .join(selected, Seq("q_id", "n_id"), "left_anti")
        .join(msim, Seq("q_id", "n_id"))
        .withColumn("mmr_score", lit(0.7) * col("cos") - lit(0.3) * col("msim"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(
          col("q_id"),
          col("n_id"),
          lit(r.toLong).as("mmr_round"),
          col("cos").as("rel"),
          col("mmr_score"))
      // Cut, don't stack: `out` is referenced THREE times per round (the
      // union here, the msim join, and the anti-join via `selected`), so
      // a lazy chain grows the logical plan 3^rounds — the Bfs/Brandes
      // round-7 lesson at its worst multiplicity.
      out = graft.operators.Lineage.cut(out.unionByName(pick))
      selected = out.select(col("q_id"), col("n_id"))
    }
    out.orderBy("q_id", "mmr_round")
  }

  val annMmrSql: String = {
    val c = cosExpr("q.v", "q.nrm", "x.v", "x.nrm")
    def round(r: Int) = {
      val prev = s"sel${r - 1}"
      s"""r$r AS (SELECT c.q_id, c.n_id, c.cos, max(p.sim) AS msim
          FROM cand c
          JOIN p ON p.q_id = c.q_id AND p.a_id = c.n_id
          JOIN $prev s ON s.q_id = p.q_id AND s.n_id = p.b_id
          WHERE NOT EXISTS (SELECT 1 FROM $prev s2
            WHERE s2.q_id = c.q_id AND s2.n_id = c.n_id)
          GROUP BY 1, 2, 3),
        pick$r AS (SELECT q_id, n_id, cos, 0.7 * cos - 0.3 * msim AS score
          FROM (SELECT *, row_number() OVER (PARTITION BY q_id
              ORDER BY 0.7 * cos - 0.3 * msim DESC, n_id) AS rn FROM r$r)
          WHERE rn = 1),
        sel$r AS (SELECT q_id, n_id FROM $prev
          UNION ALL SELECT q_id, n_id FROM pick$r)"""
    }
    val unions = (2 to MmrRounds)
      .map(r => s"SELECT q_id, n_id, $r AS mmr_round, cos AS rel, score AS mmr_score FROM pick$r")
      .mkString("\n      UNION ALL ")
    s"""WITH $vecCte,
      q AS (SELECT id, v, nrm FROM n WHERE id % $QueryMod = 0),
      cand AS (SELECT q_id, n_id, rank, cos FROM (
          SELECT q.id AS q_id, x.id AS n_id, $c AS cos,
            row_number() OVER (PARTITION BY q.id ORDER BY $c DESC, x.id) AS rank
          FROM q CROSS JOIN n x WHERE x.id <> q.id)
        WHERE rank <= $K),
      cv AS (SELECT c.q_id, c.n_id, n.v, n.nrm FROM cand c JOIN n ON n.id = c.n_id),
      p AS (SELECT a.q_id, a.n_id AS a_id, b.n_id AS b_id,
          ${dot("a.v", "b.v")} / (a.nrm * b.nrm) AS sim
        FROM cv a JOIN cv b ON a.q_id = b.q_id AND a.n_id <> b.n_id),
      sel1 AS (SELECT q_id, n_id FROM cand WHERE rank = 1),
      ${(2 to MmrRounds).map(round).mkString(",\n      ")}
      SELECT q_id, n_id, mmr_round::BIGINT AS mmr_round, rel, mmr_score FROM (
        SELECT q_id, n_id, 1 AS mmr_round, cos AS rel, cos AS mmr_score
        FROM cand WHERE rank = 1
      UNION ALL ${unions})
      ORDER BY q_id, mmr_round"""
  }

  /** Embedding-health audit: per-vector squared L2 norm in exact scaled
    * integers, corpus mean/σ, and a 3σ outlier flag — the degenerate-
    * embedding detector (collapsed or exploding vectors) an embedding
    * pipeline runs before trusting a batch for ANN or training.
    *
    * Exactness: a float×float product is EXACT in double (24-bit
    * mantissas), the per-vector sum is the same left-associated fold on
    * both engines (0.0-seeded), and `floor(norm_sq * 1000)` lands both
    * engines on the same BIGINT; corpus moments are then order-free
    * integer sums (`sumsq` stays under 2^52 here — corpora past ~1e12
    * rows should coarsen the scale quantum) and σ is `floor(sqrt(...))`,
    * an exactly-rounded op. Map-only scan + one broadcast one-row
    * moments frame.
    */
  def embOutlier(spark: SparkSession, dir: String): DataFrame = {
    val scaled = Tables
      .t(spark, dir, "embeddings")
      .select(
        col("vec_id"),
        floor(
          aggregate(
            transform(col("embedding"), x => x.cast("double") * x.cast("double")),
            lit(0.0),
            (acc, x) => acc + x) * 1000).cast("long").as("nsq"))
    val moments = scaled.agg(
      count(lit(1)).as("n"),
      sum(col("nsq")).as("s"),
      sum(col("nsq") * col("nsq")).as("ss"))
    scaled
      .crossJoin(broadcast(moments))
      .withColumn("mean_nsq", expr("s div n"))
      .withColumn("std_nsq", floor(sqrt(expr("(ss div n) - (s div n) * (s div n)"))).cast("long"))
      .withColumn("outlier", abs(col("nsq") - col("mean_nsq")) > col("std_nsq") * 3)
      .select("vec_id", "nsq", "mean_nsq", "std_nsq", "outlier")
      .orderBy("vec_id")
  }

  val embOutlierSql: String =
    """WITH s AS (SELECT vec_id,
        floor(list_reduce(list_prepend(0.0,
          list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)), (a, b) -> a + b) * 1000)::BIGINT AS nsq
      FROM embeddings),
      m AS (SELECT count(*)::BIGINT AS n, sum(nsq)::BIGINT AS s,
          sum(nsq * nsq)::BIGINT AS ss FROM s)
      SELECT vec_id, nsq,
        (m.s // m.n)::BIGINT AS mean_nsq,
        floor(sqrt(((m.ss // m.n) - (m.s // m.n) * (m.s // m.n))::DOUBLE))::BIGINT AS std_nsq,
        abs(nsq - m.s // m.n) > floor(sqrt(((m.ss // m.n) - (m.s // m.n) * (m.s // m.n))::DOUBLE))::BIGINT * 3 AS outlier
      FROM s, m ORDER BY vec_id"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_mmr" -> annMmr _,
    "emb_outlier" -> embOutlier _,
    "ann_sq" -> annSq _,
    "ann_range" -> annRange _,
    "emb_pca" -> embPca _,
    "emb_audit" -> embAudit _,
    "emb_mrl" -> embMrl _,
    "ann_pq" -> annPq _,
    "ann_rerank" -> annRerank _,
    "emb_kmeans" -> embKmeans _,
    "dd_semantic" -> ddSemantic _,
    "ann_brute" -> annBrute _,
    "ann_multiprobe" -> annMultiprobe _,
    "emb_dimstats" -> embDimstats _,
    "emb_knn" -> embKnn _,
    "ann_hamming" -> annHamming _,
    "ann_hamrecall" -> annHamrecall _,
    "ann_ivf" -> annIvf _,
    "ann_filtered" -> annFiltered _,
    "ann_ivfpq" -> annIvfPq _,
    "ann_knngraph" -> annKnnGraph _,
    "emb_centroid" -> embCentroid _,
    "emb_quant" -> embQuant _,
    "emb_pq" -> embPq _,
    "ann_recall" -> annRecall _,
    "ann_rrf" -> annRrf _,
    "ann_cellstats" -> annCellstats _)

  val oracles: Map[String, String] = Map(
    "ann_mmr" -> annMmrSql,
    "emb_outlier" -> embOutlierSql,
    "ann_sq" -> annSqSql,
    "ann_range" -> annRangeSql,
    "ann_ivfpq" -> annIvfPqSql,
    "ann_knngraph" -> annKnnGraphSql,
    "emb_pca" -> embPcaSql,
    "emb_audit" -> embAuditSql,
    "emb_mrl" -> embMrlSql,
    "ann_pq" -> annPqSql,
    "ann_rerank" -> annRerankSql,
    "emb_kmeans" -> embKmeansSql,
    "dd_semantic" -> ddSemanticSql,
    "ann_brute" -> annBruteSql,
    "ann_multiprobe" -> annMultiprobeSql,
    "emb_dimstats" -> embDimstatsSql,
    "emb_knn" -> embKnnSql,
    "ann_hamming" -> annHammingSql,
    "ann_hamrecall" -> annHamrecallSql,
    "ann_ivf" -> annIvfSql,
    "ann_filtered" -> annFilteredSql,
    "emb_centroid" -> embCentroidSql,
    "emb_quant" -> embQuantSql,
    "emb_pq" -> embPqSql,
    "ann_recall" -> annRecallSql,
    "ann_rrf" -> annRrfSql,
    "ann_cellstats" -> annCellstatsSql)
}
