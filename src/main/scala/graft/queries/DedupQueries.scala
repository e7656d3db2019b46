package graft.queries

import graft.operators.Dedup
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dedup queries over `documents`/`embeddings`, each with a DuckDB oracle
  * that replays the md5-based signatures and band keys bit-for-bit —
  * including the LSH candidate generation, so recall behavior is verified,
  * not just the final Jaccard filter.
  */
object DedupQueries {

  private val K = 3 // shingle width
  private val JaccardMin = 0.5
  private val NumHashes = 12
  private val Bands = 4
  private val MaxHamming = 3
  private val CosMin = 0.45

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "documents")

  /** Materialize the shared hashed-shingle corpus (identical canonical
    * plan to the one every shingle-based operator builds, so the
    * CacheManager serves them all from this entry). See SparkEntry.warm.
    */
  def warm(spark: SparkSession, dir: String): Unit = {
    Dedup.shingledCorpus(docs(spark, dir), "doc_id", "text", K).count()
    ()
  }

  def ddExact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exact(docs(spark, dir), "doc_id", "text").orderBy("keep_id")

  def ddNgram(spark: SparkSession, dir: String): DataFrame =
    Dedup
      .ngramJaccardPairs(docs(spark, dir), "doc_id", "text", "lang", K, JaccardMin)
      .orderBy("a_id", "b_id")

  def ddMinhash(spark: SparkSession, dir: String): DataFrame =
    Dedup
      .minhashLsh(docs(spark, dir), "doc_id", "text", K, NumHashes, Bands, JaccardMin)
      .orderBy("a_id", "b_id")

  def ddSimhash(spark: SparkSession, dir: String): DataFrame =
    Dedup
      .simhashPairs(docs(spark, dir), "doc_id", "text", K, MaxHamming)
      .orderBy("a_id", "b_id")

  def ddEmbcos(spark: SparkSession, dir: String): DataFrame =
    Dedup
      .embeddingCosinePairs(Tables.t(spark, dir, "embeddings"), "vec_id", "embedding", CosMin)
      .orderBy("a_id", "b_id")

  /** Incremental dedup: docs with id >= [[IncrSplit]] arrive as a new batch
    * against the ledger of already-ingested docs (id < split).
    */
  private val IncrSplit = 250

  def ddIncremental(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    Dedup
      .incrementalNew(
        d.filter(col("doc_id") < IncrSplit),
        d.filter(col("doc_id") >= IncrSplit),
        "doc_id",
        "text")
      .orderBy("keep_id")
  }

  /** Deterministic train/val/test split by a content-independent md5 bucket
    * of the document id — the held-out-split assignment a training pipeline
    * derives, reproducible on any engine/run (no rand()). Buckets
    * 0..[[TrainBuckets]]-1 train, [[TrainBuckets]] val, rest test; the SQL
    * twins below derive from the same constants so the Spark rule and both
    * oracles cannot drift apart.
    */
  private val TrainBuckets = 8

  def dsSplit(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(
        col("doc_id"),
        pmod(
          graft.functions.Hashing.md5Long60(concat(lit("split|"), col("doc_id").cast("string"))),
          lit(10L)).as("bucket"))
      .withColumn(
        "split",
        when(col("bucket") < TrainBuckets, "train")
          .when(col("bucket") === TrainBuckets, "val")
          .otherwise("test"))
      .orderBy("doc_id")

  /** Token-budget apportionment across domains by the largest-remainder
    * (Hamilton) method: every domain's exact quota is `budget·n/N`; it
    * gets the integer floor, and the leftover seats go to the largest
    * remainders (ties to the smaller lang, pinned). The method is the
    * standard way a mixture sampler turns fractional domain weights into
    * an EXACT integer epoch plan — allocations sum to the budget by
    * construction (Σfloor + #leftovers), with no float weights anywhere:
    * base is integer division, the remainder is an exact modulus, and the
    * leftover count is the budget minus the base sum. Plan shape: one
    * domain aggregate, two one-row scalar attaches (total, leftover
    * count), and a rank window over the DOMAIN frame — bounded by the
    * domain vocabulary at any corpus scale, never a corpus funnel.
    */
  private val ApportionBudget = 1000000L

  def dsApportion(spark: SparkSession, dir: String): DataFrame =
    apportionOver(docs(spark, dir))

  /** The apportionment behind [[dsApportion]], over ANY frame with a
    * `lang` domain column — factored so ScaleProbe's `apportion_domains`
    * row measures exactly the shipped plan: one corpus aggregate, then
    * domain-frame-bounded work only, so the row must stay flat-ish
    * (scan-linear, never pair- or window-quadratic) as docs inflate.
    */
  private[graft] def apportionOver(d: DataFrame): DataFrame = {
    // Both multi-consumer frames persist (the q115 CTE-reuse discipline):
    // `counts` feeds the total AND the quota rows, `based` feeds the
    // leftover count AND the final select — unpersisted, the corpus
    // aggregate would re-run per consumer.
    val counts = graft.Caches.track(
      d
        .groupBy("lang")
        .agg(count(lit(1)).as("n"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val total = counts.agg(sum(col("n")).as("nn"))
    val based = graft.Caches.track(
      counts
        .crossJoin(total)
        .withColumn("base", expr(s"($ApportionBudget * n) DIV nn"))
        .withColumn("rem", pmod(lit(ApportionBudget) * col("n"), col("nn")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val leftovers = based.agg((lit(ApportionBudget) - sum(col("base"))).as("k"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("rem").desc, col("lang"))
    based
      .crossJoin(leftovers)
      .withColumn("rk", row_number().over(w))
      .select(
        col("lang"),
        col("n"),
        col("base"),
        col("rem"),
        (col("base") + when(col("rk") <= col("k"), 1L).otherwise(0L)).as("alloc"))
      .orderBy("lang")
  }

  val dsApportionSql: String =
    s"""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
      t AS (SELECT sum(n)::BIGINT AS nn FROM c),
      b AS (SELECT lang, n, (($ApportionBudget * n) // nn)::BIGINT AS base,
          (($ApportionBudget * n) % nn)::BIGINT AS rem FROM c, t),
      k AS (SELECT ($ApportionBudget - sum(base))::BIGINT AS k FROM b)
      SELECT lang, n, base, rem,
        (base + CASE WHEN row_number() OVER (ORDER BY rem DESC, lang) <= k
                THEN 1 ELSE 0 END)::BIGINT AS alloc
      FROM b, k ORDER BY lang"""

  /** dd_winnow knobs: fingerprints in more than [[WinnowDfCap]] docs are
    * template noise and are dropped before the bucket join (the MOSS
    * "ignore matches in many submissions" rule — and the cap²/2
    * comparison bound at scale); pairs need [[WinnowMinShared]] shared
    * fingerprints to report (sf0.01: the 24 true near-dup pairs share
    * ≥8, unrelated pairs ≤2).
    */
  private val WinnowDfCap = 64
  private val WinnowMinShared = 5

  /** Winnowing-fingerprint near-dup detection (Schleimer et al., MOSS —
    * SIGMOD 2003): the guarantee-bearing LSH alternative to MinHash
    * banding (any shared run of ≥ w+k−1 tokens shares a selected
    * fingerprint — banding only matches with probability). Docs sharing
    * ≥ [[WinnowMinShared]] selected fingerprints pair up via ONE
    * equi-join on the fingerprint value; the df cap bounds per-bucket
    * pair volume exactly like er_metablock's purge. Output per pair:
    * shared-fingerprint count, both docs' full fingerprint-set sizes,
    * and the containment ratio shared/min(n) — denominators count the
    * FULL set (pre-cap), so the ratio reports true coverage even when
    * hot fingerprints were dropped from matching.
    */
  def ddWinnow(spark: SparkSession, dir: String): DataFrame =
    ddWinnowOver(docs(spark, dir))

  /** The winnow-pair pipeline behind [[ddWinnow]], over ANY
    * `(doc_id, text)` frame — factored so ScaleProbe's `winnow_pairs`
    * row measures exactly the shipped plan (df-capped bucket join must
    * stay corpus-linear). `dfCap` is overridable ONLY so the probe can
    * scale it with its replica multiplicity: the inflated corpus gives
    * every doc ~factor near-copies, so at factor > cap the production
    * cap (correctly) purges every family to zero pairs and the join
    * volume the probe exists to measure never happens.
    */
  private[graft] def ddWinnowOver(d: DataFrame, dfCap: Int = WinnowDfCap): DataFrame = {
    val fps = graft.Caches.track(
      TextQueries
        .winnowFingerprints(d)
        .select(col("doc_id"), col("fp"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val keep = fps
      .groupBy("fp")
      .agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, dfCap))
      .select("fp")
    val m = fps.join(keep, Seq("fp"))
    val sizes = fps.groupBy("doc_id").agg(count(lit(1)).as("nfp"))
    m.as("a")
      .join(m.as("b"), col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= WinnowMinShared)
      .join(sizes.select(col("doc_id").as("a_id"), col("nfp").as("n_a")), Seq("a_id"))
      .join(sizes.select(col("doc_id").as("b_id"), col("nfp").as("n_b")), Seq("b_id"))
      .select(
        col("a_id"),
        col("b_id"),
        col("shared"),
        col("n_a"),
        col("n_b"),
        (col("shared").cast("double") / least(col("n_a"), col("n_b"))).as("containment"))
      .orderBy("a_id", "b_id")
  }

  lazy val ddWinnowSql: String =
    s"""WITH w AS (${TextQueries.winnowCoreSql}),
      f AS (SELECT DISTINCT doc_id, fp FROM w),
      keep AS (SELECT fp FROM (SELECT fp, count(*) AS df FROM f GROUP BY 1)
        WHERE df BETWEEN 2 AND $WinnowDfCap),
      m AS (SELECT f.doc_id, f.fp FROM f JOIN keep USING (fp)),
      sz AS (SELECT doc_id, count(*) AS nfp FROM f GROUP BY 1),
      p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS shared
        FROM m a JOIN m b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT p.a_id, p.b_id, p.shared, sa.nfp AS n_a, sb.nfp AS n_b,
        p.shared::DOUBLE / least(sa.nfp, sb.nfp) AS containment
      FROM p JOIN sz sa ON sa.doc_id = p.a_id JOIN sz sb ON sb.doc_id = p.b_id
      WHERE p.shared >= $WinnowMinShared
      ORDER BY p.a_id, p.b_id"""

  /** Sketch-based SOURCE-OVERLAP triage — before paying for exact
    * cross-source dedup, estimate every source pair's vocabulary overlap
    * from tiny mergeable sketches (the [[graft.operators.Anf]] register
    * discipline): each source folds its distinct tokens into 16 HLL
    * registers (md5-seeded bucket + lowest-set-bit rank — integer,
    * order-free max-merge), pair union = elementwise greatest, and
    * inclusion–exclusion `est(A) + est(B) − est(A∪B)` prices the
    * intersection. The register build is ONE map-side-combined aggregate
    * over (source, token) rows; the pair stage works on a
    * |sources|-row frame — at 100 TB the sources table has thousands of
    * rows where the exact overlap join would touch the corpus. Estimates
    * are fixed-order chains of exact power-of-two divisions, so even the
    * float columns hash-match.
    */
  def dsOverlap(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Anf.{Registers, RhoBits}
    val toks = docs(spark, dir)
      .select(col("source"), explode(array_distinct(split(col("text"), " "))).as("tok"))
      .distinct()
    val h = graft.functions.Hashing.md5Long60(concat(lit("ovl|"), col("tok")))
    val bucket = pmod(h, lit(Registers.toLong))
    val bits = array((0 until RhoBits).map(i =>
      pmod(shiftrightunsigned(shiftrightunsigned(h, 4), i), lit(2L))): _*)
    val pos = array_position(bits, 1L)
    val rho = when(pos === 0L, lit((RhoBits + 1).toLong)).otherwise(pos)
    val regs = toks
      .select(col("source"), bucket.as("bucket"), rho.as("rho"))
      .groupBy("source")
      .agg(
        coalesce(max(when(col("bucket") === 0, col("rho"))), lit(0L)).as("r0"),
        (1 until Registers).map(j =>
          coalesce(max(when(col("bucket") === j, col("rho"))), lit(0L)).as(s"r$j")): _*)
    def est(prefix: String): Column = {
      val denom = (0 until Registers)
        .map(j => expr(s"1.0 / cast(shiftleft(1L, cast($prefix$j as int)) as double)"))
        .reduce(_ + _)
      lit(0.673) * lit(256.0) / denom
    }
    def estUnion: Column = {
      val denom = (0 until Registers)
        .map(j => expr(s"1.0 / cast(shiftleft(1L, cast(greatest(a$j, b$j) as int)) as double)"))
        .reduce(_ + _)
      lit(0.673) * lit(256.0) / denom
    }
    val a = regs.select(Seq(col("source").as("src_a")) ++
      (0 until Registers).map(j => col(s"r$j").as(s"a$j")): _*)
    val b = regs.select(Seq(col("source").as("src_b")) ++
      (0 until Registers).map(j => col(s"r$j").as(s"b$j")): _*)
    a.join(b, col("src_a") < col("src_b"))
      .select(
        col("src_a"),
        col("src_b"),
        est("a").as("est_a"),
        est("b").as("est_b"),
        estUnion.as("est_union"))
      .select(
        col("src_a"),
        col("src_b"),
        col("est_a"),
        col("est_b"),
        col("est_union"),
        (col("est_a") + col("est_b") - col("est_union")).as("overlap_est"))
      .orderBy("src_a", "src_b")
  }

  lazy val dsOverlapSql: String = {
    import graft.operators.Anf.{Registers, RhoBits}
    val h = graft.functions.Hashing.sqlMd5Long60Duck("'ovl|' || tok")
    val regCols = (0 until Registers)
      .map(j => s"coalesce(max(CASE WHEN bucket = $j THEN rho END), 0) AS r$j")
      .mkString(", ")
    def estOf(f: Int => String) = (0 until Registers)
      .map(j => s"1.0 / (1::BIGINT << ${f(j)})::DOUBLE")
      .mkString(" + ")
    s"""WITH toks AS (SELECT DISTINCT source, tok FROM (
        SELECT source, unnest(list_distinct(string_split(text, ' '))) AS tok FROM documents)),
      i1 AS (SELECT source, ($h) % $Registers AS bucket, ($h) // $Registers AS rest, tok FROM toks),
      i2 AS (SELECT source, bucket,
          coalesce(list_position(list_transform(range(0, $RhoBits),
            i -> (rest // (1::BIGINT << i)) % 2), 1), ${RhoBits + 1})::BIGINT AS rho
        FROM i1),
      regs AS (SELECT source, $regCols FROM i2 GROUP BY source),
      p AS (SELECT a.source AS src_a, b.source AS src_b,
          ${(0 until Registers).map(j => s"a.r$j AS a$j, b.r$j AS b$j").mkString(", ")}
        FROM regs a JOIN regs b ON a.source < b.source),
      e AS (SELECT src_a, src_b,
          0.673 * 256.0 / (${estOf(j => s"a$j")}) AS est_a,
          0.673 * 256.0 / (${estOf(j => s"b$j")}) AS est_b,
          0.673 * 256.0 / (${estOf(j => s"greatest(a$j, b$j)")}) AS est_union
        FROM p)
      SELECT src_a, src_b, est_a, est_b, est_union,
        est_a + est_b - est_union AS overlap_est
      FROM e ORDER BY src_a, src_b"""
  }

  /** Freshness half-life anchor: ages are whole weeks before this date
    * (the events table spans the month before it).
    */
  private val DecayAnchor = "2024-02-01"

  /** Recency-weighted source mass — the freshness signal a mixture
    * sampler folds into its source weights (stale crawls contribute less;
    * news-like sources decay fast): each event's weight halves per week
    * of age. EVERY step is exact or order-free: the (source, week)
    * aggregate sums value as DECIMAL (exact); the half-life weight is
    * `1 / 2^weeks` — an integer shift, so the double is a power of two
    * and the per-week product `mass · w` is pure exponent arithmetic (no
    * rounding); the final per-source fold runs in week order over the
    * handful of week rows (the embCentroid determinism device). No
    * transcendental `pow`, no order-dependent float sum — bit-identical
    * on both engines. Plan: one map-side-combined (source, week)
    * aggregate, then a source-keyed fold over week rows — week
    * cardinality is calendar-bounded at any corpus scale.
    */
  def dsDecay(spark: SparkSession, dir: String): DataFrame = {
    // Clamped to [0, 62]: a post-anchor event would otherwise hand
    // shiftleft a NEGATIVE count (Spark wraps the shift mod 64 →
    // 1L<<63 = Long.MIN — a silently negative mass; DuckDB yields 0),
    // and ages past 62 weeks overflow the long. Inside the clamp the
    // weight is exact; at the edges it saturates (0-age for future
    // events, ~2^-62 ≈ 0 for ancient ones) instead of corrupting.
    val wk = least(
      greatest(
        floor(datediff(lit(DecayAnchor).cast("date"), col("ts").cast("date")) / 7).cast("long"),
        lit(0L)),
      lit(62L))
    val byWeek = Tables
      .events(spark, dir)
      .groupBy(col("event_type"), wk.as("wk"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("mass_dec"))
      .withColumn(
        "wm",
        col("mass_dec").cast("double") /
          expr("cast(shiftleft(1L, cast(wk as int)) as double)"))
    byWeek
      .groupBy("event_type")
      .agg(
        sum(col("n")).as("n_events"),
        sum(col("mass_dec")).cast("double").as("raw_mass"),
        sort_array(collect_list(struct(col("wk"), col("wm")))).as("lst"))
      .select(
        col("event_type"),
        col("n_events"),
        col("raw_mass"),
        aggregate(col("lst"), lit(0.0), (a, e) => a + e.getField("wm")).as("decayed_mass"))
      .withColumn("effective_weight", col("decayed_mass") / col("raw_mass"))
      .orderBy("event_type")
  }

  val dsDecaySql: String =
    s"""WITH s AS (SELECT event_type,
          least(greatest((date_diff('day', ts::DATE, DATE '$DecayAnchor') // 7)::BIGINT, 0), 62) AS wk,
          count(*) AS n, sum(CAST(value AS DECIMAL(18,2))) AS mass_dec
        FROM events GROUP BY 1, 2),
      w AS (SELECT event_type, wk, n, mass_dec,
          mass_dec::DOUBLE / (1::BIGINT << wk)::DOUBLE AS wm FROM s),
      g AS (SELECT event_type, sum(n)::BIGINT AS n_events,
          sum(mass_dec)::DOUBLE AS raw_mass, list(wm ORDER BY wk) AS lst
        FROM w GROUP BY 1)
      SELECT event_type, n_events, raw_mass,
        list_reduce(list_prepend(0.0, lst), (a, b) -> a + b) AS decayed_mass,
        list_reduce(list_prepend(0.0, lst), (a, b) -> a + b) / raw_mass AS effective_weight
      FROM g ORDER BY event_type"""

  /** STRATIFIED split with EXACT per-stratum proportions: within each
    * domain (lang), docs take a deterministic md5 shuffle order and the
    * first ceil(10%) become `val`, the next ceil(10%) `test`, the rest
    * `train` — the held-out construction used when the iid-hash
    * [[dsSplit]] would leave small strata under-represented (hash
    * bucketing only hits 10% in expectation; a 40-doc stratum can easily
    * land 2 or 7 val docs, this lands exactly 4). Rank + stratum size via
    * one bounded-partition window (domains are a bounded set, same
    * documented shape as [[dsTokenbudget]]); boundaries are exact integer
    * ceilings — no float proportion ever compares.
    */
  private val StratPct = 10L

  def dsStratified(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang")
      .orderBy("k", "doc_id")
    val wn = org.apache.spark.sql.expressions.Window.partitionBy("lang")
    docs(spark, dir)
      .select(
        col("doc_id"),
        col("lang"),
        graft.functions.Hashing
          .md5Long60(concat(lit("strat|"), col("doc_id").cast("string")))
          .as("k"))
      .withColumn("strat_rank", row_number().over(w).cast("long"))
      .withColumn("n_stratum", count(lit(1)).over(wn))
      .withColumn("n_holdout", ceil(col("n_stratum") * StratPct / lit(100)).cast("long"))
      .withColumn(
        "split",
        when(col("strat_rank") <= col("n_holdout"), "val")
          .when(col("strat_rank") <= col("n_holdout") * 2, "test")
          .otherwise("train"))
      .select("doc_id", "lang", "strat_rank", "n_stratum", "split")
      .orderBy("doc_id")
  }

  val dsStratifiedSql: String = {
    val k = graft.functions.Hashing.sqlMd5Long60Duck("'strat|' || doc_id::VARCHAR")
    s"""WITH r AS (SELECT doc_id, lang,
        row_number() OVER (PARTITION BY lang ORDER BY $k, doc_id) AS strat_rank,
        count(*) OVER (PARTITION BY lang) AS n_stratum
      FROM documents),
      b AS (SELECT doc_id, lang, strat_rank, n_stratum,
        ceil(n_stratum * $StratPct / 100)::BIGINT AS n_holdout FROM r)
      SELECT doc_id, lang, strat_rank, n_stratum,
        CASE WHEN strat_rank <= n_holdout THEN 'val'
             WHEN strat_rank <= n_holdout * 2 THEN 'test'
             ELSE 'train' END AS split
      FROM b ORDER BY doc_id"""
  }

  /** Deterministic class REBALANCING: undersample every domain (lang) to
    * the size of the smallest one — the classifier-training counterpart
    * of [[dsStratified]] (that one preserves proportions; this one
    * equalizes them). Selection within a domain is the md5 shuffle rank,
    * so the kept subset is deterministic and unbiased; the global minimum
    * arrives as a broadcast one-row aggregate, never a driver pull.
    */
  def dsBalance(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang")
      .orderBy("k", "doc_id")
    val ranked = docs(spark, dir)
      .select(
        col("doc_id"),
        col("lang"),
        graft.functions.Hashing
          .md5Long60(concat(lit("bal|"), col("doc_id").cast("string")))
          .as("k"))
      .withColumn("balance_rank", row_number().over(w).cast("long"))
    val minN = ranked
      .groupBy("lang")
      .agg(count(lit(1)).as("n"))
      .agg(min(col("n")).as("target_per_class"))
    ranked
      .crossJoin(broadcast(minN))
      .filter(col("balance_rank") <= col("target_per_class"))
      .select("doc_id", "lang", "balance_rank", "target_per_class")
      .orderBy("doc_id")
  }

  val dsBalanceSql: String = {
    val k = graft.functions.Hashing.sqlMd5Long60Duck("'bal|' || doc_id::VARCHAR")
    s"""WITH r AS (SELECT doc_id, lang,
        row_number() OVER (PARTITION BY lang ORDER BY $k, doc_id) AS balance_rank
      FROM documents),
      m AS (SELECT min(n)::BIGINT AS target_per_class
        FROM (SELECT count(*) AS n FROM documents GROUP BY lang))
      SELECT doc_id, lang, balance_rank, m.target_per_class
      FROM r, m WHERE balance_rank <= m.target_per_class ORDER BY doc_id"""
  }

  private val splitBucketSql =
    s"(${graft.functions.Hashing.sqlMd5Long60Duck("'split|' || doc_id::VARCHAR")}) % 10"

  private def splitCaseSql(b: String) =
    s"CASE WHEN $b < $TrainBuckets THEN 'train' WHEN $b = $TrainBuckets THEN 'val' ELSE 'test' END"

  private val SrpDims = 64
  private val SrpBits = 16
  private val SrpBands = 4

  def ddSrp(spark: SparkSession, dir: String): DataFrame =
    Dedup
      .srpLshPairs(
        Tables.t(spark, dir, "embeddings"),
        "vec_id",
        "embedding",
        SrpDims,
        SrpBits,
        SrpBands,
        CosMin)
      .orderBy("a_id", "b_id")

  // ---- DuckDB oracle fragments --------------------------------------------

  private val norm = raw"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"
  private val toks = raw"list_filter(string_split_regex($norm, '\s+'), t -> t <> '')"
  private val tokenHashes =
    s"list_transform($toks, t -> ${graft.functions.Hashing.sqlMd5Long60Duck("t")})"

  /** Hashed k-shingle list over a token-hash list column `th` — the DuckDB
    * mirror of [[Dedup.hashedShingleSet]] for an arbitrary width.
    */
  private def shingleOfThK(k: Int) =
    s"CASE WHEN len(th) >= $k THEN list_distinct(list_transform(range(1, len(th) - ${k - 2}), i -> ${Dedup
        .sqlShingleHashDuck(s"list_slice(th, i, i + ${k - 1})")})) ELSE [${Dedup.sqlShingleHashDuck("th")}] END"

  private val shingleOfTh = shingleOfThK(K)

  /** `s(doc_id, lang, sh)` — the per-doc HASHED shingle sets (same
    * md5-per-token + position-sensitive combine as the Spark side).
    */
  private val shingleCte =
    s"s AS (SELECT doc_id, lang, $shingleOfTh AS sh FROM (SELECT doc_id, lang, $tokenHashes AS th FROM documents))"

  private val sqlJac =
    "len(list_intersect(sa.sh, sb.sh))::DOUBLE / len(list_distinct(list_concat(sa.sh, sb.sh)))"

  val ddExactSql: String =
    s"""SELECT md5($norm) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
      FROM documents GROUP BY 1 ORDER BY keep_id"""

  val ddNgramSql: String =
    s"""WITH $shingleCte
      SELECT * FROM (
        SELECT sa.doc_id AS a_id, sb.doc_id AS b_id, $sqlJac AS jac
        FROM s sa JOIN s sb ON sa.doc_id < sb.doc_id AND sa.lang = sb.lang)
      WHERE jac >= $JaccardMin ORDER BY a_id, b_id"""

  private val SweepBase = 0.25
  private val SweepT100 = 25 to 90 by 5

  /** Near-dup threshold calibration sweep: pair counts at a ladder of
    * Jaccard thresholds (0.25..0.90 step 0.05) from ONE candidate
    * generation pass at the lowest rung — the curve a dedup pipeline reads
    * to pick its production threshold before committing to a full run.
    * Every rung reuses the same PPJoin pair frame (lossless at the base
    * threshold, so every rung's pair set is exact); per-pair rung
    * membership is a literal-array filter, no re-join per threshold.
    *
    * Boundary exactness: `jac` is one IEEE division of exact integer
    * counts and each rung is `t/100.0` — both correctly rounded to the
    * identical double on either engine, so `jac >= t` never flips across
    * engines (no transcendental, no accumulated float).
    */
  def ddThreshold(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = Dedup.ngramJaccardPairs(docs(spark, dir), "doc_id", "text", "lang", K, SweepBase)
    val rungs = array(SweepT100.map(t => lit(t.toLong)): _*)
    val hits = pairs
      .select(explode(filter(rungs, t => col("jac") >= t.cast("double") / 100.0)).as("t100"))
      .groupBy("t100")
      .agg(count(lit(1)).as("n_pairs"))
    SweepT100
      .map(_.toLong)
      .toDF("t100")
      .join(hits, Seq("t100"), "left")
      .select(col("t100"), coalesce(col("n_pairs"), lit(0L)).as("n_pairs"))
      .orderBy("t100")
  }

  val ddThresholdSql: String =
    s"""WITH $shingleCte,
      p AS (SELECT * FROM (
          SELECT sa.doc_id AS a_id, sb.doc_id AS b_id, $sqlJac AS jac
          FROM s sa JOIN s sb ON sa.doc_id < sb.doc_id AND sa.lang = sb.lang)
        WHERE jac >= $SweepBase),
      spine AS (SELECT (25 + 5 * i)::BIGINT AS t100 FROM range(0, ${SweepT100.size}) r(i)),
      hits AS (SELECT t100, count(*) AS n FROM spine JOIN p ON p.jac >= spine.t100 / 100.0
               GROUP BY t100)
      SELECT s.t100, coalesce(hits.n, 0)::BIGINT AS n_pairs
      FROM spine s LEFT JOIN hits ON s.t100 = hits.t100 ORDER BY s.t100"""

  /** The shingle → signature → banded CTE chain (`s`, `sig`, `banded`),
    * DuckDB form, with the exact permutation family the Spark side uses
    * (same seeded coefficients): split the 60-bit hash into 30-bit
    * halves, multiply-add, mod 2^61-1 — int64-safe on both engines.
    * Shared by the batch LSH oracle and the streaming near-dup oracle
    * (graft-visible so StreamingQueries replays the SAME bucketing).
    */
  private[graft] val sqlBandedCtes: String = {
    val rows = NumHashes / Bands
    val minExprs = Dedup
      .minhashCoeffs(NumHashes)
      .map { case (a1, a2, b) =>
        s"list_min(list_transform(sh, x -> ($a1 * (x // 1073741824) + $a2 * (x % 1073741824) + $b) % ${Dedup.MinhashPrime}))"
      }
      .mkString("[", ", ", "]")
    val bandCols = (0 until rows).map(r => s"sig[$rows * b + ${r + 1}] AS s$r").mkString(", ")
    s"""$shingleCte,
      sig AS (SELECT doc_id, $minExprs AS sig FROM s),
      banded AS (SELECT doc_id, b, $bandCols FROM sig, range(0, $Bands) t(b))"""
  }

  /** `a.sN = bb.sN` equality over one band's signature rows. */
  private[graft] val sqlBandEq: String =
    (0 until (NumHashes / Bands)).map(r => s"a.s$r = bb.s$r").mkString(" AND ")

  /** The (k, numHashes, bands) the whole LSH family is declared at. */
  private[graft] val LshParams: (Int, Int, Int) = (K, NumHashes, Bands)

  val ddMinhashSql: String =
    s"""WITH $sqlBandedCtes,
      cand AS (SELECT DISTINCT a.doc_id AS a_id, bb.doc_id AS b_id
        FROM banded a JOIN banded bb ON a.b = bb.b AND $sqlBandEq AND a.doc_id < bb.doc_id)
      SELECT * FROM (
        SELECT a_id, b_id, $sqlJac AS jac
        FROM cand JOIN s sa ON sa.doc_id = a_id JOIN s sb ON sb.doc_id = b_id)
      WHERE jac >= $JaccardMin ORDER BY a_id, b_id"""

  /** Incremental NEAR-dup ([[Dedup.minhashLshAgainstLedger]]): the batch
    * of docs with id >= [[IncrSplit]] arrives against the MinHash-LSH
    * index of the already-ingested ledger (id < split) — the fuzzy
    * sibling of `dd_incremental`'s exact-hash ledger check. Only
    * new×ledger bands join; ledger self-pairs are never recomputed.
    */
  def ddNearinc(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    Dedup
      .minhashLshAgainstLedger(
        d.filter(col("doc_id") < IncrSplit),
        d.filter(col("doc_id") >= IncrSplit),
        "doc_id",
        "text",
        K,
        NumHashes,
        Bands,
        JaccardMin)
      .orderBy("new_id", "old_id")
  }

  val ddNearincSql: String = {
    val rows = NumHashes / Bands
    val minExprs = Dedup
      .minhashCoeffs(NumHashes)
      .map { case (a1, a2, b) =>
        s"list_min(list_transform(sh, x -> ($a1 * (x // 1073741824) + $a2 * (x % 1073741824) + $b) % ${Dedup.MinhashPrime}))"
      }
      .mkString("[", ", ", "]")
    val bandEq = (0 until rows).map(r => s"n.s$r = o.s$r").mkString(" AND ")
    val bandCols = (0 until rows).map(r => s"sig[$rows * b + ${r + 1}] AS s$r").mkString(", ")
    s"""WITH $shingleCte,
      sig AS (SELECT doc_id, $minExprs AS sig FROM s),
      banded AS (SELECT doc_id, b, $bandCols FROM sig, range(0, $Bands) t(b)),
      cand AS (SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
        FROM banded n JOIN banded o ON n.b = o.b AND $bandEq
        WHERE n.doc_id >= $IncrSplit AND o.doc_id < $IncrSplit)
      SELECT * FROM (
        SELECT new_id, old_id, $sqlJac AS jac
        FROM cand JOIN s sa ON sa.doc_id = new_id JOIN s sb ON sb.doc_id = old_id)
      WHERE jac >= $JaccardMin ORDER BY new_id, old_id"""
  }

  /** Per-document n-gram NOVELTY against the training partition — the
    * memorization/overlap audit run on a held-out set before using it for
    * eval: for each doc in the eval fifth (doc_id % 5 = 0), the fraction
    * of its hashed 3-shingles NOT present anywhere in the train corpus.
    * Differs from `dd_contaminate` (boolean any-hit exclusion at width 4)
    * in emitting the continuous per-doc coverage a leakage dashboard
    * ranks on. Shape at scale: the train ledger is a distinct-shingle
    * hash table; eval shingles semi-join it co-partitioned on the shingle
    * key — both sides shuffle once on `g`, no corpus self-join, and the
    * novelty ratio is one exact integer division.
    */
  private val NovEvalMod = 5

  def ddNovelty(spark: SparkSession, dir: String): DataFrame = {
    val sh = Dedup.shingledCorpus(docs(spark, dir), "doc_id", "text", K)
    val evalS = sh.filter(col("id") % NovEvalMod === 0)
    val ledger = sh
      .filter(col("id") % NovEvalMod =!= 0)
      .select(explode(col("sh")).as("g"))
      .distinct()
    val known = evalS
      .select(col("id"), explode(col("sh")).as("g"))
      .join(ledger, Seq("g"), "left_semi")
      .groupBy("id")
      .agg(count(lit(1)).as("n_known"))
    evalS
      .select(col("id").as("doc_id"), size(col("sh")).cast("long").as("n_grams"))
      .join(known.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_grams"),
        coalesce(col("n_known"), lit(0L)).as("n_known"),
        ((col("n_grams") - coalesce(col("n_known"), lit(0L))) / col("n_grams")).as("novelty"))
      .orderBy("doc_id")
  }

  val ddNoveltySql: String =
    s"""WITH $shingleCte,
      tr AS (SELECT DISTINCT unnest(sh) AS g FROM s WHERE doc_id % $NovEvalMod <> 0),
      ev AS (SELECT doc_id, unnest(sh) AS g FROM s WHERE doc_id % $NovEvalMod = 0),
      kn AS (SELECT doc_id, count(*) AS n_known FROM ev
        WHERE g IN (SELECT g FROM tr) GROUP BY doc_id),
      base AS (SELECT doc_id, len(sh)::BIGINT AS n_grams FROM s WHERE doc_id % $NovEvalMod = 0)
      SELECT b.doc_id, b.n_grams, coalesce(kn.n_known, 0)::BIGINT AS n_known,
        (b.n_grams - coalesce(kn.n_known, 0))::BIGINT / b.n_grams::BIGINT AS novelty
      FROM base b LEFT JOIN kn ON b.doc_id = kn.doc_id ORDER BY b.doc_id"""

  /** End-to-end dedup FUNNEL: surviving-document counts after each stage
    * of the pipeline a corpus actually runs — raw → exact content dedup →
    * near-dup canonicalization (MinHash-LSH pairs + connected
    * components) — with per-stage removal counts from a 3-row lag
    * window. Every stage reads a frame another query already
    * materializes (content-hash groups, the memoized LSH→CC assignment),
    * so the funnel itself costs three one-row aggregates: it is the
    * dashboard summary of the dedup suite, not a recompute.
    */
  def ddFunnel(spark: SparkSession, dir: String): DataFrame = {
    val raw = docs(spark, dir)
      .agg(count(lit(1)).as("n_surviving"))
      .select(lit(0L).as("stage_no"), lit("raw").as("stage"), col("n_surviving"))
    val exact = ddExact(spark, dir)
      .agg(count(lit(1)).as("n_surviving"))
      .select(lit(1L).as("stage_no"), lit("exact").as("stage"), col("n_surviving"))
    val near = ddClusters(spark, dir)
      .agg(countDistinct(col("canonical_id")).as("n_surviving"))
      .select(lit(2L).as("stage_no"), lit("near").as("stage"), col("n_surviving"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("stage_no")
    raw
      .unionByName(exact)
      .unionByName(near)
      .withColumn(
        "n_removed",
        coalesce(lag(col("n_surviving"), 1).over(w) - col("n_surviving"), lit(0L)))
      .orderBy("stage_no")
  }

  // lazy: interpolates ddClustersSql, which is declared later in the file
  // (a plain val would capture null at class-init time).
  lazy val ddFunnelSql: String =
    s"""WITH u AS (
        SELECT 0::BIGINT AS stage_no, 'raw' AS stage, count(*)::BIGINT AS n_surviving
        FROM documents
        UNION ALL
        SELECT 1, 'exact', count(*)::BIGINT FROM ($ddExactSql)
        UNION ALL
        SELECT 2, 'near', count(DISTINCT canonical_id)::BIGINT FROM ($ddClustersSql))
      SELECT stage_no, stage, n_surviving,
        coalesce(lag(n_surviving) OVER (ORDER BY stage_no) - n_surviving, 0)::BIGINT AS n_removed
      FROM u ORDER BY stage_no"""

  /** Measured MinHash-LSH RECALL against the exact prefix-filter pair set
    * at the same threshold, bucketed by Jaccard band — the calibration
    * evidence for the `(numHashes, bands)` choice (the scaladoc's
    * `1-(1-s^r)^b` curve, observed instead of assumed; ann_recall is the
    * same audit for IVF). Exact pairs come from the lossless PPJoin frame
    * and LSH pairs from the banded join — both already session-memoized —
    * left-joined on the pair key; recall per band is one exact integer
    * division. LSH is blind to language blocks, so recall is measured on
    * the within-block exact set it is trying to reproduce.
    */
  def ddRecall(spark: SparkSession, dir: String): DataFrame = {
    val exact = Dedup
      .ngramJaccardPairs(docs(spark, dir), "doc_id", "text", "lang", K, JaccardMin)
      .select(col("a_id"), col("b_id"), col("jac"))
    val lsh = Dedup
      .minhashLsh(docs(spark, dir), "doc_id", "text", K, NumHashes, Bands, JaccardMin)
      .select(col("a_id"), col("b_id"), lit(1L).as("found"))
    exact
      .join(lsh, Seq("a_id", "b_id"), "left")
      .select(
        least(floor(col("jac") * 10), lit(9L)).cast("long").as("band10"),
        col("found"))
      .groupBy("band10")
      .agg(count(lit(1)).as("n_exact"), count(col("found")).as("n_found"))
      .withColumn("recall", col("n_found") / col("n_exact"))
      .orderBy("band10")
  }

  val ddRecallSql: String =
    s"""WITH ex AS (SELECT a_id, b_id, jac FROM ($ddNgramSql)),
      mh AS (SELECT a_id, b_id FROM ($ddMinhashSql)),
      j AS (SELECT least(floor(ex.jac * 10), 9)::BIGINT AS band10,
          CASE WHEN mh.a_id IS NULL THEN 0 ELSE 1 END AS found
        FROM ex LEFT JOIN mh ON ex.a_id = mh.a_id AND ex.b_id = mh.b_id)
      SELECT band10, count(*)::BIGINT AS n_exact, sum(found)::BIGINT AS n_found,
        sum(found)::BIGINT / count(*)::BIGINT AS recall
      FROM j GROUP BY band10 ORDER BY band10"""

  /** Per-document shingle RARITY against the corpus document-frequency
    * ledger: min/max df over the doc's 3-shingles, how many are unique to
    * it (df = 1), and the unique fraction — the "is this doc made of
    * boilerplate or of novel text" signal that complements [[ddNovelty]]
    * (novelty is vs a train split; rarity is vs the whole corpus). Shape:
    * the df ledger is one count per distinct shingle; doc shingles join
    * it co-partitioned on the shingle key and fold per doc — two shuffles
    * on slim (hash, count) rows, no pairwise anything.
    */
  def ddRarity(spark: SparkSession, dir: String): DataFrame = {
    val sh = Dedup.shingledCorpus(docs(spark, dir), "doc_id", "text", K)
    val ex = sh.select(col("id"), explode(col("sh")).as("g"))
    val ledger = ex.groupBy("g").agg(count(lit(1)).as("df"))
    ex.join(ledger, Seq("g"))
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_grams"),
        min(col("df")).as("min_df"),
        max(col("df")).as("max_df"),
        count(when(col("df") === 1, 1)).as("n_unique_grams"))
      .select(
        col("id").as("doc_id"),
        col("n_grams"),
        col("min_df"),
        col("max_df"),
        col("n_unique_grams"),
        (col("n_unique_grams") / col("n_grams")).as("rare_frac"))
      .orderBy("doc_id")
  }

  val ddRaritySql: String =
    s"""WITH $shingleCte,
      e AS (SELECT doc_id, unnest(sh) AS g FROM s),
      ledger AS (SELECT g, count(*) AS df FROM e GROUP BY g)
      SELECT e.doc_id, count(*)::BIGINT AS n_grams,
        min(ledger.df)::BIGINT AS min_df, max(ledger.df)::BIGINT AS max_df,
        count(*) FILTER (WHERE ledger.df = 1)::BIGINT AS n_unique_grams,
        count(*) FILTER (WHERE ledger.df = 1)::BIGINT / count(*)::BIGINT AS rare_frac
      FROM e JOIN ledger ON e.g = ledger.g GROUP BY e.doc_id ORDER BY e.doc_id"""

  /** Benchmark decontamination audit over `documents`: every 25th doc
    * plays the held-out benchmark; the rest are the training corpus. A
    * corpus doc is contaminated when it shares any 4-token n-gram with a
    * benchmark doc ([[Dedup.contaminationHits]] — broadcast benchmark
    * n-gram ledger, map-side semi-join). Width 4 (vs the dedup operators'
    * 3) because overlap is an exclusion signal: one shared window must
    * mean real textual overlap, not vocabulary coincidence.
    */
  private val ContamK = 4
  private val BenchMod = 25

  def ddContaminate(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    Dedup
      .contaminationHits(
        d.filter(col("doc_id") % BenchMod =!= 0),
        d.filter(col("doc_id") % BenchMod === 0),
        "doc_id",
        "text",
        ContamK)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")
  }

  val ddContaminateSql: String =
    s"""WITH t AS (SELECT doc_id, $tokenHashes AS th FROM documents),
      s AS (SELECT doc_id, ${shingleOfThK(ContamK)} AS sh FROM t),
      bench AS (SELECT DISTINCT unnest(sh) AS g FROM s WHERE doc_id % $BenchMod = 0),
      corp AS (SELECT doc_id, unnest(sh) AS g FROM s WHERE doc_id % $BenchMod <> 0)
      SELECT doc_id, count(*) AS n_hit_ngrams
      FROM corp WHERE g IN (SELECT g FROM bench)
      GROUP BY doc_id ORDER BY doc_id"""

  /** Bloom-filter decontamination pre-filter with a false-positive audit —
    * the shape a 100 TB corpus actually wants for benchmark exclusion: the
    * benchmark n-gram ledger is folded into a FIXED-SIZE bit array
    * ([[BloomBits]] bits as [[BloomBits]]/32 32-bit words, k=2 independent
    * md5-derived probe positions per gram), so the broadcast cost is a few
    * KB REGARDLESS of benchmark size, and the corpus-side membership test
    * is a map-side bit probe against the broadcast word table. Only grams
    * the bloom flags (a tiny, bounded-FP-rate fraction) pay the exact
    * ledger join — Bloom filters have no false negatives, so the exact
    * pass over positives recovers precise counts. Output per corpus doc:
    * gram count, bloom positives, exact (true) positives among them, and
    * the realized false-positive count — the audit that justifies sizing
    * the filter. Every bit position and word mask is integer md5
    * arithmetic (32-bit words: a 1<<63 sign bit is engine lore, shift<=31
    * is not), replayed bit-exactly by the oracle.
    */
  private val BloomBits = 16384L

  def ddBloom(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    def grams(df: DataFrame): DataFrame =
      df.select(
        col("doc_id"),
        explode(Dedup.hashedShingleSet(col("text"), ContamK)).as("g"))
    def bloomPos(tag: String): Column =
      pmod(
        graft.functions.Hashing.md5Long60(concat(lit(tag), col("g").cast("string"))),
        lit(BloomBits))
    val bench = grams(d.filter(col("doc_id") % BenchMod === 0)).select("g").distinct()
    val words = bench
      .select(explode(array(bloomPos("bloom1|"), bloomPos("bloom2|"))).as("p"))
      .select(expr("p div 32").as("w"), expr("shiftleft(1L, CAST(p % 32 AS INT))").as("m"))
      .groupBy("w")
      .agg(expr("bit_or(m)").as("mask"))
    val corp = grams(d.filter(col("doc_id") % BenchMod =!= 0))
      .withColumn("p1", bloomPos("bloom1|"))
      .withColumn("p2", bloomPos("bloom2|"))
    val perDoc = corp.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    val positives = corp
      .join(
        broadcast(words.select(col("w").as("w1"), col("mask").as("mask1"))),
        expr("p1 div 32") === col("w1"),
        "left")
      .join(
        broadcast(words.select(col("w").as("w2"), col("mask").as("mask2"))),
        expr("p2 div 32") === col("w2"),
        "left")
      .filter(
        expr("coalesce(mask1, 0L) & shiftleft(1L, CAST(p1 % 32 AS INT))") =!= 0L &&
          expr("coalesce(mask2, 0L) & shiftleft(1L, CAST(p2 % 32 AS INT))") =!= 0L)
    // Exact check over bloom POSITIVES only (no false negatives exist):
    // the expensive ledger join touches the flagged fraction, not the corpus.
    val audited = positives
      .join(bench.withColumnRenamed("g", "bg"), col("g") === col("bg"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bloom_pos"),
        sum(when(col("bg").isNotNull, 1L).otherwise(0L)).as("n_true_pos"))
    perDoc
      .join(audited, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_grams"),
        coalesce(col("n_bloom_pos"), lit(0L)).as("n_bloom_pos"),
        coalesce(col("n_true_pos"), lit(0L)).as("n_true_pos"),
        (coalesce(col("n_bloom_pos"), lit(0L)) - coalesce(col("n_true_pos"), lit(0L)))
          .as("n_false_pos"))
      .orderBy("doc_id")
  }

  val ddBloomSql: String = {
    def h(tag: String) = graft.functions.Hashing.sqlMd5Long60Duck(s"'$tag|' || g::VARCHAR")
    s"""WITH t AS (SELECT doc_id, $tokenHashes AS th FROM documents),
      s AS (SELECT doc_id, ${shingleOfThK(ContamK)} AS sh FROM t),
      bench AS (SELECT DISTINCT unnest(sh) AS g FROM s WHERE doc_id % $BenchMod = 0),
      corp AS (SELECT doc_id, unnest(sh) AS g FROM s WHERE doc_id % $BenchMod <> 0),
      bpos AS (SELECT ${h("bloom1")} % $BloomBits AS p FROM bench
        UNION ALL SELECT ${h("bloom2")} % $BloomBits AS p FROM bench),
      words AS (SELECT p // 32 AS w, bit_or(1::BIGINT << CAST(p % 32 AS INT)) AS mask
        FROM bpos GROUP BY 1),
      probe AS (SELECT doc_id, g,
          ${h("bloom1")} % $BloomBits AS p1, ${h("bloom2")} % $BloomBits AS p2
        FROM corp),
      pos AS (SELECT doc_id, g FROM probe
        LEFT JOIN words w1 ON probe.p1 // 32 = w1.w
        LEFT JOIN words w2 ON probe.p2 // 32 = w2.w
        WHERE (coalesce(w1.mask, 0) & (1::BIGINT << CAST(probe.p1 % 32 AS INT))) <> 0
          AND (coalesce(w2.mask, 0) & (1::BIGINT << CAST(probe.p2 % 32 AS INT))) <> 0),
      aud AS (SELECT doc_id, count(*)::BIGINT AS n_bloom_pos,
          (count(*) FILTER (WHERE g IN (SELECT g FROM bench)))::BIGINT AS n_true_pos
        FROM pos GROUP BY doc_id),
      base AS (SELECT doc_id, count(*)::BIGINT AS n_grams FROM corp GROUP BY doc_id)
      SELECT base.doc_id, base.n_grams,
        coalesce(aud.n_bloom_pos, 0)::BIGINT AS n_bloom_pos,
        coalesce(aud.n_true_pos, 0)::BIGINT AS n_true_pos,
        (coalesce(aud.n_bloom_pos, 0) - coalesce(aud.n_true_pos, 0))::BIGINT AS n_false_pos
      FROM base LEFT JOIN aud USING (doc_id) ORDER BY doc_id"""
  }

  /** Asymmetric containment detection (quote/subset relations Jaccard
    * can't see: a short doc fully quoted inside a long one scores high
    * containment but low Jaccard because the union is dominated by the
    * long side). C(a→b) = |S_a ∩ S_b| / |S_a| over INFORMATIVE shingles —
    * those occurring in ≤ [[ContainDfCap]] docs — which is also what makes
    * the plan corpus-linear: candidate pairs come from an inverted-index
    * self-join whose per-shingle fan-out is df ≤ cap (so ≤ cap² pairs per
    * posting list), never an all-pairs product; ubiquitous boilerplate
    * shingles are excluded from the semantics AND from the join. Shares
    * the session's persisted shingled corpus (the warm() frame). The
    * denominator counts all informative shingles of `a` (df=1 included —
    * unshareable, so skipping them in pair-gen is lossless optimization,
    * not a semantic change).
    */
  private val ContainMin = 0.8
  private val ContainDfCap = 20L

  def ddContainment(spark: SparkSession, dir: String): DataFrame = {
    val base = Dedup.shingledCorpus(docs(spark, dir), "doc_id", "text", K)
    val wins = base.select(col("id"), explode(col("sh")).as("g"))
    val dfs = wins.groupBy("g").agg(count(lit(1)).as("df"))
    val inf = wins
      .join(dfs.filter(col("df") <= ContainDfCap).select("g"), Seq("g"))
    val sizes = inf.groupBy("id").agg(count(lit(1)).as("n"))
    val pairs = inf
      .select(col("g"), col("id").as("a_id"))
      .join(inf.select(col("g"), col("id").as("b_id")), Seq("g"))
      .filter(col("a_id") =!= col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.select(col("id").as("a_id"), col("n").as("a_n")), Seq("a_id"))
      .withColumn("containment", col("inter").cast("double") / col("a_n").cast("double"))
      .filter(col("containment") >= ContainMin)
      .join(sizes.select(col("id").as("b_id"), col("n").as("b_n")), Seq("b_id"))
      .select(col("a_id"), col("b_id"), col("a_n"), col("b_n"), col("inter"),
        col("containment"))
      .orderBy("a_id", "b_id")
  }

  val ddContainmentSql: String =
    s"""WITH $shingleCte,
      wins AS (SELECT doc_id AS id, unnest(sh) AS g FROM s),
      dfs AS (SELECT g, count(*) AS df FROM wins GROUP BY g),
      inf AS (SELECT id, wins.g FROM wins JOIN dfs USING (g)
        WHERE df <= $ContainDfCap),
      sizes AS (SELECT id, count(*)::BIGINT AS n FROM inf GROUP BY id),
      pairs AS (SELECT a.id AS a_id, b.id AS b_id, count(*)::BIGINT AS inter
        FROM inf a JOIN inf b ON a.g = b.g AND a.id <> b.id
        GROUP BY 1, 2)
      SELECT p.a_id, p.b_id, sa.n AS a_n, sb.n AS b_n, p.inter,
        p.inter::DOUBLE / sa.n::DOUBLE AS containment
      FROM pairs p
      JOIN sizes sa ON p.a_id = sa.id
      JOIN sizes sb ON p.b_id = sb.id
      WHERE p.inter::DOUBLE / sa.n::DOUBLE >= $ContainMin
      ORDER BY a_id, b_id"""

  /** C4-style boilerplate removal over `documents`: aligned 3-token spans
    * occurring in 3+ distinct docs are stripped from every doc
    * ([[Dedup.removeBoilerplateSpans]]). 231 of the sf0.01 corpus spans
    * cross the threshold, so the cleaned text differs from the input on a
    * large fraction of rows — the oracle replays chunking, ledger, and
    * reassembly.
    */
  private val SpanW = 3
  private val SpanMinDocs = 3

  def ddBoilerplate(spark: SparkSession, dir: String): DataFrame =
    Dedup
      .removeBoilerplateSpans(docs(spark, dir), "doc_id", "text", SpanW, SpanMinDocs)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")

  val ddBoilerplateSql: String =
    s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
      sp AS (SELECT doc_id,
          list_transform(range(0, cast(ceil(len(tk)::DOUBLE / $SpanW) AS BIGINT)),
            i -> array_to_string(list_slice(tk, i * $SpanW + 1, i * $SpanW + $SpanW), ' ')) AS spans
        FROM t),
      e AS (SELECT doc_id, unnest(range(1, len(spans) + 1)) AS i, unnest(spans) AS span FROM sp),
      boiler AS (SELECT span FROM e GROUP BY span HAVING count(DISTINCT doc_id) >= $SpanMinDocs),
      f AS (SELECT doc_id, i, span, span IN (SELECT span FROM boiler) AS b FROM e),
      agg AS (SELECT doc_id,
          coalesce(string_agg(span, ' ' ORDER BY i) FILTER (WHERE NOT b), '') AS clean_text,
          count(*) FILTER (WHERE NOT b) AS n_kept,
          count(*) FILTER (WHERE b) AS n_dropped
        FROM f GROUP BY doc_id)
      SELECT d.doc_id, coalesce(a.clean_text, '') AS clean_text,
        coalesce(a.n_kept, 0) AS n_kept, coalesce(a.n_dropped, 0) AS n_dropped
      FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY doc_id"""

  /** Span width for the first-occurrence dedup — deliberately NOT
    * [[SpanW]], so the two span passes exercise different chunk
    * geometries.
    */
  private val ParaW = 4

  /** Falcon/RefinedWeb-style global first-occurrence span dedup
    * ([[Dedup.globalFirstSpanDedup]]): exactly one training copy of every
    * aligned 4-token span survives, in corpus (doc_id, pos) order —
    * contrast [[ddBoilerplate]], which strips frequent spans from every
    * doc including the first. The oracle replays chunking, the
    * per-span winner election, and reassembly.
    */
  def ddParagraph(spark: SparkSession, dir: String): DataFrame =
    Dedup
      .globalFirstSpanDedup(docs(spark, dir), "doc_id", "text", ParaW)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")

  val ddParagraphSql: String =
    s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
      sp AS (SELECT doc_id,
          list_transform(range(0, cast(ceil(len(tk)::DOUBLE / $ParaW) AS BIGINT)),
            i -> array_to_string(list_slice(tk, i * $ParaW + 1, i * $ParaW + $ParaW), ' ')) AS spans
        FROM t),
      e AS (SELECT doc_id, unnest(range(1, len(spans) + 1)) AS i, unnest(spans) AS span FROM sp),
      f AS (SELECT doc_id, i, span,
          row_number() OVER (PARTITION BY span ORDER BY doc_id, i) = 1 AS keep
        FROM e),
      agg AS (SELECT doc_id,
          coalesce(string_agg(span, ' ' ORDER BY i) FILTER (WHERE keep), '') AS clean_text,
          count(*) FILTER (WHERE keep) AS n_kept,
          count(*) FILTER (WHERE NOT keep) AS n_dropped
        FROM f GROUP BY doc_id)
      SELECT d.doc_id, coalesce(a.clean_text, '') AS clean_text,
        coalesce(a.n_kept, 0) AS n_kept, coalesce(a.n_dropped, 0) AS n_dropped
      FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY doc_id"""

  /** Domain-mixture sampling planner: given target proportions per
    * language, derive the per-domain sampling rate that reshapes the
    * corpus to the target mixture at constant total size, cap upsampling
    * at [[MixMaxEpochs]] epochs (the standard guard against minority-domain
    * over-repetition), and report the realized mixture after the cap. The
    * global totals come from tiny aggregate frames cross-joined back in
    * (broadcast, no single-partition window) — the shape that stays flat
    * when the per-domain stats table has a million rows instead of five.
    */
  private val MixTargets: Seq[(String, Double)] =
    Seq("en" -> 0.40, "es" -> 0.20, "de" -> 0.15, "fr" -> 0.15, "zh" -> 0.10)
  private val MixMaxEpochs = 3.0

  def dsMixture(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val targets = MixTargets.toDF("lang", "target_frac")
    val avail = docs(spark, dir)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
      .join(broadcast(targets), Seq("lang"))
    val withRate = avail
      .crossJoin(broadcast(avail.agg(sum(col("chars")).as("total_chars"))))
      .withColumn("rate", col("target_frac") * col("total_chars") / col("chars"))
      .withColumn("rate_capped", least(col("rate"), lit(MixMaxEpochs)))
      .withColumn("realized_chars", col("rate_capped") * col("chars"))
    withRate
      .crossJoin(
        broadcast(withRate.agg(sum(col("realized_chars")).as("realized_total"))))
      .select(
        col("lang"),
        col("n_docs"),
        col("chars"),
        col("target_frac"),
        col("rate"),
        col("rate_capped"),
        col("realized_chars"),
        (col("realized_chars") / col("realized_total")).as("realized_frac"))
      .orderBy("lang")
  }

  val dsMixtureSql: String = {
    // ::DOUBLE: DuckDB VALUES floats are DECIMAL, which would route the
    // rate arithmetic through decimal division instead of IEEE double.
    val targetRows = MixTargets.map { case (l, f) => s"('$l', $f::DOUBLE)" }.mkString(", ")
    s"""WITH targets(lang, target_frac) AS (VALUES $targetRows),
      avail AS (SELECT d.lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS chars, t.target_frac
        FROM documents d JOIN targets t ON d.lang = t.lang GROUP BY d.lang, t.target_frac),
      tot AS (SELECT sum(chars)::BIGINT AS total_chars FROM avail),
      r AS (SELECT avail.*, target_frac * total_chars / chars AS rate,
          least(target_frac * total_chars / chars, $MixMaxEpochs) AS rate_capped,
          least(target_frac * total_chars / chars, $MixMaxEpochs) * chars AS realized_chars
        FROM avail CROSS JOIN tot),
      rt AS (SELECT sum(realized_chars) AS realized_total FROM r)
      SELECT lang, n_docs, chars, target_frac, rate, rate_capped, realized_chars,
        realized_chars / realized_total AS realized_frac
      FROM r CROSS JOIN rt ORDER BY lang"""
  }

  /** Deterministic domain interleaving: order the corpus into the actual
    * TRAINING SEQUENCE implied by the [[MixTargets]] proportions. Each
    * document gets a deterministic within-domain shuffle position (md5
    * priority, like [[dsSample]]), and domains merge by the classic
    * weighted-fair key `domain_rank / target_frac` — a domain with 40% of
    * the target mixture emits a doc 4x as often as a 10% domain. The
    * global position comes from [[graft.operators.GlobalRank]] (two-pass
    * rank, no single-partition window).
    */
  def dsInterleave(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val targets = broadcast(MixTargets.toDF("lang", "target_frac"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang")
      .orderBy("priority", "doc_id")
    val keyed = docs(spark, dir)
      .select(
        col("doc_id"),
        col("lang"),
        graft.functions.Hashing
          .md5Long60(concat(lit("ileave|"), col("doc_id").cast("string")))
          .as("priority"))
      .withColumn("domain_rank", row_number().over(w).cast("long"))
      .join(targets, Seq("lang"))
      .withColumn("order_key", col("domain_rank") / col("target_frac"))
      .select("doc_id", "lang", "domain_rank", "order_key")
    graft.operators.GlobalRank
      .withRank(keyed, Seq(col("order_key"), col("doc_id")), "global_pos")
      .orderBy("global_pos")
  }

  val dsInterleaveSql: String = {
    val targetRows = MixTargets.map { case (l, f) => s"('$l', $f::DOUBLE)" }.mkString(", ")
    val prio = graft.functions.Hashing.sqlMd5Long60Duck("'ileave|' || doc_id::VARCHAR")
    s"""WITH targets(lang, target_frac) AS (VALUES $targetRows),
      k AS (SELECT doc_id, d.lang,
          row_number() OVER (PARTITION BY d.lang ORDER BY $prio, doc_id) AS domain_rank
        FROM documents d),
      o AS (SELECT k.doc_id, k.lang, k.domain_rank,
          k.domain_rank / t.target_frac AS order_key
        FROM k JOIN targets t ON k.lang = t.lang)
      SELECT doc_id, lang, domain_rank, order_key,
        row_number() OVER (ORDER BY order_key, doc_id) AS global_pos
      FROM o ORDER BY global_pos"""
  }

  /** Token-budget curation: each domain (lang) gets a fixed training-token
    * budget and fills it greedily from its highest-[[TextQueries.qualityCol]]
    * documents — the standard "best docs first until the budget is spent"
    * selection a mixture planner hands to per-domain curation. The running
    * total is an explicit ROWS window per domain ordered by (quality desc,
    * doc_id): domains are a bounded set (each window partition is one
    * domain), and the ordering doubles are the SAME left-associated IEEE
    * expression on both engines, so membership at the budget boundary is
    * deterministic. Emits every doc with its cumulative position and a
    * `kept` flag (rather than only survivors) so the audit trail shows
    * what the budget excluded and by how much.
    */
  private val TokenBudget = 2000L

  def dsTokenbudget(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang")
      .orderBy(col("quality").desc, col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    docs(spark, dir)
      .select(
        col("doc_id"),
        col("lang"),
        TextQueries.qualityCol.as("quality"),
        size(graft.functions.TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("kept", col("cum_tokens") <= TokenBudget)
      .orderBy("doc_id")
  }

  val dsTokenbudgetSql: String =
    s"""WITH q AS (SELECT doc_id, lang, ${TextQueries.qualitySqlExpr} AS quality,
        len(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''))::BIGINT AS n_tokens
      FROM documents),
      c AS (SELECT doc_id, lang, quality, n_tokens,
        (sum(n_tokens) OVER (PARTITION BY lang ORDER BY quality DESC, doc_id
                             ROWS UNBOUNDED PRECEDING))::BIGINT AS cum_tokens
      FROM q)
      SELECT doc_id, lang, quality, n_tokens, cum_tokens,
        cum_tokens <= $TokenBudget AS kept
      FROM c ORDER BY doc_id"""

  /** Corpus self-overlap audit: distinct 6-token sliding windows shared
    * across documents ([[Dedup.duplicatedWindowStats]]) — width 6 sits
    * between the dedup shingle (3) and the whole-phrase decontamination
    * n-gram (4) widths and flags 47 of the 500 sf0.01 docs.
    */
  private val SubstrK = 6

  def ddSubstring(spark: SparkSession, dir: String): DataFrame =
    Dedup
      .duplicatedWindowStats(docs(spark, dir), "doc_id", "text", SubstrK)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")

  val ddSubstringSql: String =
    s"""WITH t AS (SELECT doc_id, $tokenHashes AS th FROM documents),
      s AS (SELECT doc_id, ${shingleOfThK(SubstrK)} AS sh FROM t),
      e AS (SELECT doc_id, unnest(sh) AS g FROM s),
      dup AS (SELECT g FROM e GROUP BY g HAVING count(*) >= 2),
      pd AS (SELECT doc_id, count(*) AS n_windows FROM e GROUP BY doc_id),
      dd AS (SELECT doc_id, count(*) AS n_dup_windows
        FROM e WHERE g IN (SELECT g FROM dup) GROUP BY doc_id)
      SELECT pd.doc_id, pd.n_windows,
        coalesce(dd.n_dup_windows, 0) AS n_dup_windows,
        coalesce(dd.n_dup_windows, 0)::INT / pd.n_windows::INT AS dup_frac
      FROM pd LEFT JOIN dd ON pd.doc_id = dd.doc_id ORDER BY pd.doc_id"""

  /** Intra-document span dedup over `documents`
    * ([[Dedup.intraDocSpanDedup]], same 3-token chunking as
    * [[ddBoilerplate]]): repeats of a span within one doc are dropped,
    * first occurrences kept in order. Map-only.
    */
  def ddIntradoc(spark: SparkSession, dir: String): DataFrame =
    Dedup
      .intraDocSpanDedup(docs(spark, dir), "doc_id", "text", SpanW)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")

  val ddIntradocSql: String =
    s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
      sp AS (SELECT doc_id,
          list_transform(range(0, cast(ceil(len(tk)::DOUBLE / $SpanW) AS BIGINT)),
            i -> array_to_string(list_slice(tk, i * $SpanW + 1, i * $SpanW + $SpanW), ' ')) AS spans
        FROM t),
      e AS (SELECT doc_id, unnest(range(1, len(spans) + 1)) AS i, unnest(spans) AS span FROM sp),
      k AS (SELECT doc_id, i, span,
          row_number() OVER (PARTITION BY doc_id, span ORDER BY i) AS rn FROM e),
      agg AS (SELECT doc_id,
          string_agg(span, ' ' ORDER BY i) FILTER (WHERE rn = 1) AS clean_text,
          count(*) FILTER (WHERE rn = 1) AS n_kept,
          count(*) FILTER (WHERE rn > 1) AS n_dropped
        FROM k GROUP BY doc_id)
      SELECT d.doc_id, coalesce(agg.clean_text, '') AS clean_text,
        coalesce(agg.n_kept, 0) AS n_kept, coalesce(agg.n_dropped, 0) AS n_dropped
      FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id ORDER BY d.doc_id"""

  /** Curriculum phasing: rank the corpus by the [[TextQueries.taQuality]]
    * score (quality-first curriculum) with a deterministic tiebreak, and
    * cut the ranking into 3 equal phases by the closed-form
    * `(rank-1)*3 div N + 1` — no ntile, whose boundary depends on the
    * engine's tile-remainder convention. Global rank comes from
    * [[graft.operators.GlobalRank]] (no single-partition window).
    */
  private val CurriculumPhases = 3

  def dsCurriculum(spark: SparkSession, dir: String): DataFrame = {
    val q = TextQueries.taQuality(spark, dir).select(col("doc_id"), col("quality"))
    val ranked = graft.operators.GlobalRank
      .withRank(q, Seq(col("quality").desc, col("doc_id")), "global_rank")
    ranked
      .crossJoin(broadcast(q.agg(count(lit(1)).as("n"))))
      .withColumn(
        "phase",
        expr(s"(global_rank - 1) * $CurriculumPhases div n") + lit(1L))
      .select("doc_id", "quality", "global_rank", "phase")
      .orderBy("global_rank")
  }

  val dsCurriculumSql: String = {
    // quality replayed from ta_quality's oracle; identical IEEE arithmetic
    s"""WITH q AS (SELECT doc_id, quality FROM (${TextQueries.taQualitySql.replace("ORDER BY doc_id", "")})),
      n AS (SELECT count(*) AS n FROM q),
      r AS (SELECT doc_id, quality,
          row_number() OVER (ORDER BY quality DESC, doc_id) AS global_rank
        FROM q)
      SELECT doc_id, quality, global_rank,
        (global_rank - 1) * $CurriculumPhases // n.n + 1 AS phase
      FROM r CROSS JOIN n ORDER BY global_rank"""
  }

  /** Cross-split contamination audit: near-dup pairs (the MinHash-LSH
    * operator's output) that straddle the [[dsSplit]] train/val/test
    * boundary — the leakage check a training pipeline runs before
    * shipping a held-out set. Emits one row per ordered split pair with
    * the offending-pair count; an empty result would mean a clean split.
    */
  def dsLeakage(spark: SparkSession, dir: String): DataFrame = {
    val pairs =
      Dedup.minhashLsh(docs(spark, dir), "doc_id", "text", K, NumHashes, Bands, JaccardMin)
    val splits = dsSplit(spark, dir).select(col("doc_id"), col("split"))
    pairs
      .join(splits.select(col("doc_id").as("a_id"), col("split").as("a_split")), Seq("a_id"))
      .join(splits.select(col("doc_id").as("b_id"), col("split").as("b_split")), Seq("b_id"))
      .filter(col("a_split") =!= col("b_split"))
      .groupBy("a_split", "b_split")
      .agg(count(lit(1)).as("n_leaky_pairs"))
      .orderBy("a_split", "b_split")
  }

  val dsLeakageSql: String =
    s"""WITH splits AS (
        SELECT doc_id, ${splitCaseSql("b")} AS split
        FROM (SELECT doc_id, $splitBucketSql AS b FROM documents)),
      pairs AS ($ddMinhashSql)
      SELECT sa.split AS a_split, sb.split AS b_split, count(*) AS n_leaky_pairs
      FROM pairs p
      JOIN splits sa ON sa.doc_id = p.a_id
      JOIN splits sb ON sb.doc_id = p.b_id
      WHERE sa.split <> sb.split
      GROUP BY a_split, b_split ORDER BY a_split, b_split"""

  /** Canonical-document assignment: MinHash-LSH near-dup pairs →
    * connected components → one row per document with its canonical
    * (cluster-min) id; documents with no near-dup map to themselves.
    * This is the operator a training pipeline actually applies after
    * pair generation — "which row do I keep" — and it composes the
    * LSH, clustering, and left-join machinery under one oracle.
    * CC's imperative plan is memoized per (session, dir) like the ER
    * clustering.
    */
  /** The verified LSH pair frame, session-shared (dd_chaining reads it
    * next to the CC assignment — same materialize-once policy).
    */
  private def lshPairs(spark: SparkSession, dir: String): DataFrame =
    SessionMemo.getOrElseUpdate("dd_lsh_pairs", spark, dir) {
      Dedup
        .minhashLsh(docs(spark, dir), "doc_id", "text", K, NumHashes, Bands, JaccardMin)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  /** The LSH→CC cluster assignment, session-shared. */
  private def lshCc(spark: SparkSession, dir: String): DataFrame =
    SessionMemo.getOrElseUpdate("dd_cc", spark, dir) {
      graft.operators.ConnectedComponents
        .run(lshPairs(spark, dir), "a_id", "b_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  def ddClusters(spark: SparkSession, dir: String): DataFrame = {
    val cc = lshCc(spark, dir)
    docs(spark, dir)
      .select(col("doc_id"))
      .join(cc.select(col("node").as("doc_id"), col("comp")), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("canonical_id"))
      .orderBy("doc_id")
  }

  /** Chaining audit over the near-dup clusters — the classic LSH+CC
    * failure mode made measurable: transitive closure merges documents
    * that share NO direct verified pair (a–b and b–c qualify, a–c never
    * did), and a multi-member cluster whose direct-pair count is below
    * complete is partly CHAIN, not similarity. Per cluster: size, direct
    * verified pairs, the complete-graph pair count (exact integers), the
    * weakest direct link's Jaccard (one IEEE division — deterministic
    * cross-engine), and the chained flag. Reads the memoized LSH pairs +
    * CC assignment — zero new pair enumeration; the rollups are
    * cluster-keyed aggregates over pair-count-sized frames.
    */
  def ddChaining(spark: SparkSession, dir: String): DataFrame =
    chainingStats(lshPairs(spark, dir), lshCc(spark, dir))

  /** The per-cluster rollup of [[ddChaining]] over any `(a_id, b_id,
    * jac)` pair frame and `(node, comp)` assignment — factored so the
    * spec can drive a synthetic CHAINED cluster (the harness corpus's
    * near-dup groups are cliques, so the chained branch never fires on
    * real data; the synthetic corpus is where the failure mode lives).
    */
  private[queries] def chainingStats(pairs: DataFrame, cc: DataFrame): DataFrame = {
    val assign = cc.select(col("node").as("a_id"), col("comp"))
    val sizes = cc
      .groupBy(col("comp"))
      .agg(count(lit(1)).as("n_members"))
    val pairStats = pairs
      .join(assign, Seq("a_id"))
      .groupBy(col("comp"))
      .agg(count(lit(1)).as("n_direct_pairs"), min(col("jac")).as("min_pair_jac"))
    sizes
      .join(pairStats, Seq("comp"))
      .select(
        col("comp").as("cluster_id"),
        col("n_members"),
        col("n_direct_pairs"),
        (col("n_members") * (col("n_members") - 1) / 2).cast("long").as("n_possible_pairs"),
        (col("n_direct_pairs") <
          (col("n_members") * (col("n_members") - 1) / 2).cast("long")).as("chained"),
        col("min_pair_jac"))
      .orderBy("cluster_id")
  }

  val ddChainingSql: String =
    s"""WITH RECURSIVE pairs AS ($ddMinhashSql),
      e AS (SELECT a_id AS s, b_id AS d FROM pairs UNION SELECT b_id, a_id FROM pairs),
      reach(s, d) AS (
        SELECT s, s FROM (SELECT DISTINCT s FROM e)
        UNION
        SELECT r.s, e.d FROM reach r JOIN e ON r.d = e.s),
      comp AS (SELECT s AS doc_id, min(d) AS cid FROM reach GROUP BY s),
      sizes AS (SELECT cid, count(*)::BIGINT AS n_members FROM comp GROUP BY cid),
      ps AS (SELECT c.cid, count(*)::BIGINT AS n_direct_pairs, min(p.jac) AS min_pair_jac
        FROM pairs p JOIN comp c ON c.doc_id = p.a_id GROUP BY c.cid)
      SELECT cid AS cluster_id, n_members, n_direct_pairs,
        (n_members * (n_members - 1) // 2)::BIGINT AS n_possible_pairs,
        n_direct_pairs < n_members * (n_members - 1) // 2 AS chained,
        min_pair_jac
      FROM sizes JOIN ps USING (cid) ORDER BY cluster_id"""

  val ddSimhashSql: String = {
    val bits = (0 until 32)
      .map(j =>
        s"CASE WHEN 2 * len(list_filter(sh, h -> (h >> $j) & 1 = 1)) > len(sh) THEN ${1L << j}::BIGINT ELSE 0::BIGINT END")
      .mkString(" + ")
    s"""WITH $shingleCte,
      sim AS (SELECT doc_id, $bits AS sim FROM s)
      SELECT * FROM (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id, bit_count(xor(a.sim, b.sim))::BIGINT AS hamming
        FROM sim a JOIN sim b ON a.doc_id < b.doc_id)
      WHERE hamming <= $MaxHamming ORDER BY a_id, b_id"""
  }

  val ddEmbcosSql: String = {
    def dot(x: String, y: String) =
      s"list_reduce(list_transform(range(1, len($x) + 1), i -> $x[i] * $y[i]), (p, q) -> p + q)"
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
      SELECT * FROM (
        SELECT a.vec_id AS a_id, b.vec_id AS b_id,
          ${dot("a.v", "b.v")} / (sqrt(${dot("a.v", "a.v")}) * sqrt(${dot("b.v", "b.v")})) AS cos
        FROM v a JOIN v b ON a.vec_id < b.vec_id)
      WHERE cos >= $CosMin ORDER BY a_id, b_id"""
  }

  val ddSrpSql: String = {
    val rows = SrpBits / SrpBands
    val mask = (1L << rows) - 1
    val md5l = graft.functions.Hashing.sqlMd5Long60Duck("'rp|' || b || '|' || d")
    def dot(x: String, y: String) =
      s"list_reduce(list_transform(range(1, len($x) + 1), i -> $x[i] * $y[i]), (p, q) -> p + q)"
    s"""WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
      planes AS (SELECT b, list(($md5l) / ${(1L << 59).toDouble} - 1.0 ORDER BY d) AS pw
                 FROM range(0, $SrpBits) t(b), range(0, $SrpDims) u(d) GROUP BY b),
      dots AS (SELECT id, b,
          list_reduce(list_transform(range(1, $SrpDims + 1), i -> v[i] * pw[i]), (p, q) -> p + q) AS dp
        FROM v, planes),
      sig AS (SELECT id, sum(CASE WHEN dp >= 0 THEN (1::BIGINT << b) ELSE 0::BIGINT END)::BIGINT AS sig
              FROM dots GROUP BY id),
      banded AS (SELECT id, bb, (sig >> ($rows * bb)) & $mask AS bv
                 FROM sig, range(0, $SrpBands) t(bb)),
      cand AS (SELECT DISTINCT a.id AS a_id, c.id AS b_id
               FROM banded a JOIN banded c ON a.bb = c.bb AND a.bv = c.bv AND a.id < c.id),
      n AS (SELECT id, v, sqrt(${dot("v", "v")}) AS nrm FROM v)
      SELECT * FROM (
        SELECT a_id, b_id, ${dot("x.v", "y.v")} / (x.nrm * y.nrm) AS cos
        FROM cand JOIN n x ON x.id = a_id JOIN n y ON y.id = b_id)
      WHERE cos >= $CosMin ORDER BY a_id, b_id"""
  }

  // NOT EXISTS, not NOT IN: a single NULL in the ledger subquery would make
  // NOT IN return nothing (three-valued logic) while Spark's left_anti
  // keeps all non-matching rows.
  val ddIncrementalSql: String =
    s"""SELECT content_hash, keep_id, n_copies FROM (
        SELECT md5($norm) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
        FROM documents WHERE doc_id >= $IncrSplit GROUP BY 1) batch
      WHERE NOT EXISTS (
        SELECT 1 FROM documents d WHERE d.doc_id < $IncrSplit
          AND md5(${norm.replace("trim(text)", "trim(d.text)")}) = batch.content_hash)
      ORDER BY keep_id"""

  val dsSplitSql: String =
    s"""SELECT doc_id, bucket, ${splitCaseSql("bucket")} AS split
      FROM (SELECT doc_id, $splitBucketSql AS bucket FROM documents)
      ORDER BY doc_id"""

  /** Near-duplicate leakage across the train/val/test split: ds_leakage
    * catches EXACT cross-split copies; this catches the near-dups that
    * survive it — every MinHash-LSH candidate pair (the [[ddMinhash]]
    * pass, reused via the CacheManager) whose endpoints landed in
    * different splits, with the doc to purge (`drop_id` = the member on
    * the LATER tier, train < val < test — held-out sets stay clean by
    * dropping from eval, never from train). At 100 TB this is two slim
    * id-equi joins of the pair list against the split assignment — cost
    * is pair-proportional, the corpus is never rescanned.
    */
  def dsNearLeak(spark: SparkSession, dir: String): DataFrame = {
    def tier(c: org.apache.spark.sql.Column) =
      when(c === "train", 0).when(c === "val", 1).otherwise(2)
    val sp = dsSplit(spark, dir).select(col("doc_id"), col("split"))
    ddMinhash(spark, dir)
      .join(sp.select(col("doc_id").as("a_id"), col("split").as("a_split")), "a_id")
      .join(sp.select(col("doc_id").as("b_id"), col("split").as("b_split")), "b_id")
      .filter(col("a_split") =!= col("b_split"))
      .withColumn(
        "drop_id",
        when(tier(col("a_split")) > tier(col("b_split")), col("a_id")).otherwise(col("b_id")))
      .select("a_id", "b_id", "jac", "a_split", "b_split", "drop_id")
      .orderBy("a_id", "b_id")
  }

  val dsNearLeakSql: String = {
    def tier(s: String) = s"CASE $s WHEN 'train' THEN 0 WHEN 'val' THEN 1 ELSE 2 END"
    s"""WITH pairs AS ($ddMinhashSql),
      spl AS (SELECT doc_id, ${splitCaseSql(s"($splitBucketSql)")} AS split FROM documents)
      SELECT p.a_id, p.b_id, p.jac, sa.split AS a_split, sb.split AS b_split,
        CASE WHEN (${tier("sa.split")}) > (${tier("sb.split")})
             THEN p.a_id ELSE p.b_id END AS drop_id
      FROM pairs p
      JOIN spl sa ON sa.doc_id = p.a_id
      JOIN spl sb ON sb.doc_id = p.b_id
      WHERE sa.split <> sb.split ORDER BY p.a_id, p.b_id"""
  }

  /** Per-stratum sample size. */
  private val SampleK = 3

  /** Deterministic stratified sampling: the [[SampleK]] lowest md5-ranked
    * docs per (lang) stratum — the reproducible eval-set draw a training
    * pipeline needs (no rand(), identical on any engine/run/partitioning).
    * Per-stratum top-k via a window over the lang shuffle; strata here are
    * modest, and a stratum too large for one partition would switch to the
    * bounded top-k Aggregator the ANN path uses.
    */
  def dsSample(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang")
      .orderBy(col("rk"), col("doc_id"))
    docs(spark, dir)
      .select(
        col("lang"),
        col("doc_id"),
        graft.functions.Hashing
          .md5Long60(concat(lit("sample|"), col("doc_id").cast("string")))
          .as("rk"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= SampleK)
      .select(col("lang"), col("doc_id"), col("rnk"))
      .orderBy("lang", "rnk")
  }

  val dsSampleSql: String =
    s"""SELECT lang, doc_id, rnk FROM (
        SELECT lang, doc_id,
          row_number() OVER (PARTITION BY lang ORDER BY rk, doc_id) AS rnk
        FROM (SELECT lang, doc_id,
                ${graft.functions.Hashing.sqlMd5Long60Duck("'sample|' || doc_id::VARCHAR")} AS rk
              FROM documents))
      WHERE rnk <= $SampleK ORDER BY lang, rnk"""

  /** Deterministic WEIGHTED stratified sampling — priority sampling
    * (Duffield–Lund–Thorup): per doc draw priority = u / w with u a
    * 60-bit md5 hash and w = n_chars, keep the [[SampleK]] smallest per
    * lang stratum. Long docs are proportionally likelier to be drawn —
    * the length-weighted mixture draw a training pipeline uses to weight
    * corpora by token budget rather than doc count. The priority is ONE
    * int64→double cast and ONE IEEE division on both engines, so the
    * ranking (hence membership) is bit-identical cross-engine — no
    * u^(1/w) exponentiation whose libm rounding could diverge. Same
    * shuffle shape as [[dsSample]]: per-stratum window over the lang
    * exchange, switchable to the bounded top-k Aggregator for huge strata.
    */
  def dsWeighted(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang")
      .orderBy(col("priority"), col("doc_id"))
    docs(spark, dir)
      .select(
        col("lang"),
        col("doc_id"),
        col("n_chars"),
        (graft.functions.Hashing
          .md5Long60(concat(lit("wsample|"), col("doc_id").cast("string")))
          .cast("double") / greatest(col("n_chars"), lit(1L)).cast("double"))
          .as("priority"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= SampleK)
      .select(col("lang"), col("doc_id"), col("n_chars"), col("rnk"))
      .orderBy("lang", "rnk")
  }

  /** Char budget per packed bin (stand-in for a token budget — n_chars is
    * the fixture's cost column; swapping in a tokenizer count changes
    * nothing structurally).
    */
  private val PackBudget = 2000L

  /** Deterministic sequence packing: assign docs to fixed-budget context
    * bins, never splitting a doc — the batch-construction step of an LLM
    * training pipeline. bin = (running chars BEFORE this doc) div budget
    * over the per-lang doc_id order: one window over the lang exchange,
    * no sequential scan, identical on any partitioning (the standard
    * approximate-packing recipe — a doc can overhang its bin by its own
    * length, bounded waste, unlike greedy first-fit which is inherently
    * sequential). Emits per-bin occupancy for audit.
    */
  def dsPack(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang")
      .orderBy("doc_id")
    docs(spark, dir)
      .select(col("lang"), col("doc_id"), col("n_chars"))
      .withColumn("cum", sum(col("n_chars")).over(w))
      .withColumn("bin", expr(s"(cum - n_chars) div $PackBudget"))
      .groupBy("lang", "bin")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("chars"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("lang", "bin")
  }

  val dsPackSql: String =
    s"""SELECT lang, bin, count(*) AS n_docs, sum(n_chars)::BIGINT AS chars,
        min(doc_id) AS first_doc, max(doc_id) AS last_doc
      FROM (SELECT lang, doc_id, n_chars,
              ((sum(n_chars) OVER (PARTITION BY lang ORDER BY doc_id) - n_chars)
                // $PackBudget)::BIGINT AS bin
            FROM documents)
      GROUP BY lang, bin ORDER BY lang, bin"""

  private val BucketBatch = 16L

  /** Length-bucketed batch packing with padding-waste accounting — the
    * batching step of a padded-tensor training pipeline: group documents
    * into power-of-two length buckets, shuffle deterministically within
    * each bucket, cut fixed-size batches, and price the padding each batch
    * pays (every sequence pads to the batch max).
    *
    * Scale shape: the bucket id is a map-side expression; the within-bucket
    * order comes from ONE distributed sort ([[graft.operators.GlobalRank]]
    * two-pass rank over (bucket, key) — bucket count is tiny, ~12, so a
    * per-bucket `Window` would funnel the corpus through 12 reducers) and a
    * broadcast-joined per-bucket min-rank offset. The bucket boundary is
    * integer-exact on both engines: `length(bin(n_chars))` =
    * floor(log2)+1 computed on the binary string, no transcendental
    * (`floor(log2(x))` can land an ulp under an exact power and flip the
    * bucket on one engine only).
    */
  def dsBucket(spark: SparkSession, dir: String): DataFrame = {
    val keyed = docs(spark, dir)
      .select(
        col("doc_id"),
        col("n_chars"),
        length(bin(greatest(col("n_chars"), lit(1L)))).cast("long").as("bucket"),
        graft.functions.Hashing
          .md5Long60(concat(lit("bucket|"), col("doc_id").cast("string")))
          .as("k"))
    val ranked = graft.operators.GlobalRank
      .withRank(keyed, Seq(col("bucket"), col("k"), col("doc_id")), "grank")
    val offsets = ranked.groupBy("bucket").agg(min(col("grank")).as("base"))
    ranked
      .join(broadcast(offsets), Seq("bucket"))
      .withColumn("batch", expr(s"(grank - base) div $BucketBatch"))
      .groupBy("bucket", "batch")
      .agg(
        count(lit(1)).as("n_docs"),
        max(col("n_chars")).as("max_chars"),
        sum(col("n_chars")).as("sum_chars"))
      .withColumn("padded_chars", col("n_docs") * col("max_chars"))
      .withColumn(
        "waste_frac",
        (col("padded_chars") - col("sum_chars")).cast("double") / col("padded_chars"))
      .orderBy("bucket", "batch")
  }

  val dsBucketSql: String =
    s"""SELECT bucket, batch, n_docs, max_chars, sum_chars,
        n_docs * max_chars AS padded_chars,
        (n_docs * max_chars - sum_chars)::DOUBLE / (n_docs * max_chars) AS waste_frac
      FROM (
        SELECT bucket, ((rnk - 1) // $BucketBatch)::BIGINT AS batch,
          count(*) AS n_docs, max(n_chars) AS max_chars, sum(n_chars)::BIGINT AS sum_chars
        FROM (
          SELECT bucket, n_chars,
            row_number() OVER (PARTITION BY bucket ORDER BY k, doc_id) AS rnk
          FROM (SELECT doc_id, n_chars,
                  length(bin(greatest(n_chars, 1)))::BIGINT AS bucket,
                  ${graft.functions.Hashing.sqlMd5Long60Duck("'bucket|' || doc_id::VARCHAR")} AS k
                FROM documents))
        GROUP BY bucket, batch)
      ORDER BY bucket, batch"""

  val dsWeightedSql: String =
    s"""SELECT lang, doc_id, n_chars, rnk FROM (
        SELECT lang, doc_id, n_chars,
          row_number() OVER (PARTITION BY lang ORDER BY priority, doc_id) AS rnk
        FROM (SELECT lang, doc_id, n_chars,
                (${graft.functions.Hashing.sqlMd5Long60Duck("'wsample|' || doc_id::VARCHAR")})::DOUBLE
                  / greatest(n_chars, 1)::DOUBLE AS priority
              FROM documents))
      WHERE rnk <= $SampleK ORDER BY lang, rnk"""

  // Reachability closure over the (replayed) LSH pairs, min label per
  // component, then every document left-joined in — unclustered docs are
  // their own canonical.
  val ddClustersSql: String =
    s"""WITH RECURSIVE pairs AS ($ddMinhashSql),
      e AS (SELECT a_id AS s, b_id AS d FROM pairs UNION SELECT b_id, a_id FROM pairs),
      reach(s, d) AS (
        SELECT s, s FROM (SELECT DISTINCT s FROM e)
        UNION
        SELECT r.s, e.d FROM reach r JOIN e ON r.d = e.s),
      comp AS (SELECT s AS doc_id, min(d) AS canonical_id FROM reach GROUP BY s)
      SELECT d.doc_id, coalesce(c.canonical_id, d.doc_id) AS canonical_id
      FROM documents d LEFT JOIN comp c USING (doc_id) ORDER BY d.doc_id"""

  // ---- canonical selection by quality --------------------------------------
  // "Which member do I KEEP" with a reason: within each near-dup cluster
  // retain the highest-quality member (the shared document quality score
  // — [[TextQueries.qualityCol]], same doubles as ta_quality on both
  // engines), tie-broken by doc_id. The argmax is max(struct(quality,
  // doc_id)) — an ordinary aggregate with a map-side partial, so the
  // shuffle carries ONE candidate row per (partition, cluster), not every
  // member through a window funnel. At 100 TB this is the difference
  // between shuffling the corpus and shuffling ~one slim row per cluster
  // per partition; the cluster assignment itself is the memoized LSH→CC
  // frame shared with dd_clusters.

  def ddKeepbest(spark: SparkSession, dir: String): DataFrame = {
    val q = docs(spark, dir)
      .select(col("doc_id"), TextQueries.qualityCol.as("quality"))
    ddClusters(spark, dir)
      .join(q, "doc_id")
      .groupBy("canonical_id")
      .agg(
        count(lit(1)).as("n_members"),
        max(struct(col("quality"), col("doc_id"))).as("m"))
      .select(
        col("canonical_id"),
        col("m.doc_id").as("keep_id"),
        col("m.quality").as("best_quality"),
        col("n_members"))
      .orderBy("canonical_id")
  }

  val ddKeepbestSql: String =
    s"""WITH assign AS ($ddClustersSql),
      q AS (SELECT doc_id, ${TextQueries.qualitySqlExpr} AS quality FROM documents),
      a AS (SELECT canonical_id, assign.doc_id, quality
            FROM assign JOIN q ON assign.doc_id = q.doc_id),
      r AS (SELECT canonical_id, doc_id, quality,
            row_number() OVER (PARTITION BY canonical_id
                               ORDER BY quality DESC, doc_id DESC) AS rn,
            count(*) OVER (PARTITION BY canonical_id) AS n_members
            FROM a)
      SELECT canonical_id, doc_id AS keep_id, quality AS best_quality, n_members
      FROM r WHERE rn = 1 ORDER BY canonical_id"""

  // ---- contrastive triplet mining ------------------------------------------
  // (anchor, positive, negative) triplets for embedding/contrastive
  // training, mined entirely from deterministic signals: positives are
  // MinHash-LSH near-duplicates (each participant paired with its lowest-id
  // partner), negatives are the document HALF THE CORPUS AWAY in global
  // content-fingerprint order — far in fingerprint space, but picked by
  // rank arithmetic rather than a similarity scan, so mining costs one
  // distributed sort ([[graft.operators.GlobalRank]] two-pass rank, no
  // single-partition window) plus two slim equi-joins on rank — no
  // pairwise term anywhere. The one driver-side value is the corpus count
  // (O(1)). Reuses the LSH pair generation (and its warmed shingle
  // corpus), so the pair cost is shared with dd_minhash.

  /** Hard-negative mining for contrastive/embedding training: per query
    * doc, the top nearest neighbors by embedding cosine that are NOT
    * near-duplicates — semantically close but lexically distinct, the
    * negatives that actually teach a retriever (random negatives are too
    * easy; near-dup "negatives" are false negatives that poison the
    * loss). Composition of two session-shared frames, so the marginal
    * cost is one anti-join over k-bounded shortlists: the persisted
    * brute-force cosine shortlist ([[AnnQueries.annBrute]] — the recall
    * oracle) anti-joined against the MinHash-LSH near-dup pairs, then
    * re-ranked inside each query's ≤k surviving rows (a k-bounded window,
    * never corpus-sized). Ids join across tables by the testdata
    * convention vec_id i = embedding of doc i.
    */
  private val HardNegK = 5

  def dsHardneg(spark: SparkSession, dir: String): DataFrame = {
    val short = AnnQueries.annBrute(spark, dir)
    val dup = Dedup
      .minhashLsh(docs(spark, dir), "doc_id", "text", K, NumHashes, Bands, JaccardMin)
      .select(col("a_id"), col("b_id"))
    val dupSym = dup.union(dup.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id")
      .orderBy("rank")
    short
      .join(
        dupSym,
        col("q_id") === col("a_id") && col("n_id") === col("b_id"),
        "left_anti")
      .withColumn("hard_rank", row_number().over(w).cast("long"))
      .filter(col("hard_rank") <= HardNegK)
      .select(col("q_id"), col("n_id").as("neg_id"), col("cos"), col("hard_rank"))
      .orderBy("q_id", "hard_rank")
  }

  val dsHardnegSql: String =
    s"""WITH short AS (${AnnQueries.annBruteSql}),
      pairs AS ($ddMinhashSql),
      sym AS (SELECT a_id, b_id FROM pairs
        UNION ALL SELECT b_id AS a_id, a_id AS b_id FROM pairs),
      filt AS (SELECT s.q_id, s.n_id, s.cos, s.rank FROM short s
        WHERE NOT EXISTS (SELECT 1 FROM sym
          WHERE sym.a_id = s.q_id AND sym.b_id = s.n_id))
      SELECT q_id, neg_id, cos, hard_rank FROM (
        SELECT q_id, n_id AS neg_id, cos,
          row_number() OVER (PARTITION BY q_id ORDER BY rank) AS hard_rank
        FROM filt)
      WHERE hard_rank <= $HardNegK ORDER BY q_id, hard_rank"""

  def dsContrastive(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val pairs = Dedup
      .minhashLsh(d, "doc_id", "text", K, NumHashes, Bands, JaccardMin)
      .select(col("a_id"), col("b_id"))
    val sym = pairs.union(pairs.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
    val pos = sym.groupBy(col("a_id").as("anchor")).agg(min(col("b_id")).as("pos"))
    val fp = d.select(
      col("doc_id"),
      graft.functions.Hashing
        .md5Long60(graft.functions.TextAnalysis.normalized(col("text")))
        .as("fp"))
    val ranked = graft.operators.GlobalRank.withRank(fp, Seq(col("fp"), col("doc_id")), "r")
    val n = ranked.count()
    pos
      .join(ranked.select(col("doc_id").as("anchor"), col("r")), "anchor")
      .withColumn("nr", ((col("r") - 1 + lit(n / 2)) % lit(n)) + 1)
      .join(ranked.select(col("r").as("nr"), col("doc_id").as("neg")), "nr")
      .select(col("anchor"), col("pos"), col("neg"))
      .orderBy("anchor")
  }

  val dsContrastiveSql: String = {
    val norm = raw"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"
    s"""WITH pairs AS ($ddMinhashSql),
      sym AS (SELECT a_id, b_id FROM pairs UNION ALL SELECT b_id AS a_id, a_id AS b_id FROM pairs),
      pos AS (SELECT a_id AS anchor, min(b_id) AS pos FROM sym GROUP BY a_id),
      fp AS (SELECT doc_id, ${graft.functions.Hashing.sqlMd5Long60Duck(norm)} AS fp FROM documents),
      rk AS (SELECT doc_id, row_number() OVER (ORDER BY fp, doc_id) AS r FROM fp),
      nn AS (SELECT count(*) AS n FROM rk),
      a AS (SELECT pos.anchor, pos.pos, ((rk.r - 1 + nn.n // 2) % nn.n) + 1 AS nr
            FROM pos JOIN rk ON rk.doc_id = pos.anchor CROSS JOIN nn)
      SELECT a.anchor, a.pos, rk.doc_id AS neg
      FROM a JOIN rk ON rk.r = a.nr ORDER BY a.anchor"""
  }

  // ---- deterministic epoch shuffling ---------------------------------------
  // The per-epoch training-order permutation a data loader needs,
  // reproducible on any engine/cluster/restart: order each epoch by
  // md5("epoch<e>|" || doc_id) — a fresh pseudorandom permutation per
  // epoch with no rand() and no stateful shuffle buffer. Positions come
  // from [[graft.operators.GlobalRank]] (two-pass distributed rank), NOT a
  // partition-less window: one epoch's permutation of a 100 TB corpus is
  // itself corpus-sized, so the rank must never funnel through one task.
  private val Epochs = 3

  def dsShuffle(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select(col("doc_id"))
    (0 until Epochs)
      .map { e =>
        val keyed = d.select(
          col("doc_id"),
          graft.functions.Hashing
            .md5Long60(concat(lit(s"epoch$e|"), col("doc_id").cast("string")))
            .as("k"))
        graft.operators.GlobalRank
          .withRank(keyed, Seq(col("k"), col("doc_id")), "pos")
          .select(lit(e.toLong).as("epoch"), col("pos"), col("doc_id"))
      }
      .reduce(_ unionByName _)
      .orderBy("epoch", "pos")
  }

  val dsShuffleSql: String = {
    val key = graft.functions.Hashing
      .sqlMd5Long60Duck("'epoch' || epoch::VARCHAR || '|' || doc_id::VARCHAR")
    s"""WITH ep AS (SELECT unnest(range($Epochs)) AS epoch),
      keyed AS (SELECT ep.epoch, d.doc_id, $key AS k
                FROM documents d CROSS JOIN ep)
      SELECT epoch, row_number() OVER (PARTITION BY epoch ORDER BY k, doc_id) AS pos, doc_id
      FROM keyed ORDER BY epoch, pos"""
  }

  // ---- hashed n-gram importance weights (DSIR shape) ----------------------

  private val DsirBuckets = 64

  /** Data-selection importance weights via hashed token buckets (the DSIR
    * recipe: score documents by how target-like their hashed n-gram
    * distribution is). Tokens hash to [[DsirBuckets]] buckets; each bucket
    * gets the add-one-smoothed target/corpus rate ratio, and a document's
    * weight is its bucket-count-weighted sum. The per-bucket LUT is
    * [[DsirBuckets]] rows — broadcast, so scoring is one map-side join over
    * the token stream at any corpus size; the two distribution passes are
    * plain map-side-combined counts.
    *
    * Determinism: the true DSIR weight is a log-likelihood-ratio sum, but
    * `ln` is a transcendental (not correctly rounded — the gr_adamic r4
    * lesson), so the score linearizes to the rate ratio itself:
    * round(1e6 * (n_t+1)(N_c+B) / ((n_c+1)(N_t+B))) — each factor cast
    * to double BEFORE the multiply (a BIGINT product would silently wrap
    * in Spark with ANSI off at corpus scale while DuckDB promotes —
    * identical per-factor casts give the same left-associated IEEE
    * product on both engines with no overflow), one correctly-rounded
    * IEEE divide, one round, then an order-free BIGINT sum.
    */
  def dsDsir(spark: SparkSession, dir: String): DataFrame = {
    val bk = docs(spark, dir)
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .withColumn("b",
        pmod(graft.functions.Hashing.md5Long60(concat(lit("dsir|"), col("tok"))),
          lit(DsirBuckets.toLong)))
    val corpus = bk.groupBy("b").agg(count(lit(1)).as("n_c"))
    val target = bk.filter(col("lang") === "en").groupBy("b").agg(count(lit(1)).as("n_t"))
    val totals = bk.agg(
      count(lit(1)).as("nc_total"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("nt_total"))
    val lut = corpus
      .join(target, Seq("b"), "left")
      .crossJoin(broadcast(totals))
      .select(col("b"),
        round(lit(1000000.0) *
          ((coalesce(col("n_t"), lit(0L)) + 1L).cast("double") *
            (col("nc_total") + DsirBuckets).cast("double")) /
          ((col("n_c") + 1L).cast("double") *
            (col("nt_total") + DsirBuckets).cast("double")))
          .cast("long").as("score"))
    val perDoc = bk
      .groupBy("doc_id", "b")
      .agg(count(lit(1)).as("cnt"))
      .join(broadcast(lut), Seq("b"))
      .groupBy("doc_id")
      .agg(sum("cnt").as("n_toks"), sum(col("cnt") * col("score")).as("weight_scaled"))
    docs(spark, dir)
      .select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_toks"), lit(0L)).as("n_toks"),
        coalesce(col("weight_scaled"), lit(0L)).as("weight_scaled"))
      .orderBy("doc_id")
  }

  val dsDsirSql: String = {
    val h = graft.functions.Hashing.sqlMd5Long60Duck("'dsir|' || tok")
    s"""WITH toks AS (SELECT doc_id, lang, unnest(string_split_regex(text, '\\s+')) AS tok
          FROM documents),
      bk AS (SELECT doc_id, lang, $h % $DsirBuckets AS b FROM toks WHERE len(tok) > 0),
      corpus AS (SELECT b, count(*) AS n_c FROM bk GROUP BY b),
      target AS (SELECT b, count(*) AS n_t FROM bk WHERE lang = 'en' GROUP BY b),
      tot AS (SELECT count(*) AS nc_total,
          count(*) FILTER (WHERE lang = 'en') AS nt_total FROM bk),
      lut AS (SELECT c.b,
          round(1000000.0 * ((coalesce(t.n_t, 0) + 1)::DOUBLE * (tot.nc_total + $DsirBuckets)::DOUBLE)
            / ((c.n_c + 1)::DOUBLE * (tot.nt_total + $DsirBuckets)::DOUBLE))::BIGINT AS score
        FROM corpus c LEFT JOIN target t USING (b) CROSS JOIN tot),
      dc AS (SELECT doc_id, b, count(*) AS cnt FROM bk GROUP BY doc_id, b),
      agg AS (SELECT doc_id, sum(cnt)::BIGINT AS n_toks,
          sum(cnt * score)::BIGINT AS weight_scaled
        FROM dc JOIN lut USING (b) GROUP BY doc_id)
      SELECT d.doc_id, coalesce(a.n_toks, 0) AS n_toks,
        coalesce(a.weight_scaled, 0) AS weight_scaled
      FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY doc_id"""
  }

  // ---- grouped k-fold splitting -------------------------------------------

  private val KFolds = 5L

  /** Grouped k-fold assignment: folds are dealt per NEAR-DUP CLUSTER (the
    * memoized LSH→CC frame shared with dd_clusters), so no cluster ever
    * straddles a fold boundary — the split hygiene plain row-wise k-fold
    * lacks (near-duplicate train/eval leakage, the ds_nearleak failure
    * mode, is structurally impossible). Fold = md5(canonical_id) mod k:
    * content-independent, deterministic, cross-engine. Output is the
    * per-fold audit (docs, clusters, chars); the assignment itself is the
    * map-side hash — zero extra shuffles beyond the audit aggregate.
    */
  def dsGkfold(spark: SparkSession, dir: String): DataFrame =
    ddClusters(spark, dir)
      .withColumn(
        "fold",
        pmod(
          graft.functions.Hashing
            .md5Long60(concat(lit("gkf|"), col("canonical_id").cast("string"))),
          lit(KFolds)))
      .join(docs(spark, dir).select(col("doc_id"), col("n_chars")), "doc_id")
      .groupBy("fold")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("canonical_id")).as("n_clusters"),
        sum(col("n_chars")).as("chars"))
      .orderBy("fold")

  val dsGkfoldSql: String = {
    val h = graft.functions.Hashing.sqlMd5Long60Duck("'gkf|' || canonical_id::VARCHAR")
    s"""WITH assign AS ($ddClustersSql)
      SELECT $h % $KFolds AS fold, count(*) AS n_docs,
        count(DISTINCT canonical_id) AS n_clusters, sum(n_chars)::BIGINT AS chars
      FROM assign JOIN documents USING (doc_id)
      GROUP BY 1 ORDER BY fold"""
  }

  /** Temperature-scaled mixture reweighting at T = 2: each domain (lang)
    * samples proportionally to `n^(1/T) = sqrt(n)` instead of `n`,
    * flattening the mixture toward small domains — the multilingual
    * up-sampling rule (XLM-R's alpha-smoothing) a mixture planner applies
    * before per-domain curation. T = 2 keeps the whole query hash-exact:
    * `floor(sqrt(n))` is an exactly-rounded IEEE op on both engines
    * (general T routes through `pow`, a transcendental — the gr_adamic
    * class), and shares are integer ppm. One tiny aggregate + a broadcast
    * one-row totals join; nothing here scales with corpus size except the
    * initial count scan.
    */
  def dsTemperature(spark: SparkSession, dir: String): DataFrame = {
    val byLang = docs(spark, dir)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w", floor(sqrt(col("n_docs"))).cast("long"))
    val totals = byLang.agg(sum("w").as("w_total"), sum("n_docs").as("n_total"))
    byLang
      .crossJoin(broadcast(totals))
      .select(
        col("lang"),
        col("n_docs"),
        col("w"),
        expr("(w * 1000000) div w_total").as("p_ppm"),
        expr("(n_docs * 1000000) div n_total").as("uniform_ppm"))
      .withColumn("boosted", col("p_ppm") > col("uniform_ppm"))
      .orderBy("lang")
  }

  val dsTemperatureSql: String =
    """WITH b AS (SELECT lang, count(*)::BIGINT AS n_docs,
        floor(sqrt(count(*)))::BIGINT AS w FROM documents GROUP BY lang),
      t AS (SELECT sum(w)::BIGINT AS w_total, sum(n_docs)::BIGINT AS n_total FROM b)
      SELECT lang, n_docs, w,
        ((w * 1000000) // t.w_total)::BIGINT AS p_ppm,
        ((n_docs * 1000000) // t.n_total)::BIGINT AS uniform_ppm,
        (w * 1000000) // t.w_total > (n_docs * 1000000) // t.n_total AS boosted
      FROM b, t ORDER BY lang"""

  /** Soft dedup: instead of dropping near-duplicates, down-weight them so
    * each near-dup cluster contributes ~one document's worth of sampling
    * mass (the "count-based repetition discounting" alternative real
    * pipelines use when hard removal is too aggressive). weight_ppm =
    * floor(1e6 / cluster_size) — integer fixed-point, order-free,
    * cross-engine exact. Cluster assignment is the memoized LSH→CC frame
    * shared with dd_clusters/dd_keepbest/ds_gkfold, so the marginal cost
    * is one cluster-keyed count + a map-side weight column; at 100 TB the
    * only shuffle is the slim (canonical_id) count.
    */
  def dsDupweight(spark: SparkSession, dir: String): DataFrame = {
    val cl = ddClusters(spark, dir)
    val sizes = cl.groupBy("canonical_id").agg(count(lit(1)).as("n_dups"))
    cl.join(sizes, "canonical_id")
      .select(
        col("doc_id"),
        col("canonical_id"),
        col("n_dups"),
        expr("1000000 div n_dups").as("weight_ppm"))
      .orderBy("doc_id")
  }

  val dsDupweightSql: String =
    s"""WITH cl AS ($ddClustersSql),
      sz AS (SELECT canonical_id, count(*)::BIGINT AS n_dups FROM cl GROUP BY canonical_id)
      SELECT doc_id, cl.canonical_id, n_dups,
        (1000000 // n_dups)::BIGINT AS weight_ppm
      FROM cl JOIN sz USING (canonical_id) ORDER BY doc_id"""

  private val EraseMod = 50L

  /** Right-to-be-forgotten propagation audit: given a deletion list
    * (doc_id % [[EraseMod]] = 0 — the stand-in for a takedown/opt-out
    * feed), report every near-dup cluster the deletion touches with its
    * member count, how many members are tombstoned, and the re-elected
    * canonical (min surviving member; NULL when the whole cluster is
    * erased). This is the derived-artifact side of a deletion: dropping
    * the raw rows is easy, but cluster assignments, canonical choices,
    * and downstream silver tables keyed on them must be repaired — this
    * audit is the repair driver. Cluster assignment is the memoized
    * LSH→CC frame; the audit is one cluster-keyed aggregate (conditional
    * min/sum — map-side partials), so the only shuffle is the slim
    * per-cluster frame at any corpus size.
    */
  def dsErasure(spark: SparkSession, dir: String): DataFrame =
    ddClusters(spark, dir)
      .withColumn("deleted", (col("doc_id") % EraseMod === 0).cast("long"))
      .groupBy("canonical_id")
      .agg(
        count(lit(1)).as("n_members"),
        sum(col("deleted")).as("n_deleted"),
        min(when(col("deleted") === 0L, col("doc_id"))).as("new_canonical"))
      .filter(col("n_deleted") > 0)
      .orderBy("canonical_id")

  val dsErasureSql: String =
    s"""WITH cl AS ($ddClustersSql)
      SELECT canonical_id, count(*)::BIGINT AS n_members,
        sum((doc_id % $EraseMod = 0)::BIGINT)::BIGINT AS n_deleted,
        min(CASE WHEN doc_id % $EraseMod <> 0 THEN doc_id END) AS new_canonical
      FROM cl GROUP BY canonical_id HAVING n_deleted > 0 ORDER BY canonical_id"""

  private val CdcW = 8
  private val CdcD = 64L

  /** Content-defined chunk dedup (the storage-layer dedup a data lake
    * runs under a training corpus): each document is cut at rolling-hash
    * boundaries ([[graft.expressions.CdcChunks]] — O(n) native
    * expression, boundaries follow content so edits only re-chunk the
    * span they touch), chunks are identified by their full-content
    * polynomial hash, and one global first-occurrence election (min
    * (doc_id, pos) per hash — the [[Dedup]] paragraph-dedup shape) marks
    * every later occurrence as a duplicate. Per doc: chunk count,
    * codepoint volume, and the duplicate share a CDC store would NOT
    * re-write.
    *
    * Scale shape: the only shuffle carries slim (hash, doc_id, pos, len)
    * rows — never text; the election is an aggregate + join on the
    * chunk-hash key (join-keyed, never broadcast — the ledger is
    * corpus-sized). Hash-exact end to end: every value is integer.
    */
  def ddCdc(spark: SparkSession, dir: String): DataFrame = {
    val chunks = graft.Caches.track(
      docs(spark, dir)
        .select(
          col("doc_id"),
          graft.functions.Compat
            .column(graft.expressions.CdcChunks(
              graft.functions.Compat.expression(col("text")), CdcW, CdcD))
            .as("cs"))
        // explode_OUTER, then drop the null rows: a plain explode makes
        // InferFiltersFromGenerate add `size(chunks) > 0` BELOW the
        // Generate, and that filter re-evaluates the O(n) chunker per
        // row (3 evaluations once isnotnull joins it). The outer variant
        // infers nothing, the chunker runs exactly once per document,
        // and the cheap attribute filter prunes empty docs after.
        .select(col("doc_id"), explode_outer(col("cs")).as("c"))
        .filter(col("c").isNotNull)
        .select(
          col("doc_id"),
          col("c.pos").as("pos"),
          col("c.len").as("len"),
          col("c.hash").as("hash"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val global = chunks
      .groupBy("hash")
      .agg(count(lit(1)).as("n_occ"), min(struct(col("doc_id"), col("pos"))).as("owner"))
    chunks
      .join(global, Seq("hash"))
      .withColumn(
        "dup",
        col("n_occ") > 1 &&
          !(col("owner.doc_id") === col("doc_id") && col("owner.pos") === col("pos")))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum("len").as("n_cp"),
        sum(when(col("dup"), 1L).otherwise(0L)).as("dup_chunks"),
        sum(when(col("dup"), col("len")).otherwise(0L)).as("dup_cp"))
      .orderBy("doc_id")
  }

  val ddCdcSql: String = {
    val B = graft.expressions.RollingHashMin.B
    val P = graft.expressions.RollingHashMin.P
    def fold(sliceExpr: String) =
      s"list_reduce(list_prepend(0::BIGINT, $sliceExpr), (a, c) -> (a * $B + c) % $P)"
    s"""WITH cps AS (SELECT doc_id,
          list_transform(range(1, length(text) + 1), j -> unicode(text[j:j])::BIGINT) AS cp
        FROM documents WHERE length(text) > 0),
      bs AS (SELECT doc_id, cp, len(cp) AS n,
          list_filter(range($CdcW, len(cp) + 1),
            i -> ${fold(s"list_slice(cp, i - $CdcW + 1, i)")} % $CdcD = 0) AS bl
        FROM cps),
      ends AS (SELECT doc_id, cp,
          CASE WHEN len(bl) > 0 AND bl[len(bl)] = n THEN bl ELSE list_append(bl, n) END AS el
        FROM bs),
      ch AS (SELECT doc_id, cp, el,
          unnest(el) AS ed, unnest(range(1, len(el) + 1)) AS idx
        FROM ends),
      chunks AS (SELECT doc_id,
          CASE WHEN idx = 1 THEN 0 ELSE el[idx - 1] END AS pos,
          ed - (CASE WHEN idx = 1 THEN 0 ELSE el[idx - 1] END) AS len,
          ${fold(s"list_slice(cp, (CASE WHEN idx = 1 THEN 0 ELSE el[idx - 1] END) + 1, ed)")} AS hash
        FROM ch),
      marked AS (SELECT doc_id, len,
          row_number() OVER (PARTITION BY hash ORDER BY doc_id, pos) AS rn
        FROM chunks)
      SELECT doc_id, count(*)::BIGINT AS n_chunks, sum(len)::BIGINT AS n_cp,
        (count(*) FILTER (WHERE rn > 1))::BIGINT AS dup_chunks,
        coalesce(sum(len) FILTER (WHERE rn > 1), 0)::BIGINT AS dup_cp
      FROM marked GROUP BY doc_id ORDER BY doc_id"""
  }

  /** Pareto-front (skyline) data selection over two quality signals —
    * document length (`n_chars`) and lexical richness (distinct-token
    * count), both maximized: keep every document no other document
    * dominates (≥ in both, > in one). The multi-objective "don't collapse
    * quality to one weighted score" selection step.
    *
    * Scale shape: dominance is decided on the PER-VALUE aggregate, not
    * the corpus — bmax per distinct length (a hash aggregate), then a
    * domain-bounded (lengths × lengths) self-join computes each length's
    * best richness among STRICTLY LONGER docs. The corpus is touched by
    * two narrow passes; nothing quadratic in documents exists anywhere —
    * the value domain, not the row count, bounds the join. The oracle
    * brute-forces dominance with NOT EXISTS, so the pruned plan's
    * equivalence to the O(n²) definition is under the hash gate.
    */
  def dsPareto(spark: SparkSession, dir: String): DataFrame = {
    val sig = graft.Caches.track(
      docs(spark, dir)
        .select(
          col("doc_id"),
          col("n_chars").as("a"),
          size(array_distinct(graft.functions.TextAnalysis.tokens(col("text"))))
            .cast("long").as("b"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val abmax = sig.groupBy("a").agg(max("b").as("bmax"))
    val up = abmax.as("x")
      .join(abmax.as("y"), col("y.a") > col("x.a"), "left")
      .groupBy(col("x.a").as("a"), col("x.bmax").as("bmax"))
      .agg(max(col("y.bmax")).as("upmax"))
    sig
      .join(up, Seq("a"))
      .filter(
        (col("upmax").isNull || col("upmax") < col("b")) && col("bmax") <= col("b"))
      .select("doc_id", "a", "b")
      .orderBy("doc_id")
  }

  val dsParetoSql: String = {
    val toks = raw"list_filter(string_split_regex(text, '\s+'), t -> t <> '')"
    s"""WITH sig AS (SELECT doc_id, n_chars AS a,
          len(list_distinct($toks))::BIGINT AS b
        FROM documents)
      SELECT doc_id, a, b FROM sig s
      WHERE NOT EXISTS (SELECT 1 FROM sig o
        WHERE o.a >= s.a AND o.b >= s.b AND (o.a > s.a OR o.b > s.b))
      ORDER BY doc_id"""
  }

  private val KcK = 5

  /** Greedy k-center coreset selection over the embedding table (the
    * Gonzalez max-min farthest-point heuristic, the classic 2-approx):
    * seed with vec_id 0, then [[KcK]]−1 rounds each adding the point
    * LEAST similar to its nearest already-chosen center (min over points
    * of max-cos-to-chosen; ties to the smaller id). The output reports,
    * per center, its selection round, the max-min similarity at
    * selection time, and the final coverage (assigned-point count and
    * worst within-cluster cosine) — the diversity-driven prototype
    * selection a training pipeline runs to pick a representative subset
    * before expensive human/LLM labeling.
    *
    * Scale shape: each round is ONE map pass over the vectors against a
    * BROADCAST chosen set (k rows) followed by a global top-1 reduce
    * (TakeOrdered — never a full sort), and the driver collects exactly
    * one row per round — the k-bounded-collect pattern of
    * [[graft.operators.KMeans]]. K passes over 100 TB is the exact
    * baseline; production runs it on a uniform sample and this operator
    * IS that inner loop. Hash-exact: every cosine is the ordered-fold
    * [[Dedup.dotFold]] over the same doubles on both engines, `max` of
    * doubles is order-free, and ties break on ids.
    */
  def dsKcenter(spark: SparkSession, dir: String): DataFrame = {
    // Widened: same single-split inheritance as [[facilityOver]] — the
    // per-round max-cos sweep otherwise runs one-core serial.
    val v = graft.Caches.track(
      graft.operators.Lineage
        .widen(
          Tables
            .t(spark, dir, "embeddings")
            .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("v"))
            .withColumn("nrm", sqrt(Dedup.dotFold(col("v"), col("v")))))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    var chosen = Vector((0L, 1.0))
    // Incremental running max-cos (r15 continuation): the old loop
    // cross-joined every point against ALL chosen-so-far centers each
    // round (Σr = K(K−1)/2 center-dots per point) and re-aggregated the
    // per-point max. But max over a growing set folds: mc_r(p) =
    // greatest(mc_{r−1}(p), cos(p, new_center)) — so each round is one
    // MAP over a persisted (id, v, nrm, mc) frame with the single new
    // center broadcast (one row — bounded at any scale), zero joins,
    // zero exchanges, and K−1 center-dots per point total. Bit-identical:
    // the same IEEE divisions feed `greatest`, whose ordering (NaN
    // largest, null-free inputs) matches the max aggregate it replaces;
    // Round6QueriesSpec replays the greedy selection.
    def centerRow(id: Long) = v
      .filter(col("id") === lit(id))
      .select(col("v").as("c_v"), col("nrm").as("c_nrm"))
    val cosNew = Dedup.dotFold(col("v"), col("c_v")) / (col("nrm") * col("c_nrm"))
    var running = graft.Caches.track(
      v.crossJoin(broadcast(centerRow(chosen.head._1)))
        .select(col("id"), col("v"), col("nrm"), cosNew.as("mc"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    for (r <- 1 until KcK) {
      val ids = chosen.map(_._1)
      val far = running
        .filter(!col("id").isin(ids: _*))
        .select(col("id"), col("mc"))
        .orderBy(col("mc").asc, col("id").asc)
        .limit(1)
        .collect()(0)
      chosen = chosen :+ ((far.getLong(0), far.getDouble(1)))
      if (r < KcK - 1)
        running = graft.Caches.track(
          running
            .crossJoin(broadcast(centerRow(far.getLong(0))))
            .select(col("id"), col("v"), col("nrm"), greatest(col("mc"), cosNew).as("mc"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    }
    import spark.implicits._
    val sel = chosen.zipWithIndex
      .map { case ((id, selCos), r) => (r.toLong, id, selCos) }
      .toDF("round", "c_id", "sel_cos")
    val centersAll = v
      .filter(col("id").isin(chosen.map(_._1): _*))
      .select(col("id").as("c_id"), col("v").as("c_v"), col("nrm").as("c_nrm"))
    val asg = v
      .crossJoin(broadcast(centersAll))
      .withColumn("cos", Dedup.dotFold(col("v"), col("c_v")) / (col("nrm") * col("c_nrm")))
      .groupBy("id")
      .agg(max(struct(col("cos"), (-col("c_id")).as("negc"))).as("m"))
      .select(col("id"), (-col("m.negc")).as("c_id"), col("m.cos").as("cos"))
    val stats = asg
      .groupBy("c_id")
      .agg(count(lit(1)).as("n_assigned"), min(col("cos")).as("min_cos"))
    sel
      .join(stats, Seq("c_id"))
      .select(col("round"), col("c_id").as("center_id"), col("sel_cos"),
        col("n_assigned"), col("min_cos"))
      .orderBy("round")
  }

  val dsKcenterSql: String = {
    def dot(x: String, y: String) =
      s"list_reduce(list_transform(range(1, len($x) + 1), i -> $x[i] * $y[i]), (p, q) -> p + q)"
    val cos = s"${dot("x.v", "c.v")} / (x.nrm * c.nrm)"
    def round(r: Int) =
      s"""m$r AS (SELECT x.id, max($cos) AS mc
          FROM n x JOIN ch${r - 1} ch ON true JOIN n c ON c.id = ch.id
          WHERE NOT EXISTS (SELECT 1 FROM ch${r - 1} e WHERE e.id = x.id)
          GROUP BY x.id),
      p$r AS (SELECT $r::BIGINT AS r, id, mc FROM m$r ORDER BY mc ASC, id ASC LIMIT 1),
      ch$r AS (SELECT r, id, mc FROM ch${r - 1} UNION ALL SELECT r, id, mc FROM p$r)"""
    s"""WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
      n AS (SELECT id, v, sqrt(${dot("v", "v")}) AS nrm FROM v),
      ch0 AS (SELECT 0::BIGINT AS r, 0::BIGINT AS id, 1.0 AS mc),
      ${(1 until KcK).map(round).mkString(",\n      ")},
      asg AS (SELECT id, c_id, cos FROM (
          SELECT x.id, c.id AS c_id, $cos AS cos,
            row_number() OVER (PARTITION BY x.id ORDER BY $cos DESC, c.id ASC) AS rn
          FROM n x JOIN ch${KcK - 1} ch ON true JOIN n c ON c.id = ch.id)
        WHERE rn = 1),
      st AS (SELECT c_id, count(*)::BIGINT AS n_assigned, min(cos) AS min_cos
        FROM asg GROUP BY c_id)
      SELECT ch.r AS round, ch.id AS center_id, ch.mc AS sel_cos,
        st.n_assigned, st.min_cos
      FROM ch${KcK - 1} ch JOIN st ON st.c_id = ch.id ORDER BY round"""
  }

  // ---- facility-location coreset selection ----------------------------------

  private val FacK = 4
  private[graft] val FacCandC = 64
  /** Cover floor: far below any possible quantized dot (|dot| ≤
    * 64·(10⁴·max|x|)² ≈ 2.3e9 here), yet small enough that a corpus-sized
    * SUM of floors stays in BIGINT.
    */
  private val FacFloor = -(1L << 40)

  /** Greedy facility-location coreset selection (the submodular
    * data-pruning objective of CRAIG/Kaushal et al.: maximize
    * `Σ_points max_{s∈S} sim(p, s)`): [[FacK]] rounds, each picking the
    * candidate with the largest coverage gain, then folding the winner
    * into the per-point cover. Complements `ds_kcenter` (max-min
    * distance — outlier coverage) with the max-sum objective (mass
    * coverage) a mixture pruner actually optimizes.
    *
    * Candidate pool: the CONSTANT-SIZE [[FacCandC]] lowest md5-ranked
    * vectors (the ds_split/ds_sample draw — content-independent,
    * engine-independent, tie to lower id), NOT a corpus-proportional
    * modulus — a `id % m` pool makes each greedy round score
    * candidates × points = N²/m dots with an unbounded broadcast (the
    * r14 verdict's quadratic finding); a fixed pool keeps every round
    * at C·N dots under a C-bounded broadcast, the same uniform-draw
    * stochastic-greedy degradation Mirzasoleiman et al.'s lazier-
    * than-lazy analysis licenses.
    *
    * Cross-engine discipline: similarities are EXACT INTEGER dots over
    * 1e4-quantized coordinates (the emb_dimstats device), the argmax
    * ties to the lower candidate id, and the objective/cover arithmetic
    * never leaves BIGINT — greedy selection is boundary-sensitive
    * (one flipped comparison changes every later round), so nothing
    * float is allowed to decide anything.
    *
    * Scale: each round is one candidates×points scored aggregate
    * (map-side combinable, broadcast of ≤[[FacCandC]] rows), one 1-row
    * argmax to the driver (the dsKcenter pattern — k-bounded), and one
    * map-only cover fold against the winner's broadcast vector; the
    * cover frame is Lineage-cut per round (two references per round —
    * the k>1 rule). The ScaleProbe `facility` row pins per-round
    * linearity at 20×.
    */
  def dsFacility(spark: SparkSession, dir: String): DataFrame =
    facilityOver(
      Tables
        .t(spark, dir, "embeddings")
        .select(
          col("vec_id").as("id"),
          transform(
            col("embedding").cast("array<double>"),
            x => round(x * 10000).cast("long")).as("qv")))

  /** The greedy core over any `(id: long, qv: array<long>)` frame —
    * shared with ScaleProbe so the probe can never silently measure a
    * different algorithm than the query ships.
    */
  private[graft] def facilityOver(quant: DataFrame): DataFrame = {
    val spark = quant.sparkSession
    // Widened (Lineage.widen, r15): the corpus frame otherwise inherits
    // the single-split scan's ONE partition and every greedy round's
    // candidates × points scoring runs serial on one core.
    val q = graft.Caches.track(
      graft.operators.Lineage
        .widen(quant)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    def idot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)
    // Constant-size pool: TakeOrdered over the persisted corpus, then
    // persisted itself so the 4 rounds don't re-rank; ≤ FacCandC rows.
    val cands = graft.Caches.track(
      q.select(
          col("id").as("c_id"),
          col("qv").as("c_qv"),
          graft.functions.Hashing
            .md5Long60(concat(lit("fac|"), col("id").cast("string")))
            .as("rk"))
        .orderBy(col("rk"), col("c_id"))
        .limit(FacCandC)
        .select(col("c_id"), col("c_qv"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // The pool is k-bounded (≤ FacCandC rows) — pull it to the driver
    // ONCE so each round's winner vector is a map lookup, not a filter
    // job over the corpus (4 fewer jobs per query; the dsKcenter
    // bounded-pull rule).
    val candVecs: Map[Long, Array[Long]] = cands
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
      .toMap
    var covered = q.select(col("id"), lit(FacFloor).as("cover"))
    var chosen = Vector.empty[(Long, Long, Long, Long)]
    for (k <- 1 to FacK) {
      val already = chosen.map(_._2)
      val cnd =
        if (already.isEmpty) cands else cands.filter(!col("c_id").isin(already: _*))
      val best = q
        .join(covered, Seq("id"))
        .crossJoin(broadcast(cnd))
        .select(col("c_id"), greatest(idot(col("qv"), col("c_qv")), col("cover")).as("s"))
        .groupBy("c_id")
        .agg(sum(col("s")).as("obj"))
        .orderBy(col("obj").desc, col("c_id").asc)
        .limit(1)
        .collect()(0)
      val (cid, obj) = (best.getLong(0), best.getLong(1))
      val cvec = candVecs(cid)
      val next = graft.operators.Lineage.cut(
        q.join(covered, Seq("id"))
          .select(
            col("id"),
            greatest(col("cover"), idot(col("qv"), typedLit(cvec))).as("cover"),
            (idot(col("qv"), typedLit(cvec)) > col("cover")).as("imp")))
      val nImproved = next.filter(col("imp")).count()
      covered = next.select("id", "cover")
      chosen = chosen :+ ((k.toLong, cid, obj, nImproved))
    }
    import spark.implicits._
    chosen.toDF("k", "center_id", "objective", "n_improved").orderBy("k")
  }

  val dsFacilitySql: String = {
    def dot(x: String, y: String) =
      s"list_reduce(list_transform(range(1, len($x) + 1), i -> $x[i] * $y[i]), (p, q) -> p + q)"
    def round(r: Int) = {
      val excl =
        if (r == 1) "" else s"WHERE NOT EXISTS (SELECT 1 FROM sel${r - 1} s WHERE s.cid = c.id)"
      s"""g$r AS (SELECT c.id AS cid, sum(greatest(${dot("x.qv", "c.qv")}, cv.cover))::BIGINT AS obj
          FROM (SELECT id, qv FROM c $excl) c, v x JOIN cov${r - 1} cv USING (id)
          GROUP BY c.id),
      p$r AS MATERIALIZED (SELECT $r::BIGINT AS k, cid, obj FROM g$r ORDER BY obj DESC, cid LIMIT 1),
      sel$r AS (${if (r == 1) "SELECT cid FROM p1"
        else s"SELECT cid FROM sel${r - 1} UNION ALL SELECT cid FROM p$r"}),
      cov$r AS MATERIALIZED (SELECT x.id,
          greatest(cv.cover, ${dot("x.qv", "pv.qv")})::BIGINT AS cover
        FROM v x JOIN cov${r - 1} cv USING (id), p$r JOIN v pv ON pv.id = p$r.cid),
      ni$r AS (SELECT count(*) FILTER (WHERE c2.cover > c1.cover)::BIGINT AS n_improved
        FROM cov$r c2 JOIN cov${r - 1} c1 ON c1.id = c2.id)"""
    }
    val finals = (1 to FacK)
      .map(r => s"SELECT p$r.k, p$r.cid AS center_id, p$r.obj AS objective, ni$r.n_improved FROM p$r, ni$r")
      .mkString("\n        UNION ALL ")
    s"""WITH v AS MATERIALIZED (SELECT vec_id AS id,
        list_transform(embedding::DOUBLE[], x -> round(x * 10000)::BIGINT) AS qv
        FROM embeddings),
      c AS MATERIALIZED (SELECT id, qv FROM (
          SELECT id, qv, ${graft.functions.Hashing.sqlMd5Long60Duck("'fac|' || id::VARCHAR")} AS rk
          FROM v)
        ORDER BY rk, id LIMIT $FacCandC),
      cov0 AS (SELECT id, (-(1::BIGINT << 40))::BIGINT AS cover FROM v),
      ${(1 to FacK).map(round).mkString(",\n      ")}
      SELECT k, center_id, objective, n_improved FROM (
        $finals) ORDER BY k"""
  }

  // ---- one-permutation MinHash ----------------------------------------------

  private val OphBins = 16
  private val OphBands = 4

  /** One-Permutation MinHash LSH near-dups
    * ([[Dedup.ophLshPairs]] — Li–Owen–Zhang binning + Shrivastava–Li
    * rotation densification): the signature costs ONE pass over the
    * shingle hashes regardless of its length, vs `dd_minhash`'s
    * [[NumHashes]] permutation passes — the difference between hashing a
    * 100 TB corpus once and hashing it `numHashes` times. Same
    * candidates-then-exact-Jaccard discipline and the shared persisted
    * shingle corpus; the densification window is doc-keyed over a
    * constant 2·[[OphBins]]-row grid per doc, so the whole signature
    * stage is corpus-linear map/window work. The oracle replays binning,
    * cyclic borrow (IGNORE NULLS window), offsets, and band list-equality
    * joins exactly — every quantity is an integer until the final exact
    * Jaccard division.
    */
  def ddOph(spark: SparkSession, dir: String): DataFrame =
    Dedup
      .ophLshPairs(docs(spark, dir), "doc_id", "text", K, OphBins, OphBands, JaccardMin)
      .orderBy("a_id", "b_id")

  val ddOphSql: String =
    s"""WITH $shingleCte,
      el AS (SELECT doc_id, unnest(sh) AS h FROM s),
      binned AS (SELECT doc_id, h % $OphBins AS bin, min(h) AS v FROM el GROUP BY 1, 2),
      grid AS (SELECT doc_id, r.bin2 FROM (SELECT DISTINCT doc_id FROM s), range(0, ${2 * OphBins}) r(bin2)),
      vals AS (SELECT g.doc_id, g.bin2, b.v,
          CASE WHEN b.v IS NOT NULL THEN g.bin2 END AS srcbin
        FROM grid g LEFT JOIN binned b ON b.doc_id = g.doc_id AND b.bin = g.bin2 % $OphBins),
      filled AS (SELECT doc_id, bin2,
          first_value(v IGNORE NULLS) OVER w AS fv,
          first_value(srcbin IGNORE NULLS) OVER w AS fsrc
        FROM vals
        WINDOW w AS (PARTITION BY doc_id ORDER BY bin2
          ROWS BETWEEN CURRENT ROW AND $OphBins FOLLOWING)),
      dens AS (SELECT doc_id, bin2 AS bin, fv + ${Dedup.OphOffset} * (fsrc - bin2) AS dv
        FROM filled WHERE bin2 < $OphBins),
      sig AS (SELECT doc_id, bin // ${OphBins / OphBands} AS band,
          list(dv ORDER BY bin) AS karr
        FROM dens GROUP BY 1, 2),
      cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM sig a JOIN sig b
        ON a.band = b.band AND a.karr = b.karr AND a.doc_id < b.doc_id)
      SELECT * FROM (
        SELECT a_id, b_id, $sqlJac AS jac
        FROM cand JOIN s sa ON sa.doc_id = a_id JOIN s sb ON sb.doc_id = b_id)
      WHERE jac >= $JaccardMin ORDER BY a_id, b_id"""

  // ---- exact set-similarity join over order baskets -------------------------

  /** Exact cosine set-similarity self-join over order baskets (the
    * market-basket twin of the document-level near-dup family): each
    * order is the SET of its distinct parts, candidate pairs come from
    * the inverted index on parts (one posting equi-join — a pair is
    * generated once per shared part, never enumerated), the per-pair
    * overlap is one count aggregate, and membership is decided by the
    * INTEGER inequality `4·shared² >= n1·n2` (⟺ set cosine ≥ 0.5 —
    * exact membership, no float in the decision); the cosine itself
    * ships as a bit-exact payload (integer operands, one sqrt each, one
    * division — identical rounding on both engines).
    *
    * Scale shape: posting-join fan-out is Σ_p C(df(p), 2) with df
    * data-bounded (an order basket is small and a part's order count
    * doesn't grow with basket size), so candidates grow LINEARLY with
    * orders — measured 894k pairs at sf0.01 → 9.0M at sf0.1 for 10×
    * data. The thresholded production variant would add the dd_ngram
    * prefix-filter machinery; this query is the exact index-join form a
    * basket-analysis / collaborative-filter pipeline materializes.
    */
  def ddSetsim(spark: SparkSession, dir: String): DataFrame =
    setsimFrom(
      Tables
        .t(spark, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")))
      .orderBy("o1", "o2")

  /** The dd_setsim posting join on a caller-supplied `(o, p)` membership
    * frame — shared with ScaleProbe's `setsim_pairs` row so the probe
    * times the exact shipped plan, never a drifted copy.
    */
  def setsimFrom(membership: DataFrame): DataFrame = {
    val lp = graft.Caches.track(
      membership
        .select(col("o"), col("p"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val n = lp.groupBy("o").agg(count(lit(1)).as("n"))
    lp.select(col("o").as("o1"), col("p"))
      .join(lp.select(col("o").as("o2"), col("p")), Seq("p"))
      .filter(col("o1") < col("o2"))
      .groupBy("o1", "o2")
      .agg(count(lit(1)).as("shared"))
      .join(n.select(col("o").as("o1"), col("n").as("n1")), Seq("o1"))
      .join(n.select(col("o").as("o2"), col("n").as("n2")), Seq("o2"))
      .filter(col("shared") * col("shared") * 4 >= col("n1") * col("n2"))
      .select(
        col("o1"),
        col("o2"),
        col("shared"),
        col("n1"),
        col("n2"),
        (col("shared").cast("double") / (sqrt(col("n1")) * sqrt(col("n2")))).as("cos"))
  }

  val ddSetsimSql: String =
    """WITH lp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      n AS (SELECT o, count(*) AS n FROM lp GROUP BY o),
      pairs AS (
        SELECT a.o AS o1, b.o AS o2, count(*) AS shared
        FROM lp a JOIN lp b ON a.p = b.p AND a.o < b.o
        GROUP BY 1, 2)
      SELECT o1, o2, shared, n1.n AS n1, n2.n AS n2,
        shared::DOUBLE / (sqrt(n1.n) * sqrt(n2.n)) AS cos
      FROM pairs JOIN n n1 ON n1.o = o1 JOIN n n2 ON n2.o = o2
      WHERE shared * shared * 4 >= n1.n * n2.n
      ORDER BY o1, o2"""

  // ---- greedy max-coverage selection ----------------------------------------

  private val McK = 5

  /** Greedy maximum-coverage data selection: pick [[McK]] documents, each
    * round taking the doc whose DISTINCT tokens add the most not-yet-
    * covered vocabulary (ties to the lower doc_id) — the classic
    * (1 − 1/e)-approximate submodular-coverage primitive behind
    * "select the subset that teaches the most vocabulary / covers the
    * most facilities", sitting next to [[dsKcenter]]'s distance variant.
    * Zero-gain docs stay eligible (left join fills 0), so the selection
    * is total and deterministic even after coverage saturates.
    *
    * Scale shape: per round one anti-join of the token frame against the
    * covered set + one map-side-combined gain count + a ONE-ROW driver
    * pull (k-bounded, the ds_kcenter discipline); the covered set is
    * vocabulary-sized, never corpus-sized. All integers — hash-exact.
    */
  def dsMaxcover(spark: SparkSession, dir: String): DataFrame = {
    val tok = graft.Caches.track(
      Tables
        .t(spark, dir, "documents")
        .select(
          col("doc_id"),
          explode(graft.functions.TextAnalysis.tokens(col("text"))).as("tok"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val ids = tok.select("doc_id").distinct()
    var picked = Vector.empty[(Long, Long)]
    // Incrementally shrinking uncovered frame (r15 continuation): the
    // per-round gain g(d) = |tok(d) \ covered| equals the per-doc row
    // count of `uncovered` = tok minus every picked doc's tokens, so
    // instead of rebuilding `covered` from scratch (a distinct SHUFFLE)
    // and anti-joining the FULL token frame per round (a second
    // shuffle), each round subtracts only the NEW winner's tokens — one
    // document's distinct token list, bounded by document length at any
    // corpus scale, hence safely broadcast — from the persisted
    // uncovered frame. Two exchanges per round become zero; the greedy
    // picks and recorded gains are value-identical (MaxcoverSpec replays
    // the rounds brute-force; oracle re-gated at all three SFs).
    var uncovered = tok
    for (_ <- 1 to McK) {
      val pickedIds = picked.map(_._1)
      val w = ids
        .filter(!col("doc_id").isInCollection(pickedIds))
        .join(
          uncovered.groupBy("doc_id").agg(count(lit(1)).as("g")),
          Seq("doc_id"),
          "left")
        .select(col("doc_id"), coalesce(col("g"), lit(0L)).as("g"))
        .orderBy(col("g").desc, col("doc_id"))
        .limit(1)
        .collect()(0)
      picked = picked :+ ((w.getLong(0), w.getLong(1)))
      val newToks = tok.filter(col("doc_id") === lit(w.getLong(0))).select("tok")
      uncovered = graft.Caches.track(
        uncovered
          .join(broadcast(newToks), Seq("tok"), "left_anti")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    }
    import spark.implicits._
    picked.zipWithIndex
      .map { case ((id, g), i) =>
        (i + 1L, id, g, picked.take(i + 1).map(_._2).sum)
      }
      .toDF("round", "doc_id", "gain", "covered")
      .orderBy("round")
  }

  val dsMaxcoverSql: String = {
    val toks = raw"list_filter(string_split_regex(text, '\s+'), t -> t <> '')"
    def round(r: Int) =
      s"""g$r AS (SELECT d.doc_id, coalesce(x.g, 0)::BIGINT AS g
          FROM ids d LEFT JOIN (
            SELECT doc_id, count(*) AS g FROM t
            WHERE tok NOT IN (SELECT tok FROM c${r - 1}) GROUP BY doc_id) x
          ON x.doc_id = d.doc_id
          WHERE d.doc_id NOT IN (SELECT doc_id FROM p${r - 1})),
      w$r AS (SELECT $r::BIGINT AS round, doc_id, g AS gain FROM g$r
        ORDER BY g DESC, doc_id LIMIT 1),
      c$r AS MATERIALIZED (SELECT tok FROM c${r - 1}
        UNION SELECT t.tok FROM t JOIN w$r USING (doc_id)),
      p$r AS MATERIALIZED (SELECT round, doc_id, gain FROM p${r - 1}
        UNION ALL SELECT round, doc_id, gain FROM w$r)"""
    s"""WITH t AS MATERIALIZED (
        SELECT DISTINCT doc_id, unnest($toks) AS tok FROM documents),
      ids AS MATERIALIZED (SELECT DISTINCT doc_id FROM t),
      c0 AS (SELECT tok FROM t WHERE false),
      p0 AS (SELECT 0::BIGINT AS round, 0::BIGINT AS doc_id, 0::BIGINT AS gain WHERE false),
      ${(1 to McK).map(round).mkString(",\n      ")}
      SELECT round, doc_id, gain,
        sum(gain) OVER (ORDER BY round)::BIGINT AS covered
      FROM p$McK ORDER BY round"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ds_kcenter" -> dsKcenter _,
    "ds_facility" -> dsFacility _,
    "dd_setsim" -> ddSetsim _,
    "dd_oph" -> ddOph _,
    "ds_maxcover" -> dsMaxcover _,
    "dd_cdc" -> ddCdc _,
    "ds_pareto" -> dsPareto _,
    "ds_temperature" -> dsTemperature _,
    "dd_paragraph" -> ddParagraph _,
    "ds_gkfold" -> dsGkfold _,
    "ds_dupweight" -> dsDupweight _,
    "ds_erasure" -> dsErasure _,
    "ds_dsir" -> dsDsir _,
    "ds_shuffle" -> dsShuffle _,
    "ds_contrastive" -> dsContrastive _,
    "dd_incremental" -> ddIncremental _,
    "ds_split" -> dsSplit _,
    "ds_apportion" -> dsApportion _,
    "ds_decay" -> dsDecay _,
    "dd_winnow" -> ddWinnow _,
    "ds_overlap" -> dsOverlap _,
    "ds_nearleak" -> dsNearLeak _,
    "ds_leakage" -> dsLeakage _,
    "dd_exact" -> ddExact _,
    "dd_ngram" -> ddNgram _,
    "dd_threshold" -> ddThreshold _,
    "dd_minhash" -> ddMinhash _,
    "dd_simhash" -> ddSimhash _,
    "dd_embcos" -> ddEmbcos _,
    "dd_srp" -> ddSrp _,
    "dd_clusters" -> ddClusters _,
    "dd_chaining" -> ddChaining _,
    "dd_keepbest" -> ddKeepbest _,
    "ds_sample" -> dsSample _,
    "ds_weighted" -> dsWeighted _,
    "ds_pack" -> dsPack _,
    "ds_bucket" -> dsBucket _,
    "dd_contaminate" -> ddContaminate _,
    "dd_bloom" -> ddBloom _,
    "dd_containment" -> ddContainment _,
    "ds_hardneg" -> dsHardneg _,
    "dd_boilerplate" -> ddBoilerplate _,
    "ds_mixture" -> dsMixture _,
    "ds_interleave" -> dsInterleave _,
    "dd_substring" -> ddSubstring _,
    "dd_intradoc" -> ddIntradoc _,
    "ds_curriculum" -> dsCurriculum _,
    "ds_tokenbudget" -> dsTokenbudget _,
    "dd_nearinc" -> ddNearinc _,
    "dd_novelty" -> ddNovelty _,
    "ds_stratified" -> dsStratified _,
    "dd_rarity" -> ddRarity _,
    "ds_balance" -> dsBalance _,
    "dd_funnel" -> ddFunnel _,
    "dd_recall" -> ddRecall _)

  val oracles: Map[String, String] = Map(
    "ds_kcenter" -> dsKcenterSql,
    "ds_facility" -> dsFacilitySql,
    "dd_setsim" -> ddSetsimSql,
    "dd_oph" -> ddOphSql,
    "ds_maxcover" -> dsMaxcoverSql,
    "dd_cdc" -> ddCdcSql,
    "ds_pareto" -> dsParetoSql,
    "ds_temperature" -> dsTemperatureSql,
    "dd_paragraph" -> ddParagraphSql,
    "ds_gkfold" -> dsGkfoldSql,
    "ds_dupweight" -> dsDupweightSql,
    "ds_erasure" -> dsErasureSql,
    "ds_dsir" -> dsDsirSql,
    "ds_shuffle" -> dsShuffleSql,
    "ds_contrastive" -> dsContrastiveSql,
    "dd_substring" -> ddSubstringSql,
    "dd_intradoc" -> ddIntradocSql,
    "ds_curriculum" -> dsCurriculumSql,
    "ds_mixture" -> dsMixtureSql,
    "ds_interleave" -> dsInterleaveSql,
    "dd_contaminate" -> ddContaminateSql,
    "dd_bloom" -> ddBloomSql,
    "dd_containment" -> ddContainmentSql,
    "ds_hardneg" -> dsHardnegSql,
    "dd_boilerplate" -> ddBoilerplateSql,
    "dd_incremental" -> ddIncrementalSql,
    "ds_split" -> dsSplitSql,
    "ds_apportion" -> dsApportionSql,
    "ds_decay" -> dsDecaySql,
    "dd_winnow" -> ddWinnowSql,
    "ds_overlap" -> dsOverlapSql,
    "ds_nearleak" -> dsNearLeakSql,
    "ds_leakage" -> dsLeakageSql,
    "dd_exact" -> ddExactSql,
    "dd_ngram" -> ddNgramSql,
    "dd_threshold" -> ddThresholdSql,
    "dd_minhash" -> ddMinhashSql,
    "dd_simhash" -> ddSimhashSql,
    "dd_embcos" -> ddEmbcosSql,
    "dd_srp" -> ddSrpSql,
    "dd_clusters" -> ddClustersSql,
    "dd_chaining" -> ddChainingSql,
    "dd_keepbest" -> ddKeepbestSql,
    "ds_sample" -> dsSampleSql,
    "ds_weighted" -> dsWeightedSql,
    "ds_pack" -> dsPackSql,
    "ds_bucket" -> dsBucketSql,
    "ds_tokenbudget" -> dsTokenbudgetSql,
    "dd_nearinc" -> ddNearincSql,
    "dd_novelty" -> ddNoveltySql,
    "ds_stratified" -> dsStratifiedSql,
    "dd_rarity" -> ddRaritySql,
    "ds_balance" -> dsBalanceSql,
    "dd_funnel" -> ddFunnelSql,
    "dd_recall" -> ddRecallSql)
}
