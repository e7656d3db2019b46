package graft.operators

import graft.functions.{Compat, TextAnalysis}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Deduplication operators for a training-data pipeline.
  *
  * Four families, ordered from exact to fuzzy:
  *   - exact content dedup (hash group-by — one shuffle on the hash);
  *   - n-gram Jaccard pairs (quadratic verify — the correctness baseline);
  *   - MinHash + LSH banding (the scale path: shuffle on band key, candidates
  *     only where a band collides, then verify true Jaccard);
  *   - SimHash with banded Hamming join (pigeonhole over 4 x 8-bit bands
  *     guarantees every pair within Hamming distance 3 collides in >=1 band).
  *
  * All hashes are md5-derived ([[graft.functions.Hashing]]) so the DuckDB
  * oracle reproduces every signature, band key, and verdict bit-for-bit. All
  * operators are pure Column expressions + joins: no UDFs, no driver-side
  * loops.
  *
  * Self-join inputs (signatures, shingle sets) are persisted MEMORY_AND_DISK
  * before the join so the expensive md5/shingle work runs once, not once per
  * join side — at 100 TB the signature frame is a tiny fraction of the
  * corpus (ids + hashes) and is exactly what you'd materialize on a cluster.
  */
object Dedup {

  /** Exact dedup: one row per distinct content hash with the kept (min) id
    * and the number of copies. Single hash-shuffle; at 100 TB this is the
    * map-side-combine `groupBy` Spark already does best.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(md5(TextAnalysis.normalized(col(textCol))).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Incremental (batch-over-ledger) dedup: the rows of `incoming` whose
    * content hash is NOT already present in `existing`, collapsed to one
    * row per new hash (min id kept, copy count recorded). This is the
    * ingest-time shape of exact dedup at scale: the existing corpus is
    * represented only by its distinct hash ledger (a tiny fraction of
    * corpus bytes, the thing you'd keep materialized between batches), and
    * the check is a left-anti join shuffled on the hash — no re-scan of
    * old payloads.
    */
  def incrementalNew(
      existing: DataFrame,
      incoming: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val ledger = existing
      .select(md5(TextAnalysis.normalized(col(textCol))).as("content_hash"))
      .distinct()
    incoming
      .select(col(idCol).as("id"), md5(TextAnalysis.normalized(col(textCol))).as("content_hash"))
      .groupBy("content_hash")
      .agg(min(col("id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .join(ledger, Seq("content_hash"), "left_anti")
  }

  /** Benchmark decontamination: the corpus documents sharing at least one
    * hashed k-token n-gram with any benchmark document, with the count of
    * distinct shared n-grams per document (the GPT-3/Gopher-style overlap
    * audit a training pipeline runs before a model ever sees the corpus).
    *
    * Scale shape: held-out benchmark suites are fixed-size while the corpus
    * grows without bound, so the benchmark n-gram ledger is the broadcast
    * side and the semi-join runs map-side over the exploded corpus n-grams
    * — the corpus is never self-joined and never broadcast, and the only
    * shuffle carries (id) keyed hit counts for the final per-document
    * aggregation.
    */
  def contaminationHits(
      corpus: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      k: Int): DataFrame = {
    val benchGrams = bench
      .select(explode(hashedShingleSet(col(textCol), k)).as("g"))
      .distinct()
    corpus
      .select(col(idCol).as("id"), explode(hashedShingleSet(col(textCol), k)).as("g"))
      .join(broadcast(benchGrams), Seq("g"), "left_semi")
      .groupBy("id")
      .agg(count(lit(1)).as("n_hit_ngrams"))
  }

  /** Cross-document boilerplate removal (the C4-style "line dedup" pass):
    * documents are chunked into aligned w-token spans, any span occurring
    * in at least `minDocs` distinct documents is boilerplate, and every
    * occurrence of a boilerplate span is removed from every document. The
    * output keeps one row per input document with the cleaned text (spans
    * re-joined in original order) and kept/dropped span counts.
    *
    * Scale shape: the span-frequency pass is one hash-shuffle of
    * (span_hash, id) pairs — the same shape as exact dedup; the
    * boilerplate ledger it produces is tiny by construction (only spans
    * repeated across `minDocs`+ documents), so the removal pass is a
    * broadcast left join and the corpus is touched map-side only, with
    * the final reassembly grouping on the document id.
    */
  /** Aligned w-token chunks of the normalized text ("lines" for a corpus
    * without newlines). (n + w - 1) / w chunks; slice truncates the last.
    * The size-0 guard matters: sequence(0, -1) would DESCEND, not be
    * empty.
    */
  def alignedSpans(textCol: Column, w: Int): Column = {
    val tk = TextAnalysis.tokens(TextAnalysis.normalized(textCol))
    val nSpans = ((size(tk) + lit(w - 1)) / lit(w)).cast("int")
    when(size(tk) === 0, array().cast("array<string>"))
      .otherwise(
        transform(
          sequence(lit(0), nSpans - lit(1)),
          i => concat_ws(" ", slice(tk, i * lit(w) + lit(1), lit(w)))))
  }

  /** Intra-document span dedup: drop every repeat of a span WITHIN its
    * document, keeping first occurrences in order — the doc-local
    * repetition-removal transform (the cross-document dual is
    * [[removeBoilerplateSpans]]). Pure per-row array expressions
    * (`array_distinct` preserves first-occurrence order), so this is a
    * map-only pass with no shuffle at any corpus size.
    */
  def intraDocSpanDedup(docs: DataFrame, idCol: String, textCol: String, w: Int): DataFrame = {
    val spans = alignedSpans(col(textCol), w)
    val kept = array_distinct(spans)
    docs.select(
      col(idCol).as("id"),
      concat_ws(" ", kept).as("clean_text"),
      size(kept).cast("long").as("n_kept"),
      (size(spans) - size(kept)).cast("long").as("n_dropped"))
  }

  /** Row-count cutoff for broadcasting the boilerplate-span ledger: ~1 M
    * md5 rows is ~50 MB hashed-relation — a safe driver/executor bite.
    * The ledger's size is DATA-DEPENDENT (on a C4-scale web crawl the
    * spans repeated across `minDocs`+ documents easily number 10^7-10^8),
    * so an unconditional `broadcast()` hint — which bypasses Spark's own
    * size threshold — would OOM at 100 TB. Mirrors
    * [[ConnectedComponents.LocalEdgeThreshold]]'s measured dispatch:
    * count first, then pick the physical strategy.
    */
  val BoilerplateBroadcastThreshold: Long = 1L << 20

  def removeBoilerplateSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      w: Int,
      minDocs: Int,
      broadcastThreshold: Long = BoilerplateBroadcastThreshold): DataFrame = {
    val spans = alignedSpans(col(textCol), w)
    // _outer: a document with zero spans (empty text) must still emit its
    // (empty) output row, so it explodes to one null-span row. The span
    // hash is computed ONCE here and persisted with the explosion — the
    // ledger build and the probe join both read it back instead of each
    // re-hashing every span (r5 verdict: md5 ran in both consumers).
    // Widened (r15): off the single-split harness scan the explode+md5
    // otherwise runs as ONE task — measured 3.6 s serial CPU, 65% of
    // dd_boilerplate; no-op on any frame already at session width.
    val ex = graft.Caches.track(
      Lineage
        .widen(docs)
        .select(col(idCol).as("id"), posexplode_outer(spans).as(Seq("pos", "span")))
        .withColumn("h", md5(col("span")))
        .persist(StorageLevel.MEMORY_AND_DISK))
    // The ledger is persisted because it is consumed twice: once by the
    // size probe (an exact count — the dispatch measurement) and once by
    // the probe join. Both paths return identical rows — pinned by
    // DedupSpec's "broadcast gate: both ledger paths" case, which runs
    // the same corpus with broadcastThreshold = 0 (forcing the
    // shuffle-join arm) and asserts row equality with the default; the
    // ScaleProbe `boilerplate_join` row exercises the same arm at
    // inflation. Only the physical join changes between the arms.
    val ledger = graft.Caches.track(
      ex
        .select(col("h"), col("id"))
        .distinct()
        .groupBy("h")
        .agg(count(lit(1)).as("nd"))
        .filter(col("nd") >= minDocs)
        .select(col("h").as("bh"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    val gated = if (ledger.count() <= broadcastThreshold) broadcast(ledger) else ledger
    ex
      .join(gated, col("h") === col("bh"), "left")
      .withColumn("boiler", col("bh").isNotNull)
      .groupBy("id")
      .agg(
        concat_ws(
          " ",
          transform(
            array_sort(collect_list(
              when(!col("boiler") && col("span").isNotNull, struct(col("pos"), col("span"))))),
            s => s.getField("span"))).as("clean_text"),
        sum(when(col("boiler") || col("span").isNull, 0L).otherwise(1L)).as("n_kept"),
        sum(when(col("boiler"), 1L).otherwise(0L)).as("n_dropped"))
  }

  /** Global FIRST-OCCURRENCE span dedup (the Falcon/RefinedWeb paragraph
    * rule): every aligned `w`-token span keeps only its first occurrence
    * in the corpus-wide `(id, pos)` order — later repeats are stripped,
    * wherever they appear. Contrast [[removeBoilerplateSpans]], which
    * strips a frequent span from EVERY document (including the first),
    * and [[intraDocSpanDedup]], which only looks within one document;
    * first-occurrence dedup is the variant that preserves exactly one
    * training copy of every span.
    *
    * Scale shape: the winner election shuffles `(hash, id, pos)` triples
    * only (map-side-combined `min(struct(id, pos))` per hash); the
    * winner frame is corpus-sized in the worst case, so it is JOIN-keyed
    * back against the exploded frame, never broadcast. Payload text
    * crosses a shuffle once, in the per-doc reassembly — same cost as
    * the boilerplate pass.
    */
  def globalFirstSpanDedup(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      w: Int): DataFrame = {
    val spans = alignedSpans(col(textCol), w)
    // Widened (r15): off the single-split harness scan the explode+md5
    // otherwise runs as ONE task — measured 3.6 s serial CPU, 65% of
    // dd_boilerplate; no-op on any frame already at session width.
    val ex = graft.Caches.track(
      Lineage
        .widen(docs)
        .select(col(idCol).as("id"), posexplode_outer(spans).as(Seq("pos", "span")))
        .withColumn("h", md5(col("span")))
        .persist(StorageLevel.MEMORY_AND_DISK))
    val firsts = ex
      .filter(col("span").isNotNull)
      .groupBy(col("h").as("fh"))
      .agg(min(struct(col("id"), col("pos"))).as("first"))
    ex
      .join(firsts, col("h") === col("fh"), "left")
      .withColumn(
        "keep",
        col("span").isNotNull &&
          col("first.id") === col("id") && col("first.pos") === col("pos"))
      .groupBy("id")
      .agg(
        concat_ws(
          " ",
          transform(
            array_sort(collect_list(when(col("keep"), struct(col("pos"), col("span"))))),
            s => s.getField("span"))).as("clean_text"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(!col("keep") && col("span").isNotNull, 1L).otherwise(0L)).as("n_dropped"))
  }

  /** Corpus self-overlap audit (the signal behind exact-substring dedup,
    * Lee et al. "Deduplicating Training Data Makes Language Models
    * Better"): per document, how many of its distinct sliding k-token
    * windows also occur in ANY other document, and the duplicated
    * fraction. Unaligned windows (stride 1) — the complement of the
    * aligned-chunk boilerplate pass.
    *
    * Scale shape: unlike decontamination there is no small side — the
    * corpus is checked against itself — so the window-frequency pass is
    * an honest (hash, id) shuffle with map-side combine, the duplicated
    * ledger is join-keyed (not broadcast: its size is data-dependent),
    * and the per-doc rollup shuffles ids only. Window hashes are 60-bit
    * md5-derived ([[hashedShingleSet]]) so payload text never shuffles.
    */
  def duplicatedWindowStats(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int): DataFrame = {
    val wins = graft.Caches.track(
      docs
        .select(col(idCol).as("id"), explode(hashedShingleSet(col(textCol), k)).as("g"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    // wins is distinct per (id, g) by construction, so count(*) per g is
    // the distinct-document frequency.
    val dup = wins.groupBy("g").agg(count(lit(1)).as("nd")).filter(col("nd") >= 2).select("g")
    val perDoc = wins.groupBy("id").agg(count(lit(1)).as("n_windows"))
    val dupPerDoc = wins
      .join(dup, Seq("g"), "left_semi")
      .groupBy("id")
      .agg(count(lit(1)).as("n_dup_windows"))
    perDoc
      .join(dupPerDoc, Seq("id"), "left")
      .select(
        col("id"),
        col("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        (coalesce(col("n_dup_windows"), lit(0L)) / col("n_windows")).as("dup_frac"))
  }

  /** Distinct k-token shingles of the normalized text (string form — used
    * by tests and the fingerprint operators; the dedup pair operators use
    * the hashed corpus below).
    */
  def shingleSet(textCol: Column, k: Int): Column =
    TextAnalysis.shingles(TextAnalysis.tokens(TextAnalysis.normalized(textCol)), k)

  // --- hashed shingles -----------------------------------------------------
  // A shingle is represented as a 60-bit hash combined from its tokens' md5
  // hashes: one md5 per TOKEN (not per shingle) and no shingle-string
  // allocation. The combine is position-sensitive and int64-safe on both
  // engines (30-bit split multiply-adds mod 2^61-1), so the DuckDB oracle
  // replays every shingle hash bit-for-bit.

  /** Fold seed for [[shingleHash]]. */
  val ShingleSeed: Long = 1099511628211L
  private val CA1 = 794877253L
  private val CA2 = 948253789L
  private val CA3 = 648435761L
  private val CA4 = 1029388717L
  private val CB = 386910071L
  private val Mask30 = (1L << 30) - 1

  private def combineStep(acc: Column, h: Column): Column =
    (lit(CA1) * shiftright(acc, 30) + lit(CA2) * acc.bitwiseAND(lit(Mask30)) +
      lit(CA3) * shiftright(h, 30) + lit(CA4) * h.bitwiseAND(lit(Mask30)) + lit(CB)) %
      lit(MinhashPrime)

  /** Ordered fold of token hashes into one shingle hash. */
  def shingleHash(tokenHashes: Column): Column =
    aggregate(tokenHashes, lit(ShingleSeed), (acc, h) => combineStep(acc, h))

  /** DuckDB expression mirroring [[combineStep]]/[[shingleHash]] over a
    * BIGINT list expression.
    */
  def sqlShingleHashDuck(lst: String): String =
    s"""list_reduce(list_prepend($ShingleSeed, $lst), (a, b) ->
       ($CA1 * (a // 1073741824) + $CA2 * (a % 1073741824) +
        $CA3 * (b // 1073741824) + $CA4 * (b % 1073741824) + $CB) % $MinhashPrime)"""

  /** Distinct hashed k-shingles of the normalized text: tokens -> per-token
    * md5Long60 -> windowed position-sensitive combine, all windows in one
    * native pass ([[graft.expressions.ShingleHashes]]). Documents shorter
    * than k tokens hash their whole token list (the same "one shingle =
    * whole text" fallback the string form uses).
    */
  def hashedShingleSet(textCol: Column, k: Int): Column = {
    val th = transform(
      TextAnalysis.tokens(TextAnalysis.normalized(textCol)),
      t => graft.functions.Hashing.md5Long60(t))
    array_distinct(
      Compat.column(graft.expressions.ShingleHashes(Compat.expression(th), k)))
  }

  /** Composable reference form of [[hashedShingleSet]]'s window fold, kept
    * for cross-checking the native expression.
    */
  def hashedShingleSetHof(textCol: Column, k: Int): Column = {
    val th = transform(
      TextAnalysis.tokens(TextAnalysis.normalized(textCol)),
      t => graft.functions.Hashing.md5Long60(t))
    when(
      size(th) >= k,
      array_distinct(transform(
        sequence(lit(1), size(th) - (k - 1)),
        i => shingleHash(slice(th, i, lit(k))))))
      .otherwise(array(shingleHash(th)))
  }

  /** Jaccard similarity of two pre-computed shingle-set columns. */
  def setJaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Shared, persisted (id, sh) corpus frame of hashed shingle sets: one
    * tokenization + one md5-per-token pass serves every shingle-based dedup
    * operator in the session — Spark's CacheManager dedupes identical
    * canonical plans, so the first operator to run materializes it and the
    * rest read the cache.
    */
  def shingledCorpus(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    Partitioning
      .ensureWidth(docs.select(col(idCol).as("id"), col(textCol).as(textCol)))
      .select(col("id"), hashedShingleSet(col(textCol), k).as("sh"))
      .persist(StorageLevel.MEMORY_AND_DISK)

  /** Prefix tokens for the AllPairs/PPJoin prefix filter: under ANY global
    * total order on tokens (lexicographic here), two sets with Jaccard >= t
    * must share an element within the first `n - ceil(t*n) + 1` tokens of
    * each — because J >= t forces overlap >= ceil(t*n), and an overlap of o
    * must intersect the first n - o + 1 elements. The filter is lossless:
    * candidate generation over exploded prefixes finds every qualifying
    * pair.
    */
  def prefixTokens(sortedSet: Column, threshold: Double): Column =
    slice(
      sortedSet,
      lit(1),
      (size(sortedSet) - ceil(lit(threshold) * size(sortedSet))).cast("int") + lit(1))

  /** All same-`blockCol` pairs with shingle Jaccard >= threshold — exact
    * (the correctness baseline for [[minhashLsh]]), but NOT quadratic: a
    * prefix-filter candidate join (explode each doc's short shingle prefix,
    * equi-join on (block, prefix-shingle)) replaces the all-pairs product,
    * then true Jaccard verifies each candidate once. One shuffle keyed by
    * (block, shingle) for candidates + hash joins back to the persisted
    * shingle sets — the same inverted-index shape AllPairs/PPJoin use at
    * scale.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      k: Int,
      threshold: Double): DataFrame = {
    val base = shingledCorpus(docs, idCol, textCol, k)
    val blocks = docs.select(col(idCol).as("id"), col(blockCol).as("block"))
    val pref = base
      .join(blocks, Seq("id"))
      .select(
        col("id"),
        col("block"),
        size(col("sh")).as("n"),
        posexplode(prefixTokens(array_sort(col("sh")), threshold)).as(Seq("pos", "tok")))
    // Slim (id, bitmap, popcount) sidecar for the suffix filter — derived
    // from the persisted corpus, 8*BitmapWords+8 bytes per doc. The own-
    // popcount rides along because the lossless overlap bound needs each
    // side's within-set collision count (n - popcount).
    val masks = base
      .select(col("id"), tokenBitmap(col("sh")).as("bm"))
      .withColumn("bmc", bitmapOverlapBound(col("bm"), col("bm")))
    val cand = ppjoinCandidates(pref, threshold, Some(masks))
    cand
      .join(base.select(col("id").as("a_id"), col("sh").as("a_sh")), Seq("a_id"))
      .join(base.select(col("id").as("b_id"), col("sh").as("b_sh")), Seq("b_id"))
      .withColumn("jac", setJaccard(col("a_sh"), col("b_sh")))
      .filter(col("jac") >= threshold)
      .select("a_id", "b_id", "jac")
  }

  /** Bitmap width for the suffix filter: 16 longs = 1024 bits per record.
    * Sized so typical document shingle sets (~50–300 elements) fill well
    * under half the bits — random AND-collision noise stays far below the
    * required-overlap thresholds, so non-matching candidates actually get
    * pruned while the bound stays lossless at any fill.
    */
  val BitmapWords = 16

  /** Single-hash Bloom bitmap of a hash-set column (see
    * [[graft.expressions.TokenBitmap]]).
    */
  def tokenBitmap(hashes: Column): Column =
    Compat.column(
      graft.expressions.TokenBitmap(Compat.expression(hashes), BitmapWords))

  /** Lossless upper bound on |A ∩ B| from two bitmaps. */
  def bitmapOverlapBound(a: Column, b: Column): Column =
    Compat.column(
      graft.expressions.BitmapOverlapBound(Compat.expression(a), Compat.expression(b)))

  /** PPJoin candidate generation from a positional prefix frame
    * `(id, block, n, pos, tok)`: equi-join prefixes on (block, tok), then
    * prune with LOSSLESS bounds before any payload join —
    *
    *   - size ratio: J >= t implies min(n) >= t * max(n);
    *   - positional overlap bound: with both sets in ONE global sort
    *     order, shared elements at-or-before the LAST prefix collision
    *     (position pair ia, ib — the same token on both sides, since
    *     shared tokens keep their relative order) are all prefix
    *     collisions, so true overlap <= c + min(nA - ia - 1, nB - ib - 1),
    *     which must reach t/(1+t) * (nA + nB) for J >= t;
    *   - suffix (bitmap) filter, when `masks` is given: PPJoin+'s third
    *     prune re-expressed for a shuffle engine — instead of
    *     binary-searching record suffixes (which would drag the full
    *     arrays into the candidate shuffle), each record carries a
    *     [[BitmapWords]]-long single-hash Bloom bitmap of its WHOLE set
    *     plus the bitmap's own popcount, and
    *     `popcount(bmA & bmB) + min(nA - pc(bmA), nB - pc(bmB))`
    *     >= t/(1+t) * (nA + nB) is required. The first term counts bits
    *     shared tokens must light on both sides; the second is each
    *     side's within-set collision count, which bounds how far the
    *     AND-popcount can UNDER-count overlap when two distinct shared
    *     tokens collide into one bit (for any bit with aCnt/bCnt tokens,
    *     shared tokens there <= min(aCnt, bCnt) = 1 + (min - 1), and the
    *     (min - 1) excesses sum to at most min(dA, dB)). Candidates are
    *     therefore only ever dropped when even the optimistic bound
    *     cannot reach the required overlap — lossless at ANY bitmap fill.
    *     Prunes the near-miss pairs (high prefix collision, low true
    *     overlap) that survive the positional bound under skewed/
    *     adversarial corpora, before the wide array join-back + exact
    *     verify.
    *
    * The groupBy replaces the candidate dropDuplicates at identical
    * shuffle cost while also collecting the positional stats.
    *
    * The prefix join is LENGTH-PARTITIONED (the AllPairs length-index
    * refinement): joining on bare (block, tok) materializes f² collision
    * rows per hot token and only discards cross-length pairs AFTER the
    * pair groupBy, so a corpus mixing tweets and books pays the full
    * product on every shared token. Record lengths are bucketed into
    * geometric bands with INTEGER boundaries b₀=1, bᵢ₊₁ = max(bᵢ+1,
    * ceil(bᵢ/t)) — J >= t forces max(n) <= min(n)/t < bᵢ₊₂ for a short
    * side in band i, so a qualifying pair is at most ONE band apart, with
    * no floating-point boundary hazard (the band lookup is integer
    * compares against exact boundaries, not a transcendental log). The
    * longer side ("host", ties broken by id) emits its prefix tokens once
    * at its own band; every record also emits as "guest" at its own band
    * and the next, so each qualifying pair meets exactly once — at the
    * host's band — and each shared prefix token still contributes exactly
    * one row to the collision count. Cross-band products never enter the
    * join; the guest stream doubles (2 rows per prefix token), a constant
    * factor, in exchange for collision volume per hot token dropping from
    * f² to the sum of adjacent-band products.
    */
  private[graft] def ppjoinCandidates(
      pref: DataFrame,
      threshold: Double,
      masks: Option[DataFrame] = None): DataFrame = {
    // Integer-exact geometric band boundaries. Capped at 4096 entries /
    // 2^24 max length: longer records all land in the open-ended top band
    // (less pruning there, still lossless).
    val boundaries: Array[Long] = {
      val buf = scala.collection.mutable.ArrayBuffer(1L)
      while (buf.last < (1L << 24) && buf.length < 4096)
        buf += math.max(buf.last + 1, math.ceil(buf.last / threshold).toLong)
      buf.toArray
    }
    // band(n) = count of boundaries <= n, an integer fold over the
    // broadcast boundary array — codegen'd, no join, no log().
    def bandOf(n: Column): Column =
      aggregate(
        lit(boundaries),
        lit(0),
        (acc, b) => acc + when(n >= b, 1).otherwise(0))
    val banded = pref.withColumn("band", bandOf(col("n")))
    val host = banded.select(
      col("id").as("a_id"), col("block"), col("n").as("a_n"), col("pos").as("a_pos"),
      col("tok"), col("band"))
    val guest = banded.select(
      col("id").as("b_id"), col("block"), col("n").as("b_n"), col("pos").as("b_pos"),
      col("tok"), explode(array(col("band"), col("band") + 1)).as("band"))
    val positional = host
      .join(guest, Seq("block", "tok", "band"))
      // host is the (n, id)-lexicographically larger side: generates each
      // unordered pair exactly once, at the host's band.
      .filter(
        col("a_n") > col("b_n") || (col("a_n") === col("b_n") && col("a_id") > col("b_id")))
      .groupBy("a_id", "b_id")
      .agg(
        count(lit(1)).as("c"),
        max(col("a_pos")).as("ia"),
        max(col("b_pos")).as("ib"),
        max(col("a_n")).as("a_n"),
        max(col("b_n")).as("b_n"))
      // Epsilon-relaxed comparisons: the real thresholds t*max and
      // t/(1+t)*(nA+nB) are irrational in binary (t=0.9 -> 9/19), and the
      // rounded-UP double can exceed the exact value, silently pruning a
      // pair whose Jaccard is exactly t (e.g. |A|=63, |B|=70, A subset B:
      // 0.9/1.9*133 evaluates to 63.000000000000014 > 63). Subtracting a
      // slack far above double error but below 1 integer unit keeps the
      // bounds lossless — boundary candidates pass through and the exact
      // verify settles them.
      .filter(
        least(col("a_n"), col("b_n")).cast("double") >=
          lit(threshold) * greatest(col("a_n"), col("b_n")) - lit(1e-6))
      .filter(
        (col("c") + least(col("a_n") - col("ia") - 1, col("b_n") - col("ib") - 1))
          .cast("double") >=
          lit(threshold / (1 + threshold)) * (col("a_n") + col("b_n")) - lit(1e-6))
    // host/guest roles order by length, not id — normalize to a_id < b_id,
    // the contract the verify join-back and the oracles sort on.
    def normalized(df: DataFrame): DataFrame =
      df.select(
        least(col("a_id"), col("b_id")).as("a_id"),
        greatest(col("a_id"), col("b_id")).as("b_id"))
    masks match {
      case None => normalized(positional)
      case Some(m) =>
        normalized(
          positional
            .join(
              m.select(col("id").as("a_id"), col("bm").as("a_bm"), col("bmc").as("a_bmc")),
              Seq("a_id"))
            .join(
              m.select(col("id").as("b_id"), col("bm").as("b_bm"), col("bmc").as("b_bmc")),
              Seq("b_id"))
            .filter(
              (bitmapOverlapBound(col("a_bm"), col("b_bm")) +
                least(col("a_n") - col("a_bmc"), col("b_n") - col("b_bmc"))).cast("double") >=
                lit(threshold / (1 + threshold)) * (col("a_n") + col("b_n")) - lit(1e-6)))
    }
  }

  /** Modulus for the MinHash permutation family: 2^61 - 1 (prime). */
  val MinhashPrime: Long = 2305843009213693951L

  /** Deterministic multiply-shift coefficients (a_hi, a_lo, b) for each of
    * the `numHashes` permutations. Seeded java.util.Random (a specified
    * LCG), so every engine/run derives the identical family; coefficients
    * stay below 2^30 so `a * half-word` never overflows a signed 64-bit
    * intermediate on either engine.
    */
  def minhashCoeffs(numHashes: Int): Seq[(Long, Long, Long)] = {
    val rnd = new java.util.Random(0x5EED)
    Seq.fill(numHashes)((
      rnd.nextInt(1 << 30).toLong | 1L,
      rnd.nextInt(1 << 30).toLong | 1L,
      rnd.nextInt(1 << 30).toLong))
  }

  /** One permutation value: split the 60-bit base hash into 30-bit halves,
    * multiply-add, reduce mod 2^61-1 — all within int64, replayable in SQL.
    */
  private def permute(h: Column, c: (Long, Long, Long)): Column =
    (lit(c._1) * shiftright(h, 30) + lit(c._2) * h.bitwiseAND(lit((1L << 30) - 1)) + lit(c._3)) %
      lit(MinhashPrime)

  /** MinHash+LSH near-dup pairs. One md5 per shingle (the 60-bit base
    * hash), then `numHashes` cheap multiply-shift permutations over the
    * materialized hash array — not numHashes md5 passes. Bands join
    * directly on their signature-row struct (no band-key hashing), on a
    * slim (id, band-struct) projection so the wide shingle arrays never
    * ride the candidate shuffle; true Jaccard verifies each candidate
    * against the persisted shingle sets. Recall < 1 by LSH design; the
    * probability of missing a pair at similarity s is (1 - s^rows)^bands.
    */
  def minhashLsh(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      numHashes: Int,
      bands: Int,
      threshold: Double): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = numHashes / bands
    val s = minhashSigFrame(docs, idCol, textCol, k, minhashCoeffs(numHashes))
    val banded = bandExplode(s, bands, rows)
    val cand = banded
      .select(col("id").as("a_id"), col("bv"))
      .join(banded.select(col("id").as("b_id"), col("bv")), Seq("bv"))
      .filter(col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .select("a_id", "b_id")
    cand
      .join(s.select(col("id").as("a_id"), col("sh").as("a_sh")), Seq("a_id"))
      .join(s.select(col("id").as("b_id"), col("sh").as("b_sh")), Seq("b_id"))
      .withColumn("jac", setJaccard(col("a_sh"), col("b_sh")))
      .filter(col("jac") >= threshold)
      .select("a_id", "b_id", "jac")
  }

  /** Densification offset for [[ophLshPairs]]: a borrowed bin value is
    * `donor_value + OphOffset · distance`, so borrowed slots only collide
    * when both the donor value AND the borrow distance agree (the
    * Shrivastava–Li rotation scheme's collision-unbiasedness argument).
    * Small enough that `value + bins · OphOffset` stays far below 2⁶³.
    */
  val OphOffset = 1000003L

  /** One-Permutation MinHash + LSH near-dup pairs (Li–Owen–Zhang 2012;
    * rotation densification per Shrivastava–Li 2014): instead of
    * [[minhashLsh]]'s `numHashes` permutation passes over every shingle
    * set, ONE pass bins each shingle hash by `h mod bins` and keeps the
    * bin minimum — the signature cost is independent of the signature
    * LENGTH, which is exactly what matters when the 100 TB corpus is
    * hashed once and banded many ways. Empty bins densify by borrowing
    * from the nearest non-empty bin to the right (cyclic), offset by
    * [[OphOffset]] · distance so borrowed slots stay collision-unbiased.
    *
    * Distributed shape: the signature never materializes as a per-doc
    * array pipeline — shingles EXPLODE to (id, bin, min) rows (map-side
    * combined), the cyclic borrow is a doc-keyed window over a
    * 2·bins-row grid per doc (first non-null value/donor in the next
    * `bins` positions — constant rows per doc, corpus-linear), and bands
    * re-assemble as `rows`-slot structs that equi-join directly. True
    * Jaccard verifies every candidate against the shared persisted
    * shingle sets, so the emitted pair set is exact above `threshold`
    * given the candidates (recall < 1 by LSH design, as with
    * [[minhashLsh]]).
    */
  def ophLshPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      bins: Int,
      bands: Int,
      threshold: Double): DataFrame = {
    require(bins % bands == 0, "bins must divide into bands")
    val rows = bins / bands
    val corpus = shingledCorpus(docs, idCol, textCol, k)
    val binned = corpus
      .select(col("id").as("bid"), explode(col("sh")).as("h"))
      .groupBy(col("bid"), pmod(col("h"), lit(bins.toLong)).as("bin"))
      .agg(min(col("h")).as("v"))
    val grid = corpus
      .select(col("id"), explode(sequence(lit(0L), lit(2L * bins - 1))).as("bin2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id")
      .orderBy("bin2")
      .rowsBetween(0, bins.toLong)
    val dens = grid
      .join(
        binned,
        col("id") === col("bid") && pmod(col("bin2"), lit(bins.toLong)) === col("bin"),
        "left")
      .select(
        col("id"),
        col("bin2"),
        col("v"),
        when(col("v").isNotNull, col("bin2")).as("srcbin"))
      .withColumn("fv", first(col("v"), ignoreNulls = true).over(w))
      .withColumn("fsrc", first(col("srcbin"), ignoreNulls = true).over(w))
      .filter(col("bin2") < bins)
      .select(
        col("id"),
        col("bin2").as("bin"),
        (col("fv") + lit(OphOffset) * (col("fsrc") - col("bin2"))).as("dv"))
    val sig = dens
      .groupBy(col("id"), expr(s"bin div $rows").as("band"))
      .agg(
        transform(sort_array(collect_list(struct(col("bin"), col("dv")))), s =>
          s.getField("dv")).as("karr"))
    val banded = sig.select(
      col("id"),
      struct(
        col("band") +:
          (0 until rows).map(r => element_at(col("karr"), r + 1).as(s"s$r")): _*).as("bv"))
    val cand = banded
      .select(col("id").as("a_id"), col("bv"))
      .join(banded.select(col("id").as("b_id"), col("bv")), Seq("bv"))
      .filter(col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .select("a_id", "b_id")
    cand
      .join(corpus.select(col("id").as("a_id"), col("sh").as("a_sh")), Seq("a_id"))
      .join(corpus.select(col("id").as("b_id"), col("sh").as("b_sh")), Seq("b_id"))
      .withColumn("jac", setJaccard(col("a_sh"), col("b_sh")))
      .filter(col("jac") >= threshold)
      .select("a_id", "b_id", "jac")
  }

  /** Persisted (id, sh, sig) MinHash signature frame over a corpus. */
  private def minhashSigFrame(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      coeffs: Seq[(Long, Long, Long)]): DataFrame =
    shingledCorpus(docs, idCol, textCol, k)
      .withColumn(
        "sig",
        array(coeffs.map(c => array_min(transform(col("sh"), h => permute(h, c)))): _*))
      .select("id", "sh", "sig")
      .persist(StorageLevel.MEMORY_AND_DISK)

  /** MAP-ONLY (id, band-struct) rows straight from documents — the
    * STREAMING-safe front of the LSH pipeline (no persist, no shuffle):
    * shingles → multiply-shift minhash signature → band structs, all in
    * one scalar expression per row. The shingle set and the signature
    * are LET-BOUND via single-element `transform` lambdas (a lambda
    * variable is a materialized VALUE): referencing a projected array
    * column that many times directly would let projection collapse
    * re-evaluate the whole md5 shingle pass once per signature slot —
    * the round-8 `element_at`-in-lambda lesson. Batch callers use the
    * persisted [[shingledCorpus]]/signature frames instead (a cache
    * boundary serves the same purpose there).
    */
  def bandRowsMapOnly(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      numHashes: Int,
      bands: Int): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = numHashes / bands
    val coeffs = minhashCoeffs(numHashes)
    def sigOf(sh: Column): Column =
      array(coeffs.map(c => array_min(transform(sh, h => permute(h, c)))): _*)
    def bandsOf(sig: Column): Column =
      array((0 until bands).map { b =>
        struct(
          lit(b).as("band") +:
            (0 until rows).map(r => element_at(sig, b * rows + r + 1).as(s"s$r")): _*)
      }: _*)
    docs.select(
      col(idCol).as("id"),
      explode(
        element_at(
          transform(
            array(hashedShingleSet(col(textCol), k)),
            sh => element_at(transform(array(sigOf(sh)), sg => bandsOf(sg)), 1)),
          1)).as("bv"))
  }

  /** One row per (id, band-struct): the LSH bucket keys a signature frame
    * joins on. The struct carries the band index plus that band's
    * signature rows, so the equi-join IS the bucket match.
    */
  private def bandExplode(sigs: DataFrame, bands: Int, rows: Int): DataFrame =
    sigs.select(
      col("id"),
      explode(array((0 until bands).map { b =>
        struct(
          lit(b).as("band") +:
            (0 until rows).map(r => element_at(col("sig"), b * rows + r + 1).as(s"s$r")): _*)
      }: _*)).as("bv"))

  /** Incremental near-dup: MinHash-LSH a NEW batch against the LEDGER of
    * already-ingested documents, without ever re-pairing the ledger with
    * itself — the arriving-crawl-shard shape of [[minhashLsh]], as
    * [[incrementalNew]] is of [[exact]]. The ledger's banded signature
    * table is the persisted LSH index (on a cluster: a bucketed silver
    * table keyed by band struct, maintained across ingests); each batch
    * shuffles only its OWN bands into that index, so per-ingest cost is
    * proportional to the batch, not the corpus. True Jaccard then
    * verifies each (new, old) candidate against the two shingle sets.
    */
  def minhashLshAgainstLedger(
      ledger: DataFrame,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      numHashes: Int,
      bands: Int,
      threshold: Double): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = numHashes / bands
    val coeffs = minhashCoeffs(numHashes)
    val sLedger = minhashSigFrame(ledger, idCol, textCol, k, coeffs)
    val sBatch = minhashSigFrame(batch, idCol, textCol, k, coeffs)
    val cand = bandExplode(sBatch, bands, rows)
      .select(col("id").as("new_id"), col("bv"))
      .join(bandExplode(sLedger, bands, rows).select(col("id").as("old_id"), col("bv")), Seq("bv"))
      .dropDuplicates("new_id", "old_id")
      .select("new_id", "old_id")
    cand
      .join(sBatch.select(col("id").as("new_id"), col("sh").as("n_sh")), Seq("new_id"))
      .join(sLedger.select(col("id").as("old_id"), col("sh").as("o_sh")), Seq("old_id"))
      .withColumn("jac", setJaccard(col("n_sh"), col("o_sh")))
      .filter(col("jac") >= threshold)
      .select("new_id", "old_id", "jac")
  }

  /** 32-bit SimHash over an array of string features (shingles — raw tokens
    * collide too much on small vocabularies): bit j is set when more than
    * half the features have bit j set in their md5-derived hash.
    *
    * Single-expression HOF form, kept as the reference implementation for
    * cross-checking the native [[graft.expressions.SimHash32]] (which
    * [[simhashPairs]] uses: one primitive loop, no interpreted lambda chain,
    * no 32-element accumulator allocation per feature).
    */
  def simhash32(features: Column): Column =
    simFromCounts(bitCountsOf(hashArr(features)), size(features))

  /** Native SimHash over a precomputed hash array ([[hashedShingleSet]]). */
  def simhash32Native(hashes: Column): Column =
    Compat.column(graft.expressions.SimHash32(Compat.expression(hashes)))

  /** md5-derived 60-bit hash per feature (native digest-to-long). */
  private def hashArr(features: Column): Column =
    transform(features, t => graft.functions.Hashing.md5Long60(t))

  /** One aggregate pass over the hash array -> 32-element array of per-bit
    * set counts (index-aware transform of the accumulator).
    */
  private def bitCountsOf(harr: Column): Column =
    aggregate(
      harr,
      array_repeat(lit(0L), 32),
      (acc, h) =>
        transform(acc, (c, j) => c + call_function("shiftright", h, j).bitwiseAND(lit(1L))))

  /** Majority vote per bit from the counts array. */
  private def simFromCounts(counts: Column, n: Column): Column =
    (0 until 32)
      .map(j => when(lit(2L) * element_at(counts, j + 1) > n, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** SimHash near-dup pairs with Hamming distance <= maxHamming (<= 3 for
    * the 4-band pigeonhole to be exact): join on any equal 8-bit band, then
    * verify the full distance. The (id, sim) signature frame is persisted,
    * so shingling + hashing runs once; the band self-join shuffles 16 bytes
    * a row.
    */
  def simhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      maxHamming: Int): DataFrame = {
    require(maxHamming <= 3, "4 x 8-bit bands are only exact up to Hamming 3")
    val s = graft.Caches.track(
      shingledCorpus(docs, idCol, textCol, k)
        .select(col("id"), simhash32Native(col("sh")).as("sim"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    val banded = s.withColumn(
      "bv",
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"), shiftright(col("sim"), 8 * b).bitwiseAND(lit(255L)).as("v"))
      }: _*)))
    val a = banded.select(col("id").as("a_id"), col("sim").as("a_sim"), col("bv"))
    val b = banded.select(col("id").as("b_id"), col("sim").as("b_sim"), col("bv"))
    a.join(b, Seq("bv"))
      .filter(col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .withColumn("hamming", expr("bit_count(a_sim ^ b_sim)").cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("a_id", "b_id", "hamming")
  }

  /** Dot product of two double-array columns as an ordered left fold from
    * 0.0 — the same IEEE operation sequence DuckDB's list_reduce performs,
    * so scores compare bit-for-bit across engines. Composable
    * higher-order-function form, kept as the reference implementation for
    * cross-checking the native expression.
    */
  def dotFoldHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Native codegen dot product ([[graft.expressions.DotProduct]]) —
    * bit-identical to [[dotFoldHof]] (same multiply-accumulate order), but a
    * tight primitive loop instead of an interpreted lambda chain with an
    * intermediate array. This is the hot inner call of [[embeddingCosinePairs]]
    * and [[Ann]].
    */
  def dotFold(a: Column, b: Column): Column =
    Compat.column(graft.expressions.DotProduct(Compat.expression(a), Compat.expression(b)))

  def cosine(a: Column, b: Column): Column =
    dotFold(a, b) / (sqrt(dotFold(a, a)) * sqrt(dotFold(b, b)))

  // --- signed random projections (cosine LSH) ------------------------------

  /** Deterministic pseudo-random hyperplane components in [-1, 1):
    * md5-derived per (bit, dim), so DuckDB reconstructs the identical
    * planes from the same strings.
    */
  def srpPlanes(bits: Int, dims: Int): Seq[Seq[Double]] =
    (0 until bits).map { b =>
      (0 until dims).map { d =>
        graft.expressions.Md5Long60.hash(s"rp|$b|$d".getBytes("UTF-8")).toDouble /
          (1L << 59).toDouble - 1.0
      }
    }

  /** SRP sign-bit signature: bit j set iff v . plane_j >= 0. P(bit differs)
    * = angle/pi, so banding the bits gives a cosine LSH.
    */
  def srpSignature(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex
      .map { case (p, j) =>
        when(dotFold(v, typedLit(p)) >= 0, lit(1L << j)).otherwise(lit(0L))
      }
      .reduce(_ + _)

  /** Embedding near-dup pairs via signed-random-projection LSH: `bits` sign
    * bits from md5-derived hyperplanes, banded `bands` ways; vectors
    * colliding in any band become candidates, verified by true cosine >=
    * threshold. The hashing scale path for cosine (the IVF search in
    * [[Ann]] is the clustering one): candidate generation shuffles
    * (id, band-value) only. Recall < 1 by LSH design.
    */
  def srpLshPairs(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      bits: Int,
      bands: Int,
      threshold: Double): DataFrame = {
    require(bits % bands == 0, "bits must divide into bands")
    val rows = bits / bands
    val mask = (1L << rows) - 1
    val planes = srpPlanes(bits, dims)
    val s = graft.Caches.track(
      emb
        .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
        .withColumn("nrm", sqrt(dotFold(col("v"), col("v"))))
        .withColumn("sig", srpSignature(col("v"), planes))
        .persist(StorageLevel.MEMORY_AND_DISK))
    val banded = s.select(
      col("id"),
      explode(array((0 until bands).map { b =>
        struct(
          lit(b).as("band"),
          shiftright(col("sig"), rows * b).bitwiseAND(lit(mask)).as("bv"))
      }: _*)).as("bk"))
    val cand = banded
      .select(col("id").as("a_id"), col("bk"))
      .join(banded.select(col("id").as("b_id"), col("bk")), Seq("bk"))
      .filter(col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .select("a_id", "b_id")
    cand
      .join(s.select(col("id").as("a_id"), col("v").as("a_v"), col("nrm").as("a_nrm")), Seq("a_id"))
      .join(s.select(col("id").as("b_id"), col("v").as("b_v"), col("nrm").as("b_nrm")), Seq("b_id"))
      .withColumn("cos", dotFold(col("a_v"), col("b_v")) / (col("a_nrm") * col("b_nrm")))
      .filter(col("cos") >= threshold)
      .select("a_id", "b_id", "cos")
  }

  /** Embedding near-dup pairs: all pairs with cosine >= threshold.
    * Brute-force a < b here (exact baseline); the 100 TB path is the IVF
    * search in [[Ann]] — bucket first, verify within buckets. Per-row norms
    * are precomputed before the join (same `sqrt(dot(v,v))` expression, so
    * scores stay bit-identical), cutting per-pair work to one dot product.
    */
  def embeddingCosinePairs(emb: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val s = graft.Caches.track(
      emb
        .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
        .withColumn("nrm", sqrt(dotFold(col("v"), col("v"))))
        .persist(StorageLevel.MEMORY_AND_DISK))
    val a = s.select(col("id").as("a_id"), col("v").as("a_v"), col("nrm").as("a_nrm"))
    val b = s.select(col("id").as("b_id"), col("v").as("b_v"), col("nrm").as("b_nrm"))
    a.crossJoin(b)
      .filter(col("a_id") < col("b_id"))
      .withColumn("cos", dotFold(col("a_v"), col("b_v")) / (col("a_nrm") * col("b_nrm")))
      .filter(col("cos") >= threshold)
      .select("a_id", "b_id", "cos")
  }
}
