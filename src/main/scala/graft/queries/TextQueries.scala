package graft.queries

import graft.functions.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis queries over the `documents` table, each with a DuckDB
  * oracle: token statistics, quality scoring, language ID, fingerprints.
  *
  * Parity notes: token lists are `\s+` splits with empties dropped on both
  * engines; ratios divide exact integer counts in double with identical
  * operation order (IEEE-identical results); fingerprints are md5-based.
  * At 100 TB all four queries are embarrassingly parallel single-pass scans
  * — no shuffle except the final presentation sort.
  */
object TextQueries {

  private[queries] def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "documents")

  private val toks: Column = TextAnalysis.tokens(col("text"))

  /** DuckDB mirror of [[TextAnalysis.tokens]] on `text`. */
  private val sqlToks = raw"list_filter(string_split_regex(text, '\s+'), t -> t <> '')"

  /** Materialize the memoized BPE train chain untimed (the bench warm
    * policy for every memoized multi-consumer frame): ta_bpetrain AND
    * ta_bpeapply read it, and the alphabetically-earlier bpeapply was
    * billed the whole 6-round training (1.9 s of its 2.0 s bench row).
    */
  def warm(spark: SparkSession, dir: String): Unit = {
    bpeTrained(spark, dir)._2.count()
    // The stopword-filtered content-word sequence joined the shared set
    // when ta_textrank became its second consumer (ta_keyphrase was the
    // first) — materialize-once silver table, same policy as the graph
    // frames.
    contentWords(spark, dir).count()
    ()
  }

  /** Per-doc content-word sequence `(doc_id, pos, word)`: lowercase
    * `[^a-z]+`-split tokens with the vendored NLTK stopwords removed,
    * `pos` numbering the NON-EMPTY token sequence BEFORE stopword removal
    * (so stopword gaps stay visible — [[taKeyphrase]]'s island numbering
    * depends on them). Session-shared (memoized + pinned): ta_keyphrase
    * and ta_textrank both walk it; on a cluster it is a materialize-once
    * tokenized silver table, so each query should pay a cache read, not a
    * corpus re-tokenize.
    */
  private def contentWords(spark: SparkSession, dir: String): DataFrame =
    SessionMemo.getOrElseUpdate("ta_content_words", spark, dir) {
      // Laid out hash(doc_id), sorted (doc_id, pos) AT THE PERSIST (r11):
      // a persisted frame's InMemoryRelation keeps BOTH properties
      // planner-visible, so every consumer's per-doc window (keyphrase's
      // island numbering, textrank's adjacency lead) plans with NO
      // exchange and NO sort, and doc-keyed aggregates/distincts ride the
      // subset rule. The one-time repartition+sort is paid in the warm
      // phase, not by whichever query materializes first.
      graft.Caches.pin(
        contentWordsOf(docs(spark, dir))
          .repartition(col("doc_id"))
          .sortWithinPartitions("doc_id", "pos")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    }

  /** The tokenize + stopword gate behind [[contentWords]], reusable over
    * any `(doc_id, text)` frame (ScaleProbe's inflated corpus) so probe
    * and query can never diverge on the algorithm they measure.
    */
  private[graft] def contentWordsOf(d: DataFrame): DataFrame =
    d.select(
        col("doc_id"),
        posexplode(
          filter(split(lower(col("text")), "[^a-z]+"), t => t =!= lit("")))
          .as(Seq("pos", "word")))
      .filter(!col("word").isInCollection(graft.functions.Cleaning.StopWords))

  // ---- token statistics ---------------------------------------------------

  def taStats(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_unique"),
        length(col("text")).cast("long").as("n_chars"),
        when(size(toks) === 0, lit(0.0))
          .otherwise(
            aggregate(transform(toks, t => length(t)), lit(0), (acc, x) => acc + x) / size(toks))
          .as("avg_token_len"),
        when(size(toks) === 0, lit(0.0))
          .otherwise(size(array_distinct(toks)) / size(toks))
          .as("type_token_ratio"))
      .orderBy("doc_id")

  val taStatsSql: String =
    s"""SELECT doc_id,
      len($sqlToks)::BIGINT AS n_tokens,
      len(list_distinct($sqlToks))::BIGINT AS n_unique,
      length(text)::BIGINT AS n_chars,
      CASE WHEN len($sqlToks) = 0 THEN 0.0
           ELSE list_reduce(list_transform($sqlToks, t -> length(t)), (a, b) -> a + b)::INT / len($sqlToks)::INT END AS avg_token_len,
      CASE WHEN len($sqlToks) = 0 THEN 0.0
           ELSE len(list_distinct($sqlToks))::INT / len($sqlToks)::INT END AS type_token_ratio
      FROM documents ORDER BY doc_id"""

  // ---- quality scoring ----------------------------------------------------
  // quality = 0.5*(1 - stopword_ratio) + 0.3*type_token_ratio + 0.2*alpha_ratio
  // (left-associated in both engines — doubles come out bit-identical).

  private val enStop = TextAnalysis.LangMarkers.head._2

  private val nTok = size(toks)

  private val stopRatioCol: Column =
    when(nTok === 0, lit(0.0))
      .otherwise(TextAnalysis.markerHits(toks, enStop) / nTok)

  private val ttrCol: Column =
    when(nTok === 0, lit(0.0)).otherwise(size(array_distinct(toks)) / nTok)

  private val alphaRatioCol: Column =
    when(length(col("text")) === 0, lit(0.0))
      .otherwise(length(regexp_replace(col("text"), "[^a-z]", "")) / length(col("text")))

  /** The document quality score over `text` — shared with dd_keepbest's
    * canonical selection, so the two queries rank on the SAME doubles.
    */
  private[graft] val qualityCol: Column =
    lit(0.5) * (lit(1.0) - stopRatioCol) + lit(0.3) * ttrCol + lit(0.2) * alphaRatioCol

  def taQuality(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(
        col("doc_id"),
        stopRatioCol.as("stopword_ratio"),
        ttrCol.as("type_token_ratio"),
        alphaRatioCol.as("alpha_ratio"),
        qualityCol.as("quality"))
      .orderBy("doc_id")

  private val enStopSql = enStop.map(Tables.sqlLit).mkString("[", ", ", "]")

  private val stopRatioSql =
    s"CASE WHEN len($sqlToks) = 0 THEN 0.0 ELSE len(list_filter($sqlToks, t -> list_contains($enStopSql, t)))::INT / len($sqlToks)::INT END"
  private val ttrSql =
    s"CASE WHEN len($sqlToks) = 0 THEN 0.0 ELSE len(list_distinct($sqlToks))::INT / len($sqlToks)::INT END"
  private val alphaSql =
    "CASE WHEN length(text) = 0 THEN 0.0 ELSE length(regexp_replace(text, '[^a-z]', '', 'g')) / length(text) END"

  /** DuckDB mirror of [[qualityCol]] (same left-association → identical
    * IEEE doubles).
    */
  private[graft] val qualitySqlExpr: String =
    s"0.5 * (1.0 - $stopRatioSql) + 0.3 * $ttrSql + 0.2 * $alphaSql"

  val taQualitySql: String =
    s"""SELECT doc_id, $stopRatioSql AS stopword_ratio, $ttrSql AS type_token_ratio,
      $alphaSql AS alpha_ratio,
      $qualitySqlExpr AS quality
      FROM documents ORDER BY doc_id"""

  // ---- language identification --------------------------------------------

  def taLangid(spark: SparkSession, dir: String): DataFrame = {
    val scores = TextAnalysis.LangMarkers.map { case (lang, words) =>
      lang -> TextAnalysis.markerHits(toks, words)
    }
    val scoreCols = scores.map { case (lang, s) => s.cast("long").as(s"score_$lang") }
    docs(spark, dir)
      .select(
        col("doc_id") +: scoreCols :+ TextAnalysis.langIdFromScores(scores).as("lang_id"): _*)
      .orderBy("doc_id")
  }

  val taLangidSql: String = {
    val hits = TextAnalysis.LangMarkers.map { case (lang, words) =>
      val set = words.map(Tables.sqlLit).mkString("[", ", ", "]")
      lang -> s"len(list_filter($sqlToks, t -> list_contains($set, t)))"
    }
    val scoreSel = hits.map { case (l, e) => s"$e::BIGINT AS score_$l" }.mkString(", ")
    val langs = hits.map(_._1)
    val allZero = langs.map(l => s"score_$l = 0").mkString(" AND ")
    val caseArms = langs.init.zipWithIndex.map { case (l, i) =>
      val ge = langs.drop(i + 1).map(o => s"score_$l >= score_$o").mkString(" AND ")
      s"WHEN $ge THEN '$l'"
    }
    s"""SELECT doc_id, score_en, score_de, score_fr, score_es,
      CASE WHEN $allZero THEN 'und' ${caseArms.mkString(" ")} ELSE '${langs.last}' END AS lang_id
      FROM (SELECT doc_id, $scoreSel, $sqlToks AS _toks FROM documents)
      ORDER BY doc_id"""
  }

  /** Language-ID evaluation: the confusion matrix of [[taLangid]]'s
    * n-gram-marker heuristic against the corpus's labeled lang column,
    * with per-cell counts and the cell's share of its true-label row —
    * the quality-audit table a curation pipeline reads before trusting a
    * classifier gate. Map-only scoring + one low-cardinality (true,
    * predicted) aggregate; the row-share is one exact IEEE division.
    */
  def taConfusion(spark: SparkSession, dir: String): DataFrame = {
    val scores = TextAnalysis.LangMarkers.map { case (lang, words) =>
      lang -> TextAnalysis.markerHits(toks, words)
    }
    val perDoc = docs(spark, dir)
      .select(col("lang").as("true_lang"),
        TextAnalysis.langIdFromScores(scores).as("pred_lang"))
    val cells = perDoc.groupBy("true_lang", "pred_lang").agg(count(lit(1)).as("n"))
    val rows = perDoc.groupBy("true_lang").agg(count(lit(1)).as("n_true"))
    cells
      .join(broadcast(rows), Seq("true_lang"))
      .select(col("true_lang"), col("pred_lang"), col("n"), col("n_true"),
        (col("n").cast("double") / col("n_true").cast("double")).as("row_share"))
      .orderBy("true_lang", "pred_lang")
  }

  val taConfusionSql: String = {
    val hits = TextAnalysis.LangMarkers.map { case (lang, words) =>
      val set = words.map(Tables.sqlLit).mkString("[", ", ", "]")
      lang -> s"len(list_filter($sqlToks, t -> list_contains($set, t)))"
    }
    val scoreSel = hits.map { case (l, e) => s"$e::BIGINT AS score_$l" }.mkString(", ")
    val langs = hits.map(_._1)
    val allZero = langs.map(l => s"score_$l = 0").mkString(" AND ")
    val caseArms = langs.init.zipWithIndex.map { case (l, i) =>
      val ge = langs.drop(i + 1).map(o => s"score_$l >= score_$o").mkString(" AND ")
      s"WHEN $ge THEN '$l'"
    }
    s"""WITH scored AS (SELECT lang AS true_lang, $scoreSel FROM documents),
      pd AS (SELECT true_lang,
          CASE WHEN $allZero THEN 'und' ${caseArms.mkString(" ")} ELSE '${langs.last}' END
            AS pred_lang
        FROM scored),
      cells AS (SELECT true_lang, pred_lang, count(*) AS n FROM pd GROUP BY 1, 2),
      rows_ AS (SELECT true_lang, count(*) AS n_true FROM pd GROUP BY 1)
      SELECT c.true_lang, c.pred_lang, c.n, r.n_true,
        c.n::DOUBLE / r.n_true::DOUBLE AS row_share
      FROM cells c JOIN rows_ r USING (true_lang)
      ORDER BY true_lang, pred_lang"""
  }

  // ---- fingerprinting ------------------------------------------------------

  def taFingerprint(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(
        col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp_md5"),
        graft.functions.Hashing.md5Long60(TextAnalysis.normalized(col("text"))).as("fp_long"),
        TextAnalysis.shingleFingerprint(col("text")).as("fp_shingle"))
      .orderBy("doc_id")

  val taFingerprintSql: String = {
    val norm = raw"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"
    val ntoks = raw"list_filter(string_split_regex($norm, '\s+'), t -> t <> '')"
    s"""SELECT doc_id, md5($norm) AS fp_md5,
      ${graft.functions.Hashing.sqlMd5Long60Duck(norm)} AS fp_long,
      CASE WHEN len($ntoks) >= 5
           THEN list_min(list_transform(range(1, len($ntoks) - 3),
                i -> md5(array_to_string(list_slice($ntoks, i, i + 4), ' '))))
           ELSE md5($norm) END AS fp_shingle
      FROM documents ORDER BY doc_id"""
  }

  // ---- winnowing fingerprints ---------------------------------------------

  private val WinnowK = 4 // shingle width (tokens per k-gram)
  private val WinnowW = 4 // winnowing window (consecutive k-gram hashes)

  /** Winnowing document fingerprints (the MOSS scheme): hash every
    * [[WinnowK]]-token shingle, slide a [[WinnowW]]-hash window, and keep
    * the RIGHTMOST minimal hash of each window — the classic guarantee
    * that any match of length >= W+K-1 tokens shares a fingerprint, at an
    * expected density of 2/(W+1). Emits the selected (position, hash)
    * pairs per document.
    *
    * Scale shape: a pure map-side pass — the ordered window hashes come
    * from the native [[graft.expressions.ShingleHashes]] single loop, and
    * window selection is a higher-order-function fold over POSITIONS (no
    * struct allocation, no explode of unselected windows). The only
    * shuffle is the presentation sort. The rightmost-min fold compares
    * `h[j] <= h[acc]` left-to-right, so ties resolve to the later
    * position on both engines — selection is exact, not sampled.
    */
  def taWinnow(spark: SparkSession, dir: String): DataFrame =
    winnowFingerprints(docs(spark, dir)).orderBy("doc_id", "pos")

  /** The winnowing selection over any `(doc_id, text)` frame (also driven
    * at inflated corpus scale by [[graft.ScaleProbe]]).
    */
  def winnowFingerprints(d: DataFrame): DataFrame = {
    val th = transform(
      TextAnalysis.tokens(TextAnalysis.normalized(col("text"))),
      t => graft.functions.Hashing.md5Long60(t))
    val h = graft.functions.Compat.column(
      graft.expressions.ShingleHashes(graft.functions.Compat.expression(th), WinnowK))
    def argmin(hs: Column, positions: Column, init: Column): Column =
      aggregate(
        positions,
        init.cast("long"),
        (acc, j) =>
          when(element_at(hs, j) <= element_at(hs, acc.cast("int")), j.cast("long"))
            .otherwise(acc))
    val sel = when(
      size(col("h")) >= WinnowW,
      array_distinct(transform(
        sequence(lit(0), size(col("h")) - WinnowW),
        i => argmin(col("h"), sequence(i + 1, i + WinnowW), i + 1))))
      .otherwise(array(argmin(col("h"), sequence(lit(1), size(col("h"))), lit(1))))
    d.select(col("doc_id"), h.as("h"))
      .select(col("doc_id"), col("h"), explode(sel).as("pos"))
      .select(
        col("doc_id"),
        col("pos"),
        element_at(col("h"), col("pos").cast("int")).as("fp"))
  }

  /** The winnowing selection in DuckDB, WITHOUT the final ORDER BY — the
    * shared core of [[taWinnowSql]] and dd_winnow's oracle.
    */
  private[graft] val winnowCoreSql: String = {
    val norm = raw"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"
    val ntoks = raw"list_filter(string_split_regex($norm, '\s+'), t -> t <> '')"
    val th = s"list_transform($ntoks, t -> ${graft.functions.Hashing.sqlMd5Long60Duck("t")})"
    val wins = s"""CASE WHEN len(th) >= $WinnowK
        THEN list_transform(range(1, len(th) - ${WinnowK - 2}),
          i -> ${graft.operators.Dedup.sqlShingleHashDuck(s"list_slice(th, i, i + ${WinnowK - 1})")})
        ELSE [${graft.operators.Dedup.sqlShingleHashDuck("th")}] END"""
    def argmin(posList: String, init: String) =
      s"""list_reduce(list_prepend($init, $posList),
         (a, b) -> CASE WHEN h[b] <= h[a] THEN b ELSE a END)"""
    s"""SELECT doc_id, pos, h[pos] AS fp FROM (
        SELECT doc_id, h, unnest(CASE WHEN len(h) >= $WinnowW THEN
            list_distinct(list_transform(range(0, len(h) - ${WinnowW - 1}), i ->
              ${argmin(s"list_transform(range(i + 1, i + ${WinnowW + 1}), j -> j)", "i + 1")}))
          ELSE [${argmin("list_transform(range(1, len(h) + 1), j -> j)", "1")}] END) AS pos
        FROM (SELECT doc_id, $wins AS h
              FROM (SELECT doc_id, $th AS th FROM documents)))"""
  }

  val taWinnowSql: String = s"$winnowCoreSql ORDER BY doc_id, pos"

  // ---- BPE-ish subword token counting -------------------------------------
  // GPT-2-style pretokenizer shape, restricted to RE2-compatible constructs
  // (no lookahead — DuckDB's regex engine is RE2): runs of letters, runs of
  // digits, runs of other non-space, each with an optional leading space.
  private val BpePattern = " ?[a-z]+| ?[0-9]+| ?[^ a-z0-9]+"

  def taBpe(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(BpePattern), lit(0))).cast("long").as("n_bpe"),
        size(toks).cast("long").as("n_ws"))
      .withColumn("fertility", col("n_bpe").cast("double") / col("n_ws"))
      .orderBy("doc_id")

  val taBpeSql: String =
    s"""SELECT doc_id,
      len(regexp_extract_all(text, '$BpePattern'))::BIGINT AS n_bpe,
      len($sqlToks)::BIGINT AS n_ws,
      len(regexp_extract_all(text, '$BpePattern'))::BIGINT::DOUBLE / len($sqlToks)::BIGINT AS fertility
      FROM documents ORDER BY doc_id"""

  // ---- BPE merge TRAINING ---------------------------------------------------

  private val BpeTrainRounds = 6

  /** Distributed BPE merge training — the [[taBpe]] pretokenizer's
    * TRAINING side: `BpeTrainRounds` rounds of classic byte-pair-encoding
    * merge selection over the corpus vocabulary. Each round counts
    * adjacent token pairs weighted by word frequency, picks the global
    * argmax (freq desc, then lexicographic — fully deterministic), and
    * applies the merge greedily left-to-right non-overlapping inside
    * every word (the standard BPE semantics: "aaa" + merge (a,a) →
    * ["aa","a"]). Output: the learned merge table (round, lhs, rhs, freq).
    *
    * Scale shape — this is why BPE training distributes well: the working
    * frame is the VOCABULARY (word, count, tokens), Zipf-bounded, not the
    * corpus; the corpus is touched once for the word count. Per round:
    * one slim (l, r, wc) pair aggregate, ONE driver row (the argmax — the
    * k-bounded-collect pattern), and a narrow per-word array fold to
    * apply the merge. The token frame is lazily persisted per round
    * (linear references — no plan doubling) and each round's argmax
    * action fills it. The merge application is a sequential fold per
    * word (greedy-leftmost is order-dependent by definition) — arrays
    * are word-length-bounded, so the fold is O(word length), map-side,
    * codegen'd. The oracle replays every round with window-function
    * islands (candidates at positions i where tk[i]=l ∧ tk[i+1]=r merge
    * iff their run offset is even — equivalent to the greedy fold,
    * including the l = r chain case).
    */
  def taBpetrain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    bpeTrained(spark, dir)._1.toDF("round", "lhs", "rhs", "freq").orderBy("round")
  }

  /** The training loop itself, memoized per (session, dir) because both
    * the merge-table query and the tokenize-apply query need it and the
    * loop costs [[BpeTrainRounds]] aggregates + argmax actions. Returns
    * the learned merges AND the final `(word, wc, tk)` vocabulary
    * segmentation (the trained tokenizer's lookup table — vocab-sized,
    * persisted).
    */
  private val bpeMemo = scala.collection.concurrent.TrieMap
    .empty[(String, String), (Seq[(Long, String, String, Long)], DataFrame)]

  private def bpeTrained(
      spark: SparkSession,
      dir: String): (Seq[(Long, String, String, Long)], DataFrame) = {
    if (bpeMemo.size > 16) {
      // Unpersist what we evict (SessionMemo's discipline): dropping the
      // reference alone would leave the cached segmentation blocks
      // registered in the BlockManager for the session's lifetime.
      bpeMemo.values.foreach { case (_, df) =>
        try df.unpersist(blocking = false)
        catch { case _: Throwable => () }
      }
      bpeMemo.clear()
    }
    bpeMemo.getOrElseUpdate(
      (SessionMemo.sessionKey(spark), dir),
      bpeTrainOn(docs(spark, dir)))
  }

  /** The un-memoized training loop over ANY frame with a `text` column —
    * factored out so ScaleProbe can drive it on an inflated corpus (the
    * per-round cost model: one slim pair aggregate + one driver argmax
    * row per round, then a map-only merge fold over the vocab — nothing
    * in a round is corpus-sized after the first word count).
    */
  private[graft] def bpeTrainOn(
      docsDf: DataFrame): (Seq[(Long, String, String, Long)], DataFrame) = {
    locally {
        val words = docsDf
          .select(explode(toks).as("word"))
          .filter(col("word").rlike("^[a-z]+$"))
          .groupBy("word")
          .agg(count(lit(1)).as("wc"))
          .select(
            col("word"),
            col("wc"),
            expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))").as("tk"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        var cur = words
        // The frame each round supersedes: releasable only after the NEXT
        // action has materialized its replacement (the replacement's plan
        // reads this cache; unpersisting earlier re-derives the whole
        // fold chain from the source).
        var superseded: Option[DataFrame] = None
        val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
        var exhausted = false
        for (round <- 1 to BpeTrainRounds if !exhausted) {
          val top = cur
            .filter(size(col("tk")) >= 2)
            .select(
              col("wc"),
              explode(expr(
                "transform(sequence(1, size(tk) - 1), " +
                  "i -> named_struct('l', element_at(tk, i), 'r', element_at(tk, i + 1)))")).as("p"))
            .groupBy(col("p.l").as("l"), col("p.r").as("r"))
            .agg(sum(col("wc")).as("freq"))
            .orderBy(col("freq").desc, col("l"), col("r"))
            .limit(1)
            .collect()
          // The collect above filled `cur`'s cache — the frame cur
          // superseded last round has no consumer left.
          superseded.foreach(_.unpersist(blocking = false))
          superseded = None
          if (top.isEmpty) exhausted = true
          else {
            val (l, rgt, f) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
            merges += ((round.toLong, l, rgt, f))
            // Plain persist, not the Caches-tracked Lineage.round: this
            // frame outlives the query (memoized tokenizer table) and a
            // per-query releaseAll must not unpersist it mid-session.
            superseded = Some(cur)
            cur = cur
              .select(col("word"), col("wc"), bpeMergeFold(col("tk"), l, rgt).as("tk"))
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          }
        }
        // Materialize the final segmentation so the last superseded frame
        // can be released here rather than leaking until first use.
        cur.count()
        superseded.foreach(_.unpersist(blocking = false))
        (merges.toSeq, cur)
    }
  }

  /** Greedy left-to-right non-overlapping application of ONE merge (l, r)
    * to a token array: fold that joins the current token onto the
    * accumulator's last element exactly when they form the pair. The
    * merged token can never re-merge within the round (lr ≠ l since r is
    * non-empty), so this is precisely BPE's greedy semantics — "aaa" with
    * (a,a) gives ["aa","a"], "abab" with (a,b) gives ["ab","ab"].
    * Package-visible so BpeTrainSpec can lock the chain cases directly.
    */
  private[queries] def bpeMergeFold(tk: Column, l: String, r: String): Column = {
    val lLit = lit(l)
    val rLit = lit(r)
    aggregate(
      tk,
      array().cast("array<string>"),
      (acc, t) =>
        when(size(acc) === 0, array(t))
          .otherwise(when(
            element_at(acc, -1) === lLit && t === rLit,
            concat(
              slice(acc, lit(1), size(acc) - 1),
              array(concat(element_at(acc, -1), t))))
            .otherwise(concat(acc, array(t)))))
  }

  /** Tokenize the corpus with the TRAINED merges — [[taBpetrain]]'s
    * serving side. The trained tokenizer is a (word → subword count)
    * lookup table over the final vocabulary segmentation, which is
    * vocab-sized — so application to a 100 TB corpus is one BROADCAST
    * join per document word plus a per-doc aggregate; no per-doc fold
    * re-runs the merges. Per doc: VOCABULARY words (the whitespace
    * tokens that are lowercase-alpha and hence in the trained vocab —
    * the inner join drops non-`[a-z]+` words from `n_words`, and a doc
    * whose words are ALL non-alpha is absent from the output entirely),
    * total subword tokens under the learned merges, and compression
    * (words per subword — how much the 6 merges shrank the char-level
    * baseline is visible in n_subword vs n_chars of the vocab words).
    */
  def taBpeapply(spark: SparkSession, dir: String): DataFrame = {
    val segs = bpeTrained(spark, dir)._2
    val tc = segs.select(col("word"), size(col("tk")).cast("long").as("tc"))
    docs(spark, dir)
      .select(col("doc_id"), explode(toks).as("word"))
      .join(broadcast(tc), Seq("word"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("tc")).as("n_subword"))
      .withColumn(
        "compression",
        col("n_words").cast("double") / col("n_subword").cast("double"))
      .orderBy("doc_id")
  }

  val taBpeapplySql: String = {
    val rounds = (1 to BpeTrainRounds).map(bpeOracleRound).mkString(",\n      ")
    s"""WITH w0 AS (SELECT word, count(*)::BIGINT AS wc
          FROM (SELECT unnest($sqlToks) AS word FROM documents)
          WHERE regexp_matches(word, '^[a-z]+$$') GROUP BY word),
      t1 AS (SELECT word, wc, i::BIGINT AS pos, word[i:i] AS tok
        FROM (SELECT word, wc, unnest(range(1, len(word) + 1)) AS i FROM w0)),
      $rounds,
      tc AS (SELECT word, count(*)::BIGINT AS tc FROM t${BpeTrainRounds + 1} GROUP BY word),
      dw AS (SELECT doc_id, unnest($sqlToks) AS word FROM documents)
      SELECT dw.doc_id, count(*)::BIGINT AS n_words, sum(tc.tc)::BIGINT AS n_subword,
        count(*)::DOUBLE / sum(tc.tc)::DOUBLE AS compression
      FROM dw JOIN tc USING (word)
      GROUP BY dw.doc_id ORDER BY dw.doc_id"""
  }

  /** One oracle round: argmax merge over t$r, island-parity greedy
    * application producing t${r+1}. The merge CTE joins in as LEFT JOIN
    * ON TRUE, NOT a cross join: when the vocabulary exhausts before the
    * round bound (every word one token), m$r is EMPTY and a cross join
    * would empty every later token CTE — the apply oracle would return
    * zero rows against Spark's correct full output. With the left join,
    * cand coalesces to FALSE and t${r+1} = t$r, mirroring the Spark
    * loop's `exhausted` break. (taBpetrainSql is consistent either way:
    * its final union selects FROM m$r, so an empty round contributes no
    * merge row — exactly like the Spark loop.)
    */
  private def bpeOracleRound(r: Int): String =
    s"""m$r AS (SELECT l, r, sum(wc)::BIGINT AS freq FROM (
          SELECT a.tok AS l, lead(a.tok) OVER (PARTITION BY a.word ORDER BY a.pos) AS r, a.wc
          FROM t$r a) x
        WHERE r IS NOT NULL GROUP BY l, r
        ORDER BY freq DESC, l, r LIMIT 1),
      c$r AS (SELECT t.word, t.wc, t.pos, t.tok,
          coalesce(t.tok = m.l
            AND lead(t.tok) OVER (PARTITION BY t.word ORDER BY t.pos) = m.r, FALSE) AS cand
        FROM t$r t LEFT JOIN m$r m ON TRUE),
      i$r AS (SELECT *, CASE WHEN cand THEN pos - (count(*) FILTER (WHERE cand)
            OVER (PARTITION BY word ORDER BY pos ROWS UNBOUNDED PRECEDING)) END AS isl
        FROM c$r),
      g$r AS (SELECT *, CASE WHEN cand
            THEN (pos - min(pos) OVER (PARTITION BY word, isl)) % 2 = 0
            ELSE FALSE END AS merged
        FROM i$r),
      d$r AS (SELECT *, coalesce(lag(merged) OVER (PARTITION BY word ORDER BY pos), FALSE) AS consumed,
          lead(tok) OVER (PARTITION BY word ORDER BY pos) AS ntok
        FROM g$r),
      t${r + 1} AS (SELECT word, wc,
          row_number() OVER (PARTITION BY word ORDER BY pos)::BIGINT AS pos,
          CASE WHEN merged THEN tok || ntok ELSE tok END AS tok
        FROM d$r WHERE NOT consumed)"""

  val taBpetrainSql: String = {
    val rounds = (1 to BpeTrainRounds).map(bpeOracleRound).mkString(",\n      ")
    val unions = (1 to BpeTrainRounds)
      .map(r => s"SELECT $r::BIGINT AS round, l AS lhs, r AS rhs, freq FROM m$r")
      .mkString("\n      UNION ALL ")
    s"""WITH w0 AS (SELECT word, count(*)::BIGINT AS wc
          FROM (SELECT unnest($sqlToks) AS word FROM documents)
          WHERE regexp_matches(word, '^[a-z]+$$') GROUP BY word),
      t1 AS (SELECT word, wc, i::BIGINT AS pos, word[i:i] AS tok
        FROM (SELECT word, wc, unnest(range(1, len(word) + 1)) AS i FROM w0)),
      $rounds
      SELECT * FROM (
      $unions) ORDER BY round"""
  }

  // ---- rolling-hash fingerprint -------------------------------------------
  // Rabin–Karp min-window hash (O(n) with an O(1) slide) as a native
  // expression; the oracle recomputes every window by the plain fold.

  private val RollK = 16

  def taRolling(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(
        col("doc_id"),
        graft.functions.Compat
          .column(graft.expressions.RollingHashMin(
            graft.functions.Compat.expression(col("text")),
            RollK))
          .as("rolling_fp"))
      .orderBy("doc_id")

  val taRollingSql: String = {
    val B = graft.expressions.RollingHashMin.B
    val P = graft.expressions.RollingHashMin.P
    def fold(rangeExpr: String) =
      s"list_reduce(list_prepend(0::BIGINT, list_transform($rangeExpr, j -> unicode(text[j:j])::BIGINT)), (a, c) -> (a * $B + c) % $P)"
    s"""SELECT doc_id,
      CASE WHEN length(text) > $RollK
           THEN list_min(list_transform(range(1, length(text) - $RollK + 2),
                i -> ${fold(s"range(i, i + $RollK)")}))
           ELSE ${fold("range(1, length(text) + 1)")} END AS rolling_fp
      FROM documents ORDER BY doc_id"""
  }

  // ---- corpus vocabulary --------------------------------------------------
  // Token-level corpus statistics: occurrence count, document frequency,
  // frequency rank, and occurrence share — the vocabulary table a tokenizer
  // pipeline materializes. The global rank uses the two-pass
  // [[graft.operators.GlobalRank]] (range-partitioned sort + per-partition
  // offsets), NOT a single-partition window — a 1e8-token vocabulary ranks
  // distributed. The corpus-wide occurrence total is a scalar aggregate
  // (one long to the driver), not a window over an unpartitioned frame.

  def taVocab(spark: SparkSession, dir: String): DataFrame = {
    val occ = docs(spark, dir)
      .select(col("doc_id"), explode(toks).as("token"))
    // Persisted: the total aggregate, the rank's range-sampling pass, and
    // the rank shuffle would otherwise each re-run the token aggregation.
    // Tracked (the taBm25 policy) so the wrapper's releaseAll() frees it
    // AFTER the returned frame materializes — unpersisting here at
    // plan-construction time made the final consumer re-pay the whole
    // token aggregation (r9 advice item).
    val vocab = graft.Caches.track(
      occ
        .groupBy("token")
        .agg(
          count(lit(1)).as("n_occ"),
          countDistinct("doc_id").as("n_docs"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val total = vocab.agg(sum("n_occ")).collect()(0).getLong(0)
    graft.operators.GlobalRank
      .withRank(vocab, Seq(col("n_occ").desc, col("token")), "rank")
      .withColumn("share", col("n_occ").cast("double") / lit(total))
      .orderBy("rank")
  }

  val taVocabSql: String =
    s"""SELECT token, n_occ, n_docs,
      row_number() OVER (ORDER BY n_occ DESC, token) AS rank,
      n_occ::DOUBLE / sum(n_occ) OVER () AS share
      FROM (SELECT token, count(*) AS n_occ, count(DISTINCT doc_id) AS n_docs
            FROM (SELECT doc_id, unnest($sqlToks) AS token FROM documents)
            GROUP BY token)
      ORDER BY rank"""

  private val ZipfHead = 100

  /** Zipf-law fit over the frequency head: OLS of ln(count) on ln(rank)
    * for the top-[[ZipfHead]] token types — the standard corpus-health
    * check (natural text sits near slope −1; boilerplate-heavy or
    * synthetic corpora bend away, so a drifting slope flags an ingest
    * regression before any model sees the data). Scale shape: one
    * map-side-combined token count, the two-pass
    * [[graft.operators.GlobalRank]] (no single-partition window), a
    * 100-row filter, and a one-row OLS aggregate — nothing
    * corpus-sized shuffles after the count. The slope/intercept/r2 are
    * DOUBLE payloads on a single unranked row (the gr_adamic lesson:
    * never rank on a transcendental); rank itself ties exactly on
    * (count desc, token asc) in both engines.
    */
  def taZipf(spark: SparkSession, dir: String): DataFrame = {
    // Tracked, not unpersisted at plan time (see taVocab's note).
    val vocab = graft.Caches.track(
      docs(spark, dir)
        .select(explode(toks).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("n_occ"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val totals = vocab.agg(
      count(lit(1)).as("n_types"),
      sum("n_occ").as("n_tokens"))
    val head = graft.operators.GlobalRank
      .withRank(vocab, Seq(col("n_occ").desc, col("token")), "rank")
      .filter(col("rank") <= ZipfHead)
      .select(
        log(col("rank").cast("double")).as("x"),
        log(col("n_occ").cast("double")).as("y"))
    val s = head.agg(
      count(lit(1)).as("n"),
      sum("x").as("sx"),
      sum("y").as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("y") * col("y")).as("syy"))
    val cov = col("n") * col("sxy") - col("sx") * col("sy")
    val varX = col("n") * col("sxx") - col("sx") * col("sx")
    val varY = col("n") * col("syy") - col("sy") * col("sy")
    val slope = cov / varX
    val out = s
      .crossJoin(totals)
      .select(
        col("n_types"),
        col("n_tokens"),
        col("n").as("n_head"),
        slope.as("zipf_slope"),
        ((col("sy") - slope * col("sx")) / col("n")).as("intercept"),
        (cov * cov / (varX * varY)).as("r2"))
    out
  }

  val taZipfSql: String =
    s"""WITH v AS (SELECT token, count(*)::BIGINT AS n_occ
          FROM (SELECT unnest($sqlToks) AS token FROM documents) GROUP BY token),
      r AS (SELECT n_occ, row_number() OVER (ORDER BY n_occ DESC, token) AS rank FROM v),
      h AS (SELECT ln(rank::DOUBLE) AS x, ln(n_occ::DOUBLE) AS y FROM r WHERE rank <= $ZipfHead),
      s AS (SELECT count(*)::BIGINT AS n, sum(x) AS sx, sum(y) AS sy,
          sum(x*x) AS sxx, sum(x*y) AS sxy, sum(y*y) AS syy FROM h),
      t AS (SELECT count(*)::BIGINT AS n_types, sum(n_occ)::BIGINT AS n_tokens FROM v)
      SELECT t.n_types, t.n_tokens, s.n AS n_head,
        (s.n*s.sxy - s.sx*s.sy) / (s.n*s.sxx - s.sx*s.sx) AS zipf_slope,
        (s.sy - ((s.n*s.sxy - s.sx*s.sy) / (s.n*s.sxx - s.sx*s.sx)) * s.sx) / s.n AS intercept,
        (s.n*s.sxy - s.sx*s.sy) * (s.n*s.sxy - s.sx*s.sy)
          / ((s.n*s.sxx - s.sx*s.sx) * (s.n*s.syy - s.sy*s.sy)) AS r2
      FROM s, t"""

  // ---- TF-IDF scoring -----------------------------------------------------

  /** Minimum in-doc term frequency for a row to be emitted. */
  private val MinTf = 3

  /** TF-IDF term scoring: every (doc, token) with tf >= [[MinTf]], its
    * corpus document frequency, and `tf * ln(N/df)` — the keyword /
    * quality-weighting signal a training-data pipeline derives. Emitted as
    * a THRESHOLD set, not a per-doc top-k: the gate then compares float
    * scores by value (12 significant digits), where a top-k would make row
    * membership depend on float ORDERING that a 1-ulp `ln` difference
    * across engines could flip. Two aggregates — (doc, tok) term counts
    * and (tok) document frequencies — joined back slim; the corpus size N
    * rides in as a one-row cross join (broadcast), never a driver-side
    * constant, so the plan works unchanged at any scale.
    */
  def taTfidf(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val tok = d.select(col("doc_id"), explode(toks).as("tok"))
    val tf = tok.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf")).filter(col("tf") >= MinTf)
    val df = tok.groupBy("tok").agg(countDistinct(col("doc_id")).as("df"))
    val nDocs = d.agg(count(lit(1)).as("n_docs"))
    tf.join(df, Seq("tok"))
      .crossJoin(nDocs)
      .select(
        col("doc_id"),
        col("tok"),
        col("tf"),
        col("df"),
        (col("tf") * log(col("n_docs").cast("double") / col("df"))).as("tfidf"))
      .orderBy("doc_id", "tok")
  }

  val taTfidfSql: String =
    s"""WITH tok AS (SELECT doc_id, unnest($sqlToks) AS tok FROM documents),
      tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1, 2 HAVING count(*) >= $MinTf),
      df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
      n AS (SELECT count(*) AS n_docs FROM documents)
      SELECT doc_id, tok, tf, df, tf * ln(n.n_docs::DOUBLE / df) AS tfidf
      FROM tf JOIN df USING (tok), n
      ORDER BY doc_id, tok"""

  // ---- BM25 retrieval scoring ---------------------------------------------

  /** BM25 term-saturation constant (Robertson's k1). */
  private val Bm25K1 = 1.2

  /** BM25 length-normalization strength (Robertson's b). */
  private val Bm25B = 0.75

  /** Okapi BM25 term scoring — the standard retrieval scorer next to
    * [[taTfidf]]'s linear tf weighting: per surviving (doc, token) the
    * saturated, length-normalized contribution
    * `idf * tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))` with the
    * +1-smoothed Robertson idf `ln((N − df + 0.5)/(df + 0.5) + 1)`
    * (always positive, so stopword-frequency terms degrade gracefully
    * instead of flipping sign). The emitted rows ARE the posting-list
    * index a retrieval layer merges per query term — scoring any
    * multi-term query is a semi-join against `tok` plus a per-doc sum.
    *
    * Same gate discipline as ta_tfidf: a THRESHOLD row set (`tf >=`
    * [[MinTf]], integer-decided membership), float scores compared by
    * value — never a float-ordered top-k. Scale shape: two aggregates
    * ((doc,tok) tf with map-side combine and (tok) df) + slim join-backs;
    * the two corpus constants (N, Σdl) ride in as a one-row broadcast
    * cross join, never driver-side constants; dl joins back doc-keyed.
    * The IEEE expression tree is written identically here and in the
    * oracle (single division, fixed association) so both engines evaluate
    * the same rounding sequence.
    */
  def taBm25(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val tok = graft.Caches.track(
      d.select(col("doc_id"), explode(toks).as("tok"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val tf = tok
      .groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("tf"))
      .filter(col("tf") >= MinTf)
    val df = tok.groupBy("tok").agg(countDistinct(col("doc_id")).as("df"))
    val corpus = dl.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    val k1 = lit(Bm25K1)
    val b = lit(Bm25B)
    val idf = log(
      (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)) + lit(1.0))
    val norm = k1 * (lit(1.0) - b + b * (col("dl").cast("double") /
      (col("sum_dl").cast("double") / col("n_docs").cast("double"))))
    tf.join(df, Seq("tok"))
      .join(dl, Seq("doc_id"))
      .crossJoin(corpus)
      .select(
        col("doc_id"),
        col("tok"),
        col("tf"),
        col("df"),
        col("dl"),
        (idf * (col("tf").cast("double") * (k1 + lit(1.0)) /
          (col("tf").cast("double") + norm))).as("bm25"))
      .orderBy("doc_id", "tok")
  }

  val taBm25Sql: String =
    s"""WITH tok AS (SELECT doc_id, unnest($sqlToks) AS tok FROM documents),
      dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
      tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1, 2 HAVING count(*) >= $MinTf),
      df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
      c AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl)
      SELECT tf.doc_id, tf.tok, tf.tf, df.df, dl.dl,
        ln((c.n_docs::DOUBLE - df.df::DOUBLE + 0.5) / (df.df::DOUBLE + 0.5) + 1.0)
          * (tf.tf::DOUBLE * ($Bm25K1 + 1.0)
             / (tf.tf::DOUBLE + $Bm25K1 * (1.0 - $Bm25B + $Bm25B
                * (dl.dl::DOUBLE / (c.sum_dl::DOUBLE / c.n_docs::DOUBLE))))) AS bm25
      FROM tf JOIN df USING (tok) JOIN dl ON dl.doc_id = tf.doc_id, c
      ORDER BY tf.doc_id, tf.tok"""

  // ---- heavy hitters (Misra–Gries) ----------------------------------------

  /** Summary size: guarantees cover every token with freq > n/[[HhK]].
    * 40 puts the threshold at 2.5% — the harness corpus tops out around
    * 3.5% token frequency, so the gate evaluates REAL heavy hitters at
    * every fixture scale (k=20's 5% threshold would make the row set, and
    * hence the whole oracle check, vacuously empty).
    */
  private val HhK = 40

  /** Distributed frequent-token mining via the mergeable Misra–Gries
    * aggregator ([[graft.functions.MisraGries]]): O(k) state, one
    * map-side-combine pass — the sketch you run when the exact (token,
    * count) table would itself be too large to materialize. The summary
    * CONTENTS are merge-order-dependent, but its GUARANTEES are not, so
    * the query emits — for every TRUE heavy hitter, derived exactly —
    * three boolean verdicts (present in sketch; never over-counted;
    * undercount within n/k) plus the exact anchors; the oracle recomputes
    * the anchors and expects every verdict TRUE. All comparisons are
    * integer (exact*k vs n), so the row set is deterministic.
    */
  def taHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    // Persisted: the token stream feeds both the sketch aggregate and the
    // exact-anchor groupBy in one job — without this the corpus is
    // scanned + tokenized twice.
    val tok = graft.Caches.track(
      docs(spark, dir)
        .select(explode(toks).as("tok"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val mg = udaf(new graft.functions.MisraGries(HhK))
    val sketchRow = tok.agg(mg(col("tok")).as("sketch"), count(lit(1)).as("n"))
    val est = coalesce(element_at(col("sketch"), col("tok")), lit(0L))
    tok
      .groupBy("tok")
      .agg(count(lit(1)).as("exact_count"))
      .crossJoin(sketchRow)
      .filter(col("exact_count") * HhK > col("n"))
      .select(
        col("tok"),
        col("exact_count"),
        element_at(col("sketch"), col("tok")).isNotNull.as("in_sketch"),
        (est <= col("exact_count")).as("no_overcount"),
        ((col("exact_count") - est) * HhK <= col("n")).as("bound_ok"))
      .orderBy("tok")
  }

  val taHeavyHittersSql: String =
    s"""WITH tok AS (SELECT unnest($sqlToks) AS tok FROM documents),
      n AS (SELECT count(*) AS n FROM tok),
      e AS (SELECT tok, count(*) AS exact_count FROM tok GROUP BY tok)
      SELECT tok, exact_count, TRUE AS in_sketch, TRUE AS no_overcount, TRUE AS bound_ok
      FROM e, n WHERE exact_count * $HhK > n.n ORDER BY tok"""

  // ---- repetition signals (Gopher-style quality filters) ------------------

  /** Per-document repetition signals: the fraction of token 2-/3-grams that
    * are duplicates within the document, and the dominant token with its
    * share of all tokens (ties break to the lexicographically smallest
    * token). These are the "repetitious document" exclusion filters of the
    * Gopher/MassiveText pipeline; like the other ta_* scans this is a
    * single embarrassingly-parallel pass — per-row array expressions, no
    * shuffle before the presentation sort.
    */
  private def ngramList(tk: Column, n: Int): Column =
    when(size(tk) < n, array().cast("array<string>"))
      .otherwise(
        transform(
          sequence(lit(0), size(tk) - lit(n)),
          i => concat_ws(" ", slice(tk, i + lit(1), lit(n)))))

  private def dupFrac(ng: Column): Column =
    when(size(ng) === 0, lit(0.0))
      .otherwise((size(ng) - size(array_distinct(ng))) / size(ng))

  def taRepetition(spark: SparkSession, dir: String): DataFrame = {
    val tk = toks
    val counts = transform(
      array_distinct(tk),
      t => struct(size(filter(tk, x => x === t)).as("cnt"), t.as("tok")))
    val top = element_at(
      array_sort(
        counts,
        (l, r) =>
          when(l.getField("cnt") > r.getField("cnt"), -1)
            .when(l.getField("cnt") < r.getField("cnt"), 1)
            .when(l.getField("tok") < r.getField("tok"), -1)
            .when(l.getField("tok") > r.getField("tok"), 1)
            .otherwise(0)),
      1)
    docs(spark, dir)
      .select(
        col("doc_id"),
        dupFrac(ngramList(tk, 2)).as("dup_2gram_frac"),
        dupFrac(ngramList(tk, 3)).as("dup_3gram_frac"),
        when(size(tk) === 0, lit("")).otherwise(top.getField("tok")).as("top_token"),
        when(size(tk) === 0, lit(0.0))
          .otherwise(top.getField("cnt") / size(tk))
          .as("top_token_frac"))
      .orderBy("doc_id")
  }

  val taRepetitionSql: String = {
    def ngSql(n: Int) =
      s"""CASE WHEN len(tk) < $n THEN []::VARCHAR[]
          ELSE list_transform(range(0, len(tk) - ${n - 1}),
            i -> array_to_string(list_slice(tk, i + 1, i + $n), ' ')) END"""
    def dupSql(g: String) =
      s"CASE WHEN len($g) = 0 THEN 0.0 ELSE (len($g) - len(list_distinct($g)))::INT / len($g)::INT END"
    s"""WITH tok AS (SELECT doc_id, unnest($sqlToks) AS tok FROM documents),
      cnt AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok),
      top AS (SELECT doc_id, tok, c FROM (
          SELECT doc_id, tok, c,
            row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, tok ASC) AS rn
          FROM cnt) WHERE rn = 1),
      ng AS (SELECT doc_id, ${ngSql(2)} AS g2, ${ngSql(3)} AS g3, len(tk) AS n
        FROM (SELECT doc_id, $sqlToks AS tk FROM documents))
      SELECT ng.doc_id,
        ${dupSql("g2")} AS dup_2gram_frac,
        ${dupSql("g3")} AS dup_3gram_frac,
        coalesce(t.tok, '') AS top_token,
        CASE WHEN n = 0 THEN 0.0 ELSE coalesce(t.c, 0)::INT / n::INT END AS top_token_frac
      FROM ng LEFT JOIN top t ON ng.doc_id = t.doc_id ORDER BY ng.doc_id"""
  }

  // ---- PII scrubbing ------------------------------------------------------

  /** PII redaction audit: the synthetic corpus carries no PII, so the query
    * layer first PLANTS it deterministically (emails on doc_id%5, phone
    * numbers on %7, IPv4 hosts on %11 — both engines replay the identical
    * construction), then masks with [[graft.functions.Scrub]] and emits the
    * per-document mask counts. Map-only: no shuffle before the sort.
    */
  private val augText: Column = concat(
    col("text"),
    when(
      col("doc_id") % 5 === 0,
      concat(lit(" contact user"), col("doc_id").cast("string"), lit("@mail.example.com")))
      .otherwise(""),
    when(
      col("doc_id") % 7 === 0,
      concat(lit(" call 555-"), lpad((col("doc_id") * 37 % 10000).cast("string"), 4, "0")))
      .otherwise(""),
    when(
      col("doc_id") % 11 === 0,
      concat(
        lit(" host 10."),
        (col("doc_id") % 256).cast("string"),
        lit("."),
        (col("doc_id") * 7 % 256).cast("string"),
        lit(".4")))
      .otherwise(""))

  def taScrub(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Scrub
    docs(spark, dir)
      .select(col("doc_id"), augText.as("t"))
      .select(
        col("doc_id"),
        Scrub.maskPii(col("t")).as("clean_text"),
        Scrub.emailCount(col("t")).as("n_emails"),
        Scrub.ipCount(col("t")).as("n_ips"),
        Scrub.phoneCount(col("t")).as("n_phones"))
      .orderBy("doc_id")
  }

  val taScrubSql: String = {
    import graft.functions.Scrub
    val aug =
      """text
        || CASE WHEN doc_id % 5 = 0 THEN ' contact user' || doc_id::VARCHAR || '@mail.example.com' ELSE '' END
        || CASE WHEN doc_id % 7 = 0 THEN ' call 555-' || lpad(((doc_id * 37) % 10000)::VARCHAR, 4, '0') ELSE '' END
        || CASE WHEN doc_id % 11 = 0 THEN ' host 10.' || (doc_id % 256)::VARCHAR || '.' || ((doc_id * 7) % 256)::VARCHAR || '.4' ELSE '' END"""
    s"""WITH aug AS (SELECT doc_id, $aug AS t FROM documents)
      SELECT doc_id,
        regexp_replace(regexp_replace(regexp_replace(t,
          '${Scrub.EmailRe}', '<EMAIL>', 'g'),
          '${Scrub.Ipv4Re}', '<IP>', 'g'),
          '${Scrub.PhoneRe}', '<PHONE>', 'g') AS clean_text,
        len(regexp_extract_all(t, '${Scrub.EmailRe}'))::BIGINT AS n_emails,
        len(regexp_extract_all(t, '${Scrub.Ipv4Re}'))::BIGINT AS n_ips,
        len(regexp_extract_all(t, '${Scrub.PhoneRe}'))::BIGINT AS n_phones
      FROM aug ORDER BY doc_id"""
  }

  // ---- unigram LM scoring -------------------------------------------------

  /** Unigram LM cross-entropy per document (the CCNet-style quality
    * signal, with the corpus itself as the LM): learn p(t) = c(t)/N over
    * the whole corpus, then score each doc by the mean negative log
    * probability of its tokens. High scores = rare-token-heavy docs
    * (gibberish candidates); low = common-token boilerplate.
    *
    * Scale shape: the vocab pass is one token-hash shuffle (map-side
    * combined); scoring re-explodes tokens and joins the vocab — broadcast
    * here, a shuffle join once the vocabulary outgrows the broadcast
    * threshold — and aggregates back on doc_id. Docs with no tokens keep a
    * 0.0 score via the final left join against the full id set.
    */
  def taLmscore(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val tok = d.select(col("doc_id"), explode(toks).as("t"))
    val vocab = tok.groupBy("t").agg(count(lit(1)).as("c"))
    val total = vocab.agg(sum(col("c")).cast("double").as("n"))
    val scored = tok
      .join(broadcast(vocab), "t")
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        avg(-log(col("c") / col("n"))).as("xent"))
    d.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("xent"), lit(0.0)).as("xent"))
      .orderBy("doc_id")
  }

  val taLmscoreSql: String =
    s"""WITH tok AS (SELECT doc_id, unnest($sqlToks) AS t FROM documents),
      vocab AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
      tot AS (SELECT sum(c)::DOUBLE AS n FROM vocab),
      sc AS (SELECT tok.doc_id, count(*) AS n_tokens, avg(-ln(vocab.c / tot.n)) AS xent
        FROM tok JOIN vocab ON tok.t = vocab.t CROSS JOIN tot GROUP BY tok.doc_id)
      SELECT d.doc_id, coalesce(sc.n_tokens, 0) AS n_tokens,
        coalesce(sc.xent, 0.0) AS xent
      FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id ORDER BY d.doc_id"""

  // ---- RAG-style sliding-window chunking -----------------------------------
  // Split each document into overlapping token windows (window 32, stride
  // 24 → 8-token overlap) — the chunking pass an embedding/RAG indexing
  // pipeline runs before encoding. Chunk count is 1 + ceil(max(n-W,0)/S),
  // so the tail window always reaches the last token (no token is left
  // uncovered, no degenerate sub-stride tail chunk is emitted). The whole
  // op is a narrow per-row explode — embarrassingly parallel at 100 TB,
  // with output ~n/S rows per doc; the only shuffle is the presentation
  // sort. Chunk ids are per-document ordinals so downstream encode/upsert
  // stages can key on (doc_id, chunk_id) deterministically.

  def taChunk(spark: SparkSession, dir: String): DataFrame = {
    val W = 32
    val S = 24
    val n = size(col("tk"))
    val nChunks =
      when(n <= W, lit(1))
        .otherwise(floor((n - W + (S - 1)) / S).cast("int") + 1)
    docs(spark, dir)
      .select(col("doc_id"), toks.as("tk"))
      .select(col("doc_id"), col("tk"), explode(sequence(lit(0), nChunks - 1)).as("chunk_id"))
      .select(
        col("doc_id"),
        col("chunk_id").cast("long").as("chunk_id"),
        slice(col("tk"), col("chunk_id") * S + 1, lit(W)).as("chunk"))
      .select(
        col("doc_id"),
        col("chunk_id"),
        size(col("chunk")).cast("long").as("n_tokens"),
        concat_ws(" ", col("chunk")).as("chunk_text"))
      .orderBy("doc_id", "chunk_id")
  }

  val taChunkSql: String =
    s"""WITH d AS (SELECT doc_id, $sqlToks AS tk FROM documents),
      c AS (SELECT doc_id, tk,
        CASE WHEN len(tk) <= 32 THEN 1 ELSE ((len(tk) - 32 + 23) // 24) + 1 END AS n_chunks
        FROM d),
      e AS (SELECT doc_id, tk, unnest(range(n_chunks)) AS g FROM c),
      s AS (SELECT doc_id, g::BIGINT AS chunk_id,
        list_slice(tk, g * 24 + 1, g * 24 + 32) AS chunk FROM e)
      SELECT doc_id, chunk_id, len(chunk)::BIGINT AS n_tokens,
        array_to_string(chunk, ' ') AS chunk_text
      FROM s ORDER BY doc_id, chunk_id"""

  // ---- token-pair association (lift) ---------------------------------------
  // Collocation mining: for every unordered pair of tokens co-occurring in
  // a document, lift = N * df(x,y) / (df(x) * df(y)) — the association
  // signal (log-free PMI surrogate) a phrase/stop-phrase miner computes
  // over a corpus. All inputs are exact BIGINT document counts, the score
  // is ONE double multiply chain + one correctly-rounded division, scaled
  // to an integer — bit-identical across engines (the gr_adamic lesson:
  // no transcendental in an exact-compare path).
  //
  // Scale: pairs are generated MAP-SIDE over each document's sorted
  // distinct-token array — no token-row self-join (the oracle's tok⋈tok
  // shape is exactly what this avoids). The combination fan-out is TWO
  // CHAINED Generate(Explode)s (posexplode the array, then explode the
  // tail slice past each position) rather than one nested-transform HOF:
  // both explodes stay inside whole-stage codegen, whereas nested lambda
  // functions evaluate interpreted (measured 11x slower at sf0.1 — 10.9 s
  // vs 1.0 s for the identical 1.4M-pair fan-out). The pair count is one
  // partially-aggregated shuffle keyed by (t1,t2); per-token df is a
  // second small shuffle; the df join-back touches only the surviving
  // (codf >= MinCo) pairs. At web scale the array is first intersected
  // with a broadcast min-df vocabulary so pair fan-out is bounded by the
  // heavy vocabulary, not the document length (lossless for the final
  // result: df(x,y) <= min(df(x), df(y)), so a token below the co-count
  // floor can never appear in a surviving pair).

  private val PairMinCo = 5

  def taPairlift(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val ts = array_sort(array_distinct(toks))
    val n = d.select(count(lit(1)).as("n"))
    val tok = d.select(col("doc_id"), explode(array_distinct(toks)).as("t"))
    val dfc = tok.groupBy("t").agg(count(lit(1)).as("df"))
    val pairCounts = d
      .select(ts.as("ts"))
      .select(posexplode(col("ts")).as(Seq("i", "t1")), col("ts"))
      .select(
        col("t1"),
        explode(slice(col("ts"), col("i") + lit(2), size(col("ts")))).as("t2"))
      .groupBy("t1", "t2")
      .agg(count(lit(1)).as("codf"))
      .filter(col("codf") >= PairMinCo)
    pairCounts
      .join(dfc.select(col("t").as("t1"), col("df").as("df1")), "t1")
      .join(dfc.select(col("t").as("t2"), col("df").as("df2")), "t2")
      .crossJoin(broadcast(n))
      .select(
        col("t1"),
        col("t2"),
        col("codf"),
        col("df1"),
        col("df2"),
        round(lit(1e6) * (col("n") * col("codf")) / (col("df1") * col("df2")))
          .cast("long")
          .as("lift_scaled"))
      .orderBy(col("lift_scaled").desc, col("t1"), col("t2"))
      .limit(100)
  }

  val taPairliftSql: String =
    s"""WITH tok AS (
        SELECT DISTINCT doc_id, t
        FROM (SELECT doc_id, unnest($sqlToks) AS t FROM documents)),
      dfc AS (SELECT t, count(*) AS df FROM tok GROUP BY t),
      n AS (SELECT count(*) AS n FROM documents),
      pairs AS (
        SELECT a.t AS t1, b.t AS t2, count(*) AS codf
        FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND a.t < b.t
        GROUP BY 1, 2 HAVING count(*) >= $PairMinCo)
      SELECT t1, t2, codf, d1.df AS df1, d2.df AS df2,
        round(1000000.0 * (n.n * codf) / (d1.df * d2.df))::BIGINT AS lift_scaled
      FROM pairs
      CROSS JOIN n
      JOIN dfc d1 ON t1 = d1.t
      JOIN dfc d2 ON t2 = d2.t
      ORDER BY lift_scaled DESC, t1, t2 LIMIT 100"""

  // ---- RAKE keyphrase extraction ------------------------------------------

  private val KeyphraseTopK = 3

  /** RAKE-style keyphrase extraction — the phrase-level capability next
    * to the token-level `ta_tfidf`/`ta_heavyhitters`: candidate phrases
    * are maximal runs of non-stopword tokens (the vendored NLTK list,
    * [[graft.functions.Cleaning.StopWords]]; split is `[^a-z]+` on the
    * lowercased text, so apostrophe stopwords reduce to their NLTK
    * single-letter remnants), each doc scores its own phrases by the
    * integer degree-sum variant (deg(w) = Σ phrase length over w's
    * occurrences in the doc; phrase score = Σ deg over member
    * occurrences — the RAKE paper's deg(w) metric, kept integral so the
    * row set is integer-deterministic, no cross-engine float ranking),
    * and the top [[KeyphraseTopK]] per doc survive, tie-broken by phrase
    * text. Docs whose tokens are all stopwords have no candidates and
    * are absent.
    *
    * Scale shape: every stage keys by doc_id — tokenize/explode is
    * map-only, the island numbering is a per-doc window over word
    * positions, and the stats/score/top-k aggregates are doc-keyed
    * groupBys — nothing corpus-global, no ledger, no broadcast beyond
    * the stopword literal, so the query is embarrassingly
    * corpus-parallel and skew-bounded by document length.
    */
  def taKeyphrase(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = contentWords(spark, dir)
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val runs = words.withColumn("grp", col("pos") - row_number().over(byDoc))
    val phrases = runs
      .groupBy("doc_id", "grp")
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("word")))), s =>
            s.getField("word")),
          " ").as("phrase"),
        count(lit(1)).as("n_words"))
    val deg = runs
      .join(phrases.select(col("doc_id"), col("grp"), col("n_words")), Seq("doc_id", "grp"))
      .groupBy("doc_id", "word")
      .agg(sum(col("n_words")).as("deg"))
    val scored = runs
      .join(deg, Seq("doc_id", "word"))
      .groupBy("doc_id", "grp")
      .agg(sum(col("deg")).as("score"))
      .join(phrases, Seq("doc_id", "grp"))
    scored
      .withColumn(
        "rank",
        row_number().over(
          Window.partitionBy("doc_id").orderBy(col("score").desc, col("phrase"))))
      .filter(col("rank") <= KeyphraseTopK)
      .select(col("doc_id"), col("rank"), col("phrase"), col("n_words"), col("score"))
      .orderBy("doc_id", "rank")
  }

  val taKeyphraseSql: String = {
    val stop = graft.functions.Cleaning.StopWords
      .map(w => "'" + w.replace("'", "''") + "'")
      .mkString(", ")
    s"""WITH w AS (
        SELECT doc_id, unnest(ws) AS word, generate_subscripts(ws, 1) AS pos
        FROM (SELECT doc_id,
          list_filter(string_split_regex(lower(text), '[^a-z]+'), t -> t <> '') AS ws
          FROM documents)),
      runs AS (
        SELECT doc_id, word, pos,
          pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        FROM w WHERE word NOT IN ($stop)),
      phrases AS (
        SELECT doc_id, grp, string_agg(word, ' ' ORDER BY pos) AS phrase,
          count(*) AS n_words
        FROM runs GROUP BY doc_id, grp),
      deg AS (
        SELECT r.doc_id, r.word, sum(p.n_words)::BIGINT AS deg
        FROM runs r JOIN phrases p ON p.doc_id = r.doc_id AND p.grp = r.grp
        GROUP BY r.doc_id, r.word),
      scored AS (
        SELECT r.doc_id, r.grp, sum(d.deg)::BIGINT AS score
        FROM runs r JOIN deg d ON d.doc_id = r.doc_id AND d.word = r.word
        GROUP BY r.doc_id, r.grp),
      sp AS (
        SELECT s.doc_id, s.score, p.phrase, p.n_words,
          row_number() OVER (PARTITION BY s.doc_id
            ORDER BY s.score DESC, p.phrase) AS rank
        FROM scored s JOIN phrases p ON p.doc_id = s.doc_id AND p.grp = s.grp)
      SELECT doc_id, rank::INT AS rank, phrase, n_words, score
      FROM sp WHERE rank <= $KeyphraseTopK ORDER BY doc_id, rank"""
  }

  // ---- TextRank keyword extraction ----------------------------------------

  private val TextrankIters = 3
  private val TextrankTopK = 5

  /** TextRank keyword extraction — PageRank over each document's
    * content-word adjacency graph (Mihalcea & Tarau's formulation:
    * consecutive non-stopword words co-occur; the stationary walk ranks
    * words by how centrally the document keeps returning to them — the
    * graph-centrality signal RAKE's degree sum only approximates). Same
    * tokenize + stopword gate as [[taKeyphrase]]; edges are DISTINCT
    * undirected adjacencies within a doc.
    *
    * The walk is the scaled-integer discipline of
    * [[graft.operators.ScaledWalks]]: scores are BIGINT millionths,
    * damping 0.85 as `(p · 85) div (100 · od)` per-edge floor plus a
    * `150000` restart base, [[TextrankIters]] rounds — every term
    * bit-identical on both engines, so the per-doc top-[[TextrankTopK]]
    * (score DESC, word — an INTEGER-ordered top-k, never float-ordered)
    * is hash-exact. Scale shape: the corpus is a MILLION small graphs,
    * not one big one — every stage keys by doc_id (adjacency windows,
    * degree groupBys, the per-round contribution aggregate), so each
    * round is one doc-keyed shuffle of the score frame and the query is
    * embarrassingly corpus-parallel; nothing corpus-global exists at all.
    */
  def taTextrank(spark: SparkSession, dir: String): DataFrame =
    textrankFrom(contentWords(spark, dir))

  /** The full TextRank pipeline over a `(doc_id, pos, word)` content-word
    * frame — the single implementation [[taTextrank]] AND ScaleProbe's
    * textrank_rounds probe share, so a damping/Scale/round change can
    * never silently diverge between the benchmarked query and the probe.
    */
  private[graft] def textrankFrom(words: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val adj = words
      .withColumn("nxt", lead(col("word"), 1).over(byDoc))
      .filter(col("nxt").isNotNull && col("word") =!= col("nxt"))
    // Symmetrize via the CANONICAL unordered pair: distinct runs over the
    // half-size (doc, lo, hi) frame, each orientation is emitted exactly
    // once further down — same edge set as distinct-over-both-
    // orientations (an unordered pair appears iff adjacent in either
    // order), at half the distinct's volume. The adjacency build is this
    // query's dominant cost now that the rounds are fused, so the whole
    // chain rides [[contentWords]]' hash(doc_id) layout (r11): the
    // window inherits it (no exchange, no sort — the persist is already
    // (doc_id, pos)-ordered), the distinct and every aggregate below
    // satisfy their clustered distribution on the subset rule, and the
    // two degree joins pair hash(doc_id) frames — the only exchanges
    // left in the build are the node-frame distinct and edgesDeg's final
    // (doc_id, src) layout for the rounds.
    // Persisted (r10 verdict #4): the degree pass and both join-backs
    // below read canon; unpersisted, the window+distinct would re-run
    // per consumer. Tracked, not pinned: private to this query's run.
    val canon = graft.Caches.track(
      adj
        .select(
          col("doc_id"),
          least(col("word"), col("nxt")).as("lo"),
          greatest(col("word"), col("nxt")).as("hi"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // Per-(doc, node) degree over BOTH endpoints in one doc-keyed pass —
    // its key set IS the node set, so no separate distinct exists.
    // Persisted: three consumers (two degree join-backs + the initial
    // score frame).
    val od = graft.Caches.track(
      canon
        .select(col("doc_id"), explode(array(col("lo"), col("hi"))).as("word"))
        .groupBy("doc_id", "word")
        .agg(count(lit(1)).as("od"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val nodes = od.select(col("doc_id"), col("word"))
    // Both orientations + the source-side degree in ONE pass over canon:
    // attach od for lo and hi (two co-partitioned hash(doc_id) joins),
    // then explode each canonical pair into its two directed rows. No
    // doubled `sym` frame ever materializes. Persisted and partitioned
    // by the FULL round-join key (doc_id, src), with the score frame
    // held on the paired (pdoc, pword) layout: the per-round join is
    // then co-partitioned outright, and the round's only exchange is the
    // (doc_id, dst) aggregate — whose output lands exactly on
    // (pdoc, pword) after the rename, re-establishing the layout for
    // the next round.
    val edgesDeg = graft.Caches.track(
      canon
        .join(
          od.select(col("doc_id"), col("word").as("lo"), col("od").as("od_lo")),
          Seq("doc_id", "lo"))
        .join(
          od.select(col("doc_id"), col("word").as("hi"), col("od").as("od_hi")),
          Seq("doc_id", "hi"))
        .select(
          col("doc_id"),
          explode(array(
            struct(col("lo").as("src"), col("hi").as("dst"), col("od_lo").as("od")),
            struct(col("hi").as("src"), col("lo").as("dst"), col("od_hi").as("od"))))
            .as("e"))
        .select(col("doc_id"), col("e.src").as("src"), col("e.dst").as("dst"), col("e.od").as("od"))
        .repartition(col("doc_id"), col("src"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // Distinct names (pdoc/pword) on the score frame: each round joins it
    // back against frames derived from the same lineage, and shared
    // attribute ids would make the join conditions ambiguous.
    val base = nodes.select(col("doc_id").as("pdoc"), col("word").as("pword"))
    var p = base
      .withColumn("p", lit(graft.operators.ScaledWalks.Scale))
      .repartition(col("pdoc"), col("pword"))
    for (i <- 1 to TextrankIters) {
      // Fused round: damped score + restart base in ONE doc-keyed
      // aggregate (the gr_louvain single-fused-groupBy discipline). The
      // old restart pass joined the contribution sums back against
      // `base` with a coalesce-to-150000 fill — but the graph is
      // SYMMETRIC, so every node has at least one inbound edge, the
      // aggregate emits every (doc, word), and that left join's fill
      // could never fire: it was a pure extra join + shuffle per round.
      p = graft.operators.Lineage.round(
        edgesDeg
          .join(p, col("doc_id") === col("pdoc") && col("src") === col("pword"))
          .groupBy(col("doc_id"), col("dst"))
          .agg((lit(150000L) + sum(expr("(p * 85) div (100 * od)"))).as("p"))
          .select(col("doc_id").as("pdoc"), col("dst").as("pword"), col("p")), i)
    }
    p.withColumn(
        "rank",
        row_number().over(
          Window.partitionBy("pdoc").orderBy(col("p").desc, col("pword"))))
      .filter(col("rank") <= TextrankTopK)
      .select(
        col("pdoc").as("doc_id"),
        col("rank"),
        col("pword").as("word"),
        col("p").as("score"))
      .orderBy("doc_id", "rank")
  }

  val taTextrankSql: String = {
    val stop = graft.functions.Cleaning.StopWords
      .map(w => "'" + w.replace("'", "''") + "'")
      .mkString(", ")
    def iter(cur: String, prev: String) =
      s"""$cur AS (SELECT n.doc_id, n.word,
          (150000 + coalesce(c.s, 0))::BIGINT AS p
          FROM nodes n LEFT JOIN (
            SELECT e.doc_id, e.dst, sum((pp.p * 85) // (100 * deg.od))::BIGINT AS s
            FROM sym e
            JOIN deg ON deg.doc_id = e.doc_id AND deg.src = e.src
            JOIN $prev pp ON pp.doc_id = e.doc_id AND pp.word = e.src
            GROUP BY e.doc_id, e.dst) c
          ON c.doc_id = n.doc_id AND c.dst = n.word)"""
    s"""WITH w AS (
        SELECT doc_id, unnest(ws) AS word, generate_subscripts(ws, 1) AS pos
        FROM (SELECT doc_id,
          list_filter(string_split_regex(lower(text), '[^a-z]+'), t -> t <> '') AS ws
          FROM documents)),
      f AS (SELECT doc_id, word, pos FROM w WHERE word NOT IN ($stop)),
      adjpair AS (
        SELECT doc_id, word,
          lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
        FROM f),
      sym AS MATERIALIZED (
        SELECT DISTINCT doc_id, src, dst FROM (
          SELECT doc_id, word AS src, nxt AS dst FROM adjpair
            WHERE nxt IS NOT NULL AND word <> nxt
          UNION ALL
          SELECT doc_id, nxt, word FROM adjpair
            WHERE nxt IS NOT NULL AND word <> nxt)),
      nodes AS MATERIALIZED (SELECT DISTINCT doc_id, src AS word FROM sym),
      deg AS MATERIALIZED (SELECT doc_id, src, count(*) AS od FROM sym GROUP BY 1, 2),
      p0 AS (SELECT doc_id, word, ${graft.operators.ScaledWalks.Scale}::BIGINT AS p FROM nodes),
      ${iter("p1", "p0")},
      ${iter("p2", "p1")},
      ${iter("p3", "p2")},
      ranked AS (SELECT doc_id, word, p,
        row_number() OVER (PARTITION BY doc_id ORDER BY p DESC, word) AS rank
        FROM p$TextrankIters)
      SELECT doc_id, rank::INT AS rank, word, p AS score
      FROM ranked WHERE rank <= $TextrankTopK ORDER BY doc_id, rank"""
  }

  // ---- SymSpell typo candidates -------------------------------------------

  /** SymSpell deletion-neighborhood confusable-pair audit: every pair of
    * vocabulary entries at Levenshtein distance EXACTLY 1, found without
    * enumerating pairs. The candidate join is the SymSpell index trick —
    * every word emits itself plus its single-deletion variants (a
    * map-only explode, ~len variants per word), and a distance-1 pair
    * ALWAYS shares a variant (substitution: both drop the differing
    * position; insert/delete: the longer word's deletion IS the shorter
    * word), so one string equi-join replaces the quadratic all-pairs scan
    * and the post-join `levenshtein = 1` check only discards candidates
    * (e.g. transpositions, which share variants at Damerau distance 1 but
    * Levenshtein 2) — lossless by construction, the same
    * candidates-then-verify discipline as the PPJoin dedup family.
    *
    * The vocabulary is a MULTI-SOURCE identifier pool (document content
    * words, part-name words, nation names, market segments, all
    * lowercased, length >= 3) — the catalog-hygiene framing: near-identical
    * entries across heterogeneous sources ("nation_1" vs "nation_11",
    * "red" vs "rod") are exactly what silently corrupts joins and
    * dedup keys downstream, and this audit surfaces every such pair with
    * both occurrence counts. Everything is exact strings and integers —
    * hash-exact across engines.
    *
    * Scale shape: one token-count aggregate per source (map-side
    * combined), one map-only variant explosion (vocabulary-sized, far
    * below corpus size), ONE string equi-join on the variant key, one
    * codegen'd levenshtein filter on the surviving candidates. At 100 TB
    * the variant join is the entire cost model of a query-log spell /
    * identifier-reconciliation service — no pair enumeration anywhere.
    */
  def taSymspell(spark: SparkSession, dir: String): DataFrame = {
    val words = docs(spark, dir)
      .select(
        explode(
          filter(split(regexp_replace(lower(col("text")), "[^a-z]+", " "), " "), t =>
            t =!= lit(""))).as("word"))
      .union(
        Tables
          .t(spark, dir, "part")
          .select(explode(split(col("p_name"), " ")).as("word")))
      .union(Tables.t(spark, dir, "nation").select(lower(col("n_name")).as("word")))
      .union(Tables.t(spark, dir, "customer").select(lower(col("c_mktsegment")).as("word")))
    val vocab = words
      .groupBy("word")
      .agg(count(lit(1)).as("n_occ"))
      .filter(length(col("word")) >= 3)
    val variants = vocab.select(
      col("word"),
      col("n_occ"),
      explode(
        array_union(
          array(col("word")),
          transform(sequence(lit(1), length(col("word"))), i =>
            concat(
              col("word").substr(lit(1), i - 1),
              col("word").substr(i + 1, length(col("word"))))))).as("variant"))
    variants
      .select(col("variant"), col("word").as("a"), col("n_occ").as("n_occ_a"))
      .join(
        variants.select(col("variant"), col("word").as("b"), col("n_occ").as("n_occ_b")),
        "variant")
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("n_occ_a"), col("n_occ_b"))
      .distinct()
      .filter(levenshtein(col("a"), col("b")) === 1)
      .orderBy("a", "b")
  }

  val taSymspellSql: String =
    s"""WITH words AS (
        SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
          t -> t <> '')) AS word FROM documents
        UNION ALL SELECT unnest(string_split(p_name, ' ')) FROM part
        UNION ALL SELECT lower(n_name) FROM nation
        UNION ALL SELECT lower(c_mktsegment) FROM customer),
      vocab AS (
        SELECT word, count(*) AS n_occ FROM words
        GROUP BY word HAVING length(word) >= 3),
      v AS (
        SELECT word, n_occ, unnest(list_distinct(list_append(
          list_transform(range(1, length(word) + 1),
            i -> substr(word, 1, i - 1) || substr(word, i + 1, length(word))),
          word))) AS variant
        FROM vocab)
      SELECT DISTINCT x.word AS a, y.word AS b,
        x.n_occ AS n_occ_a, y.n_occ AS n_occ_b
      FROM v x JOIN v y ON x.variant = y.variant AND x.word < y.word
      WHERE levenshtein(x.word, y.word) = 1
      ORDER BY a, b"""

  // ---- character-distribution entropy -------------------------------------

  /** Per-document Shannon entropy of the character distribution — the
    * compression-ratio proxy web-curation pipelines use to flag
    * gibberish (entropy near the alphabet maximum) and degenerate
    * repetition (entropy near zero). One explode + two aggregations, all
    * map-side-combinable; the corpus text never shuffles (only (doc_id,
    * char) count rows do). H = ln(n) - (Σ c·ln c)/n over per-char counts
    * c; the fold is char-ordered and entropy is a DOUBLE payload ranked
    * only by doc_id, so the transcendental ln stays inside the gate's
    * 12-significant-digit float tolerance (the gr_adamic lesson: never
    * RANK on a transcendental). Empty docs are kept with entropy 0.
    */
  def taEntropy(spark: SparkSession, dir: String): DataFrame = {
    val counts = docs(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .filter(length(col("ch")) > 0)
      .groupBy("doc_id", "ch")
      .agg(count(lit(1)).as("c"))
    val per = counts
      .groupBy("doc_id")
      .agg(
        sum("c").as("n"),
        count(lit(1)).as("n_distinct"),
        aggregate(
          transform(
            array_sort(collect_list(struct(col("ch"), col("c")))),
            s => s.getField("c").cast("double") * log(s.getField("c").cast("double"))),
          lit(0.0),
          (a, x) => a + x).as("clnc"))
    docs(spark, dir)
      .select("doc_id")
      .join(per, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n"), lit(0L)).as("n_ch"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        when(col("n").isNull, lit(0.0))
          .otherwise(log(col("n").cast("double")) - col("clnc") / col("n"))
          .as("entropy"))
      .orderBy("doc_id")
  }

  val taEntropySql: String =
    """WITH ch AS (
        SELECT doc_id, c FROM (
          SELECT doc_id, ch, count(*) AS c
          FROM (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents)
          WHERE length(ch) > 0 GROUP BY doc_id, ch)),
      per AS (SELECT doc_id, sum(c)::BIGINT AS n, count(*)::BIGINT AS n_distinct,
          sum(c::DOUBLE * ln(c::DOUBLE)) AS clnc
        FROM ch GROUP BY doc_id)
      SELECT d.doc_id, coalesce(p.n, 0) AS n_ch, coalesce(p.n_distinct, 0) AS n_distinct,
        CASE WHEN p.n IS NULL THEN 0.0 ELSE ln(p.n::DOUBLE) - p.clnc / p.n END AS entropy
      FROM documents d LEFT JOIN per p USING (doc_id) ORDER BY d.doc_id"""

  // ---- vocabulary coverage curve ------------------------------------------

  /** Top-k vocabulary coverage: each token with its corpus occurrence
    * count, global frequency rank, inclusive cumulative occurrences, and
    * cumulative corpus share in parts-per-million — the curve that sizes
    * a tokenizer vocab ("how many types cover 99% of tokens?"). The
    * cumulative sum uses [[graft.operators.GlobalRank.withRunningSum]],
    * the two-pass distributed prefix sum (one (count,sum) pair per
    * partition reaches the driver) — never a partitionless window, which
    * would funnel the vocab through one task. Share is integer-exact:
    * `(cum_occ * 1e6) div total` (caller note: the scaled numerator
    * needs `cum_occ < ~9e12`; corpora past that should pre-divide the
    * total instead — same discipline, coarser quantum).
    */
  def taCoverage(spark: SparkSession, dir: String): DataFrame = {
    // Tracked, not unpersisted at plan time (see taVocab's note).
    val vocab = graft.Caches.track(
      docs(spark, dir)
        .select(explode(toks).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("n_occ"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val total = vocab.agg(sum("n_occ")).collect()(0).getLong(0)
    graft.operators.GlobalRank
      .withRunningSum(vocab, Seq(col("n_occ").desc, col("token")), "n_occ", "rank", "cum_occ")
      .withColumn("cum_ppm", expr(s"(cum_occ * 1000000) div $total"))
      .orderBy("rank")
  }

  val taCoverageSql: String =
    s"""WITH v AS (SELECT token, count(*)::BIGINT AS n_occ
        FROM (SELECT unnest($sqlToks) AS token FROM documents) GROUP BY token),
      t AS (SELECT sum(n_occ)::BIGINT AS total FROM v),
      r AS (SELECT token, n_occ,
          row_number() OVER (ORDER BY n_occ DESC, token) AS rank,
          (sum(n_occ) OVER (ORDER BY n_occ DESC, token ROWS UNBOUNDED PRECEDING))::BIGINT AS cum_occ
        FROM v)
      SELECT token, n_occ, rank, cum_occ,
        ((cum_occ * 1000000) // t.total)::BIGINT AS cum_ppm
      FROM r, t ORDER BY rank"""

  // ---- linear quality-classifier inference --------------------------------

  /** Weight vector of the quality model (trained offline; literals here).
    * Score space is integer-scaled: type-token ratio and stopword rate
    * enter as exact parts-per-million, so the dot product is a BIGINT and
    * the decision threshold is hash-exact on both engines — a float
    * sigmoid would put the boundary one transcendental ulp away from
    * flipping (the gr_adamic lesson). Sigmoid is monotone, so
    * thresholding the logit IS thresholding the probability.
    */
  private val ClsTtrW = 2L
  private val ClsStopW = -5L
  private val ClsLenW = 3000L
  private val ClsThreshold = 780000L

  /** Fasttext-style quality-classifier INFERENCE at corpus scale: per-doc
    * feature extraction (token count, type-token ratio, stopword rate —
    * all exact integers) and a broadcast-free linear scoring pass,
    * emitting the scaled logit and keep/drop decision. Map-only and
    * codegen'd end to end: the shape under every learned quality filter
    * (DCLM, FineWeb-Edu) once the model is distilled to a feature dot
    * product.
    */
  def taClassifier(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_unique"),
        size(filter(toks, t => t === "a" || t === "the")).cast("long").as("n_stop"))
      .withColumn("ttr_ppm", expr("CASE WHEN n_tokens = 0 THEN 0 ELSE (n_unique * 1000000) div n_tokens END"))
      .withColumn("stop_ppm", expr("CASE WHEN n_tokens = 0 THEN 0 ELSE (n_stop * 1000000) div n_tokens END"))
      .withColumn(
        "score",
        expr(s"$ClsTtrW * ttr_ppm + $ClsStopW * stop_ppm + $ClsLenW * n_tokens"))
      .withColumn("keep", col("score") >= ClsThreshold)
      .orderBy("doc_id")

  val taClassifierSql: String =
    s"""WITH t AS (SELECT doc_id, $sqlToks AS tk FROM documents),
      f AS (SELECT doc_id, len(tk)::BIGINT AS n_tokens,
          len(list_distinct(tk))::BIGINT AS n_unique,
          len(list_filter(tk, x -> x IN ('a', 'the')))::BIGINT AS n_stop
        FROM t),
      p AS (SELECT doc_id, n_tokens, n_unique, n_stop,
          (CASE WHEN n_tokens = 0 THEN 0 ELSE (n_unique * 1000000) // n_tokens END)::BIGINT AS ttr_ppm,
          (CASE WHEN n_tokens = 0 THEN 0 ELSE (n_stop * 1000000) // n_tokens END)::BIGINT AS stop_ppm
        FROM f)
      SELECT doc_id, n_tokens, n_unique, n_stop, ttr_ppm, stop_ppm,
        ($ClsTtrW * ttr_ppm + $ClsStopW * stop_ppm + $ClsLenW * n_tokens)::BIGINT AS score,
        ($ClsTtrW * ttr_ppm + $ClsStopW * stop_ppm + $ClsLenW * n_tokens) >= $ClsThreshold AS keep
      FROM p ORDER BY doc_id"""

  // ---- hashed-feature classifier inference (the hashing trick) ------------

  private[graft] val HashClfBuckets = 1024L

  /** Bigram array over a `tk` token-array column (SQL text form), as
    * `zip_with` over the two shifted slices. NOT the index form
    * (`transform(sequence(1, n-1), i -> element_at(tk, i) ...)`): after
    * Catalyst collapses projections, `tk` is substituted by its defining
    * expression EVERYWHERE — and a reference INSIDE a lambda body then
    * re-evaluates the whole tokenizer PER ELEMENT (measured: 3.6 s to
    * merely count 266k bigrams at sf0.1 — ~13 µs/token of repeated
    * regex splitting). zip_with's array arguments evaluate once per ROW;
    * only the cheap concat runs per element. Empty/1-token docs slice to
    * empty arrays — no ANSI indexing hazard.
    */
  private[graft] val hashClfBigramsSql: String =
    "zip_with(slice(tk, 1, greatest(size(tk) - 1, 0)), " +
      "slice(tk, 2, greatest(size(tk) - 1, 0)), (a, b) -> concat(a, ' ', b))"

  /** JOIN-FREE per-row classifier score over a `bgs` bigram-array column:
    * the weight is DERIVED from the bucket inline
    * (`bucket * HashClfWeightMul % 2001 - 1000` — the same
    * [[HashClfWeightMul]] formula [[taHashclf]]'s broadcast table uses),
    * so scoring folds entirely inside one scalar expression — zero
    * joins, zero aggregation state. This is the form a STATELESS
    * STREAMING filter needs: every micro-batch row scores independently,
    * nothing accumulates, and the same literal expression is the batch
    * oracle. Built on the NATIVE [[Hashing.md5Long60]]
    * expression (digest bytes straight to long — the composable
    * `conv(substring(md5(...)))` text form allocates hex strings per
    * call) with the ONE-multiply bucket weight: HOF lambdas run
    * interpreted, so per-bigram cost is the whole game — one md5 + one
    * multiply per feature.
    */
  private[graft] def hashClfScoreCol(bgs: Column): Column = {
    import graft.functions.Hashing.md5Long60
    aggregate(
      bgs,
      lit(0L),
      (acc, bg) => {
        val bucket = md5Long60(concat(lit("clfb|"), bg)) % HashClfBuckets
        acc + (bucket * HashClfWeightMul % 2001L - 1000L)
      })
  }

  /** Per-bucket model weight: a Knuth multiplicative hash of the bucket
    * id into [-1000, 1000] — deterministic, exact BIGINT on both engines,
    * and ONE integer multiply instead of a second md5 (the md5-derived
    * weight made the streaming inline fold 2× slower for zero modeling
    * content — the weights are placeholder literals either way; a trained
    * model would load real values into the same shape).
    */
  private[graft] val HashClfWeightMul = 2654435761L

  /** Fasttext-style HASHED-feature classifier inference — the other half
    * of the learned-quality-filter pattern next to [[taClassifier]]'s
    * closed-form features: per-doc bigram features land in
    * [[HashClfBuckets]] buckets via the hashing trick (no vocabulary —
    * the standard way a million-ngram model fits a broadcast), and the
    * score is a sum of looked-up bucket weights. The weight table is
    * model-sized (buckets, not corpus) and BROADCAST, so inference over a
    * 100 TB corpus is one map-side explode + one broadcast equi-join +
    * one per-doc aggregate — no corpus-sized shuffle except the final
    * per-doc groupBy, which partial-aggregates map-side first. Score
    * space is exact BIGINT so the keep threshold is hash-stable
    * cross-engine.
    */
  def taHashclf(spark: SparkSession, dir: String): DataFrame = {
    val weights = spark
      .range(HashClfBuckets)
      .select(
        col("id").as("bucket"),
        (col("id") * HashClfWeightMul % 2001L - 1000L).as("w"))
    val feats = docs(spark, dir)
      .select(col("doc_id"), toks.as("tk"))
      .select(
        col("doc_id"),
        explode(expr(hashClfBigramsSql)).as("bg"))
      .select(
        col("doc_id"),
        (graft.functions.Hashing.md5Long60(concat(lit("clfb|"), col("bg"))) % HashClfBuckets)
          .as("bucket"))
    feats
      .join(broadcast(weights), Seq("bucket"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feat"), sum(col("w")).as("score"))
      .withColumn("keep", col("score") > 0L)
      .orderBy("doc_id")
  }

  val taHashclfSql: String = {
    val bHash = graft.functions.Hashing.sqlMd5Long60Duck("'clfb|' || bg")
    s"""WITH wt AS (SELECT b AS bucket, (b * $HashClfWeightMul) % 2001 - 1000 AS w
          FROM range(0, $HashClfBuckets) t(b)),
      tk AS (SELECT doc_id, $sqlToks AS tk FROM documents),
      bg AS (SELECT doc_id,
          unnest(list_transform(range(1, greatest(len(tk), 1)),
            i -> tk[i] || ' ' || tk[i + 1])) AS bg
        FROM tk),
      f AS (SELECT doc_id, ($bHash) % $HashClfBuckets AS bucket FROM bg)
      SELECT f.doc_id, count(*)::BIGINT AS n_feat, sum(wt.w)::BIGINT AS score,
        sum(wt.w) > 0 AS keep
      FROM f JOIN wt ON wt.bucket = f.bucket
      GROUP BY f.doc_id ORDER BY f.doc_id"""
  }

  // ---- bigram language-model predictability -------------------------------

  private val LmScale = 1000000L

  /** Corpus-trained bigram predictability per document: train bigram and
    * prefix counts over ALL documents' adjacent token pairs, then score
    * each document by the average conditional probability of its bigrams,
    * `P(t2|t1) = c(t1,t2)/c(t1·)` — the "how much does this doc look like
    * the corpus's own n-gram statistics" quality signal (the count-based
    * precursor of a KenLM filter; [[taLmscore]] is its unigram
    * cross-entropy sibling). Each probability is the exact fixed-point
    * `floor(1e6·c2/c1)`, summed as BIGINT — no transcendental, no float
    * summation order, so the gate compares hashes, not tolerances.
    *
    * Scale shape: bigrams are built per row with array HOFs (narrow),
    * counted by ONE hash aggregate on the (t1,t2) key, and scored by a
    * join back on the same key — corpus-sized but slim shuffles; the
    * prefix-count frame joins on t1. Nothing is broadcast (vocab² is
    * corpus-scale); nothing driver-side.
    */
  def taBigramlm(spark: SparkSession, dir: String): DataFrame = {
    val bgList = when(size(toks) < 2, array().cast("array<struct<t1:string,t2:string>>"))
      .otherwise(
        transform(
          sequence(lit(0), size(toks) - lit(2)),
          i => struct(
            element_at(toks, i + lit(1)).as("t1"),
            element_at(toks, i + lit(2)).as("t2"))))
    val bg = graft.Caches.track(
      docs(spark, dir)
        .select(col("doc_id"), explode(bgList).as("b"))
        .select(col("doc_id"), col("b.t1").as("t1"), col("b.t2").as("t2"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val c2 = bg.groupBy("t1", "t2").agg(count(lit(1)).as("c2"))
    val c1 = bg.groupBy("t1").agg(count(lit(1)).as("c1"))
    val scored = bg
      .join(c2, Seq("t1", "t2"))
      .join(c1, Seq("t1"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(expr(s"(c2 * $LmScale) div c1")).as("pred_sum"))
      .withColumn(
        "pred_avg",
        col("pred_sum").cast("double") / col("n_bigrams").cast("double"))
    docs(spark, dir)
      .select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_bigrams", "pred_sum"))
      .orderBy("doc_id")
  }

  val taBigramlmSql: String =
    s"""WITH tk AS (SELECT doc_id, $sqlToks AS tk FROM documents),
      bg AS (SELECT doc_id, unnest(list_transform(range(1, len(tk)),
            i -> struct_pack(t1 := tk[i], t2 := tk[i + 1]))) AS b
        FROM tk WHERE len(tk) >= 2),
      pairs AS (SELECT doc_id, b.t1 AS t1, b.t2 AS t2 FROM bg),
      c2 AS (SELECT t1, t2, count(*)::BIGINT AS c2 FROM pairs GROUP BY t1, t2),
      c1 AS (SELECT t1, count(*)::BIGINT AS c1 FROM pairs GROUP BY t1),
      sc AS (SELECT doc_id, count(*)::BIGINT AS n_bigrams,
          sum((c2.c2 * $LmScale) // c1.c1)::BIGINT AS pred_sum
        FROM pairs JOIN c2 USING (t1, t2) JOIN c1 USING (t1)
        GROUP BY doc_id)
      SELECT d.doc_id, coalesce(sc.n_bigrams, 0)::BIGINT AS n_bigrams,
        coalesce(sc.pred_sum, 0)::BIGINT AS pred_sum,
        CASE WHEN sc.n_bigrams IS NULL THEN NULL
             ELSE sc.pred_sum::DOUBLE / sc.n_bigrams::DOUBLE END AS pred_avg
      FROM documents d LEFT JOIN sc USING (doc_id) ORDER BY d.doc_id"""

  // ---- readability scoring ------------------------------------------------

  /** Flesch reading-ease per document from three exact integer counts —
    * words (whitespace tokens), sentences (runs of `.!?`, min 1), and a
    * syllable proxy (vowel-group runs per lowercased word, min 1 per
    * word) — the classic readability gate a corpus-quality pass runs
    * next to [[taQuality]]. Map-only, single scan, no shuffle before the
    * presentation sort. Hash-exact: the score is three correctly-rounded
    * IEEE ops over exact-integer ratios in a fixed association order, so
    * both engines produce the same bits; empty documents emit NULL
    * rather than a cross-engine-loose 0/0.
    */
  def taReadability(spark: SparkSession, dir: String): DataFrame = {
    val tk = toks
    val nWords = size(tk).cast("long")
    val nSents =
      greatest(lit(1), size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0)))).cast("long")
    val nSyll = aggregate(
      transform(
        tk,
        w => greatest(lit(1), size(regexp_extract_all(lower(w), lit("[aeiouy]+"), lit(0))))),
      lit(0L),
      (acc, x) => acc + x.cast("long"))
    docs(spark, dir)
      .select(
        col("doc_id"),
        nWords.as("n_words"),
        nSents.as("n_sents"),
        nSyll.as("n_syll"))
      .withColumn(
        "fk_score",
        when(col("n_words") === 0, lit(null).cast("double"))
          .otherwise(
            lit(206.835)
              - lit(1.015) * (col("n_words").cast("double") / col("n_sents").cast("double"))
              - lit(84.6) * (col("n_syll").cast("double") / col("n_words").cast("double"))))
      .orderBy("doc_id")
  }

  val taReadabilitySql: String =
    s"""SELECT doc_id, n_words, n_sents, n_syll,
      CASE WHEN n_words = 0 THEN NULL
           ELSE 206.835 - 1.015 * (n_words::DOUBLE / n_sents::DOUBLE)
                - 84.6 * (n_syll::DOUBLE / n_words::DOUBLE) END AS fk_score
      FROM (SELECT doc_id,
          len($sqlToks)::BIGINT AS n_words,
          greatest(1, len(regexp_extract_all(text, '[.!?]+')))::BIGINT AS n_sents,
          list_reduce(list_prepend(0::BIGINT,
            list_transform($sqlToks,
              w -> greatest(1, len(regexp_extract_all(lower(w), '[aeiouy]+')))::BIGINT)),
            (a, b) -> a + b) AS n_syll
        FROM documents)
      ORDER BY doc_id"""

  // ---- quality-score calibration audit ------------------------------------

  private val CalLongChars = 150L

  /** Reliability-diagram audit of the shared quality score
    * ([[qualityCol]]): score deciles vs an independent length label
    * (n_chars ≥ [[CalLongChars]]) — the check a pipeline runs before
    * trusting a filter threshold ("is the score monotone against an
    * outcome it never saw?"). Determinism: the score is bit-identical on
    * both engines (mirrored expression), the decile is `floor(q*10)`
    * clamped to [0,9] of that identical double, and the per-bin mean
    * score is carried as an exact fixed-point BIGINT sum of
    * `floor(q*1e6)` — no float accumulation anywhere; long_rate is one
    * IEEE division of two BIGINTs. Map-side binning + one 10-row
    * aggregate: nothing here grows with corpus size except the scan.
    */
  def taCalibration(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(
        least(greatest(floor(qualityCol * 10).cast("long"), lit(0L)), lit(9L)).as("bin"),
        floor(qualityCol * 1000000).cast("long").as("q_ppm"),
        (length(col("text")) >= CalLongChars).cast("long").as("is_long"))
      .groupBy("bin")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("q_ppm")).as("sum_q_ppm"),
        sum(col("is_long")).as("n_long"))
      .withColumn("long_rate", col("n_long").cast("double") / col("n_docs").cast("double"))
      .orderBy("bin")

  val taCalibrationSql: String =
    s"""SELECT bin, count(*)::BIGINT AS n_docs, sum(q_ppm)::BIGINT AS sum_q_ppm,
        sum(is_long)::BIGINT AS n_long,
        (sum(is_long)::BIGINT)::DOUBLE / (count(*)::BIGINT)::DOUBLE AS long_rate
      FROM (SELECT least(greatest(floor(($qualitySqlExpr) * 10)::BIGINT, 0), 9) AS bin,
          floor(($qualitySqlExpr) * 1000000)::BIGINT AS q_ppm,
          (length(text) >= $CalLongChars)::BIGINT AS is_long
        FROM documents)
      GROUP BY bin ORDER BY bin"""

  // ---- χ² term–source association -----------------------------------------

  private val ChisqMinDf = 5
  private val ChisqTopK = 10

  /** χ²-style term–source association (the classic feature-selection /
    * domain-signature table a mixture-weighting pipeline builds): for
    * each (source, word) the 2×2 document-frequency contingency
    * `a` (in-source docs with the word), `b` (in-source without),
    * `c` (out-of-source with), `d` (out-of-source without), ranked
    * per source by the covariance numerator `a·d − b·c`.
    *
    * Cross-engine discipline: the RANK and every FILTER are pure BIGINT
    * (support `a ≥ ChisqMinDf`, non-degenerate margins, `a·d − b·c`
    * with ties to word asc — synthetic corpora tie constantly on the
    * χ² VALUE, so ranking on the float would be a boundary flake); the
    * χ² statistic itself is a per-row double PAYLOAD computed with one
    * fixed association `(N·cov·cov) / (((a+b)(c+d))·((a+c)(b+d)))` —
    * products and one division are IEEE-exact in both engines, nothing
    * transcendental, no float ever sums across rows.
    *
    * Scale: per-doc dedup is `array_distinct` BEFORE the explode (map
    * side — no corpus-wide distinct shuffle); `a` and `df_w` are
    * map-side-combinable counts keyed by word, joined word-to-word
    * (co-partitioned); the source margin is a broadcast; the top-k
    * window runs on the support-pruned association frame, and its
    * partition count equals the source cardinality — for a
    * million-domain crawl swap in the bounded TopKByScore aggregation.
    */
  def taChisq(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val dw = d.select(col("doc_id"), col("source"), explode(array_distinct(toks)).as("word"))
    val ns = d.groupBy("source").agg(count(lit(1)).as("n_s"))
    val nTotal = d.count()
    val aTbl = dw
      .groupBy("source", "word")
      .agg(count(lit(1)).as("a"))
      .filter(col("a") >= ChisqMinDf)
    val dfw = dw.groupBy("word").agg(count(lit(1)).as("df_w"))
    val cell = aTbl
      .join(broadcast(ns), Seq("source"))
      .join(dfw, Seq("word"))
      .filter(col("df_w") < nTotal && col("n_s") < nTotal)
      .select(
        col("source"),
        col("word"),
        col("a"),
        (col("n_s") - col("a")).as("b"),
        (col("df_w") - col("a")).as("c"),
        (lit(nTotal) - col("n_s") - col("df_w") + col("a")).as("d"))
      .withColumn("covnum", col("a") * col("d") - col("b") * col("c"))
    cell
      .withColumn(
        "rk",
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("source")
            .orderBy(col("covnum").desc, col("word"))))
      .filter(col("rk") <= ChisqTopK)
      .withColumn(
        "chi2",
        (lit(nTotal).cast("double") * col("covnum").cast("double") * col("covnum")
          .cast("double")) /
          (((col("a") + col("b")) * (col("c") + col("d"))).cast("double") *
            ((col("a") + col("c")) * (col("b") + col("d"))).cast("double")))
      .select(
        col("source"),
        col("word"),
        col("a"),
        col("b"),
        col("c"),
        col("d"),
        col("covnum"),
        col("rk").cast("long").as("rk"),
        col("chi2"))
      .orderBy("source", "rk")
  }

  val taChisqSql: String =
    s"""WITH dw AS (
        SELECT doc_id, source, unnest(list_distinct($sqlToks)) AS word FROM documents),
      ns AS (SELECT source, count(*)::BIGINT AS n_s FROM documents GROUP BY 1),
      nn AS (SELECT count(*)::BIGINT AS n FROM documents),
      dfw AS (SELECT word, count(*)::BIGINT AS df_w FROM dw GROUP BY 1),
      cell AS (
        SELECT t.source, t.word, t.a, ns.n_s - t.a AS b, dfw.df_w - t.a AS c,
          nn.n - ns.n_s - dfw.df_w + t.a AS d, nn.n AS n
        FROM (SELECT source, word, count(*)::BIGINT AS a FROM dw GROUP BY 1, 2) t
        JOIN ns USING (source) JOIN dfw USING (word), nn
        WHERE t.a >= $ChisqMinDf AND dfw.df_w < nn.n AND ns.n_s < nn.n),
      ranked AS (
        SELECT source, word, a, b, c, d, a * d - b * c AS covnum, n,
          row_number() OVER (PARTITION BY source ORDER BY a * d - b * c DESC, word) AS rk
        FROM cell)
      SELECT source, word, a, b, c, d, covnum, rk::BIGINT AS rk,
        (n::DOUBLE * covnum::DOUBLE * covnum::DOUBLE) /
          (((a + b) * (c + d))::DOUBLE * ((a + c) * (b + d))::DOUBLE) AS chi2
      FROM ranked WHERE rk <= $ChisqTopK
      ORDER BY source, rk"""

  // ---- sparse inverted-index retrieval ------------------------------------

  private val SparseDfCapDen = 10
  private val SparseTopK = 5
  private val SparsePostCap = 256

  /** Sparse lexical retrieval over an inverted bigram index — the
    * BM25-family serving tier next to the dense `ann_*` stack: each doc's
    * bigram term-frequency vector, posting lists PURGED of terms hitting
    * more than 1/[[SparseDfCapDen]] of the corpus (the df-cap that keeps
    * hub terms from quadratic postings — scale-FREE, so the gate can
    * never go vacuous as N grows), candidate pairs from the posting-list
    * equi-join, scored by the exact integer term-frequency dot product,
    * reduced to top-[[SparseTopK]] per query doc.
    *
    * Everything that ranks or filters is BIGINT (dot, n_shared, df cap);
    * ties break to the lower neighbor id. Scale: tf/df are map-side-
    * combinable; the pair join is posting-bounded (Σ df² over SURVIVING
    * terms, the quantity the cap bounds); the top-k runs through the
    * bounded [[graft.operators.TopKByScore]] aggregate (dot ≤ 2⁵³ holds
    * by corpus arithmetic: tf products of 16-bit-scale counts), so
    * map-side partials ship k rows per query, never the scored set.
    */
  def taSparsedot(spark: SparkSession, dir: String): DataFrame = {
    val tk = toks
    val bigrams = when(size(tk) < 2, array().cast("array<string>"))
      .otherwise(
        zip_with(
          slice(tk, lit(1), size(tk) - 1),
          slice(tk, lit(2), size(tk) - 1),
          (a, b) => concat(a, lit(" "), b)))
    // Widened (r15): the bigram explode otherwise runs in the single-split
    // scan's one task (measured ~0.95 s serial).
    val tf = graft.Caches.track(
      graft.operators.Lineage
        .widen(docs(spark, dir))
        .select(col("doc_id"), explode(bigrams).as("tok"))
        .groupBy("doc_id", "tok")
        .agg(count(lit(1)).as("tf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val nDocs = tf.select("doc_id").distinct().count()
    // Two-stage posting bound: the scale-FREE df cap (df ≤ N/10) purges
    // hub terms, then each surviving posting list is TRUNCATED to its
    // [[SparsePostCap]] highest-tf entries (ties to the lower doc id) —
    // the impact-ordered index truncation production sparse retrieval
    // runs (WAND-family): with only the fractional cap, per-term
    // postings grow with N and the pair join goes Σdf² — measured 7.6×
    // time for 3× data on the duplicated sf0.3 corpus; the cap makes
    // candidate work ≤ PostCap·|postings|, linear in the corpus, at a
    // recall trade the cap constant controls.
    // The truncation window runs over the HOT terms only (df > cap —
    // the terms it can change); cold postings pass through untouched, so
    // the common case pays no per-term sort (measured: the full-frame
    // window cost ~5 s at sf0.1 where truncation bites almost nothing).
    val kept0 = graft.Caches.track(
      tf.join(
          tf.groupBy("tok").agg(count(lit(1)).as("df"))
            .filter(col("df") * SparseDfCapDen <= nDocs),
          Seq("tok"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val hot = kept0
      .filter(col("df") > SparsePostCap)
      .withColumn(
        "imp_rn",
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("tok")
            .orderBy(col("tf").desc, col("doc_id"))))
      .filter(col("imp_rn") <= SparsePostCap)
      .drop("imp_rn")
    // kept itself persists too: BOTH sides of the pair self-join read it,
    // and without this the hot-term truncation window runs twice (r14
    // follow-up review).
    val kept = graft.Caches.track(
      kept0.filter(col("df") <= SparsePostCap).union(hot).drop("df")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // Persisted: the top-k aggregate AND the n_shared re-attach both read
    // it — without the persist the posting-list pair join runs twice.
    // The dot product and n_shared are SYMMETRIC in (src, dst), so the
    // pair join keeps only src < dst — half the rows through the partial
    // aggregate and half the (src, dst) keys through the exchange — and
    // the full ordered-pair frame is the persisted half plus its mirror
    // (a projection of the cache, never a second join). Bit-identical to
    // the src ≠ dst join it replaces.
    val halfPairs = graft.Caches.track(
      kept
        .select(col("tok"), col("doc_id").as("src"), col("tf").as("tf_a"))
        .join(kept.select(col("tok"), col("doc_id").as("dst"), col("tf").as("tf_b")), Seq("tok"))
        .filter(col("src") < col("dst"))
        .groupBy("src", "dst")
        .agg(sum(col("tf_a") * col("tf_b")).as("dot"), count(lit(1)).as("n_shared"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // Mirror by union folded back to the parent's width (a union
    // concatenates children's partitions — 2× the task starts otherwise);
    // an explode-of-two-structs mirror was tried and allocates per-row
    // garbage that tripled the top-k stage's GC (3.2 s → 26 s).
    val scoredPairs = halfPairs
      .union(halfPairs.select(
        col("dst").as("src"), col("src").as("dst"), col("dot"), col("n_shared")))
      .coalesce(math.max(1, halfPairs.rdd.getNumPartitions))
    val topk = (s: Column, i: Column) =>
      graft.operators.TopKByScore.applied(SparseTopK, s, i)
    // Persisted: consumed by the gate count AND the re-attach join.
    val ranked = graft.Caches.track(
      scoredPairs
        .groupBy("src")
        .agg(topk(col("dot").cast("double"), col("dst")).as("top"))
        .select(
          col("src"),
          posexplode(zip_with(col("top.scores"), col("top.ids"), (s, i) =>
            struct(s.as("dot"), i.as("dst")))))
        .select(
          col("src"),
          col("col.dst").as("dst"),
          (col("pos") + 1).cast("long").as("rk"),
          col("col.dot").cast("long").as("dot"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // n_shared re-attach: the ranked side is k-bounded (queries × TopK
    // rows) while scoredPairs is the full candidate-pair frame — left to
    // the planner this joined as a sort-merge that re-exchanged AND
    // sorted every scored pair (measured: 151 MB exchange + 73 s of sort
    // CPU, half the query). Count-gate a broadcast of the slim ranked
    // side (the BoilerplateBroadcastThreshold dispatch discipline:
    // measure, then pick the physical strategy — at a corpus where
    // queries × k outgrows the gate, the shuffle join returns), so the
    // pair frame streams from its cache unshuffled.
    val gated =
      if (ranked.count() <= SparseRankedBroadcastMax) broadcast(ranked) else ranked
    // Probe the HALF frame on the canonical (lo, hi) key — n_shared is
    // symmetric, so this streams 10M cached rows once instead of the 20M
    // mirror a (src, dst) probe would.
    gated
      .withColumn("lo", least(col("src"), col("dst")))
      .withColumn("hi", greatest(col("src"), col("dst")))
      .join(
        halfPairs.select(col("src").as("lo"), col("dst").as("hi"), col("n_shared")),
        Seq("lo", "hi"))
      .select(col("src"), col("dst"), col("rk"), col("dot"), col("n_shared"))
      .orderBy("src", "rk")
  }

  /** Row-count cutoff for broadcasting the ranked top-k frame into the
    * n_shared re-attach: ≤ ~1 M slim rows is a safe hashed-relation bite
    * (the [[graft.operators.Dedup.BoilerplateBroadcastThreshold]]
    * pattern); the frame is queries × [[SparseTopK]], data-dependent, so
    * the dispatch is counted, never assumed.
    */
  private val SparseRankedBroadcastMax = 1L << 20

  val taSparsedotSql: String = {
    val bg = s"list_transform(range(1, greatest(len($sqlToks), 1)), i -> $sqlToks[i] || ' ' || $sqlToks[i+1])"
    s"""WITH tf AS MATERIALIZED (SELECT doc_id, tok, count(*)::BIGINT AS tf
        FROM (SELECT doc_id, unnest($bg) AS tok FROM documents) GROUP BY 1, 2),
      nn AS (SELECT count(DISTINCT doc_id)::BIGINT AS n FROM tf),
      df AS (SELECT tok, count(*)::BIGINT AS df FROM tf GROUP BY 1),
      p0 AS (SELECT tf.doc_id, tf.tok, tf.tf,
          row_number() OVER (PARTITION BY tf.tok ORDER BY tf.tf DESC, tf.doc_id) AS imp_rn
        FROM tf JOIN df USING (tok), nn WHERE df.df * $SparseDfCapDen <= nn.n),
      p AS MATERIALIZED (SELECT doc_id, tok, tf FROM p0 WHERE imp_rn <= $SparsePostCap),
      pr AS MATERIALIZED (SELECT a.doc_id AS src, b.doc_id AS dst,
          sum(a.tf * b.tf)::BIGINT AS dot, count(*)::BIGINT AS n_shared
        FROM p a JOIN p b ON a.tok = b.tok AND a.doc_id <> b.doc_id GROUP BY 1, 2),
      r AS (SELECT *, row_number() OVER (PARTITION BY src ORDER BY dot DESC, dst) AS rk
        FROM pr)
      SELECT src, dst, rk::BIGINT AS rk, dot, n_shared FROM r WHERE rk <= $SparseTopK
      ORDER BY src, rk"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ta_chisq" -> taChisq _,
    "ta_sparsedot" -> taSparsedot _,
    "ta_calibration" -> taCalibration _,
    "ta_coverage" -> taCoverage _,
    "ta_classifier" -> taClassifier _,
    "ta_hashclf" -> taHashclf _,
    "ta_entropy" -> taEntropy _,
    "ta_pairlift" -> taPairlift _,
    "ta_keyphrase" -> taKeyphrase _,
    "ta_textrank" -> taTextrank _,
    "ta_symspell" -> taSymspell _,
    "ta_bm25" -> taBm25 _,
    "ta_chunk" -> taChunk _,
    "ta_lmscore" -> taLmscore _,
    "ta_scrub" -> taScrub _,
    "ta_repetition" -> taRepetition _,
    "ta_heavyhitters" -> taHeavyHitters _,
    "ta_tfidf" -> taTfidf _,
    "ta_vocab" -> taVocab _,
    "ta_zipf" -> taZipf _,
    "ta_rolling" -> taRolling _,
    "ta_stats" -> taStats _,
    "ta_quality" -> taQuality _,
    "ta_langid" -> taLangid _,
    "ta_confusion" -> taConfusion _,
    "ta_fingerprint" -> taFingerprint _,
    "ta_winnow" -> taWinnow _,
    "ta_bpe" -> taBpe _,
    "ta_bpetrain" -> taBpetrain _,
    "ta_bpeapply" -> taBpeapply _,
    "ta_readability" -> taReadability _,
    "ta_bigramlm" -> taBigramlm _)

  val oracles: Map[String, String] = Map(
    "ta_chisq" -> taChisqSql,
    "ta_sparsedot" -> taSparsedotSql,
    "ta_calibration" -> taCalibrationSql,
    "ta_coverage" -> taCoverageSql,
    "ta_classifier" -> taClassifierSql,
    "ta_hashclf" -> taHashclfSql,
    "ta_entropy" -> taEntropySql,
    "ta_pairlift" -> taPairliftSql,
    "ta_keyphrase" -> taKeyphraseSql,
    "ta_textrank" -> taTextrankSql,
    "ta_symspell" -> taSymspellSql,
    "ta_bm25" -> taBm25Sql,
    "ta_chunk" -> taChunkSql,
    "ta_lmscore" -> taLmscoreSql,
    "ta_scrub" -> taScrubSql,
    "ta_repetition" -> taRepetitionSql,
    "ta_heavyhitters" -> taHeavyHittersSql,
    "ta_tfidf" -> taTfidfSql,
    "ta_vocab" -> taVocabSql,
    "ta_zipf" -> taZipfSql,
    "ta_rolling" -> taRollingSql,
    "ta_stats" -> taStatsSql,
    "ta_quality" -> taQualitySql,
    "ta_langid" -> taLangidSql,
    "ta_confusion" -> taConfusionSql,
    "ta_fingerprint" -> taFingerprintSql,
    "ta_winnow" -> taWinnowSql,
    "ta_bpe" -> taBpeSql,
    "ta_bpetrain" -> taBpetrainSql,
    "ta_bpeapply" -> taBpeapplySql,
    "ta_readability" -> taReadabilitySql,
    "ta_bigramlm" -> taBigramlmSql)
}
