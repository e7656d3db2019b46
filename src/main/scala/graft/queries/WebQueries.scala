package graft.queries

import graft.functions.WebText
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Web-corpus ingestion queries: the crawl-side passes (HTML boilerplate
  * stripping, URL/domain accounting, encoding-damage detection) that run
  * BEFORE the dedup/quality stages in a training-data pipeline.
  *
  * The synthetic `documents` table carries plain text, so each query first
  * PLANTS its web artifacts deterministically from `doc_id` (the same
  * device as [[TextQueries.taScrub]]) — both engines replay the identical
  * construction, so the extraction logic is what is actually verified.
  *
  * Scale: every per-document pass is a map-only codegen'd string sweep; the
  * only shuffle in the family is `ta_urls`' groupBy on the (low-cardinality)
  * domain key, which map-side combines.
  */
object WebQueries {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "documents")

  // ---- HTML boilerplate stripping ----------------------------------------

  /** Deterministic HTML wrapper: every doc gets a div/h1/p skeleton; %4
    * adds an anchor, %6 a script block, %9 a comment.
    */
  private val htmlDoc: Column = concat(
    lit("<div id=\"main\"><h1>Doc "),
    col("doc_id").cast("string"),
    lit("</h1><p>"),
    col("text"),
    lit("</p>"),
    when(
      col("doc_id") % 4 === 0,
      concat(
        lit("<a href=\"https://site"),
        (col("doc_id") % 7).cast("string"),
        lit(".example.com/d"),
        col("doc_id").cast("string"),
        lit("\">more info here</a>")))
      .otherwise(""),
    when(col("doc_id") % 6 === 0, lit("<script>var x = 1;</script>")).otherwise(""),
    when(col("doc_id") % 9 === 0, lit("<!-- tracking pixel -->")).otherwise(""),
    lit("</div>"))

  private val htmlDocSql: String =
    """'<div id="main"><h1>Doc ' || doc_id::VARCHAR || '</h1><p>' || text || '</p>'
      || CASE WHEN doc_id % 4 = 0 THEN '<a href="https://site' || (doc_id % 7)::VARCHAR || '.example.com/d' || doc_id::VARCHAR || '">more info here</a>' ELSE '' END
      || CASE WHEN doc_id % 6 = 0 THEN '<script>var x = 1;</script>' ELSE '' END
      || CASE WHEN doc_id % 9 = 0 THEN '<!-- tracking pixel -->' ELSE '' END
      || '</div>'"""

  /** HTML → visible text with the boilerplate audit columns: tag / link /
    * script counts (taken on the ORIGINAL markup, independent of the
    * stripping), anchor-text share of the visible text (link density — the
    * classic navigation-page signal), and the markup fraction of the raw
    * bytes. Map-only.
    */
  def taHtml(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), htmlDoc.as("html"))
      .select(
        col("doc_id"),
        WebText.visibleText(col("html")).as("clean_text"),
        WebText.tagCount(col("html")).as("n_tags"),
        WebText.linkCount(col("html")).as("n_links"),
        WebText.scriptCount(col("html")).as("n_scripts"),
        WebText.anchorChars(col("html")).cast("long").as("anchor_chars"),
        length(WebText.visibleText(col("html"))).cast("long").as("visible_chars"),
        (WebText.anchorChars(col("html")).cast("double") /
          length(WebText.visibleText(col("html"))).cast("double")).as("link_frac"),
        ((length(col("html")) - length(WebText.visibleText(col("html")))).cast("double") /
          length(col("html")).cast("double")).as("markup_frac"))
      .orderBy("doc_id")

  val taHtmlSql: String = {
    import WebText.{AnchorRe, CommentRe, ScriptRe, TagRe}
    val clean =
      raw"""trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
        '$ScriptRe', ' ', 'g'), '$CommentRe', ' ', 'g'), '$TagRe', ' ', 'g'), '\s+', ' ', 'g'))"""
    raw"""WITH h AS (SELECT doc_id, $htmlDocSql AS html FROM documents),
      c AS (SELECT doc_id, html, $clean AS clean_text FROM h)
      SELECT doc_id, clean_text,
        len(regexp_extract_all(html, '$TagRe'))::BIGINT AS n_tags,
        len(regexp_extract_all(html, '$AnchorRe'))::BIGINT AS n_links,
        len(regexp_extract_all(html, '$ScriptRe'))::BIGINT AS n_scripts,
        list_reduce(list_prepend(0, list_transform(
          regexp_extract_all(html, '$AnchorRe', 1), a -> length(a))), (x, y) -> x + y)::BIGINT AS anchor_chars,
        length(clean_text)::BIGINT AS visible_chars,
        list_reduce(list_prepend(0, list_transform(
          regexp_extract_all(html, '$AnchorRe', 1), a -> length(a))), (x, y) -> x + y)::DOUBLE
          / length(clean_text)::DOUBLE AS link_frac,
        (length(html) - length(clean_text))::DOUBLE / length(html)::DOUBLE AS markup_frac
      FROM c ORDER BY doc_id"""
  }

  // ---- URL / domain accounting -------------------------------------------

  /** Deterministic URL planting: %4 adds an https URL on one of 7 `www.`
    * site domains, %10 an http asset URL on one of 3 CDN domains (%20 gets
    * both).
    */
  private[graft] val urlText: Column = concat(
    col("text"),
    when(
      col("doc_id") % 4 === 0,
      concat(
        lit(" see https://www.site"),
        (col("doc_id") % 7).cast("string"),
        lit(".example.com/page/"),
        col("doc_id").cast("string")))
      .otherwise(""),
    when(
      col("doc_id") % 10 === 0,
      concat(lit(" fetch http://cdn"), (col("doc_id") % 3).cast("string"), lit(".example.org/asset.js")))
      .otherwise(""))

  private[graft] val urlTextSql: String =
    """text
      || CASE WHEN doc_id % 4 = 0 THEN ' see https://www.site' || (doc_id % 7)::VARCHAR || '.example.com/page/' || doc_id::VARCHAR ELSE '' END
      || CASE WHEN doc_id % 10 = 0 THEN ' fetch http://cdn' || (doc_id % 3)::VARCHAR || '.example.org/asset.js' ELSE '' END"""

  /** Outlink accounting per registrable domain: URL count, distinct
    * referencing documents, https share, first referencing doc. The
    * extraction is a map-only explode; the aggregation is one map-side-
    * combined shuffle on the domain key — the shape that holds when the
    * domain table has a hundred million rows instead of ten.
    */
  def taUrls(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), explode(regexp_extract_all(urlText, lit(WebText.UrlRe), lit(0))).as("url"))
      .select(col("doc_id"), col("url"), WebText.urlDomain(col("url")).as("domain"))
      .groupBy("domain")
      .agg(
        count(lit(1)).as("n_urls"),
        countDistinct(col("doc_id")).as("n_docs"),
        sum(when(col("url").startsWith("https://"), 1L).otherwise(0L)).as("n_https"),
        min(col("doc_id")).as("min_doc"))
      .orderBy("domain")

  val taUrlsSql: String = {
    import WebText.{HostRe, UrlRe}
    raw"""WITH t AS (SELECT doc_id, $urlTextSql AS t FROM documents),
      u AS (SELECT doc_id, unnest(regexp_extract_all(t, '$UrlRe')) AS url FROM t),
      d AS (SELECT doc_id, url,
          regexp_replace(lower(regexp_extract(url, '$HostRe', 1)), '^www\.', '') AS domain
        FROM u)
      SELECT domain, count(*) AS n_urls, count(DISTINCT doc_id) AS n_docs,
        sum(CASE WHEN starts_with(url, 'https://') THEN 1 ELSE 0 END)::BIGINT AS n_https,
        min(doc_id) AS min_doc
      FROM d GROUP BY domain ORDER BY domain"""
  }

  // ---- encoding-damage (mojibake) detection ------------------------------

  /** Deterministic damage planting: %6 appends 1–3 U+FFFD replacement
    * chars, %9 two C0 control chars, %8 a multi-byte (but single code
    * point) accented suffix — exercising the code-point length semantics
    * both engines share.
    */
  private val dmgText: Column = concat(
    col("text"),
    when(col("doc_id") % 6 === 0, expr("repeat('�', CAST(doc_id % 3 + 1 AS INT))"))
      .otherwise(""),
    when(col("doc_id") % 9 === 0, lit("")).otherwise(""),
    when(col("doc_id") % 8 === 0, lit(" café")).otherwise(""))

  private val dmgTextSql: String =
    """text
      || CASE WHEN doc_id % 6 = 0 THEN repeat(chr(65533), (doc_id % 3 + 1)::INT) ELSE '' END
      || CASE WHEN doc_id % 9 = 0 THEN chr(7) || chr(8) ELSE '' END
      || CASE WHEN doc_id % 8 = 0 THEN ' caf' || chr(233) ELSE '' END"""

  /** Encoding-damage audit: U+FFFD replacement-char count (the decoder's
    * own damage marker), stray C0 control chars, non-ASCII count and ASCII
    * fraction, and the resulting suspect flag. Map-only; the counts are
    * exact integers so the flag is bit-stable.
    */
  def taMojibake(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), dmgText.as("t"))
      .select(
        col("doc_id"),
        WebText.replacementCharCount(col("t")).as("n_replacement"),
        WebText.controlCharCount(col("t")).as("n_control"),
        WebText.nonAsciiCount(col("t")).as("n_nonascii"),
        when(length(col("t")) === 0, lit(1.0))
          .otherwise(
            (length(col("t")) - WebText.nonAsciiCount(col("t"))).cast("double") /
              length(col("t")).cast("double"))
          .as("ascii_frac"),
        (WebText.replacementCharCount(col("t")) > 0 || WebText.controlCharCount(col("t")) > 0)
          .as("suspect"))
      .orderBy("doc_id")

  val taMojibakeSql: String = {
    import WebText.{ControlRe, NonAsciiRe}
    raw"""WITH t AS (SELECT doc_id, $dmgTextSql AS t FROM documents),
      c AS (SELECT doc_id, t,
          (length(t) - length(regexp_replace(t, chr(65533), '', 'g')))::BIGINT AS n_replacement,
          len(regexp_extract_all(t, '$ControlRe'))::BIGINT AS n_control,
          len(regexp_extract_all(t, '$NonAsciiRe'))::BIGINT AS n_nonascii
        FROM t)
      SELECT doc_id, n_replacement, n_control, n_nonascii,
        CASE WHEN length(t) = 0 THEN 1.0
             ELSE (length(t) - n_nonascii)::DOUBLE / length(t)::DOUBLE END AS ascii_frac,
        (n_replacement > 0 OR n_control > 0) AS suspect
      FROM c ORDER BY doc_id"""
  }

  // ---- URL canonicalization dedup ----------------------------------------

  /** Four surface forms of one logical URL, selected by `(doc_id div 40)
    * % 4` — a selector that CYCLES within each canonical-key residue class
    * (doc_id % 4 would be constant inside a class, never exercising the
    * cross-form collapse): uppercase
    * scheme+www+host, explicit `:443` + fragment, tracking query params,
    * and a trailing slash. All four must collapse to the same canonical
    * key `site{id%40}.example.com/page/{id%25}`.
    */
  private val surfaceUrl: Column = {
    val host = concat(lit("site"), (col("doc_id") % 40).cast("string"), lit(".example.com"))
    val hostUpper =
      concat(lit("Site"), (col("doc_id") % 40).cast("string"), lit(".EXAMPLE.COM"))
    val path = concat(lit("/page/"), (col("doc_id") % 25).cast("string"))
    val form = expr("(doc_id div 40) % 4")
    when(form === 0, concat(lit("HTTPS://WWW."), hostUpper, path))
      .when(form === 1, concat(lit("https://"), host, lit(":443"), path, lit("#sec2")))
      .when(
        form === 2,
        concat(lit("https://www."), host, path, lit("?utm_source=feed&utm_campaign=a1")))
      .otherwise(concat(lit("http://"), host, path, lit("/")))
  }

  private val surfaceUrlSql: String =
    """CASE (doc_id // 40) % 4
      WHEN 0 THEN 'HTTPS://WWW.Site' || (doc_id % 40)::VARCHAR || '.EXAMPLE.COM/page/' || (doc_id % 25)::VARCHAR
      WHEN 1 THEN 'https://site' || (doc_id % 40)::VARCHAR || '.example.com:443/page/' || (doc_id % 25)::VARCHAR || '#sec2'
      WHEN 2 THEN 'https://www.site' || (doc_id % 40)::VARCHAR || '.example.com/page/' || (doc_id % 25)::VARCHAR || '?utm_source=feed&utm_campaign=a1'
      ELSE 'http://site' || (doc_id % 40)::VARCHAR || '.example.com/page/' || (doc_id % 25)::VARCHAR || '/' END"""

  /** Frontier dedup by canonical URL: every surface variant of one logical
    * resource collapses to one key; per key the query reports reference
    * count, distinct surface forms, and the first referencing doc (the
    * fetch that wins). One map-only canonicalization pass + one
    * map-side-combined groupBy on the canonical key — the crawl-frontier
    * shape at any scale.
    */
  def ddUrlcanon(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), surfaceUrl.as("url"))
      .select(col("doc_id"), col("url"), WebText.canonicalUrl(col("url")).as("canonical"))
      .groupBy("canonical")
      .agg(
        count(lit(1)).as("n_refs"),
        countDistinct(col("url")).as("n_forms"),
        min(col("doc_id")).as("first_doc"))
      .orderBy("canonical")

  val ddUrlcanonSql: String =
    raw"""WITH u AS (SELECT doc_id, $surfaceUrlSql AS url FROM documents),
      c0 AS (SELECT doc_id, url, regexp_replace(url, '#.*$$', '') AS s FROM u),
      c1 AS (SELECT doc_id, url,
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(s,
            '([?&])(utm_[a-z]+|fbclid|gclid)=[^&#]*', '\1', 'g'),
            '&&+', '&', 'g'), '\?&+', '?'), '[?&]+$$', '') AS s
        FROM c0),
      c2 AS (SELECT doc_id, url,
          lower(regexp_extract(s, '^([^/]*//[^/]*)', 1)) || regexp_replace(s, '^[^/]*//[^/]*', '') AS s
        FROM c1),
      c3 AS (SELECT doc_id, url,
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(s,
            '^https?://', ''), '^www\.', ''), '^([^/]+):(80|443)(/|$$)', '\1\3'), '/$$', '') AS canonical
        FROM c2)
      SELECT canonical, count(*) AS n_refs, count(DISTINCT url) AS n_forms,
        min(doc_id) AS first_doc
      FROM c3 GROUP BY canonical ORDER BY canonical"""

  // ---- domain-suffix blocklist filtering ----------------------------------

  /** The blocklist every crawl pipeline carries (spam/adult/malware domain
    * lists): one registrable host and one whole second-level zone.
    */
  private[graft] val Blocklist = Seq("site3.example.com", "example.org")

  /** Blocklist filtering with SUFFIX semantics — a listed domain blocks
    * every subdomain under it (`example.org` catches `cdn1.example.org`),
    * the match rule domain blocklists (and the public-suffix list)
    * actually use. The scalable shape: each outlink host EXPLODES into its
    * label-suffix chain (bounded by its label count, ≤ ~5 — never a
    * per-character explode or a LIKE-join), and ONE equi-join against the
    * broadcast blocklist decides every suffix at once. A LIKE/endsWith
    * join would be a cartesian at 100 TB; the suffix-chain equi-join is
    * linear in outlinks. Output: per referencing document, its outlink
    * count, how many hit the blocklist, and the keep verdict (any blocked
    * outlink poisons the document — the conservative crawl policy).
    *
    * Both counts share OCCURRENCE multiplicity: `n_urls` counts every
    * outlink occurrence and `n_blocked` counts every BLOCKED occurrence —
    * a doc repeating the same blocked URL reports it each time (so
    * `n_blocked <= n_urls` reads as a true contamination ratio). The
    * occurrence index from `posexplode` is what lets the blocked branch
    * dedup a single occurrence's MULTIPLE suffix hits (a host can match
    * several blocklist entries) without collapsing genuine repeats.
    */
  def taBlockfilter(spark: SparkSession, dir: String): DataFrame =
    taBlockfilterOver(docs(spark, dir))

  /** The blockfilter behind [[taBlockfilter]], over ANY `(doc_id, text)`
    * frame — factored so ScaleProbe's `blockfilter_chain` row measures
    * exactly the shipped plan: the suffix-chain join volume is
    * outlinks × labels (labels ≤ ~5 per host), so the row must stay
    * corpus-linear as docs inflate.
    */
  private[graft] def taBlockfilterOver(d: DataFrame): DataFrame = {
    val spark = d.sparkSession
    val bl = broadcast(
      spark.createDataFrame(Blocklist.map(Tuple1(_))).toDF("sfx"))
    // Persisted: two consumers (the suffix/blocked branch and the n_urls
    // aggregate) — without it the documents scan + URL regex + explode
    // run twice, the dominant cost of the query.
    val urls = graft.Caches.track(
      d
        .select(
          col("doc_id"),
          posexplode(regexp_extract_all(urlText, lit(WebText.UrlRe), lit(0)))
            .as(Seq("pos", "url")))
        .select(col("doc_id"), col("pos"), WebText.urlDomain(col("url")).as("host"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val suffixes = urls
      .withColumn("labels", split(col("host"), "\\."))
      .select(
        col("doc_id"),
        col("pos"),
        explode(
          transform(
            sequence(lit(1), size(col("labels"))),
            j => concat_ws(".", slice(col("labels"), j, size(col("labels")) - j + 1))))
          .as("sfx"))
    val blockedPerDoc = suffixes
      .join(bl, Seq("sfx"), "left_semi")
      .select("doc_id", "pos")
      .distinct()
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_blocked"))
    urls
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_urls"))
      .join(blockedPerDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_urls"),
        coalesce(col("n_blocked"), lit(0L)).as("n_blocked"),
        (coalesce(col("n_blocked"), lit(0L)) === 0).as("keep"))
      .orderBy("doc_id")
  }

  val taBlockfilterSql: String = {
    import WebText.{HostRe, UrlRe}
    val blValues = Blocklist.map(s => s"('$s')").mkString(", ")
    raw"""WITH t AS (SELECT doc_id, $urlTextSql AS t FROM documents),
      u AS (SELECT doc_id, unnest(regexp_extract_all(t, '$UrlRe')) AS url,
          unnest(range(1, len(regexp_extract_all(t, '$UrlRe')) + 1)) AS pos
        FROM t),
      d AS (SELECT doc_id, pos,
          regexp_replace(lower(regexp_extract(url, '$HostRe', 1)), '^www\.', '') AS host
        FROM u),
      s AS (SELECT doc_id, pos,
          unnest(list_transform(range(1, len(string_split(host, '.')) + 1),
            j -> array_to_string(string_split(host, '.')[j:], '.'))) AS sfx
        FROM d),
      bl(sfx) AS (VALUES $blValues),
      b AS (SELECT DISTINCT doc_id, pos FROM s JOIN bl USING (sfx)),
      n AS (SELECT doc_id, count(*) AS n_urls FROM d GROUP BY 1),
      nb AS (SELECT doc_id, count(*) AS n_blocked FROM b GROUP BY 1)
      SELECT n.doc_id, n.n_urls, coalesce(nb.n_blocked, 0)::BIGINT AS n_blocked,
        coalesce(nb.n_blocked, 0) = 0 AS keep
      FROM n LEFT JOIN nb ON n.doc_id = nb.doc_id
      ORDER BY n.doc_id"""
  }

  // ---- Unicode script detection -------------------------------------------

  /** Deterministic script planting: zh docs carry length-proportional CJK
    * glyph runs (n_chars/5 + 1 copies of a 6-glyph fragment — enough to
    * DOMINATE the Latin word salad, so the cjk arm of the classifier is
    * actually exercised), every 9th doc a Cyrillic fragment — Latin/CJK/
    * Cyrillic and the mixed case all occur. BMP-only glyphs: Spark
    * `length` counts UTF-16 units, DuckDB counts code points — equal
    * only below the astral planes, so the planting stays there.
    */
  private val scriptText: Column = concat(
    col("text"),
    when(
      col("lang") === "zh",
      concat_ws("", array_repeat(lit(" 汉字分析文本"), (col("n_chars") / 5 + 1).cast("int"))))
      .otherwise(""),
    when(col("doc_id") % 9 === 0, lit(" проверка текста")).otherwise(""))

  private val scriptTextSql: String =
    """text
      || CASE WHEN lang = 'zh' THEN repeat(' 汉字分析文本', (n_chars // 5 + 1)::INT) ELSE '' END
      || CASE WHEN doc_id % 9 = 0 THEN ' проверка текста' ELSE '' END"""

  /** Writing-SCRIPT detection — the routing signal upstream of language
    * ID (a CJK page never enters the Latin tokenizer; a mixed-script page
    * gets segmented first): per-character counts for Latin/CJK/Cyrillic
    * via Unicode-range classes, the dominant script by count (ties break
    * latin > cjk > cyrillic, documented), and the mixed flag (two or
    * more scripts present). Counts by strip-and-subtract — exact
    * integers, map-only.
    */
  def taScript(spark: SparkSession, dir: String): DataFrame = {
    def classCount(c: Column, re: String): Column =
      (length(c) - length(regexp_replace(c, re, ""))).cast("long")
    docs(spark, dir)
      .select(col("doc_id"), scriptText.as("t"))
      .select(
        col("doc_id"),
        classCount(col("t"), "[A-Za-z]").as("n_latin"),
        classCount(col("t"), "[一-鿿]").as("n_cjk"),
        classCount(col("t"), "[Ѐ-ӿ]").as("n_cyrillic"))
      .select(
        col("doc_id"),
        col("n_latin"),
        col("n_cjk"),
        col("n_cyrillic"),
        when(col("n_latin") >= col("n_cjk") && col("n_latin") >= col("n_cyrillic"), "latin")
          .when(col("n_cjk") >= col("n_cyrillic"), "cjk")
          .otherwise("cyrillic")
          .as("dominant"),
        ((col("n_latin") > 0).cast("int") + (col("n_cjk") > 0).cast("int") +
          (col("n_cyrillic") > 0).cast("int") >= 2).as("mixed"))
      .orderBy("doc_id")
  }

  val taScriptSql: String =
    s"""WITH t AS (SELECT doc_id, $scriptTextSql AS t FROM documents),
      c AS (SELECT doc_id,
          (length(t) - length(regexp_replace(t, '[A-Za-z]', '', 'g')))::BIGINT AS n_latin,
          (length(t) - length(regexp_replace(t, '[\\x{4e00}-\\x{9fff}]', '', 'g')))::BIGINT AS n_cjk,
          (length(t) - length(regexp_replace(t, '[\\x{0400}-\\x{04ff}]', '', 'g')))::BIGINT AS n_cyrillic
        FROM t)
      SELECT doc_id, n_latin, n_cjk, n_cyrillic,
        CASE WHEN n_latin >= n_cjk AND n_latin >= n_cyrillic THEN 'latin'
             WHEN n_cjk >= n_cyrillic THEN 'cjk'
             ELSE 'cyrillic' END AS dominant,
        (CASE WHEN n_latin > 0 THEN 1 ELSE 0 END + CASE WHEN n_cjk > 0 THEN 1 ELSE 0 END
          + CASE WHEN n_cyrillic > 0 THEN 1 ELSE 0 END) >= 2 AS mixed
      FROM c ORDER BY doc_id"""

  // ---- synthetic-text artifact screening -----------------------------------

  /** Assistant-boilerplate markers a synthetic-data screen greps for
    * (apostrophe-free so one constant serves both engines' literals).
    */
  private[graft] val SyntheticMarkers = Seq(
    "As an AI language model",
    "I hope this helps! Let me know if you have any questions",
    "Certainly! Here is the information you requested")

  private[graft] val syntheticText: Column = concat(
    col("text"),
    when(col("doc_id") % 23 === 0, lit(" " + SyntheticMarkers(0) + ", I cannot browse the internet."))
      .otherwise(""),
    when(col("doc_id") % 31 === 0, lit(" " + SyntheticMarkers(1) + ".")).otherwise(""),
    when(col("doc_id") % 41 === 0, lit(" " + SyntheticMarkers(2) + ".")).otherwise(""))

  private[graft] val syntheticTextSql: String =
    s"""text
      || CASE WHEN doc_id % 23 = 0 THEN ' ${SyntheticMarkers(0)}, I cannot browse the internet.' ELSE '' END
      || CASE WHEN doc_id % 31 = 0 THEN ' ${SyntheticMarkers(1)}.' ELSE '' END
      || CASE WHEN doc_id % 41 = 0 THEN ' ${SyntheticMarkers(2)}.' ELSE '' END"""

  /** Synthetic-text contamination screen — the pass a pretraining
    * pipeline runs now that crawls contain model output: per SOURCE, how
    * many documents carry assistant-boilerplate markers ("As an AI
    * language model…", sign-off phrases), the marker-instance count, and
    * the contamination rate. Detection is a fixed bank of `contains`
    * probes (map-only, codegen'd — never a regex alternation over the
    * corpus); the per-source aggregate map-side-combines to the source
    * vocabulary.
    */
  def taSynthetic(spark: SparkSession, dir: String): DataFrame = {
    val t = col("t")
    val markers = SyntheticMarkers.map(m => t.contains(m).cast("long"))
    docs(spark, dir)
      .select(col("doc_id"), col("source"), syntheticText.as("t"))
      .select(
        col("doc_id"),
        col("source"),
        markers.reduce(_ + _).as("n_markers"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_markers") > 0, 1L).otherwise(0L)).as("n_flagged"),
        sum(col("n_markers")).as("n_markers"))
      .withColumn("rate", col("n_flagged").cast("double") / col("n_docs"))
      .orderBy("source")
  }

  val taSyntheticSql: String = {
    val markerSum = SyntheticMarkers
      .map(m => s"CASE WHEN contains(t, '$m') THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH t AS (SELECT doc_id, source, $syntheticTextSql AS t FROM documents),
      m AS (SELECT doc_id, source, ($markerSum)::BIGINT AS n_markers FROM t)
      SELECT source, count(*) AS n_docs,
        sum(CASE WHEN n_markers > 0 THEN 1 ELSE 0 END)::BIGINT AS n_flagged,
        sum(n_markers)::BIGINT AS n_markers,
        sum(CASE WHEN n_markers > 0 THEN 1 ELSE 0 END)::BIGINT::DOUBLE / count(*) AS rate
      FROM m GROUP BY source ORDER BY source"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ta_script" -> taScript _,
    "ta_synthetic" -> taSynthetic _,
    "ta_html" -> taHtml _,
    "ta_urls" -> taUrls _,
    "ta_mojibake" -> taMojibake _,
    "ta_blockfilter" -> taBlockfilter _,
    "dd_urlcanon" -> ddUrlcanon _)

  val oracles: Map[String, String] = Map(
    "ta_script" -> taScriptSql,
    "ta_synthetic" -> taSyntheticSql,
    "ta_html" -> taHtmlSql,
    "ta_urls" -> taUrlsSql,
    "ta_mojibake" -> taMojibakeSql,
    "ta_blockfilter" -> taBlockfilterSql,
    "dd_urlcanon" -> ddUrlcanonSql)
}
