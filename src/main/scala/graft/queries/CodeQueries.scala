package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Code-corpus curation queries: the passes a code-training-data pipeline
  * runs between crawl and tokenizer — license detection (what may be
  * trained on at all) and fenced-code-block extraction (how much of a
  * markdown/doc page is actually code). The synthetic `documents` table
  * carries prose, so each query PLANTS its code artifacts
  * deterministically from `doc_id` (the [[WebQueries]] device — both
  * engines replay the identical construction, so the detection logic is
  * what is verified; overlapping residues exercise the precedence rules).
  *
  * Scale: both queries are map-only codegen'd string sweeps — no shuffle
  * anywhere in the family.
  */
object CodeQueries {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "documents")

  // ---- license detection ---------------------------------------------------

  /** Planted header fragments (apostrophe-free so one constant serves the
    * Spark literal and the SQL literal byte-for-byte).
    */
  private val SpdxLine = "SPDX-License-Identifier: MIT\n"
  private val ApacheLine = "Licensed under the Apache License, Version 2.0.\n"
  private val GplLine =
    "This program is free software: you can redistribute it under the terms of the GNU General Public License.\n"
  private val MitBodyLine =
    "Permission is hereby granted, free of charge, to any person obtaining a copy of this software.\n"

  private val licensedText: Column = concat(
    when(col("doc_id") % 11 === 0, lit(SpdxLine)).otherwise(""),
    when(col("doc_id") % 7 === 0, lit(ApacheLine)).otherwise(""),
    when(col("doc_id") % 13 === 0, lit(GplLine)).otherwise(""),
    when(col("doc_id") % 17 === 0, lit(MitBodyLine)).otherwise(""),
    col("text"))

  private val licensedTextSql: String =
    s"""CASE WHEN doc_id % 11 = 0 THEN '$SpdxLine' ELSE '' END
      || CASE WHEN doc_id % 7 = 0 THEN '$ApacheLine' ELSE '' END
      || CASE WHEN doc_id % 13 = 0 THEN '$GplLine' ELSE '' END
      || CASE WHEN doc_id % 17 = 0 THEN '$MitBodyLine' ELSE '' END
      || text"""

  private val SpdxRe = "SPDX-License-Identifier: ([A-Za-z0-9.-]+)"

  /** License classification with the precedence real scanners use: a
    * machine-readable SPDX tag wins outright (its identifier is emitted
    * verbatim), then full-text markers in decreasing specificity —
    * Apache-2.0 notice, GPL grant, MIT permission grant — else `none`.
    * A document carrying several planted headers (overlapping residues)
    * resolves by that precedence in both engines. `permissive` is the
    * policy verdict a pipeline filters on (GPL-class corpora need
    * separate handling).
    */
  def taLicense(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), licensedText.as("t"))
      .select(
        col("doc_id"),
        when(col("t").rlike(SpdxRe), regexp_extract(col("t"), SpdxRe, 1))
          .when(col("t").contains("Apache License, Version 2.0"), lit("Apache-2.0"))
          .when(col("t").contains("GNU General Public License"), lit("GPL"))
          .when(col("t").contains("Permission is hereby granted, free of charge"), lit("MIT-text"))
          .otherwise(lit("none"))
          .as("license"),
        col("t").rlike(SpdxRe).as("via_spdx"))
      .withColumn("permissive", col("license").isin("MIT", "Apache-2.0", "MIT-text"))
      .orderBy("doc_id")

  val taLicenseSql: String =
    s"""WITH t AS (SELECT doc_id, $licensedTextSql AS t FROM documents),
      c AS (SELECT doc_id,
          CASE WHEN regexp_matches(t, '$SpdxRe') THEN regexp_extract(t, '$SpdxRe', 1)
               WHEN contains(t, 'Apache License, Version 2.0') THEN 'Apache-2.0'
               WHEN contains(t, 'GNU General Public License') THEN 'GPL'
               WHEN contains(t, 'Permission is hereby granted, free of charge') THEN 'MIT-text'
               ELSE 'none' END AS license,
          regexp_matches(t, '$SpdxRe') AS via_spdx
        FROM t)
      SELECT doc_id, license, via_spdx,
        license IN ('MIT', 'Apache-2.0', 'MIT-text') AS permissive
      FROM c ORDER BY doc_id"""

  // ---- fenced code-block extraction ---------------------------------------

  /** Planted markdown fences: %5 a tagged python block, %8 a bare block,
    * %20 additionally a scala block (so %40 documents carry all three —
    * multi-fence extraction, mixed tagged/untagged).
    */
  private val fencedText: Column = concat(
    col("text"),
    when(
      col("doc_id") % 5 === 0,
      concat(
        lit("\n```python\nfor i in range("),
        (col("doc_id") % 9).cast("string"),
        lit("):\n    print(i)\n```")))
      .otherwise(""),
    when(
      col("doc_id") % 8 === 0,
      concat(lit("\n```\nSELECT "), (col("doc_id") % 4).cast("string"), lit(";\n```")))
      .otherwise(""),
    when(
      col("doc_id") % 20 === 0,
      concat(lit("\n```scala\nval x = "), col("doc_id").cast("string"), lit("\n```")))
      .otherwise(""))

  private val fencedTextSql: String =
    """text
      || CASE WHEN doc_id % 5 = 0 THEN chr(10) || '```python' || chr(10) || 'for i in range(' || (doc_id % 9)::VARCHAR || '):' || chr(10) || '    print(i)' || chr(10) || '```' ELSE '' END
      || CASE WHEN doc_id % 8 = 0 THEN chr(10) || '```' || chr(10) || 'SELECT ' || (doc_id % 4)::VARCHAR || ';' || chr(10) || '```' ELSE '' END
      || CASE WHEN doc_id % 20 = 0 THEN chr(10) || '```scala' || chr(10) || 'val x = ' || doc_id::VARCHAR || chr(10) || '```' ELSE '' END"""

  /** Fence pattern: optional language tag, newline, non-greedy body up to
    * the closing fence — `(?s)` so the body crosses lines (RE2 and Java
    * regex agree on the non-greedy semantics).
    */
  private val FenceRe = "```([a-z]*)\\n(.*?)```"

  /** Fenced-code extraction — the markdown/doc-page pass that decides how
    * much of a page is code (and in which languages) before routing it to
    * the code or prose pipeline: fence count, the ordered comma-joined
    * language tags (bare fences contribute an empty tag), total code
    * bytes, and the code fraction of the page.
    *
    * Sizes are UTF-8 BYTE counts on both engines (Spark `octet_length` ↔
    * DuckDB `strlen`) — encoding-exact on every plane, unlike the
    * `length` pair this replaced, whose UTF-16-units-vs-code-points
    * agreement silently assumed the raw corpus text stays BMP-only
    * (r11 ADVICE: the assumption was documented for ta_script's planted
    * glyphs but only inherited here).
    */
  def taCodefence(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), fencedText.as("t"))
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("t"), lit("(?s)" + FenceRe), lit(0))).cast("long")
          .as("n_fences"),
        concat_ws(",", regexp_extract_all(col("t"), lit("(?s)" + FenceRe), lit(1)))
          .as("langs"),
        aggregate(
          regexp_extract_all(col("t"), lit("(?s)" + FenceRe), lit(2)),
          lit(0L),
          (acc, b) => acc + octet_length(b)).as("code_bytes"),
        (aggregate(
          regexp_extract_all(col("t"), lit("(?s)" + FenceRe), lit(2)),
          lit(0L),
          (acc, b) => acc + octet_length(b)).cast("double") / octet_length(col("t")))
          .as("code_frac"))
      .orderBy("doc_id")

  val taCodefenceSql: String = {
    val fence = FenceRe.replace("\\n", "\n")
    s"""WITH t AS (SELECT doc_id, $fencedTextSql AS t FROM documents)
      SELECT doc_id,
        len(regexp_extract_all(t, '$fence', 0, 's'))::BIGINT AS n_fences,
        coalesce(array_to_string(regexp_extract_all(t, '$fence', 1, 's'), ','), '') AS langs,
        list_reduce(list_prepend(0, list_transform(
          regexp_extract_all(t, '$fence', 2, 's'), x -> strlen(x))), (a, b) -> a + b)::BIGINT AS code_bytes,
        list_reduce(list_prepend(0, list_transform(
          regexp_extract_all(t, '$fence', 2, 's'), x -> strlen(x))), (a, b) -> a + b)::DOUBLE
          / strlen(t) AS code_frac
      FROM t ORDER BY doc_id"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ta_license" -> taLicense _,
    "ta_codefence" -> taCodefence _)

  val oracles: Map[String, String] = Map(
    "ta_license" -> taLicenseSql,
    "ta_codefence" -> taCodefenceSql)
}
