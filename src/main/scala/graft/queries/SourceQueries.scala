package graft.queries

import graft.operators.Multimodal
import graft.sources.AminerReader
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source/format coverage queries.
  *
  *  - `am_parse` — a ROUND-TRIP proof of the AMiner flat-text parser:
  *    render every documents row into the tagged multi-line record format
  *    (`#*title \n#@authors \n#t year \n#c venue \n#index id \n#%ref...`),
  *    run the exact parsing expressions the text source uses
  *    ([[AminerReader.parseRecords]]), and emit the parsed fields. The
  *    DuckDB oracle computes what a correct parser must recover directly
  *    from the source columns — any drift in the split/trim/multi-value
  *    extraction logic breaks the hash match. (The physical blank-line
  *    `lineSep` scan itself is covered by fixture tests.)
  *
  *  - `mm_features` — the multimodal binary pipeline over payloads derived
  *    from text ([[Multimodal]]): byte length, sha256, and the stub
  *    decoder's deterministic dimensions, all replayed by DuckDB.
  */
object SourceQueries {

  def amParse(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.t(spark, dir, "documents")
    // Documents text is single-line and '#'-free (synthetic corpus), so the
    // rendered record structure is unambiguous.
    val rendered = docs.select(
      col("doc_id"),
      concat(
        lit("#*"), substring(col("text"), 1, 40), lit("\n"),
        lit("#@"), concat_ws(", ", col("source"), col("lang")), lit("\n"),
        lit("#t"), (col("n_chars") % 30 + 1980).cast("string"), lit("\n"),
        lit("#c"), col("source"), lit("\n"),
        lit("#index"), col("doc_id").cast("string"), lit("\n"),
        lit("#%ref_"), col("doc_id").cast("string"), lit("\n"),
        lit("#%ref_"), (col("doc_id") + 1).cast("string")).as("value"))
    AminerReader
      .parseRecords(rendered)
      .select(
        col("doc_id"),
        col("title"),
        col("authors"),
        col("year"),
        col("publication venue").as("venue"),
        col("index").as("idx"),
        col("references").as("refs"))
      .orderBy("doc_id")
  }

  val amParseSql: String =
    """SELECT doc_id,
      trim(lower(text[1:40])) AS title,
      lower(source || ', ' || lang) AS authors,
      (1980 + n_chars % 30)::INT AS year,
      lower(source) AS venue,
      doc_id::VARCHAR AS idx,
      'ref_' || doc_id::VARCHAR || ', ref_' || (doc_id + 1)::VARCHAR AS refs
      FROM documents ORDER BY doc_id"""

  def mmFeatures(spark: SparkSession, dir: String): DataFrame =
    Multimodal
      .extractFeatures(
        Multimodal.toMedia(Tables.t(spark, dir, "documents"), "doc_id", "text"))
      .toDF()
      .orderBy("doc_id")

  val mmFeaturesSql: String = {
    /** 4 hex chars -> int, via the same digit fold Hashing uses. */
    def hex4(e: String) =
      s"list_reduce(list_transform(range(1, 5), i -> strpos('0123456789abcdef', substr($e, i, 1)) - 1), (a, b) -> a * 16 + b)"
    s"""SELECT doc_id, octet_length(encode(text))::BIGINT AS n_bytes,
      sha256(text) AS sha_hex,
      (1 + ${hex4("sha256(text)")} % 512)::BIGINT AS width,
      (1 + ${hex4("substr(sha256(text), 5, 4)")} % 512)::BIGINT AS height
      FROM documents ORDER BY doc_id"""
  }

  private val FrameBytes = 32
  private val FrameStride = 4

  /** Frame-sampling plumbing under the gate: per-doc frame count and last
    * sampled offset (window geometry is pure integer arithmetic DuckDB
    * replays; the frame content digests are covered by MultimodalSpec).
    */
  def mmFrames(spark: SparkSession, dir: String): DataFrame =
    Multimodal
      .frameSample(
        Multimodal.toMedia(Tables.t(spark, dir, "documents"), "doc_id", "text"),
        FrameBytes,
        FrameStride)
      .groupBy("doc_id")
      .agg(
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n_frames"),
        org.apache.spark.sql.functions.max("offset").as("last_offset"))
      .orderBy("doc_id")

  val mmFramesSql: String = {
    val step = FrameBytes * FrameStride
    s"""SELECT doc_id,
      ((octet_length(encode(text)) - $FrameBytes) // $step + 1)::BIGINT AS n_frames,
      ($step * ((octet_length(encode(text)) - $FrameBytes) // $step))::BIGINT AS last_offset
      FROM documents WHERE octet_length(encode(text)) >= $FrameBytes
      ORDER BY doc_id"""
  }

  private val MaxDim = 64L

  /** Resize-to-fit plumbing under the gate: the stub decoder's aspect-kept
    * bounding-box geometry AND the re-encoded payload digest, both
    * replayed by DuckDB (sha256 + the same float scale arithmetic).
    */
  def mmResize(spark: SparkSession, dir: String): DataFrame =
    Multimodal
      .resize(Multimodal.toMedia(Tables.t(spark, dir, "documents"), "doc_id", "text"), MaxDim)
      .toDF()
      .orderBy("doc_id")

  val mmResizeSql: String = {
    def hex4(e: String) =
      s"list_reduce(list_transform(range(1, 5), i -> strpos('0123456789abcdef', substr($e, i, 1)) - 1), (a, b) -> a * 16 + b)"
    s"""SELECT doc_id, tw AS width, th AS height,
      sha256(text || '|' || tw::VARCHAR || ' x ' || th::VARCHAR) AS thumb_sha
      FROM (SELECT doc_id, text,
              CASE WHEN $MaxDim.0 / greatest(w, h) >= 1.0 THEN w
                   ELSE greatest(1, floor(w * ($MaxDim.0 / greatest(w, h)))::BIGINT) END AS tw,
              CASE WHEN $MaxDim.0 / greatest(w, h) >= 1.0 THEN h
                   ELSE greatest(1, floor(h * ($MaxDim.0 / greatest(w, h)))::BIGINT) END AS th
            FROM (SELECT doc_id, text,
                    (1 + ${hex4("sha256(text)")} % 512)::BIGINT AS w,
                    (1 + ${hex4("substr(sha256(text), 5, 4)")} % 512)::BIGINT AS h
                  FROM documents))
      ORDER BY doc_id"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "am_parse" -> amParse _,
    "mm_features" -> mmFeatures _,
    "mm_frames" -> mmFrames _,
    "mm_resize" -> mmResize _)

  val oracles: Map[String, String] = Map(
    "am_parse" -> amParseSql,
    "mm_features" -> mmFeaturesSql,
    "mm_frames" -> mmFramesSql,
    "mm_resize" -> mmResizeSql)
}
