package graft.queries

import graft.operators.Multimodal
import graft.sources.AminerReader
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  *  - `mm_features` / `mm_resize` — the multimodal image pipeline over
  *    REAL synthesized BMPs ([[Multimodal]]): a genuine
  *    `javax.imageio.ImageIO` decode recovers width/height and the pixel
  *    raster; because the synthesized dimensions and pixel values are
  *    closed-form in (doc_id, text length), DuckDB recomputes the decoded
  *    dims, the BMP byte size, and position-weighted pixel checksums —
  *    an encode → decode → (resample) round-trip proof under the hash
  *    gate.
  */
object SourceQueries {

  /** Materialize the session-shared multimodal frames untimed (the bench
    * warm policy for every memoized multi-consumer frame): the decoded
    * dHash table feeds BOTH mm_phash and mm_dedup, and the banded hash
    * pairs feed both as well — whichever ran first was billed the whole
    * decode pass.
    */
  def warm(spark: SparkSession, dir: String): Unit = {
    phashed(spark, dir).count()
    phashHashPairs(spark, dir).count()
    ()
  }

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

  /** The synthesized image dims in SQL — mirrors [[Multimodal.dims]]. */
  private val dimsCte =
    """d AS (SELECT doc_id, sha256(text) AS s,
         (8 + (octet_length(encode(text)) * 7 + doc_id * 13) % 57)::BIGINT AS w,
         (8 + (octet_length(encode(text)) * 11 + doc_id * 29) % 57)::BIGINT AS h
       FROM documents)"""

  def mmFeatures(spark: SparkSession, dir: String): DataFrame =
    Multimodal
      .decodeFeatures(
        Multimodal.synthesizeImages(Tables.t(spark, dir, "documents"), "doc_id", "text"))
      .toDF()
      .orderBy("doc_id")

  // n_bytes is the exact BMP file size (54-byte headers + 4-byte-padded
  // BGR rows); px_checksum replays Multimodal.pixel over the full raster
  // via a range-join enumeration of (x, y).
  val mmFeaturesSql: String =
    s"""WITH $dimsCte,
      px AS (SELECT d.doc_id,
          sum(((x.i * 31 + y.j * 17 + d.doc_id * 7) % 256) * (y.j * d.w + x.i + 1))::BIGINT AS cks
        FROM d, range(0, 64) x(i), range(0, 64) y(j)
        WHERE x.i < d.w AND y.j < d.h
        GROUP BY d.doc_id)
      SELECT d.doc_id, (54 + ((3 * d.w + 3) // 4) * 4 * d.h)::BIGINT AS n_bytes,
        d.s AS src_sha, d.w AS width, d.h AS height, px.cks AS px_checksum
      FROM d JOIN px USING (doc_id) ORDER BY doc_id"""

  private val BlurVarX100 = 4000000L

  /** Variance-of-Laplacian blur gate ([[Multimodal.laplacianMoments]] —
    * REAL decode, integer moments): per image the interior-pixel count,
    * the Laplacian sum/sum-of-squares, the variance scaled ×100 via the
    * integer cross-multiplication `(n·Q − S²)·100 div n²` (exact — no
    * float forms anywhere), and the blur flag against [[BlurVarX100]]
    * (threshold at the corpus median so both classes stay populated).
    * Scale: decode is map-only; only (id, dims, longs) rows shuffle; the
    * flag and variance derive in the same projection — a 100 TB corpus
    * pays one decode pass and ships 6 longs per image.
    */
  def mmLapvar(spark: SparkSession, dir: String): DataFrame =
    Multimodal
      .laplacianMoments(
        Multimodal.synthesizeImages(Tables.t(spark, dir, "documents"), "doc_id", "text"))
      .toDF()
      .withColumn(
        "var_x100",
        expr("(n_int * q_lap - s_lap * s_lap) * 100 div (n_int * n_int)"))
      .withColumn(
        "is_blurry",
        when(col("var_x100") < BlurVarX100, 1L).otherwise(0L))
      .orderBy("doc_id")

  val mmLapvarSql: String =
    s"""WITH $dimsCte,
      px AS (SELECT d.doc_id, d.w, d.h,
          (4*((x.i*31 + y.j*17 + d.doc_id*7) % 256)
            - (((x.i-1)*31 + y.j*17 + d.doc_id*7) % 256)
            - (((x.i+1)*31 + y.j*17 + d.doc_id*7) % 256)
            - ((x.i*31 + (y.j-1)*17 + d.doc_id*7) % 256)
            - ((x.i*31 + (y.j+1)*17 + d.doc_id*7) % 256))::BIGINT AS l
        FROM d, range(1, 64) x(i), range(1, 64) y(j)
        WHERE x.i < d.w - 1 AND y.j < d.h - 1),
      lap AS (SELECT doc_id, w, h, count(*)::BIGINT AS n_int,
          sum(l)::BIGINT AS s_lap, sum(l * l)::BIGINT AS q_lap
        FROM px GROUP BY 1, 2, 3)
      SELECT doc_id, w AS width, h AS height, n_int, s_lap, q_lap,
        ((n_int * q_lap - s_lap * s_lap) * 100 // (n_int * n_int))::BIGINT AS var_x100,
        (((n_int * q_lap - s_lap * s_lap) * 100 // (n_int * n_int)) < $BlurVarX100)::BIGINT AS is_blurry
      FROM lap ORDER BY doc_id"""

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

  private val ZcrFrameLen = 200

  /** Frame-wise zero-crossing-rate gate ([[Multimodal.zcrStats]] — REAL
    * WAV encode→decode, frame-local integer sign-flip counts): per clip
    * the decoded sample count, full-frame count, and the total/max/min
    * per-frame crossings — the cheap voiced/noise feature an audio
    * funnel thresholds before any spectral work. All BIGINT; the DuckDB
    * oracle replays the closed-form samples over a range enumeration.
    */
  def mmZcr(spark: SparkSession, dir: String): DataFrame =
    Multimodal
      .zcrStats(Tables.t(spark, dir, "documents"), "doc_id", "text", ZcrFrameLen)
      .toDF()
      .orderBy("doc_id")

  val mmZcrSql: String =
    s"""WITH a AS (SELECT doc_id,
          (64 + (octet_length(encode(text)) * 13 + doc_id * 7) % 937)::BIGINT AS n
        FROM documents),
      z AS (SELECT a.doc_id, x.k // $ZcrFrameLen AS f,
          sum(CASE WHEN x.k % $ZcrFrameLen <> 0
            AND ((x.k * 31 + a.doc_id * 7) % 20001 - 10000)
              * (((x.k - 1) * 31 + a.doc_id * 7) % 20001 - 10000) < 0
            THEN 1 ELSE 0 END)::BIGINT AS zc
        FROM a, range(0, 1000) x(k)
        WHERE a.n >= $ZcrFrameLen AND x.k < (a.n // $ZcrFrameLen) * $ZcrFrameLen
        GROUP BY 1, 2)
      SELECT z.doc_id, a.n AS n_samples, (a.n // $ZcrFrameLen)::BIGINT AS n_frames,
        sum(z.zc)::BIGINT AS zc_total, max(z.zc)::BIGINT AS zc_max,
        min(z.zc)::BIGINT AS zc_min
      FROM z JOIN a USING (doc_id) GROUP BY 1, 2, 3 ORDER BY doc_id"""

  private val VadThreshold = 500
  private val VadMinRun = 50

  /** Silence segmentation (VAD) over the synthesized per-doc audio
    * ([[Multimodal.silenceSegments]]): a REAL PCM WAV is encoded per doc,
    * `javax.sound` decodes it back, and silent runs (|sample| <
    * [[VadThreshold]], run ≥ [[VadMinRun]]) are scanned on the DECODED
    * samples — per doc: sample count, silent samples, qualifying
    * segments, longest run. One doc row in → one stats row out (narrow
    * map; audio bytes never shuffle). The oracle replays the planted
    * closed-form blocks; the fixture keeps a hard amplitude gap around
    * the threshold so the decision is never boundary-sensitive.
    */
  def mmSilence(spark: SparkSession, dir: String): DataFrame =
    Multimodal
      .silenceSegments(
        Tables.t(spark, dir, "documents"), "doc_id", "text", VadThreshold, VadMinRun)
      .toDF()
      .orderBy("doc_id")

  val mmSilenceSql: String =
    s"""WITH d AS (SELECT doc_id,
          (64 + (octet_length(encode(text)) * 13 + doc_id * 7) % 937)::BIGINT AS n
        FROM documents),
      ks AS (SELECT doc_id, n, unnest(range(0, n)) AS k FROM d),
      s AS (SELECT doc_id, n, k,
          CASE WHEN ((k // 50) * 11 + doc_id) % 4 = 0
               THEN (k * 13 + doc_id) % 801 - 400
               ELSE 1000 + (k * 31 + doc_id * 7) % 9000 END AS smp
        FROM ks),
      v AS (SELECT doc_id, n, k, abs(smp) < $VadThreshold AS silent FROM s),
      g AS (SELECT *, sum(CASE WHEN silent THEN 0 ELSE 1 END)
            OVER (PARTITION BY doc_id ORDER BY k ROWS UNBOUNDED PRECEDING) AS grp
        FROM v),
      runs AS (SELECT doc_id, grp, count(*) AS run_len
        FROM g WHERE silent GROUP BY doc_id, grp),
      agg AS (SELECT doc_id,
          (count(*) FILTER (WHERE run_len >= $VadMinRun))::BIGINT AS n_segments,
          max(run_len)::BIGINT AS longest_run, sum(run_len)::BIGINT AS n_silent
        FROM runs GROUP BY doc_id)
      SELECT d.doc_id, d.n AS n_samples,
        coalesce(a.n_silent, 0)::BIGINT AS n_silent,
        coalesce(a.n_segments, 0)::BIGINT AS n_segments,
        coalesce(a.longest_run, 0)::BIGINT AS longest_run
      FROM d LEFT JOIN agg a USING (doc_id) ORDER BY doc_id"""

  /** Scene-cut detection over the synthesized per-doc video
    * ([[Multimodal.videoFrameLumas]] — real 64-byte frame buffers decoded
    * to luminance executor-side): a cut is any frame whose decoded luma
    * differs from its predecessor's, the standard frame-difference
    * detector. Per doc: frame count, detected cuts, and the total
    * luminance shift across cuts. The lag window partitions by doc —
    * per-video timelines are the only serialization unit, so the pass is
    * one hash exchange of slim (doc, frame, luma) rows at any corpus
    * size; frame payloads never shuffle (luma is decoded in the narrow
    * flatMap). Planted cuts can't alias (adjacent-scene sums are
    * injective), so detected == planted — MultimodalSpec asserts it.
    */
  def mmScenecut(spark: SparkSession, dir: String): DataFrame = {
    val frames = Multimodal
      .videoFrameLumas(Tables.t(spark, dir, "documents"), "doc_id", "text")
      .toDF()
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("frame")
    frames
      .withColumn("prev", lag(col("luma"), 1).over(w))
      .withColumn("cut", col("prev").isNotNull && col("luma") =!= col("prev"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_frames"),
        sum(when(col("cut"), 1L).otherwise(0L)).as("n_cuts"),
        sum(when(col("cut"), abs(col("luma") - col("prev"))).otherwise(0L)).as("total_shift"))
      .orderBy("doc_id")
  }

  val mmScenecutSql: String =
    """WITH d AS (SELECT doc_id,
          (6 + (octet_length(encode(text)) * 5 + doc_id * 3) % 11)::BIGINT AS nf
        FROM documents),
      fr AS (SELECT doc_id, unnest(range(0, nf)) AS f FROM d),
      sc AS (SELECT doc_id, f,
          sum(CASE WHEN f >= 1 AND (doc_id * 13 + f * 7) % 5 = 0 THEN 1 ELSE 0 END)
            OVER (PARTITION BY doc_id ORDER BY f ROWS UNBOUNDED PRECEDING) AS scene
        FROM fr),
      lum AS (SELECT doc_id, f,
          list_reduce(list_transform(range(0, 64), k -> (k + scene * 83 + doc_id) % 256),
            (a, b) -> a + b)::BIGINT AS luma
        FROM sc),
      diff AS (SELECT doc_id, f, luma,
          lag(luma) OVER (PARTITION BY doc_id ORDER BY f) AS prev
        FROM lum)
      SELECT doc_id, count(*)::BIGINT AS n_frames,
        (count(*) FILTER (WHERE prev IS NOT NULL AND luma <> prev))::BIGINT AS n_cuts,
        coalesce(sum(abs(luma - prev)) FILTER (WHERE prev IS NOT NULL AND luma <> prev),
          0)::BIGINT AS total_shift
      FROM diff GROUP BY doc_id ORDER BY doc_id"""

  /** Video dedup funnel — [[mmAudiodedup]]'s equality-group decision
    * applied to clips' SCENE STRUCTURE, completing the multimodal dedup
    * triptych (image / audio / video). The signature is what survives a
    * re-encode: frame count plus a fingerprint of the DETECTED cut-frame
    * SET (the [[mmScenecut]] detector, whose detected == planted
    * invariant MultimodalSpec locks), not pixel content. The fingerprint
    * is an XOR fold of a per-position 60-bit md5 over `"vcut|"+frame` —
    * position-sensitive (the frame index is hashed in), commutative (so
    * it sits in one hash aggregate), overflow-free, and valid for clips
    * of ANY length. The r7 form packed positions with `shiftleft(1,
    * frame)`, which silently aliases past frame 63 (Java shift semantics
    * wrap the distance mod 64) — fine for the bounded synthetic clips,
    * wrong the day a real video exceeds 64 frames; MmFunnelSpec now locks
    * the >63-frame case. Like the audio funnel, the signature is an
    * EQUIVALENCE relation, so clusters ARE the hash groups — one groupBy,
    * never a pair enumeration — and each cluster keeps its
    * highest-total-luma member (the "highest-fidelity copy" election;
    * ties to the lower doc_id). One decode pass: signature, fingerprint,
    * and total luma all come from the same per-frame luma rows.
    */
  def mmVideodedup(spark: SparkSession, dir: String): DataFrame = {
    val frames = Multimodal
      .videoFrameLumas(Tables.t(spark, dir, "documents"), "doc_id", "text")
      .toDF()
    videoSignatureDedup(frames)
  }

  /** The signature + election stage of [[mmVideodedup]], over any
    * `(doc_id, frame, luma)` frame table — factored out so the funnel
    * spec can drive it with >63-frame fixtures the synthetic corpus
    * never produces.
    */
  def videoSignatureDedup(frames: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("frame")
    val sig = frames
      .withColumn("prev", lag(col("luma"), 1).over(w))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_frames"),
        call_function(
          "bit_xor",
          when(
            col("prev").isNotNull && col("luma") =!= col("prev"),
            graft.functions.Hashing
              .md5Long60(concat(lit("vcut|"), col("frame").cast("string"))))
            .otherwise(0L)).as("cut_sig"),
        sum(col("luma")).as("tl"))
    sig
      .groupBy("n_frames", "cut_sig")
      .agg(
        min(col("doc_id")).as("cluster_id"),
        count(lit(1)).as("n_members"),
        max(struct(col("tl"), (-col("doc_id")).as("nid"))).as("m"))
      .select(
        col("cluster_id"),
        col("n_frames"),
        col("cut_sig"),
        col("n_members"),
        (-col("m.nid")).as("keep_id"),
        col("m.tl").as("keep_luma"))
      .orderBy("cluster_id")
  }

  // The oracle replays the closed-form frame synthesis, the same
  // frame-difference detector, the XOR'd md5 cut fingerprint, and the
  // same election.
  val mmVideodedupSql: String =
    s"""WITH d AS (SELECT doc_id,
          (6 + (octet_length(encode(text)) * 5 + doc_id * 3) % 11)::BIGINT AS nf
        FROM documents),
      fr AS (SELECT doc_id, unnest(range(0, nf)) AS f FROM d),
      sc AS (SELECT doc_id, f,
          sum(CASE WHEN f >= 1 AND (doc_id * 13 + f * 7) % 5 = 0 THEN 1 ELSE 0 END)
            OVER (PARTITION BY doc_id ORDER BY f ROWS UNBOUNDED PRECEDING) AS scene
        FROM fr),
      lum AS (SELECT doc_id, f,
          list_reduce(list_transform(range(0, 64), k -> (k + scene * 83 + doc_id) % 256),
            (a, b) -> a + b)::BIGINT AS luma
        FROM sc),
      diff AS (SELECT doc_id, f, luma,
          lag(luma) OVER (PARTITION BY doc_id ORDER BY f) AS prev
        FROM lum),
      sig AS (SELECT doc_id, count(*)::BIGINT AS n_frames,
          coalesce(bit_xor(${graft.functions.Hashing.sqlMd5Long60Duck("'vcut|' || f")})
            FILTER (WHERE prev IS NOT NULL AND luma <> prev), 0)::BIGINT AS cut_sig,
          sum(luma)::BIGINT AS tl
        FROM diff GROUP BY doc_id),
      ranked AS (SELECT *, row_number()
          OVER (PARTITION BY n_frames, cut_sig ORDER BY tl DESC, doc_id) AS rn
        FROM sig)
      SELECT min(s.doc_id)::BIGINT AS cluster_id, s.n_frames, s.cut_sig,
        count(*)::BIGINT AS n_members,
        max(r.doc_id)::BIGINT AS keep_id, max(r.tl)::BIGINT AS keep_luma
      FROM sig s JOIN ranked r
        ON r.n_frames = s.n_frames AND r.cut_sig = s.cut_sig AND r.rn = 1
      GROUP BY s.n_frames, s.cut_sig ORDER BY cluster_id"""

  /** Thumbnail bounding box — small enough that most synthesized images
    * (8–64 px a side) genuinely downscale, while some already fit (both
    * geometry branches exercised).
    */
  private val MaxDim = 16

  def mmResize(spark: SparkSession, dir: String): DataFrame =
    Multimodal
      .resizeImages(
        Multimodal.synthesizeImages(Tables.t(spark, dir, "documents"), "doc_id", "text"),
        MaxDim)
      .toDF()
      .orderBy("doc_id")

  // Integer aspect-fit geometry + nearest-neighbor resampling replay:
  // src = (dst * srcDim) // dstDim indexes the closed-form pixel function,
  // so the checksum verifies the DECODED-then-resampled raster.
  val mmResizeSql: String =
    s"""WITH $dimsCte,
      r AS (SELECT doc_id, w, h,
          CASE WHEN greatest(w, h) <= $MaxDim THEN w
               ELSE greatest(1, (w * $MaxDim) // greatest(w, h)) END AS tw,
          CASE WHEN greatest(w, h) <= $MaxDim THEN h
               ELSE greatest(1, (h * $MaxDim) // greatest(w, h)) END AS th
        FROM d),
      px AS (SELECT r.doc_id,
          sum(((((x.i * r.w) // r.tw) * 31 + ((y.j * r.h) // r.th) * 17 + r.doc_id * 7) % 256)
              * (y.j * r.tw + x.i + 1))::BIGINT AS cks
        FROM r, range(0, 64) x(i), range(0, 64) y(j)
        WHERE x.i < r.tw AND y.j < r.th
        GROUP BY r.doc_id)
      SELECT r.doc_id, r.w AS width, r.h AS height, r.tw AS thumb_w, r.th AS thumb_h,
        px.cks AS thumb_checksum
      FROM r JOIN px USING (doc_id) ORDER BY doc_id"""

  /** Real audio round-trip: synthesized PCM WAVs decoded with the JDK's
    * `javax.sound.sampled` — decoded format, frame count, and a
    * position-weighted sample checksum, all closed-form for the oracle.
    */
  def mmAudio(spark: SparkSession, dir: String): DataFrame =
    Multimodal
      .decodeAudioFeatures(
        Multimodal.synthesizeAudio(Tables.t(spark, dir, "documents"), "doc_id", "text"))
      .toDF()
      .orderBy("doc_id")

  val mmAudioSql: String = {
    val sr = Multimodal.SampleRate
    s"""WITH a AS (SELECT doc_id,
           (64 + (octet_length(encode(text)) * 13 + doc_id * 7) % 937)::BIGINT AS n
         FROM documents),
      s AS (SELECT a.doc_id,
          sum(((x.k * 31 + a.doc_id * 7) % 20001 - 10000) * (x.k + 1))::BIGINT AS cks
        FROM a, range(0, 1000) x(k) WHERE x.k < a.n
        GROUP BY a.doc_id)
      SELECT a.doc_id, (44 + 2 * a.n)::BIGINT AS n_bytes, $sr::BIGINT AS sample_rate,
        a.n AS n_samples, s.cks AS s_checksum
      FROM a JOIN s USING (doc_id) ORDER BY doc_id"""
  }

  // ---- perceptual-hash image near-dup --------------------------------------
  // Image dedup the way a crawl pipeline does it: dHash each decoded
  // image ([[Multimodal.dhash56]] — REAL ImageIO decode, 8x8 resample,
  // horizontal-gradient bits), then find near-identical images by banded
  // LSH: 4 x 14-bit bands, join on any equal band, verify exact Hamming
  // <= 3. The pigeonhole makes the banded candidates recall-COMPLETE for
  // the threshold (3 differing bits can touch at most 3 of 4 bands), so
  // the brute-force oracle matches exactly. Scale shape is dd_simhash's:
  // the self-join ships (id, 56-bit hash) rows only — the image payloads
  // never cross a shuffle.

  private val PhashMaxHamming = 3

  /** The ONE real decode pass behind the whole image-dedup family:
    * `(doc_id, dhash, px)` — fingerprint AND pixel count from the same
    * decoded raster, memoized per session so [[mmPhash]] and [[mmDedup]]
    * never re-decode a payload (round 6 decoded every image twice; at
    * 100 TB decode IS the cost).
    */
  private def phashed(spark: SparkSession, dir: String): DataFrame =
    SessionMemo.getOrElseUpdate("mm_phashed", spark, dir) {
      Multimodal
        .dhash56(
          Multimodal.synthesizeImages(Tables.t(spark, dir, "documents"), "doc_id", "text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  /** Hash-level near-dup candidates: band DISTINCT hashes only, verify
    * exact Hamming on the (tiny) distinct-hash pair set. Exact-duplicate
    * images — the hottest collision mass in any crawl, and the measured
    * cause of round 6's superlinear 20×→50× probe growth — never enter
    * the banded join at all: a million copies of one image contribute ONE
    * row per band here, and fan back out only where the output itself is
    * pair-shaped. Recall is untouched: Hamming ≤ 3 between two DOCS is a
    * property of their hashes, and the pigeonhole argument applies to the
    * distinct-hash pair verbatim. Output: `(h_a, h_b, hamming)`,
    * h_a < h_b, hamming in 1..PhashMaxHamming.
    */
  private def phashHashPairs(spark: SparkSession, dir: String): DataFrame =
    SessionMemo.getOrElseUpdate("mm_hashpairs", spark, dir) {
      bandedHashPairs(phashed(spark, dir))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  /** The banding core on an arbitrary `(…, dhash)` frame — shared with
    * ScaleProbe so the probe can never silently measure a different
    * algorithm than the funnel ships (band count, band width, and the
    * Hamming threshold live HERE only).
    */
  private[graft] def bandedHashPairs(hashed: DataFrame): DataFrame = {
    val distinctH = hashed.select("dhash").distinct()
    val banded = distinctH.select(
      col("dhash"),
      explode(array((0 until 4).map { b =>
        struct(
          lit(b).as("band"),
          shiftright(col("dhash"), 14 * b).bitwiseAND(lit(0x3fffL)).as("v"))
      }: _*)).as("bv"))
    val ha = banded.select(col("dhash").as("h_a"), col("bv"))
    val hb = banded.select(col("dhash").as("h_b"), col("bv"))
    ha.join(hb, Seq("bv"))
      .filter(col("h_a") < col("h_b"))
      .dropDuplicates("h_a", "h_b")
      .withColumn("hamming", expr("bit_count(h_a ^ h_b)").cast("long"))
      .filter(col("hamming") <= PhashMaxHamming)
      .select("h_a", "h_b", "hamming")
  }

  /** The doc-pair fan-out over qualified hash pairs (exact-equal pairs at
    * Hamming 0 + cross-hash group products) — [[mmPhash]]'s body, shared
    * with ScaleProbe.
    */
  private[graft] def phashPairFanout(hashed: DataFrame, hashPairs: DataFrame): DataFrame = {
    val h = hashed.select("doc_id", "dhash")
    val exact = h
      .select(col("doc_id").as("a_id"), col("dhash"))
      .join(h.select(col("doc_id").as("b_id"), col("dhash")), Seq("dhash"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), lit(0L).as("hamming"))
    val cross = hashPairs
      .join(h.select(col("doc_id").as("ia"), col("dhash").as("h_a")), Seq("h_a"))
      .join(h.select(col("doc_id").as("ib"), col("dhash").as("h_b")), Seq("h_b"))
      .select(
        least(col("ia"), col("ib")).as("a_id"),
        greatest(col("ia"), col("ib")).as("b_id"),
        col("hamming"))
    exact.unionByName(cross)
  }

  /** The reduced CC edge set (exact-group stars + one representative edge
    * per qualifying hash pair) — [[mmDedup]]'s clustering input, shared
    * with ScaleProbe. Connectivity provably equals the pair graph's.
    */
  private[graft] def phashDedupEdges(hashed: DataFrame, hashPairs: DataFrame): DataFrame = {
    val groups = hashed.groupBy("dhash").agg(min(col("doc_id")).as("rep"))
    val stars = hashed
      .join(groups, Seq("dhash"))
      .filter(col("doc_id") =!= col("rep"))
      .select(col("rep").as("a_id"), col("doc_id").as("b_id"))
    val repEdges = hashPairs
      .join(groups.select(col("dhash").as("h_a"), col("rep").as("ra")), Seq("h_a"))
      .join(groups.select(col("dhash").as("h_b"), col("rep").as("rb")), Seq("h_b"))
      .select(col("ra").as("a_id"), col("rb").as("b_id"))
    stars.unionByName(repEdges)
  }

  def mmPhash(spark: SparkSession, dir: String): DataFrame =
    // Exact-equal images pair at Hamming 0 via one equi self-join on the
    // hash; cross-hash near-dups qualify at the HASH level first and fan
    // group membership back out — both output-proportional (these ARE
    // the true duplicates). Each doc pair appears exactly once.
    phashPairFanout(phashed(spark, dir), phashHashPairs(spark, dir))
      .select("a_id", "b_id", "hamming")
      .orderBy("a_id", "b_id")

  // The oracle replays decode + resample + gradient in closed form
  // (g(x,y) = pixel(doc, x*w//8, y*h//8)) and brute-forces the pair join
  // — candidate-generation recall is part of what the hash match proves.
  val mmPhashSql: String =
    s"""WITH $dimsCte,
      g AS (SELECT d.doc_id, x.i AS i, y.j AS j,
          ((((x.i * d.w) // 8) * 31 + ((y.j * d.h) // 8) * 17 + d.doc_id * 7) % 256) AS g0,
          (((((x.i + 1) * d.w) // 8) * 31 + ((y.j * d.h) // 8) * 17 + d.doc_id * 7) % 256) AS g1
        FROM d, range(0, 7) x(i), range(0, 8) y(j)),
      hs AS (SELECT doc_id,
          sum(CASE WHEN g1 > g0 THEN (1::BIGINT << (j * 7 + i)) ELSE 0 END)::BIGINT AS dh
        FROM g GROUP BY doc_id)
      SELECT * FROM (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
          bit_count(xor(a.dh, b.dh))::BIGINT AS hamming
        FROM hs a JOIN hs b ON a.doc_id < b.doc_id)
      WHERE hamming <= $PhashMaxHamming ORDER BY a_id, b_id"""

  // ---- image dedup funnel: pairs → clusters → keep-largest ----------------

  /** The full image-dedup decision a crawl pipeline ships: the banded
    * dHash near-dup pairs ([[mmPhash]]) are clustered by distributed
    * connected components, every image (pair-free singletons included)
    * gets a cluster id, and each cluster keeps its LARGEST-resolution
    * member (pixel count from the REAL decode, ties to the lower doc_id)
    * — dd_keepbest's argmax-by-struct election applied to the multimodal
    * family, so the shuffle carries one slim candidate row per
    * (partition, cluster), never a payload. The oracle replays hash,
    * brute pairs, a recursive reachability closure, and the same
    * election.
    *
    * Scale shape (round 7): ONE decode pass total — `px` comes from the
    * same memoized [[phashed]] frame the fingerprints come from — and the
    * CC input is a REDUCED edge set with identical connectivity: a star
    * per exact-hash group (member → group-min) plus one representative
    * edge per qualifying cross-hash pair. The original pair graph connects
    * every member of group(h₁) to every member of group(h₂), so collapsing
    * each group to its star and each group-pair to one rep-rep edge
    * preserves components exactly while cutting the edge count from
    * Σ C(gᵢ,2) (quadratic on hot hashes) to |docs in dup groups| +
    * |qualifying hash pairs| (linear). Property-locked against the pair
    * graph in MmFunnelSpec.
    */
  def mmDedup(spark: SparkSession, dir: String): DataFrame = {
    val hashed = phashed(spark, dir)
    val comps = graft.operators.ConnectedComponents
      .run(phashDedupEdges(hashed, phashHashPairs(spark, dir)), "a_id", "b_id")
    hashed
      .select(col("doc_id"), col("px"))
      .join(comps.select(col("node").as("doc_id"), col("comp")), Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("comp"), col("doc_id")))
      .groupBy("cluster_id")
      .agg(
        count(lit(1)).as("n_members"),
        max(struct(col("px"), (-col("doc_id")).as("nid"))).as("m"))
      .select(
        col("cluster_id"),
        col("n_members"),
        (-col("m.nid")).as("keep_id"),
        col("m.px").as("keep_px"))
      .orderBy("cluster_id")
  }

  val mmDedupSql: String =
    s"""WITH RECURSIVE $dimsCte,
      g AS (SELECT d.doc_id, x.i AS i, y.j AS j,
          ((((x.i * d.w) // 8) * 31 + ((y.j * d.h) // 8) * 17 + d.doc_id * 7) % 256) AS g0,
          (((((x.i + 1) * d.w) // 8) * 31 + ((y.j * d.h) // 8) * 17 + d.doc_id * 7) % 256) AS g1
        FROM d, range(0, 7) x(i), range(0, 8) y(j)),
      hs AS (SELECT doc_id,
          sum(CASE WHEN g1 > g0 THEN (1::BIGINT << (j * 7 + i)) ELSE 0 END)::BIGINT AS dh
        FROM g GROUP BY doc_id),
      pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
        FROM hs a JOIN hs b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.dh, b.dh)) <= $PhashMaxHamming),
      e AS (SELECT a_id AS s, b_id AS t FROM pairs UNION SELECT b_id, a_id FROM pairs),
      reach(s, t) AS (
        SELECT s, s FROM (SELECT DISTINCT s FROM e)
        UNION
        SELECT r.s, e.t FROM reach r JOIN e ON r.t = e.s),
      comp AS (SELECT s AS doc_id, min(t) AS comp FROM reach GROUP BY s),
      assign AS (SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS cluster_id,
          d.w * d.h AS px
        FROM d LEFT JOIN comp c USING (doc_id)),
      ranked AS (SELECT cluster_id, doc_id, px,
          row_number() OVER (PARTITION BY cluster_id ORDER BY px DESC, doc_id) AS rn
        FROM assign)
      SELECT a.cluster_id, count(*)::BIGINT AS n_members,
        max(r.doc_id)::BIGINT AS keep_id, max(r.px)::BIGINT AS keep_px
      FROM assign a JOIN ranked r ON a.cluster_id = r.cluster_id AND r.rn = 1
      GROUP BY a.cluster_id ORDER BY a.cluster_id"""

  // ---- energy-contour audio near-dup ---------------------------------------
  // Audio dedup the way a crawl pipeline fingerprints clips
  // ([[graft.operators.Multimodal.audioFingerprints]] — REAL WAV
  // encode → javax.sound decode, 25 frame energies, sign-of-delta bits →
  // a 24-bit contour), then banded LSH: 3 × 8-bit bands, join on any
  // equal band, verify exact Hamming ≤ 2. Pigeonhole recall-complete (2
  // differing bits touch ≤ 2 of 3 bands), so the brute-force oracle
  // matches exactly. Audio payloads never cross a shuffle — the
  // self-join ships (id, long) rows only.

  private val AfpFrames = 25 // 24 delta bits -> 3 x 8-bit bands
  private val AfpMaxHamming = 2

  def mmAudiofp(spark: SparkSession, dir: String): DataFrame = {
    val fps = graft.Caches.track(
      Multimodal
        .audioFingerprints(Tables.t(spark, dir, "documents"), "doc_id", "text", AfpFrames)
        .toDF()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val banded = fps.select(
      col("doc_id"),
      col("fp"),
      explode(array((0 until 3).map { b =>
        struct(
          lit(b).as("band"),
          shiftright(col("fp"), 8 * b).bitwiseAND(lit(0xffL)).as("v"))
      }: _*)).as("bv"))
    val a = banded.select(col("doc_id").as("a_id"), col("fp").as("a_h"), col("bv"))
    val b = banded.select(col("doc_id").as("b_id"), col("fp").as("b_h"), col("bv"))
    val cand = a
      .join(b, Seq("bv"))
      .filter(col("a_id") =!= col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .withColumn("hamming", expr("bit_count(a_h ^ b_h)").cast("long"))
    val stats = cand
      .groupBy(col("a_id").as("doc_id"))
      .agg(
        count(lit(1)).as("n_cand"),
        sum(when(col("hamming") <= AfpMaxHamming, 1L).otherwise(0L)).as("n_dup"))
    fps
      .select(col("doc_id"), col("fp"))
      .join(stats, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_cand", "n_dup"))
      .orderBy("doc_id")
  }

  // The oracle replays the synthesized PCM closed form (sample k =
  // ((k*31 + id*7) mod 20001) - 10000), frame energies, and delta bits,
  // then brute-forces both the banded candidate count and the Hamming
  // verification — candidate-generation recall AND volume are under the
  // hash gate.
  val mmAudiofpSql: String =
    s"""WITH d AS (SELECT doc_id,
          (64 + (octet_length(encode(text)) * 13 + doc_id * 7) % 937)::BIGINT AS n
        FROM documents),
      fl AS (SELECT doc_id, n, n // $AfpFrames AS flen FROM d),
      fe AS (SELECT f.doc_id, x.k // f.flen AS frame,
          sum(abs((x.k * 31 + f.doc_id * 7) % 20001 - 10000))::BIGINT AS e
        FROM fl f, range(0, 1000) x(k) WHERE x.k < f.flen * $AfpFrames
        GROUP BY f.doc_id, x.k // f.flen),
      fp AS (SELECT a.doc_id,
          sum(CASE WHEN a.e > b.e THEN (1::BIGINT << a.frame) ELSE 0::BIGINT END)::BIGINT AS fp
        FROM fe a JOIN fe b ON b.doc_id = a.doc_id AND b.frame = a.frame + 1
        GROUP BY a.doc_id),
      cand AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
          bit_count(xor(a.fp, b.fp))::BIGINT AS hamming
        FROM fp a JOIN fp b ON a.doc_id <> b.doc_id
        WHERE EXISTS (SELECT 1 FROM range(0, 3) t(bb)
          WHERE (a.fp >> (8 * bb)) & 255 = (b.fp >> (8 * bb)) & 255)),
      st AS (SELECT a_id AS doc_id, count(*)::BIGINT AS n_cand,
          (count(*) FILTER (WHERE hamming <= $AfpMaxHamming))::BIGINT AS n_dup
        FROM cand GROUP BY a_id)
      SELECT fp.doc_id, fp.fp,
        coalesce(st.n_cand, 0)::BIGINT AS n_cand,
        coalesce(st.n_dup, 0)::BIGINT AS n_dup
      FROM fp LEFT JOIN st USING (doc_id) ORDER BY fp.doc_id"""

  /** Audio dedup funnel — [[mmDedup]]'s decision applied to clips:
    * EXACT-contour duplicate pairs are clustered by distributed connected
    * components and each cluster keeps its LONGEST member (sample count
    * from the REAL `javax.sound` decode, ties to the lower doc_id).
    * Exactness is deliberate and load-bearing: clustering is a
    * TRANSITIVE closure, and closing over a Hamming tolerance chains
    * near-misses end-to-end until the corpus collapses (measured here:
    * tolerance 1 on the 24-bit contour merges all 500 clips into ONE
    * cluster; equality yields 48 honest clusters). The tolerant
    * comparison belongs at the PAIR level, where [[mmAudiofp]] audits it
    * — a funnel that deletes data must cluster on an equivalence
    * relation. Equality also upgrades the plan: one hash join on the
    * fingerprint key, no banding needed. The oracle replays the
    * closed-form contour, the equality pairs, a recursive closure, and
    * the same election.
    *
    * Second payoff of exactness: under an equivalence relation the
    * clusters ARE the hash groups, so no pair set is ever enumerated —
    * one groupBy on the fingerprint replaces a self-join whose output is
    * sum-of-C(g,2) over group sizes (quadratic on a hot fingerprint;
    * measured 11,435 pairs for these 500 clips, and group-proportional
    * squares at any inflation). Image dedup genuinely needs pairs+CC
    * because Hamming-3 is NOT transitive; equality dedup never does.
    */
  def mmAudiodedup(spark: SparkSession, dir: String): DataFrame = {
    // ONE decode pass: [[Multimodal.audioFingerprints]] already returns
    // the sample count alongside the contour (both come from the same
    // decoded stream) — round 6 ran a SECOND full synthesize+decode and a
    // join just to recover n_samples, doubling the dominant per-row cost.
    val fps = Multimodal
      .audioFingerprints(Tables.t(spark, dir, "documents"), "doc_id", "text", AfpFrames)
      .toDF()
      .select(col("doc_id"), col("fp"), col("n_samples"))
    fps
      .groupBy("fp")
      .agg(
        min(col("doc_id")).as("cluster_id"),
        count(lit(1)).as("n_members"),
        max(struct(col("n_samples"), (-col("doc_id")).as("nid"))).as("m"))
      .select(
        col("cluster_id"),
        col("n_members"),
        (-col("m.nid")).as("keep_id"),
        col("m.n_samples").as("keep_samples"))
      .orderBy("cluster_id")
  }

  val mmAudiodedupSql: String =
    s"""WITH d AS (SELECT doc_id,
          (64 + (octet_length(encode(text)) * 13 + doc_id * 7) % 937)::BIGINT AS n
        FROM documents),
      fl AS (SELECT doc_id, n, n // $AfpFrames AS flen FROM d),
      fe AS (SELECT f.doc_id, x.k // f.flen AS frame,
          sum(abs((x.k * 31 + f.doc_id * 7) % 20001 - 10000))::BIGINT AS e
        FROM fl f, range(0, 1000) x(k) WHERE x.k < f.flen * $AfpFrames
        GROUP BY f.doc_id, x.k // f.flen),
      fp AS (SELECT a.doc_id,
          sum(CASE WHEN a.e > b.e THEN (1::BIGINT << a.frame) ELSE 0::BIGINT END)::BIGINT AS fp
        FROM fe a JOIN fe b ON b.doc_id = a.doc_id AND b.frame = a.frame + 1
        GROUP BY a.doc_id),
      j AS (SELECT fp.doc_id, fp.fp, d.n FROM fp JOIN d USING (doc_id)),
      ranked AS (SELECT fp, doc_id, n,
          row_number() OVER (PARTITION BY fp ORDER BY n DESC, doc_id) AS rn
        FROM j)
      SELECT min(j.doc_id)::BIGINT AS cluster_id, count(*)::BIGINT AS n_members,
        max(r.doc_id)::BIGINT AS keep_id, max(r.n)::BIGINT AS keep_samples
      FROM j JOIN ranked r ON j.fp = r.fp AND r.rn = 1
      GROUP BY j.fp ORDER BY cluster_id"""

  /** File-based multimodal ingestion roundtrip: synthesize real BMPs for
    * docs 0-99, export them as individual files executor-side
    * ([[graft.sources.BinaryFiles.export]]), scan the directory back with
    * Spark's `binaryFile` source, parse ids from paths, and REAL-decode
    * the scanned bytes. The oracle recomputes file size and decoded dims
    * from the closed forms — so the whole encode → file → scan → decode
    * chain sits under the hash gate.
    */
  def mmIngest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = SessionMemo.tmpDir(spark, "mm_ingest")
    val imgs = Multimodal
      .synthesizeImages(
        Tables.t(spark, dir, "documents").filter(col("doc_id") < 100),
        "doc_id",
        "text")
      .toDF()
      .select(col("doc_id"), col("payload"))
    graft.sources.BinaryFiles.export(imgs, out, ".bmp")
    val scanned = graft.sources.BinaryFiles
      .ingest(spark, out, "*.bmp")
      .select(
        regexp_extract(col("path"), "(\\d+)\\.bmp$", 1).cast("long").as("doc_id"),
        col("content").as("payload"))
      .as[graft.operators.IngestedImage]
    Multimodal.decodeIngested(scanned).toDF().orderBy("doc_id")
  }

  val mmIngestSql: String =
    s"""WITH $dimsCte
      SELECT doc_id, (54 + ((3 * w + 3) // 4) * 4 * h)::BIGINT AS n_bytes,
        w::BIGINT AS width, h::BIGINT AS height
      FROM d WHERE doc_id < 100 ORDER BY doc_id"""

  private val NShards = 8L
  private val TarBlock = 512L

  /** Deterministic WebDataset-style shard manifest: every record is
    * hash-assigned to a shard, ordered within its shard by an independent
    * hash, and given its byte offset in the shard's tar stream (tar
    * framing: one 512-byte header per entry, payload rounded up to the
    * 512-byte block) — the index a multimodal training loader seeks with.
    *
    * Scale shape: shard assignment and entry sizing are map-side
    * expressions; the only shuffle is the per-shard window, whose
    * partitions are BOUNDED — a production shard targets a fixed byte
    * budget, so shard COUNT grows with the corpus while shard size stays
    * constant (here the count is pinned to 8 for the fixed test corpus).
    * The manifest never carries payload bytes, only ids and sizes.
    */
  def mmShard(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard_id")
      .orderBy("k", "doc_id")
    Tables
      .t(spark, dir, "documents")
      .select(
        col("doc_id"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        pmod(
          graft.functions.Hashing
            .md5Long60(concat(lit("shard|"), col("doc_id").cast("string"))),
          lit(NShards)).as("shard_id"),
        graft.functions.Hashing
          .md5Long60(concat(lit("pos|"), col("doc_id").cast("string")))
          .as("k"))
      .withColumn(
        "entry_bytes",
        lit(TarBlock) + expr(s"((n_bytes + ${TarBlock - 1}) div $TarBlock) * $TarBlock"))
      .withColumn("seq", row_number().over(w).cast("long"))
      .withColumn(
        "offset",
        coalesce(
          sum(col("entry_bytes")).over(
            w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("shard_id", "seq", "doc_id", "n_bytes", "entry_bytes", "offset")
      .orderBy("shard_id", "seq")
  }

  val mmShardSql: String =
    s"""SELECT shard_id, seq, doc_id, n_bytes, entry_bytes,
        coalesce(sum(entry_bytes) OVER (PARTITION BY shard_id ORDER BY k, doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS "offset"
      FROM (
        SELECT shard_id, doc_id, n_bytes, k,
          ($TarBlock + ((n_bytes + ${TarBlock - 1}) // $TarBlock) * $TarBlock)::BIGINT AS entry_bytes,
          row_number() OVER (PARTITION BY shard_id ORDER BY k, doc_id)::BIGINT AS seq
        FROM (
          SELECT doc_id, octet_length(encode(text))::BIGINT AS n_bytes,
            (${graft.functions.Hashing.sqlMd5Long60Duck("'shard|' || doc_id::VARCHAR")}) % $NShards AS shard_id,
            ${graft.functions.Hashing.sqlMd5Long60Duck("'pos|' || doc_id::VARCHAR")} AS k
          FROM documents))
      ORDER BY shard_id, seq"""

  /** REAL WebDataset-style shard round-trip: the same deterministic shard
    * assignment as `mm_shard`, but the archives are genuinely BUILT —
    * each shard's records are assembled executor-side into a POSIX-ustar
    * tar byte stream ([[graft.sources.TarShards]]), written as
    * `<shard_id>.tar` files, scanned back with the `binaryFile` source,
    * and STREAM-PARSED back into the entry manifest. Every output column
    * (seq from parse order, doc_id from the entry name, n_bytes from the
    * header's octal size field, offset from the 512-block walk) is read
    * out of the tar bytes, so the hash gate proves writer and reader
    * agree with the closed-form framing arithmetic end to end.
    *
    * Scale shape: one task assembles one shard (a bounded unit by
    * design — shard COUNT grows with the corpus, size does not), the
    * groupByKey shuffles each payload exactly once to its shard's task,
    * and the scan-back is a distributed file scan. No driver hop.
    */
  def mmTar(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = SessionMemo.tmpDir(spark, "mm_tar")
    val shards = Tables
      .t(spark, dir, "documents")
      .select(
        pmod(
          graft.functions.Hashing
            .md5Long60(concat(lit("shard|"), col("doc_id").cast("string"))),
          lit(NShards)).as("shard_id"),
        graft.functions.Hashing
          .md5Long60(concat(lit("pos|"), col("doc_id").cast("string")))
          .as("k"),
        col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Long, Long, Array[Byte])]
      .groupByKey(_._1)
      .mapGroups { (sid, it) =>
        val entries = it.toSeq
          .sortBy { case (_, k, id, _) => (k, id) }
          .map { case (_, _, id, bytes) => (s"$id.txt", bytes) }
        (sid, graft.sources.TarShards.shardBytes(entries))
      }
      .toDF("shard_id", "tar")
    graft.sources.BinaryFiles.export(shards, out, ".tar")
    val parsed = graft.sources.BinaryFiles
      .ingest(spark, out, "*.tar")
      .select(
        regexp_extract(col("path"), "(\\d+)\\.tar$", 1).cast("long").as("shard_id"),
        col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (sid, bytes) =>
        graft.sources.TarShards.parse(bytes).zipWithIndex.map {
          case ((name, size, off), i) =>
            (sid, (i + 1).toLong, name.stripSuffix(".txt").toLong, size, off)
        }
      }
      .toDF("shard_id", "seq", "doc_id", "n_bytes", "offset")
    parsed.orderBy("shard_id", "seq")
  }

  // The oracle replays assignment, within-shard order, and the 512-block
  // offset walk in closed form — matching proves the bytes on disk frame
  // exactly what the arithmetic says they should.
  val mmTarSql: String =
    s"""SELECT shard_id, seq, doc_id, n_bytes,
        coalesce(sum(entry_bytes) OVER (PARTITION BY shard_id ORDER BY k, doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS "offset"
      FROM (
        SELECT shard_id, doc_id, n_bytes, k,
          ($TarBlock + ((n_bytes + ${TarBlock - 1}) // $TarBlock) * $TarBlock)::BIGINT AS entry_bytes,
          row_number() OVER (PARTITION BY shard_id ORDER BY k, doc_id)::BIGINT AS seq
        FROM (
          SELECT doc_id, octet_length(encode(text))::BIGINT AS n_bytes,
            (${graft.functions.Hashing.sqlMd5Long60Duck("'shard|' || doc_id::VARCHAR")}) % $NShards AS shard_id,
            ${graft.functions.Hashing.sqlMd5Long60Duck("'pos|' || doc_id::VARCHAR")} AS k
          FROM documents))
      ORDER BY shard_id, seq"""

  /** Little-endian unsigned 32-bit field at byte offset `off` (0-based) of
    * a binary column — hex the 4-byte slice, swap to big-endian pairs,
    * one `conv`. All codegen'd string/binary builtins, no UDF.
    */
  private def leU32(bin: Column, off: Int): Column = {
    val hx = hex(substring(bin, off + 1, 4))
    conv(
      concat(substring(hx, 7, 2), substring(hx, 5, 2), substring(hx, 3, 2), substring(hx, 1, 2)),
      16,
      10).cast("long")
  }

  /** Metadata probe WITHOUT decode: parse the BMP container header fields
    * (magic, declared file size, pixel-data offset, width, height)
    * straight out of the binary payload's first 26 bytes — the way a
    * 100 TB multimodal scan reads dimensions for filtering/bucketing
    * without paying a full image decode per record (a ~1000× cheaper
    * map-only pass; the decode stays downstream, on the filtered
    * survivors). The oracle recomputes every header field from the
    * synthesis closed forms, so the byte-level parse is hash-gated
    * against what the real encoder wrote.
    */
  def mmMeta(spark: SparkSession, dir: String): DataFrame = {
    val imgs = Multimodal
      .synthesizeImages(Tables.t(spark, dir, "documents"), "doc_id", "text")
      .toDF()
    imgs
      .select(
        col("doc_id"),
        substring(col("payload"), 1, 2).cast("string").as("magic"),
        length(col("payload")).cast("long").as("n_bytes"),
        leU32(col("payload"), 2).as("hdr_file_size"),
        leU32(col("payload"), 10).as("data_offset"),
        leU32(col("payload"), 18).as("width"),
        leU32(col("payload"), 22).as("height"))
      .orderBy("doc_id")
  }

  val mmMetaSql: String =
    s"""WITH $dimsCte
      SELECT doc_id, 'BM' AS magic,
        (54 + ((3 * w + 3) // 4) * 4 * h)::BIGINT AS n_bytes,
        (54 + ((3 * w + 3) // 4) * 4 * h)::BIGINT AS hdr_file_size,
        54::BIGINT AS data_offset,
        w::BIGINT AS width, h::BIGINT AS height
      FROM d ORDER BY doc_id"""

  /** The training-resolution bucket menu: (id, ratio numerator/denominator,
    * label) — the SDXL-style aspect groups a vision-model loader packs
    * batches from.
    */
  private val AspectBuckets = Seq(
    (0, 1, 1, "1:1"),
    (1, 4, 3, "4:3"),
    (2, 3, 4, "3:4"),
    (3, 16, 9, "16:9"),
    (4, 9, 16, "9:16"),
    (5, 2, 1, "2:1"),
    (6, 1, 2, "1:2"))

  /** Aspect-ratio bucketing — the pass a vision training pipeline runs so
    * batches share a shape (resize-to-square destroys composition;
    * bucketed loaders pad/crop within the nearest ratio instead). Dims
    * come from the HEADER-ONLY parse ([[mmMeta]]'s 26-byte read — never a
    * decode), each image registers under all 7 candidate buckets and the
    * argmin keeps the nearest ratio (distance is one IEEE subtraction of
    * two correctly-rounded divisions — identical on both engines; ties
    * break on bucket id), and the letterbox pad cost is integer-exact
    * ceil-division arithmetic. Output per bucket: member count + total
    * pad pixels (the wasted compute the menu choice costs). Map-only
    * scoring, a 7-way bounded explode, one bucket-keyed aggregate.
    */
  def mmAspectbucket(spark: SparkSession, dir: String): DataFrame = {
    val bdf = spark.createDataFrame(AspectBuckets).toDF("bid", "bw", "bh", "label")
    val dims = Multimodal
      .synthesizeImages(Tables.t(spark, dir, "documents"), "doc_id", "text")
      .toDF()
      .select(
        col("doc_id"),
        leU32(col("payload"), 18).as("w"),
        leU32(col("payload"), 22).as("h"))
    val cand = dims
      .select(
        col("doc_id"),
        col("w"),
        col("h"),
        explode(array(AspectBuckets.map { case (bid, bw, bh, label) =>
          struct(lit(bid).as("bid"), lit(bw).as("bw"), lit(bh).as("bh"), lit(label).as("label"))
        }: _*)).as("b"))
      .select(col("doc_id"), col("w"), col("h"), col("b.bid"), col("b.bw"), col("b.bh"), col("b.label"))
      .withColumn(
        "dist",
        abs(col("w").cast("double") / col("h") - col("bw").cast("double") / col("bh")))
    val assigned = cand
      .groupBy("doc_id", "w", "h")
      .agg(min(struct(col("dist"), col("bid"), col("bw"), col("bh"), col("label"))).as("m"))
      .select(
        col("doc_id"),
        col("w"),
        col("h"),
        col("m.bid").as("bid"),
        col("m.bw").as("bw"),
        col("m.bh").as("bh"),
        col("m.label").as("label"))
      .withColumn(
        "pad_px",
        when(
          col("w") * col("bh") <= col("h") * col("bw"),
          expr("((h * bw + bh - 1) div bh) * h - w * h"))
          .otherwise(expr("w * ((w * bh + bw - 1) div bw) - w * h")))
    bdf
      .select(col("bid"), col("label"))
      .join(
        assigned.groupBy("bid", "label").agg(count(lit(1)).as("n"), sum(col("pad_px")).as("p")),
        Seq("bid", "label"),
        "left")
      .select(
        col("bid"),
        col("label"),
        coalesce(col("n"), lit(0L)).as("n_images"),
        coalesce(col("p"), lit(0L)).as("pad_px"))
      .orderBy("bid")
  }

  val mmAspectbucketSql: String = {
    val bValues = AspectBuckets
      .map { case (bid, bw, bh, label) => s"($bid, $bw, $bh, '$label')" }
      .mkString(", ")
    s"""WITH $dimsCte,
      b(bid, bw, bh, label) AS (VALUES $bValues),
      cand AS (SELECT d.doc_id, d.w, d.h, b.bid, b.bw, b.bh, b.label,
          abs(d.w::DOUBLE / d.h - b.bw::DOUBLE / b.bh) AS dist
        FROM d, b),
      a AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY dist, bid) AS rn FROM cand),
      s AS (SELECT doc_id, bid, label,
          CASE WHEN w * bh <= h * bw THEN ((h * bw + bh - 1) // bh) * h - w * h
               ELSE w * ((w * bh + bw - 1) // bw) - w * h END AS pad_px
        FROM a WHERE rn = 1)
      SELECT b.bid, b.label, count(s.doc_id)::BIGINT AS n_images,
        coalesce(sum(s.pad_px), 0)::BIGINT AS pad_px
      FROM b LEFT JOIN s USING (bid, label)
      GROUP BY b.bid, b.label ORDER BY b.bid"""
  }

  /** Container-format sniffing — the FIRST gate of a multimodal ingest:
    * decide each blob's real format from its magic bytes (never from the
    * path or a declared column — upstream labels lie), route matches,
    * quarantine mismatches. The mixed table interleaves the REAL encoder
    * outputs (even ids → BMP, odd → WAV), and every 97th payload has its
    * first byte zeroed — deterministic corruption, so the `unknown`/
    * mismatch arm is exercised. Sniffing is a map-only prefix compare on
    * the binary column ('BM'; 'RIFF'+'WAVE' at offset 8); the oracle
    * replays the routing from the synthesis closed forms. At 100 TB this
    * pass reads 12 bytes per blob — the same header-only discipline as
    * [[mmMeta]].
    */
  def mmSniff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.t(spark, dir, "documents")
    val imgs = Multimodal
      .synthesizeImages(docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
      .toDF()
      .select(col("doc_id"), lit("bmp").as("declared"), col("payload"))
    val wavs = Multimodal
      .synthesizeAudio(docs.filter(col("doc_id") % 2 =!= 0), "doc_id", "text")
      .toDF()
      .select(col("doc_id"), lit("wav").as("declared"), col("payload"))
    val mixed = imgs
      .union(wavs)
      .withColumn(
        "payload",
        when(
          col("doc_id") % 97 === 0,
          concat(lit(Array[Byte](0)), expr("substring(payload, 2)")))
          .otherwise(col("payload")))
    mixed
      .select(
        col("doc_id"),
        col("declared"),
        when(substring(col("payload"), 1, 2).cast("string") === "BM", "bmp")
          .when(
            substring(col("payload"), 1, 4).cast("string") === "RIFF" &&
              substring(col("payload"), 9, 4).cast("string") === "WAVE",
            "wav")
          .otherwise("unknown")
          .as("sniffed"),
        length(col("payload")).cast("long").as("n_bytes"))
      .withColumn("ok", col("declared") === col("sniffed"))
      .orderBy("doc_id")
  }

  val mmSniffSql: String =
    s"""WITH $dimsCte,
      a AS (SELECT d.doc_id,
          CASE WHEN d.doc_id % 2 = 0 THEN 'bmp' ELSE 'wav' END AS declared,
          CASE WHEN d.doc_id % 2 = 0 THEN (54 + ((3 * d.w + 3) // 4) * 4 * d.h)::BIGINT
               ELSE (44 + 2 * (64 + (octet_length(encode(doc.text)) * 13 + d.doc_id * 7) % 937))::BIGINT
          END AS n_bytes
        FROM d JOIN documents doc USING (doc_id))
      SELECT doc_id, declared,
        CASE WHEN doc_id % 97 = 0 THEN 'unknown' ELSE declared END AS sniffed,
        n_bytes,
        doc_id % 97 <> 0 AS ok
      FROM a ORDER BY doc_id"""

  /** JDBC sink → source round-trip against the bundled embedded Derby:
    * write the supplier table through Spark's JDBC writer (overwrite =
    * drop + recreate), read it back as a PARTITIONED JDBC scan — four
    * range slices on s_suppkey, each its own connection, the parallel
    * ingestion shape a real warehouse extract uses — with the balance
    * predicate pushed into the remote query, then aggregate per nation.
    * The oracle recomputes from the source parquet, so type fidelity
    * (BIGINT/VARCHAR/DOUBLE) and the filter's remote evaluation are both
    * under the hash gate. Derby is in-JVM; on a cluster the same code
    * hits any JDBC warehouse — the partitioned-read contract is
    * identical.
    */
  def q87Jdbc(spark: SparkSession, dir: String): DataFrame = {
    val url = s"jdbc:derby:${SessionMemo.tmpDir(spark, "q87_derby")};create=true"
    val table = "SUPPLIER_RT"
    Tables
      .t(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey").cast("long").as("s_nationkey"),
        col("s_acctbal"))
      .write
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
      .mode("overwrite")
      .save()
    val bounds = Tables.t(spark, dir, "supplier")
      .agg(min("s_suppkey"), max("s_suppkey")).collect()(0)
    spark.read
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
      .option("partitionColumn", "s_suppkey")
      .option("lowerBound", bounds.getLong(0))
      .option("upperBound", bounds.getLong(1) + 1)
      .option("numPartitions", 4)
      .load()
      .filter(col("s_acctbal") > 1000.0)
      .groupBy("s_nationkey")
      .agg(
        count(lit(1)).as("n"),
        sum(col("s_acctbal").cast("decimal(18,2)")).cast("double").as("bal"))
      .orderBy("s_nationkey")
  }

  val q87JdbcSql: String =
    """SELECT s_nationkey::BIGINT AS s_nationkey, count(*) AS n,
      sum(CAST(s_acctbal AS DECIMAL(18,2)))::DOUBLE AS bal
      FROM supplier WHERE s_acctbal > 1000.0
      GROUP BY 1 ORDER BY 1"""

  /** ViT patch side — 8 px, so the 8–64 px synthesized images yield 1 to
    * 64 full patches each.
    */
  private val PatchP = 8

  /** ViT-style patchification under the gate ([[Multimodal.patchify]]):
    * real BMP decode, `8×8` patch grid with edge cropping, one row per
    * patch with its decoded-pixel sum. The oracle replays the grid
    * geometry AND every patch's pixel sum from the closed-form pixel
    * function via a range-join enumeration — so the comparison verifies
    * the decoded raster patch-by-patch, not just counts.
    */
  def mmPatchify(spark: SparkSession, dir: String): DataFrame =
    Multimodal
      .patchify(
        Multimodal.synthesizeImages(Tables.t(spark, dir, "documents"), "doc_id", "text"),
        PatchP)
      .toDF()
      .orderBy("doc_id", "patch_row", "patch_col")

  val mmPatchifySql: String =
    s"""WITH $dimsCte,
      p AS (SELECT d.doc_id, pr.j AS patch_row, pc.i AS patch_col,
          sum(((pc.i * $PatchP + u.x) * 31 + (pr.j * $PatchP + v.y) * 17 + d.doc_id * 7) % 256)::BIGINT AS patch_sum
        FROM d, range(0, 8) pr(j), range(0, 8) pc(i),
          range(0, $PatchP) u(x), range(0, $PatchP) v(y)
        WHERE pc.i < d.w // $PatchP AND pr.j < d.h // $PatchP
        GROUP BY 1, 2, 3)
      SELECT doc_id, patch_row::BIGINT AS patch_row, patch_col::BIGINT AS patch_col, patch_sum
      FROM p ORDER BY doc_id, patch_row, patch_col"""

  /** Horizontal-flip augmentation under the gate
    * ([[Multimodal.flipHorizontal]]): decode → materialize the flipped
    * raster → position-weighted checksum. The oracle recomputes the
    * checksum of the MIRRORED closed-form pixel field (`px(w-1-x, y)`
    * weighted at position `(x, y)`), so a flip that dropped or merely
    * copied columns cannot pass.
    */
  def mmAugment(spark: SparkSession, dir: String): DataFrame =
    Multimodal
      .flipHorizontal(
        Multimodal.synthesizeImages(Tables.t(spark, dir, "documents"), "doc_id", "text"))
      .toDF()
      .orderBy("doc_id")

  val mmAugmentSql: String =
    s"""WITH $dimsCte,
      px AS (SELECT d.doc_id,
          sum((((d.w - 1 - x.i) * 31 + y.j * 17 + d.doc_id * 7) % 256) * (y.j * d.w + x.i + 1))::BIGINT AS cks
        FROM d, range(0, 64) x(i), range(0, 64) y(j)
        WHERE x.i < d.w AND y.j < d.h
        GROUP BY d.doc_id)
      SELECT d.doc_id, d.w AS width, d.h AS height, px.cks AS flip_checksum
      FROM d JOIN px USING (doc_id) ORDER BY doc_id"""

  /** CLIP-score gate threshold: the synthetic pair cosines span
    * ~0.52–0.79, so 0.65 (≈ the median) drops the misaligned tail the way
    * a LAION-style filter drops low-scoring image–text pairs.
    */
  private[graft] val ClipThreshold = 0.65
  private val ClipDim = 64

  /** The CLIP-score expression over an id column and a `DOUBLE[]`
    * embedding column — ONE definition shared by the batch filter and the
    * streaming twin ([[graft.streaming.StreamingQueries.stClipfilter]]),
    * so the two paths cannot drift. zip_with/slice shapes only —
    * element_at inside a lambda on a projected array column re-evaluates
    * the defining expression per element after projection collapse (the
    * tokenizer-per-bigram trap).
    */
  private[graft] def clipScore(id: Column, v: Column): Column = {
    val rolled = concat(slice(v, 2, ClipDim - 1), slice(v, 1, 1))
    val pert = transform(
      sequence(lit(0), lit(ClipDim - 1)),
      i => lit(0.05) * ((id + i) % 7 - 3))
    val img = zip_with(
      zip_with(v, rolled, (a, b) => lit(0.75) * a + lit(0.25) * b),
      pert,
      (m, p) => m + p)
    def dot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, e) => acc + e)
    dot(v, img) / (sqrt(dot(v, v)) * sqrt(dot(img, img)))
  }

  /** The img + clip_score CTEs over an input relation exposing
    * `(doc_id, v DOUBLE[], <carry>)` — the SQL mirror of [[clipScore]],
    * shared by both oracles.
    */
  private[graft] def clipScoreCtes(src: String, carry: String): String =
    s"""p AS (SELECT $carry, v,
          list_transform(range(0, $ClipDim),
            i -> 0.75 * v[i + 1] + 0.25 * v[((i + 1) % $ClipDim) + 1]
                 + 0.05 * ((doc_id + i) % 7 - 3)) AS img
        FROM $src),
      c AS (SELECT $carry,
          list_reduce(list_prepend(0.0, list_transform(range(1, ${ClipDim + 1}), i -> v[i] * img[i])), (x, y) -> x + y)
            / (sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, ${ClipDim + 1}), i -> v[i] * v[i])), (x, y) -> x + y))
               * sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, ${ClipDim + 1}), i -> img[i] * img[i])), (x, y) -> x + y))) AS clip_score
        FROM p)"""

  /** CLIP-score image–text pair filtering — the alignment gate a
    * multimodal training pipeline runs over (image, caption) pairs
    * (LAION's `clip_score >= t` keep rule): per pair, the cosine between
    * the caption embedding and the image embedding decides keep/drop.
    * The caption side is the `embeddings` row keyed to the document; the
    * image side is a deterministic closed-form surrogate (a 0.75/0.25
    * self/rolled mix plus a small id-keyed perturbation — the real
    * encoder lives outside this container, but the JOIN/score/filter
    * plumbing is exactly what ships). Both folds run in index order, so
    * the cosine is the same IEEE double on both engines and the keep
    * flag is bit-stable.
    *
    * Scale: one equi-join on the pair key (both sides co-keyed by id —
    * co-partitioned silver tables in production) and a map-only scoring
    * pass; nothing here is corpus-quadratic, and dropped pairs never
    * leave the stage that scores them.
    */
  def mmClipfilter(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables
      .t(spark, dir, "embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding").cast("array<double>").as("v"))
    Tables
      .t(spark, dir, "documents")
      .select(col("doc_id"), col("source"))
      .join(emb, Seq("doc_id"))
      .select(
        col("doc_id"),
        col("source"),
        clipScore(col("doc_id"), col("v")).as("clip_score"))
      .select(
        col("doc_id"),
        col("source"),
        col("clip_score"),
        (col("clip_score") >= ClipThreshold).as("keep"))
      .orderBy("doc_id")
  }

  val mmClipfilterSql: String =
    s"""WITH e AS (SELECT vec_id AS doc_id, embedding::DOUBLE[] AS v FROM embeddings),
      j AS (SELECT d.doc_id, d.source, e.v FROM documents d JOIN e USING (doc_id)),
      ${clipScoreCtes("j", "doc_id, source")}
      SELECT doc_id, source, clip_score, clip_score >= $ClipThreshold AS keep
      FROM c ORDER BY doc_id"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_clipfilter" -> mmClipfilter _,
    "mm_aspectbucket" -> mmAspectbucket _,
    "mm_sniff" -> mmSniff _,
    "mm_augment" -> mmAugment _,
    "mm_patchify" -> mmPatchify _,
    "q87_jdbc" -> q87Jdbc _,
    "mm_meta" -> mmMeta _,
    "mm_ingest" -> mmIngest _,
    "mm_shard" -> mmShard _,
    "mm_tar" -> mmTar _,
    "am_parse" -> amParse _,
    "mm_features" -> mmFeatures _,
    "mm_lapvar" -> mmLapvar _,
    "mm_zcr" -> mmZcr _,
    "mm_frames" -> mmFrames _,
    "mm_scenecut" -> mmScenecut _,
    "mm_videodedup" -> mmVideodedup _,
    "mm_silence" -> mmSilence _,
    "mm_resize" -> mmResize _,
    "mm_phash" -> mmPhash _,
    "mm_dedup" -> mmDedup _,
    "mm_audiodedup" -> mmAudiodedup _,
    "mm_audio" -> mmAudio _,
    "mm_audiofp" -> mmAudiofp _)

  val oracles: Map[String, String] = Map(
    "mm_clipfilter" -> mmClipfilterSql,
    "mm_aspectbucket" -> mmAspectbucketSql,
    "mm_sniff" -> mmSniffSql,
    "mm_augment" -> mmAugmentSql,
    "mm_patchify" -> mmPatchifySql,
    "q87_jdbc" -> q87JdbcSql,
    "mm_meta" -> mmMetaSql,
    "mm_ingest" -> mmIngestSql,
    "mm_shard" -> mmShardSql,
    "mm_tar" -> mmTarSql,
    "am_parse" -> amParseSql,
    "mm_features" -> mmFeaturesSql,
    "mm_lapvar" -> mmLapvarSql,
    "mm_zcr" -> mmZcrSql,
    "mm_frames" -> mmFramesSql,
    "mm_scenecut" -> mmScenecutSql,
    "mm_videodedup" -> mmVideodedupSql,
    "mm_silence" -> mmSilenceSql,
    "mm_resize" -> mmResizeSql,
    "mm_phash" -> mmPhashSql,
    "mm_dedup" -> mmDedupSql,
    "mm_audiodedup" -> mmAudiodedupSql,
    "mm_audio" -> mmAudioSql,
    "mm_audiofp" -> mmAudiofpSql)
}
