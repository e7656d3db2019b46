package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One media payload: an opaque binary column plus its id. In a real corpus
  * `payload` holds image/audio/video bytes; the harness has no media files,
  * so the queries derive payloads from document content — raw UTF-8 bytes
  * for the frame-sampling path, REAL encoded BMP images (see
  * [[Multimodal.synthesizeImages]]) for the decode paths.
  */
case class MediaRecord(doc_id: Long, payload: Array[Byte])

/** A synthesized image: the source content digest plus real encoded BMP
  * bytes.
  */
case class ImageRecord(doc_id: Long, src_sha: String, payload: Array[Byte])

/** Features extracted by a REAL image decode ([[javax.imageio.ImageIO]]):
  * byte size, source digest, decoded dimensions, and a position-weighted
  * checksum over the decoded pixel values (proof the pixels round-tripped,
  * not just the header).
  */
case class ImageFeatures(
    doc_id: Long,
    n_bytes: Long,
    src_sha: String,
    width: Long,
    height: Long,
    px_checksum: Long)

/** A decoded-and-resized image: source dims, aspect-fit target dims, and
  * the checksum over the resampled pixels.
  */
case class ResizedImage(
    doc_id: Long,
    width: Long,
    height: Long,
    thumb_w: Long,
    thumb_h: Long,
    thumb_checksum: Long)

/** One sampled frame of a media payload. */
case class MediaFrame(doc_id: Long, frame_no: Long, offset: Long, frame_sha: String)

/** One synthesized video frame with its decoded mean-luminance proxy. */
case class VideoFrameLuma(doc_id: Long, frame: Long, luma: Long)

/** One ViT-style patch of a decoded image: grid position and the sum of
  * its decoded gray values (proof the patch pixels round-tripped).
  */
case class ImagePatch(doc_id: Long, patch_row: Long, patch_col: Long, patch_sum: Long)

/** A horizontally-flipped decoded image: dims plus the position-weighted
  * checksum of the FLIPPED raster.
  */
case class FlippedImage(doc_id: Long, width: Long, height: Long, flip_checksum: Long)

/** A payload as it comes back from a file scan (no side metadata). */
case class LapMoments(
    doc_id: Long,
    width: Long,
    height: Long,
    n_int: Long,
    s_lap: Long,
    q_lap: Long)

case class ZcrStats(
    doc_id: Long,
    n_samples: Long,
    n_frames: Long,
    zc_total: Long,
    zc_max: Long,
    zc_min: Long)

case class IngestedImage(doc_id: Long, payload: Array[Byte])

/** Decode result for an ingested file: size plus real decoded dims. */
case class IngestedDims(doc_id: Long, n_bytes: Long, width: Long, height: Long)

/** A synthesized audio clip: real encoded PCM WAV bytes. */
case class AudioRecord(doc_id: Long, payload: Array[Byte])

/** Features from a REAL audio decode ([[javax.sound.sampled.AudioSystem]]):
  * byte size, decoded format parameters, and a position-weighted checksum
  * over the decoded samples.
  */
case class AudioFeatures(
    doc_id: Long,
    n_bytes: Long,
    sample_rate: Long,
    n_samples: Long,
    s_checksum: Long)

/** Per-doc silence-segmentation stats from the decoded VAD fixture. */
case class AudioFp(doc_id: Long, n_samples: Long, fp: Long)

case class AudioVad(
    doc_id: Long,
    n_samples: Long,
    n_silent: Long,
    n_segments: Long,
    longest_run: Long)

/** Multimodal-column plumbing for a training-data pipeline: treat media as
  * opaque `binary` columns with typed metadata, and run decode /
  * feature-extraction partition-wise (the Scala analogue of `mapInPandas`
  * batches: one codec/model initialization per partition, then a streamed
  * map over its rows — no per-row setup, no driver involvement, scales as a
  * pure narrow transformation).
  *
  * The image paths use a REAL codec: payloads are genuine 24-bit BMP files
  * (encoded by [[Multimodal.encodeGrayBmp]]), decoded with the JDK's
  * `javax.imageio.ImageIO`, resized by nearest-neighbor resampling of the
  * DECODED pixels. The pixel values themselves are a deterministic function
  * of (doc_id, x, y), so the DuckDB oracle can recompute the decoded
  * dimensions and pixel checksums in closed form — any drift in encode,
  * decode, or resampling breaks the hash match.
  */
object Multimodal {

  /** Lift an (id, text) frame into the binary payload model (raw UTF-8
    * bytes — the frame-sampling input).
    */
  def toMedia(docs: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long").as("doc_id"), encode(col(textCol), "UTF-8").as("payload"))
      .as[MediaRecord]
  }

  /** Deterministic grayscale value of pixel (x, y) of doc `id` — the
    * closed form the DuckDB oracle replays: `(x*31 + y*17 + id*7) mod 256`.
    */
  @inline def pixel(id: Long, x: Int, y: Int): Int =
    math.floorMod(x * 31L + y * 17L + id * 7L, 256L).toInt

  /** Image width/height for a doc: `8 + (len*7 + id*13) mod 57` and
    * `8 + (len*11 + id*29) mod 57` (len = UTF-8 byte length of the text) —
    * 8..64 px, content-dependent, oracle-replayable.
    */
  @inline def dims(id: Long, textBytes: Int): (Int, Int) = (
    (8 + math.floorMod(textBytes * 7L + id * 13L, 57L)).toInt,
    (8 + math.floorMod(textBytes * 11L + id * 29L, 57L)).toInt)

  /** Encode a 24-bit uncompressed BMP (BITMAPINFOHEADER, bottom-up rows,
    * 4-byte row padding) with r = g = b = `px(x, y)` — a genuine image
    * file any decoder reads back.
    */
  def encodeGrayBmp(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
    val rowSize = ((3 * w + 3) / 4) * 4
    val dataSize = rowSize * h
    val fileSize = 54 + dataSize
    val buf = java.nio.ByteBuffer.allocate(fileSize).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(fileSize)
    buf.putInt(0) // reserved
    buf.putInt(54) // pixel-data offset
    buf.putInt(40) // BITMAPINFOHEADER size
    buf.putInt(w)
    buf.putInt(h) // positive height: bottom-up row order
    buf.putShort(1) // planes
    buf.putShort(24) // bits per pixel
    buf.putInt(0) // BI_RGB (uncompressed)
    buf.putInt(dataSize)
    buf.putInt(2835) // 72 dpi
    buf.putInt(2835)
    buf.putInt(0)
    buf.putInt(0)
    var fy = h - 1 // first stored row is the BOTTOM logical row
    while (fy >= 0) {
      var x = 0
      while (x < w) {
        val v = (px(x, fy) & 0xff).toByte
        buf.put(v).put(v).put(v) // B, G, R
        x += 1
      }
      var pad = 3 * w
      while (pad % 4 != 0) { buf.put(0.toByte); pad += 1 }
      fy -= 1
    }
    buf.array()
  }

  /** `ImageIO.read(InputStream)` defaults to a DISK-backed
    * `FileCacheImageInputStream` — one temp FILE per decode, created
    * under a synchronized factory. Serial that costs ~0.5 ms/image; at
    * 32 concurrent decode tasks the temp-file creation lock serializes
    * the whole family (measured r15: 9.6 ms/image, 18× the serial
    * per-image cost, right after the decode stages went parallel).
    * Payloads here are in-memory byte arrays, so the memory-cached
    * stream is strictly better; the flag is static JVM state, set once,
    * and changes no decoded byte.
    */
  private lazy val imageIoNoDiskCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** REAL `ImageIO` decode of an in-memory payload, via the
    * memory-cached stream path — every decode site must come through
    * here so none re-acquires the temp-file lock.
    */
  private def decodeImage(payload: Array[Byte]): java.awt.image.BufferedImage = {
    imageIoNoDiskCache
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
  }

  /** Synthesize one real BMP per doc (dimensions and pixels from the
    * closed forms above) plus the source-content sha256. Partition-wise:
    * the digest — standing where a real pipeline holds its codec state —
    * is initialized once per partition.
    */
  def synthesizeImages(docs: DataFrame, idCol: String, textCol: String): Dataset[ImageRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // Widened (r15): off the single-split harness scan, the synth/encode
    // (and every decode pass consumers stack inside these partitions) was
    // ONE task — measured 1.6–2.7 s serial CPU per mm_* query. No-op on
    // any frame already at session width.
    Lineage
      .widen(docs
        .select(col(idCol).cast("long").as("doc_id"), col(textCol).cast("string").as("text")))
      .as[(Long, String)]
      .mapPartitions { it =>
        val digest = MessageDigest.getInstance("SHA-256")
        it.map { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          digest.reset()
          val sha = digest.digest(bytes).map("%02x".format(_)).mkString
          val (w, h) = dims(id, bytes.length)
          ImageRecord(id, sha, encodeGrayBmp(w, h, (x, y) => pixel(id, x, y)))
        }
      }
  }

  /** Position-weighted checksum over an image's pixels (blue channel =
    * gray value): `sum(p(x,y) * (y*w + x + 1))` — sensitive to value AND
    * position, so a flipped row order or transposed axis breaks it.
    */
  private def pxChecksum(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    var cks = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        cks += (img.getRGB(x, y) & 0xff).toLong * (y.toLong * w + x + 1)
        x += 1
      }
      y += 1
    }
    cks
  }

  /** Partition-wise feature extraction: REAL `ImageIO` decode of each
    * payload — decoded width/height and the pixel checksum come from the
    * decoded raster, not from any side-channel metadata.
    */
  def decodeFeatures(images: Dataset[ImageRecord]): Dataset[ImageFeatures] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.mapPartitions { it =>
      it.map { r =>
        val img = decodeImage(r.payload)
        require(img != null, s"undecodable image payload for doc ${r.doc_id}")
        ImageFeatures(
          r.doc_id,
          r.payload.length.toLong,
          r.src_sha,
          img.getWidth.toLong,
          img.getHeight.toLong,
          pxChecksum(img))
      }
    }
  }

  /** Laplacian blur moments: REAL `ImageIO` decode, then the 4-neighbor
    * Laplacian `L(x,y) = 4·p − p(x−1,·) − p(x+1,·) − p(·,y−1) − p(·,y+1)`
    * over INTERIOR pixels, reduced to the exact integer moments
    * `(n, ΣL, ΣL²)` — the variance-of-Laplacian blur detector every
    * image-curation pipeline runs, kept float-free so the downstream
    * variance and blur gate are pure BIGINT arithmetic in any engine.
    * One `mapPartitions`; payloads never leave the executor — only
    * (id, dims, three longs) rows shuffle.
    */
  def laplacianMoments(images: Dataset[ImageRecord]): Dataset[LapMoments] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.mapPartitions { it =>
      it.map { r =>
        val img = decodeImage(r.payload)
        require(img != null, s"undecodable image payload for doc ${r.doc_id}")
        val w = img.getWidth
        val h = img.getHeight
        var n = 0L
        var s = 0L
        var q = 0L
        var y = 1
        while (y < h - 1) {
          var x = 1
          while (x < w - 1) {
            val l = 4L * (img.getRGB(x, y) & 0xff) -
              (img.getRGB(x - 1, y) & 0xff) - (img.getRGB(x + 1, y) & 0xff) -
              (img.getRGB(x, y - 1) & 0xff) - (img.getRGB(x, y + 1) & 0xff)
            n += 1
            s += l
            q += l * l
            x += 1
          }
          y += 1
        }
        LapMoments(r.doc_id, w.toLong, h.toLong, n, s, q)
      }
    }
  }

  /** Horizontal-flip augmentation: REAL decode, a genuinely materialized
    * flipped raster (not an index trick on the source), and the
    * position-weighted checksum of the flipped pixels — the checksum is
    * position-sensitive, so it verifies the flip actually moved every
    * column, not just that values survived. Augmentation stays
    * executor-side in one `mapPartitions`; only (id, dims, long) rows
    * shuffle.
    */
  def flipHorizontal(images: Dataset[ImageRecord]): Dataset[FlippedImage] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.mapPartitions { it =>
      it.map { r =>
        val img = decodeImage(r.payload)
        require(img != null, s"undecodable image payload for doc ${r.doc_id}")
        val (w, h) = (img.getWidth, img.getHeight)
        val flipped =
          new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            flipped.setRGB(x, y, img.getRGB(w - 1 - x, y))
            x += 1
          }
          y += 1
        }
        FlippedImage(r.doc_id, w.toLong, h.toLong, pxChecksum(flipped))
      }
    }
  }

  /** ViT-style patchification: REAL `ImageIO` decode, then the image is
    * cut into a `p`×`p` patch grid (partial edge patches cropped away,
    * as a ViT preprocessor does) and each patch emits its grid position
    * plus the sum of its decoded gray values. One input row fans out to
    * `(h/p)*(w/p)` small rows — the decode and the pixel loop stay
    * executor-side in one `mapPartitions` pass, so image bytes never
    * cross a shuffle; only (id, row, col, long) patch tuples do.
    */
  def patchify(images: Dataset[ImageRecord], p: Int): Dataset[ImagePatch] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.mapPartitions { it =>
      it.flatMap { r =>
        val img = decodeImage(r.payload)
        require(img != null, s"undecodable image payload for doc ${r.doc_id}")
        val (w, h) = (img.getWidth, img.getHeight)
        for {
          pr <- 0 until h / p
          pc <- 0 until w / p
        } yield {
          var s = 0L
          var y = pr * p
          while (y < (pr + 1) * p) {
            var x = pc * p
            while (x < (pc + 1) * p) {
              s += (img.getRGB(x, y) & 0xff).toLong
              x += 1
            }
            y += 1
          }
          ImagePatch(r.doc_id, pr.toLong, pc.toLong, s)
        }
      }
    }
  }

  /** Decode ingested file payloads (the `binaryFile`-scan shape: id +
    * bytes, no side metadata): real `ImageIO` decode, emitting byte size
    * and decoded dimensions. Partition-wise like the other decode paths.
    */
  def decodeIngested(files: Dataset[IngestedImage]): Dataset[IngestedDims] = {
    val spark = files.sparkSession
    import spark.implicits._
    files.mapPartitions { it =>
      it.map { r =>
        val img = decodeImage(r.payload)
        require(img != null, s"undecodable image payload for doc ${r.doc_id}")
        IngestedDims(r.doc_id, r.payload.length.toLong, img.getWidth.toLong, img.getHeight.toLong)
      }
    }
  }

  /** Decode + aspect-fit resize: integer bounding-box geometry
    * (`t = max(1, dim * maxDim / max(w, h))`, identity when the image
    * already fits), nearest-neighbor resampling of the DECODED pixels
    * (`src = (dst * srcDim) / dstDim`), and the checksum of the resampled
    * result. The per-pair integer arithmetic is exactly replayable in SQL.
    */
  def resizeImages(images: Dataset[ImageRecord], maxDim: Int): Dataset[ResizedImage] = {
    require(maxDim >= 1)
    val spark = images.sparkSession
    import spark.implicits._
    images.mapPartitions { it =>
      it.map { r =>
        val img = decodeImage(r.payload)
        require(img != null, s"undecodable image payload for doc ${r.doc_id}")
        val w = img.getWidth
        val h = img.getHeight
        val m = math.max(w, h)
        val (tw, th) =
          if (m <= maxDim) (w, h)
          else (math.max(1, w * maxDim / m), math.max(1, h * maxDim / m))
        var cks = 0L
        var y = 0
        while (y < th) {
          val sy = y * h / th
          var x = 0
          while (x < tw) {
            val sx = x * w / tw
            cks += (img.getRGB(sx, sy) & 0xff).toLong * (y.toLong * tw + x + 1)
            x += 1
          }
          y += 1
        }
        ResizedImage(r.doc_id, w.toLong, h.toLong, tw.toLong, th.toLong, cks)
      }
    }
  }

  /** Difference-hash (dHash) of a decoded image: nearest-neighbor
    * resample to 8x8 (`src = dst * srcDim / dstDim`, the [[resizeImages]]
    * convention), then one bit per horizontal gradient — bit (y*7+x) set
    * iff g(x+1,y) > g(x,y) — for x in 0..6, y in 0..7. 56 bits, so the
    * hash stays a positive BIGINT on both engines (no sign-bit overflow
    * in an exact-compare path). Partition-wise REAL `ImageIO` decode like
    * the other image paths: the hash comes from the decoded raster.
    *
    * Also emits `px` (decoded width × height): the dedup funnel's
    * keep-largest election needs the pixel count, and the dims are
    * already in hand from THIS decode — carrying the extra long is free,
    * while fetching it any other way costs a second full decode pass of
    * every payload (the round-6 scale flaw this column removes).
    */
  def dhash56(images: Dataset[ImageRecord]): DataFrame = {
    val spark = images.sparkSession
    import spark.implicits._
    images
      .mapPartitions { it =>
        it.map { r =>
          val img = decodeImage(r.payload)
          require(img != null, s"undecodable image payload for doc ${r.doc_id}")
          val w = img.getWidth
          val h = img.getHeight
          var hash = 0L
          var y = 0
          while (y < 8) {
            val sy = y * h / 8
            var x = 0
            while (x < 7) {
              val g0 = img.getRGB(x * w / 8, sy) & 0xff
              val g1 = img.getRGB((x + 1) * w / 8, sy) & 0xff
              if (g1 > g0) hash |= 1L << (y * 7 + x)
              x += 1
            }
            y += 1
          }
          (r.doc_id, hash, w.toLong * h)
        }
      }
      .toDF("doc_id", "dhash", "px")
  }

  /** Audio sample rate for the synthesized clips. */
  val SampleRate = 8000

  /** Clip length in samples for a doc: `64 + (len*13 + id*7) mod 937` —
    * 64..1000 samples, oracle-replayable.
    */
  @inline def audioSamples(id: Long, textBytes: Int): Int =
    (64 + math.floorMod(textBytes * 13L + id * 7L, 937L)).toInt

  /** Deterministic 16-bit sample k of doc `id`:
    * `((k*31 + id*7) mod 20001) - 10000` — the closed form the oracle
    * replays.
    */
  @inline def audioSample(id: Long, k: Int): Int =
    (math.floorMod(k * 31L + id * 7L, 20001L) - 10000L).toInt

  /** Encode a mono 16-bit little-endian PCM WAV (44-byte RIFF header) —
    * a genuine audio file any decoder reads back.
    */
  def encodePcmWav(nSamples: Int, sampleRate: Int, sample: Int => Int): Array[Byte] = {
    val dataSize = 2 * nSamples
    val buf = java.nio.ByteBuffer
      .allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
    buf.putInt(36 + dataSize)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII"))
    buf.putInt(16) // PCM fmt chunk size
    buf.putShort(1) // PCM
    buf.putShort(1) // mono
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * 2) // byte rate
    buf.putShort(2) // block align
    buf.putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII"))
    buf.putInt(dataSize)
    var k = 0
    while (k < nSamples) {
      buf.putShort(sample(k).toShort)
      k += 1
    }
    buf.array()
  }

  /** Synthesize one real WAV per doc from the closed forms above. */
  def synthesizeAudio(docs: DataFrame, idCol: String, textCol: String): Dataset[AudioRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // Widened (r15): off the single-split harness scan, the synth/encode
    // (and every decode pass consumers stack inside these partitions) was
    // ONE task — measured 1.6–2.7 s serial CPU per mm_* query. No-op on
    // any frame already at session width.
    Lineage
      .widen(docs
        .select(col(idCol).cast("long").as("doc_id"), col(textCol).cast("string").as("text")))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val n = audioSamples(id, text.getBytes("UTF-8").length)
          AudioRecord(id, encodePcmWav(n, SampleRate, k => audioSample(id, k)))
        }
      }
  }

  /** Deterministic 16-bit VAD-fixture sample k of doc `id`: 50-sample
    * blocks, a block is SILENT (|s| ≤ 400) when `((k/50)*11 + id) mod 4 = 0`
    * and speech (s ≥ 1000) otherwise — planted silence runs with a hard
    * amplitude gap around the 500 threshold, so detection is exact, not
    * boundary-sensitive. Closed form, oracle-replayable.
    */
  @inline def vadSample(id: Long, k: Int): Int =
    if (math.floorMod((k / 50).toLong * 11L + id, 4L) == 0L)
      (math.floorMod(k * 13L + id, 801L) - 400L).toInt
    else (1000L + math.floorMod(k * 31L + id * 7L, 9000L)).toInt

  /** Silence segmentation (voice-activity detection) over a REAL
    * encode → decode round-trip: each doc's VAD fixture becomes a genuine
    * PCM WAV, `javax.sound` decodes it back, and the silent-run scan walks
    * the DECODED samples (|s| < threshold, runs ≥ minRun count as
    * segments). One doc row in, one stats row out — a narrow map, so
    * audio payloads never cross a shuffle at any corpus size.
    */
  def silenceSegments(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Int,
      minRun: Int): Dataset[AudioVad] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // Widened (r15): off the single-split harness scan, the synth/encode
    // (and every decode pass consumers stack inside these partitions) was
    // ONE task — measured 1.6–2.7 s serial CPU per mm_* query. No-op on
    // any frame already at session width.
    Lineage
      .widen(docs
        .select(col(idCol).cast("long").as("doc_id"), col(textCol).cast("string").as("text")))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val n = audioSamples(id, text.getBytes("UTF-8").length)
          val wav = encodePcmWav(n, SampleRate, k => vadSample(id, k))
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(wav))
          val data = in.readAllBytes()
          in.close()
          val nDec = data.length / 2
          var k = 0
          var nSilent = 0L
          var nSegments = 0L
          var longest = 0L
          var run = 0L
          while (k < nDec) {
            val s = ((data(2 * k + 1).toInt << 8) | (data(2 * k) & 0xff)).toShort.toInt
            if (math.abs(s) < threshold) {
              nSilent += 1
              run += 1
            } else {
              if (run >= minRun) nSegments += 1
              if (run > longest) longest = run
              run = 0L
            }
            k += 1
          }
          if (run >= minRun) nSegments += 1
          if (run > longest) longest = run
          AudioVad(id, nDec.toLong, nSilent, nSegments, longest)
        }
      }
  }

  /** Frame-wise zero-crossing-rate stats over a REAL encode → decode
    * round-trip ([[silenceSegments]]' idiom): each doc's clip becomes a
    * genuine PCM WAV, `javax.sound` decodes it back, and the scan counts
    * FRAME-LOCAL sign flips (`s[k-1]·s[k] < 0` within a `frameLen`
    * window — never across a frame boundary, so the oracle's per-frame
    * groups replay exactly) over the full frames only. ZCR is the
    * classic cheap voiced/unvoiced + noisiness feature an audio-curation
    * funnel gates on before paying for a spectral model. One doc row in,
    * one stats row out — payloads never cross a shuffle; docs shorter
    * than one frame emit no row.
    */
  def zcrStats(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      frameLen: Int): Dataset[ZcrStats] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // Widened (r15): off the single-split harness scan, the synth/encode
    // (and every decode pass consumers stack inside these partitions) was
    // ONE task — measured 1.6–2.7 s serial CPU per mm_* query. No-op on
    // any frame already at session width.
    Lineage
      .widen(docs
        .select(col(idCol).cast("long").as("doc_id"), col(textCol).cast("string").as("text")))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val n = audioSamples(id, text.getBytes("UTF-8").length)
          val wav = encodePcmWav(n, SampleRate, k => audioSample(id, k))
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(wav))
          val data = in.readAllBytes()
          in.close()
          val nDec = data.length / 2
          val nFrames = nDec / frameLen
          if (nFrames == 0) None
          else {
            def sample(k: Int): Int =
              ((data(2 * k + 1).toInt << 8) | (data(2 * k) & 0xff)).toShort.toInt
            var total = 0L
            var maxZc = Long.MinValue
            var minZc = Long.MaxValue
            var f = 0
            while (f < nFrames) {
              var zc = 0L
              var k = f * frameLen + 1
              val end = (f + 1) * frameLen
              while (k < end) {
                if (sample(k - 1).toLong * sample(k) < 0L) zc += 1
                k += 1
              }
              total += zc
              if (zc > maxZc) maxZc = zc
              if (zc < minZc) minZc = zc
              f += 1
            }
            Some(ZcrStats(id, nDec.toLong, nFrames.toLong, total, maxZc, minZc))
          }
        }
      }
  }

  /** Partition-wise REAL audio decode: `AudioSystem.getAudioInputStream`
    * parses the container, and the sample checksum is computed from the
    * DECODED stream bytes (format-aware endianness), not from the input
    * buffer — a full encode → decode round-trip.
    */
  def decodeAudioFeatures(audio: Dataset[AudioRecord]): Dataset[AudioFeatures] = {
    val spark = audio.sparkSession
    import spark.implicits._
    audio.mapPartitions { it =>
      it.map { r =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        val fmt = in.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1, s"doc ${r.doc_id}: unexpected decoded format $fmt")
        val frames = in.getFrameLength
        val data = in.readAllBytes()
        in.close()
        var cks = 0L
        var k = 0
        val n = data.length / 2
        while (k < n) {
          // Sign-extend the HIGH byte, mask the low one, per the decoded
          // format's endianness (PCM WAV decodes little-endian).
          val s =
            if (fmt.isBigEndian) (data(2 * k).toInt << 8) | (data(2 * k + 1) & 0xff)
            else (data(2 * k + 1).toInt << 8) | (data(2 * k) & 0xff)
          cks += s.toLong * (k + 1)
          k += 1
        }
        AudioFeatures(
          r.doc_id,
          r.payload.length.toLong,
          fmt.getSampleRate.toLong,
          frames,
          cks)
      }
    }
  }

  /** Energy-contour audio fingerprint over a REAL encode → decode
    * round-trip (the Shazam/Chromaprint shape at its simplest): the
    * decoded stream is cut into `nFrames` equal frames, each frame's
    * energy is an exact BIGINT sum of |sample|, and bit f of the
    * fingerprint is the sign of the energy delta between consecutive
    * frames (`nFrames`−1 bits). Narrow map — audio payloads never cross
    * a shuffle; only (doc_id, fp) longs leave the partition.
    */
  def audioFingerprints(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      nFrames: Int): Dataset[AudioFp] = {
    val spark = docs.sparkSession
    import spark.implicits._
    synthesizeAudio(docs, idCol, textCol).mapPartitions { it =>
      it.map { r =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        val fmt = in.getFormat
        val data = in.readAllBytes()
        in.close()
        val n = data.length / 2
        val flen = n / nFrames
        val energy = new Array[Long](nFrames)
        var k = 0
        while (k < flen * nFrames) {
          val s =
            if (fmt.isBigEndian) (data(2 * k).toInt << 8) | (data(2 * k + 1) & 0xff)
            else (data(2 * k + 1).toInt << 8) | (data(2 * k) & 0xff)
          energy(k / flen) += math.abs(s.toLong)
          k += 1
        }
        var fp = 0L
        var f = 0
        while (f < nFrames - 1) {
          if (energy(f) > energy(f + 1)) fp |= 1L << f
          f += 1
        }
        AudioFp(r.doc_id, n.toLong, fp)
      }
    }
  }

  /** Frame sampling: every `stride`-th fixed-size byte window of the
    * payload becomes a "frame" (a real video decoder would emit decoded
    * frames at a timestamp stride; the iteration/batch shape is the same).
    * flatMap keeps it a narrow transformation — one input row to n frames.
    */
  def frameSample(
      media: Dataset[MediaRecord],
      frameBytes: Int,
      stride: Int): Dataset[MediaFrame] = {
    require(frameBytes > 0 && stride > 0)
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val digest = MessageDigest.getInstance("SHA-256")
      it.flatMap { r =>
        val n = r.payload.length
        val starts = 0 until math.max(0, n - frameBytes + 1) by (frameBytes * stride)
        starts.zipWithIndex.map { case (off, i) =>
          digest.reset()
          digest.update(r.payload, off, frameBytes)
          MediaFrame(r.doc_id, i.toLong, off.toLong, digest.digest().map("%02x".format(_)).mkString)
        }
      }
    }
  }

  /** Synthesized per-doc video decoded to per-frame luminance: frame count
    * is content-dependent (`6 + (len*5 + id*3) mod 11`), a scene cut is
    * planted at frame f ≥ 1 whenever `(id*13 + f*7) mod 5 = 0`, and frame
    * byte k is `(k + scene*83 + id) mod 256` — so each 64-byte frame is a
    * REAL materialized byte buffer, and `luma` is genuinely decoded by
    * summing its unsigned bytes executor-side (the oracle replays the
    * closed form, same design as the BMP pixel function). Adjacent scenes
    * can never alias: the 64-term residue-window sum is injective under a
    * +83 offset (checked over the full 256-offset cycle). flatMap keeps
    * it a narrow transformation — one doc row to n frame rows.
    */
  def videoFrameLumas(
      docs: DataFrame,
      idCol: String,
      textCol: String): Dataset[VideoFrameLuma] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long").as("id"), encode(col(textCol), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val n = (6 + math.floorMod(payload.length * 5L + id * 3L, 11L)).toInt
        var scene = 0L
        (0 until n).map { f =>
          if (f >= 1 && math.floorMod(id * 13L + f * 7L, 5L) == 0L) scene += 1
          val frame = new Array[Byte](64)
          var k = 0
          while (k < 64) {
            frame(k) = math.floorMod(k + scene * 83L + id, 256L).toByte
            k += 1
          }
          var luma = 0L
          var i = 0
          while (i < frame.length) { luma += frame(i) & 0xff; i += 1 }
          VideoFrameLuma(id, f.toLong, luma)
        }
      }
  }
}
