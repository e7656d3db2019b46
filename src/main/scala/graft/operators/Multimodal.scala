package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One media payload: an opaque binary column plus its id. In a real corpus
  * `payload` holds image/audio/video bytes; the harness has no media files,
  * so the queries derive payloads from document text (`encode(text, UTF-8)`)
  * — the Spark-side plumbing (binary columns, typed Datasets, partition-wise
  * batch processing) is identical either way.
  */
case class MediaRecord(doc_id: Long, payload: Array[Byte])

/** Extracted features. `sha_hex` is the real content digest; `width` and
  * `height` come from the STUBBED decoder (see [[Multimodal.extractFeatures]]).
  */
case class MediaFeatures(doc_id: Long, n_bytes: Long, sha_hex: String, width: Long, height: Long)

/** A resized media payload (stub decode: dimensions scaled, payload
  * re-digested; a real decoder would emit actual pixel bytes).
  */
case class ResizedMedia(doc_id: Long, width: Long, height: Long, thumb_sha: String)

/** One sampled frame of a media payload. */
case class MediaFrame(doc_id: Long, frame_no: Long, offset: Long, frame_sha: String)

/** Multimodal-column plumbing for a training-data pipeline: treat media as
  * opaque `binary` columns with typed metadata, and run decode /
  * feature-extraction partition-wise (the Scala analogue of `mapInPandas`
  * batches: one codec/model initialization per partition, then a streamed
  * map over its rows — no per-row setup, no driver involvement, scales as a
  * pure narrow transformation).
  *
  * THE DECODE STEP IS A DETERMINISTIC STUB: this container ships no image
  * or audio codecs, so `width`/`height` are derived from the payload's
  * sha256 instead of a real pixel decode. Everything around the stub —
  * binary schema, Dataset encoders, per-partition init, feature schema —
  * is real and tested; swap the marked lines for an actual decoder
  * (e.g. javax.imageio / ffmpeg bindings) to process real media.
  */
object Multimodal {

  /** Lift an (id, text) frame into the binary payload model. */
  def toMedia(docs: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long").as("doc_id"), encode(col(textCol), "UTF-8").as("payload"))
      .as[MediaRecord]
  }

  /** Resize-to-fit: scale the stub dimensions into a bounding box keeping
    * aspect ratio, and digest the payload with the target dims (standing in
    * for re-encoded pixel bytes). Same partition-wise shape as a real
    * image-resize pass — swap the marked math for an actual scaler.
    */
  def resize(media: Dataset[MediaRecord], maxDim: Long): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val digest = MessageDigest.getInstance("SHA-256")
      it.map { r =>
        digest.reset()
        val sha = digest.digest(r.payload).map("%02x".format(_)).mkString
        // ---- STUB: source dims from the digest (see extractFeatures) ----
        val w = 1L + java.lang.Long.parseLong(sha.substring(0, 4), 16) % 512L
        val h = 1L + java.lang.Long.parseLong(sha.substring(4, 8), 16) % 512L
        val scale = maxDim.toDouble / math.max(w, h)
        val (tw, th) =
          if (scale >= 1.0) (w, h)
          else (math.max(1L, (w * scale).toLong), math.max(1L, (h * scale).toLong))
        digest.reset()
        digest.update(r.payload)
        digest.update(s"|$tw x $th".getBytes("UTF-8"))
        val thumbSha = digest.digest().map("%02x".format(_)).mkString
        // -----------------------------------------------------------------
        ResizedMedia(r.doc_id, tw, th, thumbSha)
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

  /** Partition-wise feature extraction over binary payloads. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // Per-partition init — stands in for codec/model setup in a real
      // decoder (exactly where you'd load libjpeg/ffmpeg/an ONNX session).
      val digest = MessageDigest.getInstance("SHA-256")
      it.map { r =>
        digest.reset()
        val sha = digest.digest(r.payload).map("%02x".format(_)).mkString
        // ---- STUB DECODE: deterministic fake dimensions from the digest
        // (replace with a real image decode to get true width/height) ----
        val width = 1L + java.lang.Long.parseLong(sha.substring(0, 4), 16) % 512L
        val height = 1L + java.lang.Long.parseLong(sha.substring(4, 8), 16) % 512L
        // -----------------------------------------------------------------
        MediaFeatures(r.doc_id, r.payload.length.toLong, sha, width, height)
      }
    }
  }
}
