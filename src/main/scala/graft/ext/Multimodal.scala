package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns with
  * typed metadata, plus a partition-wise feature-extraction operator.
  *
  * The Spark-side plumbing (schema, batch shape, partition-wise execution) is
  * real and tested; the actual codec is STUBBED behind `FakeCodec` — the
  * image/audio libraries are not in this container. Swapping in a real codec
  * means replacing ONE function body; the dataflow (mapPartitions over a
  * typed Dataset, batched per partition, no driver round-trips) is exactly
  * what a JNI/FFI decoder would need at 100 TB: decode cost scales with
  * splits, and the binary column never moves through a shuffle.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media: Array[Byte], mime: String)
  final case class MediaFeatures(
      doc_id: Long,
      mime: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      features: Array[Float])

  /** STUB codec: deterministic fake decode. A real implementation would hand
    * `bytes` to an image/audio library; this one derives plausible metadata
    * and a 16-bin byte histogram so the downstream schema and tests are real. */
  object FakeCodec {
    def decode(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
      val n = if (bytes == null) 0 else bytes.length
      val width = 64 + (n % 193)
      val height = 64 + ((n / 7) % 129)
      val hist = new Array[Float](16)
      if (n > 0) {
        var i = 0
        while (i < n) { hist((bytes(i) & 0xFF) / 16) += 1f; i += 1 }
        var b = 0
        while (b < 16) { hist(b) /= n.toFloat; b += 1 }
      }
      (width, height, hist)
    }
  }

  /** Attach a media column: the documents table's text bytes play the media
    * payload (deterministic stand-in for real image/audio bytes). */
  def withMediaColumn(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      when(length(col("text")) % 3 === 0, "image/png")
        .when(length(col("text")) % 3 === 1, "audio/wav")
        .otherwise("video/mp4").as("mime"))

  /** Partition-wise decode/feature-extract — the Scala analog of
    * `mapInPandas`: one iterator pass per partition, rows streamed, no
    * collect. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.select("doc_id", "media", "mime").as(Encoders.product[MediaRow])
      .mapPartitions { rows =>
        rows.map { r =>
          val (w, h, feats) = FakeCodec.decode(r.media)
          MediaFeatures(r.doc_id, r.mime,
            if (r.media == null) 0 else r.media.length, w, h, feats)
        }
      }
  }

  final case class ResizedMedia(
      doc_id: Long, mime: String, width: Int, height: Int, media: Array[Byte])

  /** Resize plumbing: recompress each payload to a target box. The STUB
    * "resampler" deterministically truncates/pads bytes proportionally to
    * the pixel-count ratio — a real codec swap touches only the marked
    * lines; schema, batching, and partition-wise shape are real. */
  def resize(media: DataFrame, maxW: Int, maxH: Int): Dataset[ResizedMedia] = {
    implicit val enc = Encoders.product[ResizedMedia]
    media.select("doc_id", "media", "mime").as(Encoders.product[MediaRow])
      .mapPartitions { rows =>
        rows.map { r =>
          val (w, h, _) = FakeCodec.decode(r.media)
          val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
          val (nw, nh) = (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
          // STUB resample: byte count scales with pixel ratio
          val n = if (r.media == null) 0
            else math.max(1, (r.media.length * (nw.toLong * nh) / (w.toLong * h)).toInt)
          val out = new Array[Byte](n)
          if (r.media != null) System.arraycopy(r.media, 0, out, 0, math.min(n, r.media.length))
          ResizedMedia(r.doc_id, r.mime, nw, nh, out)
        }
      }
  }

  final case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Frame sampling for video payloads: every `stride`-th fixed-size chunk
    * of the payload plays a decoded frame (STUB chunker; a real demuxer
    * swaps in here). One input row fans out to ≤ maxFrames rows — the
    * Spark-side shape (flatMap inside mapPartitions, bounded output) is what
    * a real video pipeline needs. */
  def sampleFrames(
      media: DataFrame,
      frameBytes: Int = 64,
      stride: Int = 4,
      maxFrames: Int = 8): Dataset[Frame] = {
    implicit val enc = Encoders.product[Frame]
    media.select("doc_id", "media", "mime").as(Encoders.product[MediaRow])
      .mapPartitions { rows =>
        rows.filter(_.mime == "video/mp4").flatMap { r =>
          val bytes = if (r.media == null) Array.emptyByteArray else r.media
          val nChunks = bytes.length / frameBytes
          (0 until nChunks by stride).take(maxFrames).zipWithIndex.map {
            case (chunk, idx) =>
              Frame(r.doc_id, idx,
                java.util.Arrays.copyOfRange(bytes, chunk * frameBytes, (chunk + 1) * frameBytes))
          }
        }
      }
  }
}
