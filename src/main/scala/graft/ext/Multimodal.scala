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
}
