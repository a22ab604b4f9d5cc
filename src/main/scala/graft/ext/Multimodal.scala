package graft.ext

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns with
  * typed metadata, plus partition-wise decode / feature-extract / resize /
  * frame-sample operators.
  *
  * The codec is REAL for images: payloads whose magic bytes identify a
  * PNG/BMP/GIF/JPEG container are decoded with JDK-builtin `javax.imageio`
  * (no external libraries) — true width/height, true pixel luminance
  * statistics. Payloads that are not a decodable image (audio/video
  * containers have no JDK decoder) take a documented fallback: unknown
  * dimensions (0×0) and a byte-level histogram, which is a real content
  * fingerprint, not a pretend decode.
  *
  * The dataflow is what a 100 TB media pipeline needs regardless of codec:
  * mapPartitions over a typed Dataset (decode cost scales with splits, rows
  * streamed, no driver round-trips), and the binary column never moves
  * through a shuffle.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media: Array[Byte], mime: String)
  final case class MediaFeatures(
      doc_id: Long,
      mime: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      mean_lum: Double,
      features: Array[Float])

  /** Image codec on JDK `javax.imageio` — container sniffed from magic bytes,
    * then a real decode. Non-image payloads fall back to a byte histogram
    * with 0×0 dimensions (dimensions genuinely unknown without a decoder). */
  object Codec {
    // ImageIO's default stream cache writes spill files per decode; decodes
    // here are all in-memory byte arrays, so cache to heap instead.
    ImageIO.setUseCache(false)

    /** True when the payload starts with a PNG/BMP/GIF/JPEG magic number. */
    def isImage(bytes: Array[Byte]): Boolean =
      bytes != null && bytes.length >= 4 && {
        val b = bytes
        (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
        (b(0) == 'B' && b(1) == 'M') ||
        (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') ||
        (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte)
      }

    /** Decode → (width, height, mean luminance, 16-bin normalized histogram).
      * Images: real pixel pass — luminance = (r+g+b)/3 per pixel, histogram
      * over luminance/16. Non-images (or corrupt image bytes): width/height
      * 0, mean/histogram over raw byte values — a content fingerprint. */
    def decode(bytes: Array[Byte]): (Int, Int, Double, Array[Float]) = {
      if (isImage(bytes)) {
        val img =
          try ImageIO.read(new ByteArrayInputStream(bytes))
          catch { case _: java.io.IOException => null }
        if (img != null) return decodeImage(img)
      }
      byteFingerprint(bytes)
    }

    private def decodeImage(img: BufferedImage): (Int, Int, Double, Array[Float]) = {
      val (w, h) = (img.getWidth, img.getHeight)
      val hist = new Array[Float](16)
      var sum = 0.0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3.0
          sum += lum
          hist(math.min(15, (lum / 16.0).toInt)) += 1f
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).toDouble
      var b = 0
      while (b < 16) { hist(b) /= n.toFloat; b += 1 }
      (w, h, sum / n, hist)
    }

    private def byteFingerprint(bytes: Array[Byte]): (Int, Int, Double, Array[Float]) = {
      val n = if (bytes == null) 0 else bytes.length
      val hist = new Array[Float](16)
      var sum = 0.0
      if (n > 0) {
        var i = 0
        while (i < n) {
          val v = bytes(i) & 0xFF
          sum += v
          hist(v / 16) += 1f
          i += 1
        }
        var b = 0
        while (b < 16) { hist(b) /= n.toFloat; b += 1 }
      }
      (0, 0, if (n > 0) sum / n else 0.0, hist)
    }

    /** Encode a sequence of solid-gray frames as a real multi-frame
      * (animated) GIF via the JDK's gif `ImageWriter` sequence API — the
      * deterministic container behind [[withGifColumn]]. A solid-gray frame
      * is a single palette entry, so the lossy-looking palette quantization
      * is exact here and decode returns each frame's gray verbatim. */
    def syntheticGif(w: Int, h: Int, grays: Seq[Int]): Array[Byte] = {
      val writer = ImageIO.getImageWritersByFormatName("gif").next()
      val out = new ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(out)
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        grays.foreach { gray =>
          val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          val g = math.max(0, math.min(255, gray))
          val rgb = (g << 16) | (g << 8) | g
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, rgb); x += 1 }
            y += 1
          }
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        }
        writer.endWriteSequence()
      } finally {
        ios.close()
        writer.dispose()
      }
      out.toByteArray
    }

    /** Mean luminance of one decoded frame ((r+g+b)/3 per pixel). */
    def meanLuminance(img: BufferedImage): Double = {
      var sum = 0.0
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          sum += (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3.0
          x += 1
        }
        y += 1
      }
      sum / (img.getWidth.toLong * img.getHeight)
    }

    /** Encode a solid-gray w×h image as real PNG bytes — the deterministic
      * image generator behind [[withImageColumn]] and the decode fixtures.
      * PNG is lossless, so decode returns exactly (w, h, gray). */
    def syntheticPng(w: Int, h: Int, gray: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = math.max(0, math.min(255, gray))
      val rgb = (g << 16) | (g << 8) | g
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "png", out)
      out.toByteArray
    }

    /** Encode 16-bit little-endian PCM as real RIFF/WAVE bytes (the
      * canonical 44-byte header): `samples` are FRAMES — each frame is
      * written once per channel. Lossless, so a real WAV parse returns
      * exactly (rate, channels, frames, amplitudes). */
    def syntheticWav(rate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
      require(channels >= 1 && rate > 0, "invalid WAV parameters")
      val dataLen = samples.length * channels * 2
      val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1) // PCM
        .putShort(channels.toShort).putInt(rate)
        .putInt(rate * channels * 2) // byte rate
        .putShort((channels * 2).toShort) // block align
        .putShort(16) // bits per sample
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach { s =>
        var c = 0
        while (c < channels) { buf.putShort(s); c += 1 }
      }
      buf.array()
    }

    /** REAL WAV parse via JDK `javax.sound.sampled` (the audio analog of
      * the ImageIO decode): header-derived (rate, channels, frames) plus
      * the exact integer sum of |sample| over every channel sample — the
      * float-free amplitude surface (for a constant-amplitude wave,
      * `absSum / (frames·channels)` recovers the amplitude exactly).
      * Returns (0, 0, 0, 0) for payloads javax.sound cannot parse. */
    def decodeWav(bytes: Array[Byte]): (Int, Int, Long, Long) = {
      if (bytes == null || bytes.length < 44) return (0, 0, 0L, 0L)
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(bytes))
        try {
          val fmt = ais.getFormat
          val frames = ais.getFrameLength
          val data = ais.readAllBytes()
          val bb = java.nio.ByteBuffer.wrap(data).order(
            if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
            else java.nio.ByteOrder.LITTLE_ENDIAN)
          var absSum = 0L
          while (bb.remaining() >= 2) absSum += math.abs(bb.getShort.toLong)
          (fmt.getSampleRate.toInt, fmt.getChannels, frames, absSum)
        } finally ais.close()
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException |
             _: java.io.IOException => (0, 0, 0L, 0L)
      }
    }

    /** Encode an 8×8-block gray pattern (64 block grays, row-major, each
      * block `blockPx`×`blockPx` pixels) as real PNG bytes — the structured
      * generator behind [[withPatternImageColumn]]: unlike the solid-gray
      * fixture, a block pattern gives the perceptual hash something to
      * hash. Lossless, so every decoded pixel returns its block's gray. */
    def syntheticPatternPng(blockGrays: Seq[Int], blockPx: Int = 8): Array[Byte] = {
      require(blockGrays.length == 64, "need 64 block grays (8x8 grid)")
      val side = 8 * blockPx
      val img = new BufferedImage(side, side, BufferedImage.TYPE_INT_RGB)
      var b = 0
      while (b < 64) {
        val g = math.max(0, math.min(255, blockGrays(b)))
        val rgb = (g << 16) | (g << 8) | g
        val (bx, by) = (b % 8, b / 8)
        var y = by * blockPx
        while (y < (by + 1) * blockPx) {
          var x = bx * blockPx
          while (x < (bx + 1) * blockPx) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        b += 1
      }
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "png", out)
      out.toByteArray
    }
  }

  /** Attach an opaque media column: the documents table's text bytes play an
    * undecodable payload (deterministic stand-in for audio/video containers,
    * which the JDK cannot decode) with a typed mime column. */
  def withMediaColumn(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      when(length(col("text")) % 3 === 0, "image/png")
        .when(length(col("text")) % 3 === 1, "audio/wav")
        .otherwise("video/mp4").as("mime"))

  /** Attach a REAL image column: one tiny PNG per document, dimensions and
    * gray level closed-form in doc_id — so a full decode round-trip is
    * oracle-checkable (width = 8 + id % 16, height = 8 + (id·3) % 16,
    * mean luminance = id % 256). Encoding runs executor-side per partition. */
  def withImageColumn(documents: DataFrame): DataFrame = {
    val png = udf((id: Long) => Codec.syntheticPng(
      (8 + id % 16).toInt, (8 + (id * 3) % 16).toInt, (id % 256).toInt))
    documents.select(
      col("doc_id"),
      png(col("doc_id")).as("media"),
      lit("image/png").as("mime"))
  }

  /** Attach a STRUCTURED image column: a 64×64 PNG of 8×8 gray blocks whose
    * grays are closed-form in doc_id — `gray(id, b) = ((id % 32)·7 + b·13)
    * % 256` — so the perceptual hash computed from the decoded pixels is
    * oracle-checkable, and docs congruent mod 32 are planted exact
    * perceptual duplicates (the dedup fixture). */
  def withPatternImageColumn(documents: DataFrame): DataFrame = {
    val png = udf((id: Long) => Codec.syntheticPatternPng(
      (0 until 64).map(b => (((id % 32) * 7 + b * 13) % 256).toInt)))
    documents.select(col("doc_id"), png(col("doc_id")).as("media"))
  }

  /** Attach a REAL audio column: one tiny square-wave WAV per document,
    * every parameter closed-form in doc_id — rate `8000·(1 + id%3)`,
    * channels `1 + id%2`, frames `32 + (id%16)·8`, amplitude
    * `1000·(1 + id%5)`, half-period `4 + id%4` — so a full
    * javax.sound parse round-trip is oracle-checkable (the audio analog
    * of [[withImageColumn]]). Encoding runs executor-side. */
  def withAudioColumn(documents: DataFrame): DataFrame = {
    val wav = udf { (id: Long) =>
      val amp = (1000 * (1 + id % 5)).toShort
      val half = (4 + id % 4).toInt
      val n = (32 + (id % 16) * 8).toInt
      val samples = Array.tabulate[Short](n)(j =>
        if ((j / half) % 2 == 0) amp else (-amp).toShort)
      Codec.syntheticWav(8000 * (1 + id % 3).toInt, (1 + id % 2).toInt, samples)
    }
    documents.select(col("doc_id"), wav(col("doc_id")).as("media"))
  }

  final case class AudioMeta(
      doc_id: Long, rate: Int, channels: Int, frames: Long, amp: Long)

  /** Partition-wise REAL WAV parse → (rate, channels, frames, amplitude):
    * amplitude is the exact integer `absSum / (frames·channels)` (constant
    * |sample| for a square wave), so the whole surface is integer-exact
    * cross-engine. Same mapPartitions discipline as [[extractFeatures]] —
    * the binary column never shuffles. */
  def extractAudioMeta(media: DataFrame): Dataset[AudioMeta] = {
    implicit val enc = Encoders.product[AudioMeta]
    media.select(col("doc_id"), col("media"), lit("audio/wav").as("mime"))
      .as(Encoders.product[MediaRow])
      .mapPartitions { rows =>
        rows.map { r =>
          val (rate, ch, frames, absSum) = Codec.decodeWav(r.media)
          val amp = if (frames > 0 && ch > 0) absSum / (frames * ch) else 0L
          AudioMeta(r.doc_id, rate, ch, frames, amp)
        }
      }
  }

  final case class HashBands(doc_id: Long, b0: Int, b1: Int, b2: Int, b3: Int)

  /** 64-bit average hash (aHash) over the decoded pixels, emitted as four
    * 16-bit bands: the image is divided into an 8×8 block grid, bit b is set
    * iff block b's pixel sum exceeds the global mean — compared in exact
    * integer form (`64·blocks·sum_b > total`), so the hash is bit-identical
    * to any engine that recomputes it from the same pixels, float-free.
    * Bands (not one 64-bit word) keep every value inside a positive INT on
    * both engines and are exactly what the banded candidate join keys on.
    * Partition-wise decode; the binary column never shuffles. */
  def aHashBands(media: DataFrame): Dataset[HashBands] = {
    implicit val enc = Encoders.product[HashBands]
    media.select(col("doc_id"), col("media"), lit("image/png").as("mime"))
      .as(Encoders.product[MediaRow])
      .mapPartitions { rows =>
        rows.map { r =>
          val img = ImageIO.read(new ByteArrayInputStream(r.media))
          val (bw, bh) = (img.getWidth / 8, img.getHeight / 8)
          val sums = new Array[Long](64)
          var b = 0
          while (b < 64) {
            val (bx, by) = (b % 8, b / 8)
            var s = 0L
            var y = by * bh
            while (y < (by + 1) * bh) {
              var x = bx * bw
              while (x < (bx + 1) * bw) { s += (img.getRGB(x, y) & 0xFF); x += 1 }
              y += 1
            }
            sums(b) = s
            b += 1
          }
          val total = sums.sum
          // bit b ⇔ mean_b > mean_all ⇔ 64·sum_b > total (equal-size blocks)
          def band(k: Int): Int = (0 until 16).map { j =>
            if (64L * sums(16 * k + j) > total) 1 << j else 0
          }.sum
          HashBands(r.doc_id, band(0), band(1), band(2), band(3))
        }
      }
  }

  /** Image near-dup candidate pairs: equi-join each of the four 16-bit hash
    * bands (pigeonhole: Hamming ≤ 3 over 64 bits with 4 bands guarantees a
    * matching band — full recall at the threshold), then verify the exact
    * Hamming distance. The shuffle carries (id, band value) rows only —
    * never pixels, never an all-pairs product. */
  def imageNearDupPairs(hashes: DataFrame, maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, "4 bands give full recall only up to Hamming 3")
    val bands = (0 to 3).map(k =>
        hashes.select(col("doc_id"), lit(k).as("band"), col(s"b$k").as("bv")))
      .reduce(_ unionAll _)
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val ham = (0 to 3).map(k =>
        bit_count(col(s"ha.b$k").bitwiseXOR(col(s"hb.b$k"))))
      .reduce(_ + _).cast("int")
    cand
      .join(hashes.as("ha"), col("doc_a") === col("ha.doc_id"))
      .join(hashes.as("hb"), col("doc_b") === col("hb.doc_id"))
      .select(col("doc_a"), col("doc_b"), ham.as("hamming"))
      .filter(col("hamming") <= maxDist)
  }

  /** Partition-wise decode/feature-extract — the Scala analog of
    * `mapInPandas`: one iterator pass per partition, rows streamed, no
    * collect. Real image decode for image payloads, byte fingerprint
    * otherwise (see [[Codec.decode]]). */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.select("doc_id", "media", "mime").as(Encoders.product[MediaRow])
      .mapPartitions { rows =>
        rows.map { r =>
          val (w, h, mean, feats) = Codec.decode(r.media)
          MediaFeatures(r.doc_id, r.mime,
            if (r.media == null) 0 else r.media.length, w, h, mean, feats)
        }
      }
  }

  final case class ResizedMedia(
      doc_id: Long, mime: String, width: Int, height: Int, media: Array[Byte])

  /** Resize decodable images into a target box (aspect preserved, never
    * upscaled): real `Graphics2D` bilinear resample, re-encoded as PNG.
    * Non-image payloads pass through unchanged with 0×0 dims — resizing an
    * opaque container is undefined, and faking it would corrupt the payload. */
  def resize(media: DataFrame, maxW: Int, maxH: Int): Dataset[ResizedMedia] = {
    implicit val enc = Encoders.product[ResizedMedia]
    media.select("doc_id", "media", "mime").as(Encoders.product[MediaRow])
      .mapPartitions { rows =>
        rows.map { r =>
          val img = if (Codec.isImage(r.media))
            try ImageIO.read(new ByteArrayInputStream(r.media))
            catch { case _: java.io.IOException => null }
          else null
          if (img == null) ResizedMedia(r.doc_id, r.mime, 0, 0, r.media)
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
            val (nw, nh) = (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
            if (nw == w && nh == h) ResizedMedia(r.doc_id, r.mime, w, h, r.media)
            else {
              val dst = new BufferedImage(nw, nh, BufferedImage.TYPE_INT_RGB)
              val g2 = dst.createGraphics()
              g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g2.drawImage(img, 0, 0, nw, nh, null)
              g2.dispose()
              val out = new ByteArrayOutputStream()
              ImageIO.write(dst, "png", out)
              ResizedMedia(r.doc_id, r.mime, nw, nh, out.toByteArray)
            }
          }
        }
      }
  }

  /** Attach a REAL multi-frame container: one tiny animated GIF per
    * document, every property closed-form in doc_id — frame count
    * 1 + id % 6, dims (8 + id % 8) × (6 + id % 5), frame i's gray
    * (id·7 + i·31) % 256 — so a full demux round-trip is oracle-checkable
    * per frame. Encoding runs executor-side per partition. */
  def withGifColumn(documents: DataFrame): DataFrame = {
    val gif = udf((id: Long) => Codec.syntheticGif(
      (8 + id % 8).toInt, (6 + id % 5).toInt,
      (0 until (1 + id % 6).toInt).map(i => ((id * 7 + i * 31) % 256).toInt)))
    documents.select(
      col("doc_id"),
      gif(col("doc_id")).as("media"),
      lit("image/gif").as("mime"))
  }

  final case class GifFrame(
      doc_id: Long, frame_idx: Int, width: Int, height: Int, mean_lum: Double)

  /** REAL frame demux for GIF containers: the JDK gif `ImageReader` walks
    * the image sequence (`getNumImages`), decodes every `stride`-th frame up
    * to `maxFrames`, and emits true per-frame dimensions + pixel luminance.
    * Same dataflow contract as [[sampleFrames]] — flatMap inside
    * mapPartitions, bounded per-doc fan-out, binary never shuffled — but
    * with a real codec end-to-end, which is what makes it hash-oracle-able
    * against the closed forms of [[withGifColumn]]. */
  def demuxGifFrames(
      media: DataFrame,
      stride: Int = 2,
      maxFrames: Int = 4): Dataset[GifFrame] = {
    implicit val enc = Encoders.product[GifFrame]
    media.select("doc_id", "media", "mime").as(Encoders.product[MediaRow])
      .mapPartitions { rows =>
        rows.filter(r => r.media != null && Codec.isImage(r.media) &&
            r.media(0) == 'G').flatMap { r =>
          val reader = ImageIO.getImageReadersByFormatName("gif").next()
          val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(r.media))
          try {
            reader.setInput(iis)
            val n = reader.getNumImages(true)
            (0 until n by stride).take(maxFrames).zipWithIndex.map {
              case (orig, j) =>
                val img = reader.read(orig)
                GifFrame(r.doc_id, j, img.getWidth, img.getHeight,
                  Codec.meanLuminance(img))
            }
          } finally {
            iis.close()
            reader.dispose()
          }
        }
      }
  }

  final case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Frame sampling for video payloads: every `stride`-th fixed-size chunk
    * of the payload plays a decoded frame. The JDK has no video demuxer, so
    * the chunker stands in at the marked line; the Spark-side shape (flatMap
    * inside mapPartitions, bounded per-doc fan-out, binary never shuffled)
    * is exactly what a JNI/FFI demuxer plugs into. */
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
          val nChunks = bytes.length / frameBytes // demuxer boundary: real codec here
          (0 until nChunks by stride).take(maxFrames).zipWithIndex.map {
            case (chunk, idx) =>
              Frame(r.doc_id, idx,
                java.util.Arrays.copyOfRange(bytes, chunk * frameBytes, (chunk + 1) * frameBytes))
          }
        }
      }
  }
}
