package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Int8 embedding quantization — the storage/bandwidth lever for vector
  * search at 100 TB: symmetric per-vector max-abs scaling packs each
  * float into one byte (4× smaller than float32, 8× smaller than the
  * double arrays the test tables carry), stored as a `binary` column so
  * Parquet keeps it as a single contiguous byte array per row.
  *
  * Cosine similarity is scale-invariant per vector, so ranking by cosine
  * over quantized vectors needs NO dequantization — integer dot products
  * rank directly; the per-vector scale matters only for reconstructing
  * values (dot products, L2). Quantization error per element is bounded by
  * scale/2 = maxAbs/254 (spec-pinned).
  */
object Quantize {

  /** struct(scale: double, q: binary) — q(i) = floor(v(i)/scale + 0.5),
    * scale = maxAbs/127. Zero vectors quantize to all-zero bytes with
    * scale 1. */
  def quantize(vec: Column): Column =
    udf((v: Seq[Double]) => {
      if (v == null) null
      else {
        var maxAbs = 0.0
        v.foreach(x => maxAbs = math.max(maxAbs, math.abs(x)))
        val scale = if (maxAbs == 0.0) 1.0 else maxAbs / 127.0
        val q = new Array[Byte](v.length)
        var i = 0
        while (i < v.length) {
          // floor(x + 0.5), NOT Math.round: since Java 7 Math.round differs
          // on IEEE edges (0.49999999999999994 rounds up under x + 0.5);
          // the DuckDB oracle mirrors floor(x/scale + 0.5) so both engines
          // must evaluate the identical expression.
          q(i) = math.max(-127.0, math.min(127.0, math.floor(v(i) / scale + 0.5))).toByte
          i += 1
        }
        (scale, q)
      }
    }).apply(vec.cast("array<double>")).cast("struct<scale:double,q:binary>")

  /** array<double> reconstruction: q(i) * scale. */
  def dequantize(scale: Column, q: Column): Column =
    udf((s: Double, bytes: Array[Byte]) =>
      if (bytes == null) null else bytes.map(_.toDouble * s).toSeq
    ).apply(scale, q)

  /** Cosine similarity straight on the int8 payloads (scale-free). */
  def cosineInt8(qa: Column, qb: Column): Column =
    udf((a: Array[Byte], b: Array[Byte]) => {
      if (a == null || b == null) null
      else {
        val n = math.min(a.length, b.length)
        var dot = 0L
        var na = 0L
        var nb = 0L
        var i = 0
        while (i < n) {
          dot += a(i).toLong * b(i)
          na += a(i).toLong * a(i)
          nb += b(i).toLong * b(i)
          i += 1
        }
        if (na == 0L || nb == 0L) null
        else java.lang.Double.valueOf(dot / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)))
      }
    }).apply(qa, qb)
}
