package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{col, udaf, udf}
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Bloom and count-min sketches as GROUPED Spark aggregates.
  *
  * `df.stat.bloomFilter`/`countMinSketch` build one whole-DataFrame sketch
  * through an RDD aggregate; these expose the same sketches as ordinary
  * aggregate COLUMNS, so they compose with `groupBy` — one sketch per
  * group/partition/file — and ride the normal two-phase hash aggregate
  * (object buffers live un-serialized inside ObjectHashAggregate; the
  * encoder only runs at shuffle/spill boundaries, so `reduce` is a plain
  * in-memory `put` per row).
  *
  * That grouping is what a lakehouse needs sketches for: per-FILE blooms in
  * a stats manifest ([[graft.sinks.FileStats.collectWithBloom]]) prune
  * point lookups the way zone maps prune ranges, and per-group CMS gives
  * bounded-memory frequency summaries per partition.
  *
  * Keys are fed as STRINGS (cast upstream): one canonical representation
  * means the build and every later probe hash identically — the same rule
  * [[graft.ops.Sketches]] follows.
  */
object SketchAggregates {

  private class BloomAgg(expected: Long, fpp: Double)
      extends Aggregator[String, BloomFilter, Array[Byte]] {
    def zero: BloomFilter = BloomFilter.create(expected, fpp)
    def reduce(b: BloomFilter, a: String): BloomFilter = {
      if (a != null) b.putString(a)
      b
    }
    def merge(x: BloomFilter, y: BloomFilter): BloomFilter = x.mergeInPlace(y)
    def finish(b: BloomFilter): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      b.writeTo(out)
      out.toByteArray
    }
    def bufferEncoder: Encoder[BloomFilter] = Encoders.javaSerialization[BloomFilter]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  private class CmsAgg(eps: Double, confidence: Double, seed: Int)
      extends Aggregator[String, CountMinSketch, Array[Byte]] {
    def zero: CountMinSketch = CountMinSketch.create(eps, confidence, seed)
    def reduce(b: CountMinSketch, a: String): CountMinSketch = {
      if (a != null) b.addString(a)
      b
    }
    def merge(x: CountMinSketch, y: CountMinSketch): CountMinSketch = x.mergeInPlace(y)
    def finish(b: CountMinSketch): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      b.writeTo(out)
      out.toByteArray
    }
    def bufferEncoder: Encoder[CountMinSketch] = Encoders.javaSerialization[CountMinSketch]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Serialized Bloom filter over the group's (string-cast, non-null)
    * keys. ~`1.2·expected·log2(1/fpp)` bits per group regardless of rows. */
  def bloom_agg(key: Column, expected: Long = 1000000L, fpp: Double = 0.01): Column =
    udaf(new BloomAgg(expected, fpp)).apply(key.cast("string"))

  /** Serialized count-min sketch over the group's keys: estimates
    * overcount by at most eps·N with the given confidence. */
  def cms_agg(key: Column, eps: Double = 0.001, confidence: Double = 0.99,
      seed: Int = 42): Column =
    udaf(new CmsAgg(eps, confidence, seed)).apply(key.cast("string"))

  def bloomFromBytes(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  def cmsFromBytes(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))

  /** Row-at-a-time probe of a serialized bloom COLUMN (e.g. a stats table
    * with one bloom per file). Deserializes per row — right for manifests
    * with one row per file/partition; for probing a BIG table against ONE
    * sketch, deserialize once and broadcast instead. */
  def might_contain(bloomBytes: Column, key: Column): Column = {
    val f = udf((b: Array[Byte], k: String) =>
      if (b == null || k == null) false else bloomFromBytes(b).mightContainString(k))
    f(bloomBytes, key.cast("string"))
  }

  /** Row-at-a-time CMS estimate — same per-row deserialization caveat. */
  def cms_estimate(cmsBytes: Column, key: Column): Column = {
    val f = udf((b: Array[Byte], k: String) =>
      if (b == null || k == null) 0L else cmsFromBytes(b).estimateCount(k))
    f(cmsBytes, key.cast("string"))
  }
}
