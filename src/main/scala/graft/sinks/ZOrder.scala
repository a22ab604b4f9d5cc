package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: sort data by the bit-interleaving of two
  * normalized dimensions so that files are "rectangular" in BOTH dimensions
  * at once — the multi-column analog of a sort key, and the open-format
  * version of Delta's OPTIMIZE ZORDER BY.
  *
  * Why it matters at 100 TB: parquet row-group min/max stats prune scans
  * only along the physical sort order. A table sorted by `a` alone answers
  * `WHERE a = ?` with tight pruning but reads everything for `WHERE b = ?`;
  * Z-ordered files bound both columns, so either predicate prunes.
  *
  * Normalization maps each dimension to a 21-bit rank via (min, max) range
  * scaling — one cheap 2-value aggregate per write; the interleave is a JVM
  * UDF (42-bit Morton code in a Long).
  */
object ZOrder {

  private val Bits = 21

  /** Interleave the low 21 bits of x and y → 42-bit Morton code. */
  private[sinks] def morton2(x: Long, y: Long): Long = {
    var out = 0L
    var i = 0
    while (i < Bits) {
      out |= ((x >> i) & 1L) << (2 * i)
      out |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    out
  }

  private val mortonUdf = udf((x: Long, y: Long) => morton2(x, y))

  /** Morton column for two numeric columns, range-normalized with the given
    * bounds (inclusive). */
  def mortonCode(a: Column, loA: Double, hiA: Double,
      b: Column, loB: Double, hiB: Double): Column = {
    val max = (1L << Bits) - 1
    def scale(c: Column, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0L)
      else least(lit(max), greatest(lit(0L),
        ((c.cast("double") - lo) / (hi - lo) * max).cast("long")))
    mortonUdf(scale(a, loA, hiA), scale(b, loB, hiB))
  }

  /** Write `df` partitioned into `numFiles` Z-ordered files on (colA, colB).
    * Ranges come from one 4-value aggregate over the input. */
  def writeZordered(
      df: DataFrame, path: String, colA: String, colB: String,
      numFiles: Int): Unit = {
    val bounds = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
    val z = mortonCode(
      col(colA), bounds.getDouble(0), bounds.getDouble(1),
      col(colB), bounds.getDouble(2), bounds.getDouble(3))
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  /** N-dimensional interleave: bit i of value j lands at position i·n + j.
    * Each dimension keeps 62/n bits (capped at 21) so the code fits a Long. */
  private[sinks] def mortonN(vals: Array[Long], bits: Int): Long = {
    val n = vals.length
    var out = 0L
    var i = 0
    while (i < bits) {
      var j = 0
      while (j < n) {
        out |= ((vals(j) >> i) & 1L) << (i * n + j)
        j += 1
      }
      i += 1
    }
    out
  }

  /** Z-ordered write over ANY number of numeric columns (2–6 useful in
    * practice; beyond that each dimension keeps too few bits to cluster).
    * One 2n-value aggregate for the ranges, then the same range-partitioned
    * sorted write as the 2-d form. */
  def writeZorderedN(
      df: DataFrame, path: String, cols: Seq[String], numFiles: Int): Unit = {
    require(cols.size >= 2, "z-order needs at least two dimensions")
    val n = cols.size
    val bits = math.min(Bits, 62 / n)
    val maxRank = (1L << bits) - 1
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val bounds = df.agg(aggs.head, aggs.tail: _*).head()
    def scale(c: Column, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0L)
      else least(lit(maxRank), greatest(lit(0L),
        ((c.cast("double") - lo) / (hi - lo) * maxRank).cast("long")))
    val scaled = cols.zipWithIndex.map { case (c, i) =>
      scale(col(c), bounds.getDouble(2 * i), bounds.getDouble(2 * i + 1))
    }
    val mortonNUdf = udf((vs: Seq[Long]) => mortonN(vs.toArray, bits))
    df.withColumn("_z", mortonNUdf(array(scaled: _*)))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }
}
