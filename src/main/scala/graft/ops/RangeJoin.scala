package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned (bucketed) range join: point-in-interval joins without the
  * nested-loop trap.
  *
  * `points JOIN intervals ON lo <= p AND p < hi` has no equi-key, so Catalyst
  * plans BroadcastNestedLoopJoin — O(|P|·|I|) comparisons, a non-starter at
  * scale. Binning both sides on a fixed width recovers an equi-join:
  * each point maps to one bin; each interval explodes to the bins it
  * overlaps (ceil((hi-lo)/width) rows, typically small when width ≈ the
  * median interval length); the equi-join on bin then shuffle-partitions
  * by bin, and the residual `lo <= p < hi` filter removes false positives
  * within a bucket. Exact same result set as the theta join — the oracle is
  * the plain theta join.
  *
  * At 100 TB: shuffle is proportional to |P| + Σ interval-spans, both sides
  * hash-partition on the bin key, and a skewed bin (many intervals crossing
  * one bucket) is AQE-splittable because it's a plain equi-join.
  */
object RangeJoin {

  /** Join `points` (value column `p`) with `intervals` (columns `lo`, `hi`;
    * half-open [lo, hi)) on containment, via bins of `binWidth`. All three
    * columns must be numeric (cast upstream); column names must not collide. */
  def pointInInterval(
      points: DataFrame, pCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = col(pCol)
    val binnedPoints = points.withColumn("_bin", floor(p / binWidth))
    // one row per bin the interval overlaps: sequence(floor(lo/w), floor((hi-ε)/w));
    // empty intervals (hi <= lo) contribute no bins and thus no matches.
    val binnedIntervals = intervals
      .filter(col(hiCol) > col(loCol))
      .withColumn("_bin",
        explode(sequence(
          floor(col(loCol) / binWidth),
          floor((col(hiCol) - lit(1)) / binWidth))))
    binnedPoints.join(binnedIntervals, Seq("_bin"))
      .filter(col(loCol) <= p && p < col(hiCol))
      .drop("_bin")
  }
}
