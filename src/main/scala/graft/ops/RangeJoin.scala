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

  /** Interval-overlap join: `left JOIN right ON loL <= hiR AND loR <= hiL`
    * (CLOSED intervals, the natural reading for date ranges) as a binned
    * equi-join. Both sides explode to the bins they cover; the join is on
    * bin (+ optional `equiKeys`, columns named identically on both sides —
    * e.g. a tenant/partition key that also bounds the bin fan-in).
    *
    * A pair overlapping many shared bins would match once per bin; instead
    * of a post-join `distinct` (an extra pairs-sized shuffle), each pair is
    * emitted EXACTLY once: only at the bin containing the overlap's start,
    * `greatest(loL, loR)` — a point both intervals cover by definition of
    * overlap, so that bin always produces the pair and no other bin does.
    *
    * At 100 TB: shuffle = Σ span/binWidth rows per side, partitioned on
    * uniform bin keys; no nested loop, no distinct. Pick binWidth near the
    * median interval length (spans ≪ width degrade toward bins with heavy
    * fan-in; spans ≫ width inflate the explode). */
  def intervalOverlap(
      left: DataFrame, loL: String, hiL: String,
      right: DataFrame, loR: String, hiR: String,
      binWidth: Long, equiKeys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def binned(df: DataFrame, lo: String, hi: String) =
      df.filter(col(hi) >= col(lo))
        .withColumn("_bin", explode(sequence(
          floor(col(lo) / binWidth), floor(col(hi) / binWidth))))
    binned(left, loL, hiL).join(binned(right, loR, hiR), "_bin" +: equiKeys)
      .filter(col(loL) <= col(hiR) && col(loR) <= col(hiL) &&
        col("_bin") === floor(greatest(col(loL), col(loR)) / binWidth))
      .drop("_bin")
  }
}
