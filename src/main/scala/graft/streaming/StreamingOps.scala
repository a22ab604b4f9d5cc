package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming analytics the reference's pipeline implies but leaves to
  * Redshift: watermarked event-time windows and streaming dedup — the
  * Structured Streaming upgrades of SURVEY.md §2.9 T7 (at-least-once →
  * dedup downstream) and the load-verification per-hour rollup (A5).
  *
  * All operators take/return DataFrames so they run identically on
  * `readStream` inputs (stateful, incremental) and batch frames (tests,
  * backfills) — the Spark pattern for write-once-run-both pipelines.
  */
object StreamingOps {

  /** Tumbling event-time window counts per key — the streaming form of the
    * README's load-verification query (`README.md:196-211`): how many rows
    * landed per (window, key), with a watermark bounding state. */
  def windowedCounts(
      df: DataFrame,
      tsCol: String,
      keyCol: String,
      windowLength: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLength), col(keyCol))
      .agg(count(lit(1)).as("n"), max(col(tsCol)).as("max_ts"))

  /** Streaming dedup on the natural key (T7): drops retry-duplicates within
    * the watermark horizon, bounding state — the streaming complement of
    * `graft.ops.Dedup` and the fix for `fwd:67-72`'s at-least-once retries. */
  def dedupWithinWatermark(
      df: DataFrame,
      tsCol: String,
      keys: Seq[String],
      watermark: String = "2 hours"): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)
}
