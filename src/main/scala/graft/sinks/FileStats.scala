package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Zone-map statistics for plain parquet — the per-file min/max/count
  * manifest a table format (Iceberg/Delta) maintains natively, built here
  * from one scan. Pairs with [[ZOrder]]: Morton clustering makes each
  * file's value ranges tight, this collects them, and a reader prunes
  * files whose range cannot contain the predicate — data skipping without
  * touching the skipped bytes.
  *
  * At 100 TB the stats table is tiny (one row per file) and the collect
  * scan is one pass that runs at write/compaction time, not query time.
  */
object FileStats {

  /** One row per physical file: row count + min/max per tracked column.
    * Aggregation is two-phase (map-side partials per file split). */
  def collect(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    df.withColumn("_file", input_file_name())
      .groupBy(col("_file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Files whose [min, max] range may contain `value` on column `c` — the
    * skip decision a pruned read makes from the stats table alone. */
  def candidateFiles(stats: DataFrame, c: String, value: Column): DataFrame =
    stats
      .filter(value >= col(s"min_$c") && value <= col(s"max_$c"))
      .select(col("_file"))

  /** [[collect]] plus a per-file BLOOM FILTER over `bloomCol` — the
    * point-lookup complement to zone maps. Min/max prunes range predicates
    * on CLUSTERED columns; on a high-cardinality key whose values scatter
    * across files (ids, urls, hashes), every file's [min, max] spans the
    * probe and zone maps prune nothing — the bloom still rules out every
    * file that lacks the key (no false negatives, ~`fpp` false positives).
    * One grouped aggregate pass builds all blooms. Size `expectedPerFile`
    * to the DISTINCT keys per file: ~1.2 KB/file at the 1e3 default,
    * ~120 KB/file at 1e5 — keep it small enough that the stats manifest
    * stays driver-loadable across thousands of files. */
  def collectWithBloom(
      df: DataFrame,
      cols: Seq[String],
      bloomCol: String,
      expectedPerFile: Long = 1000L,
      fpp: Double = 0.01): DataFrame = {
    require(cols.nonEmpty)
    val aggs = (count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))) :+
      graft.functions.SketchAggregates
        .bloom_agg(col(bloomCol), expectedPerFile, fpp).as(s"bloom_$bloomCol")
    df.withColumn("_file", input_file_name())
      .groupBy(col("_file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Files whose bloom may contain `value` — the candidate set of a point
    * lookup. Exact read = scan these files, keep the exact predicate. */
  def candidateFilesPoint(stats: DataFrame, bloomCol: String, value: Column): DataFrame =
    stats
      .filter(graft.functions.SketchAggregates
        .might_contain(col(s"bloom_$bloomCol"), value))
      .select(col("_file"))
}
