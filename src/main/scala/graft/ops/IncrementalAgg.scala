package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a per-key aggregate table fresh
  * by aggregating only the new partition and MERGING it into the stored
  * partials — `merge(partial(old), partial(delta)) == partial(old ∪ delta)`
  * for algebraic aggregates (count/sum/min/max; avg derives at read). The
  * pattern that turns "re-aggregate 100 TB every hour" into "aggregate one
  * hour, merge one tiny table" — the same partial/final algebra Spark's
  * HashAggregateExec uses inside a single query, applied across job runs.
  */
object IncrementalAgg {

  /** Mergeable partial state per key: n, sum_<v>, min_<v>, max_<v>. */
  def partial(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col(valueCol)).as(s"sum_$valueCol"),
        min(col(valueCol)).as(s"min_$valueCol"),
        max(col(valueCol)).as(s"max_$valueCol"))

  /** Merge any number of partial frames (same schema, same keys). */
  def merge(keys: Seq[String], partials: DataFrame*): DataFrame = {
    require(partials.nonEmpty)
    val v = partials.head.columns.collect { case c if c.startsWith("sum_") => c.stripPrefix("sum_") }.head
    partials.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("n")).as("n"),
        sum(col(s"sum_$v")).as(s"sum_$v"),
        min(col(s"min_$v")).as(s"min_$v"),
        max(col(s"max_$v")).as(s"max_$v"))
  }

  /** Read-side finalization: derive non-mergeable outputs (avg). */
  def finalized(partialDf: DataFrame): DataFrame = {
    val v = partialDf.columns.collect { case c if c.startsWith("sum_") => c.stripPrefix("sum_") }.head
    partialDf.withColumn(s"avg_$v", col(s"sum_$v") / col("n"))
  }

  /** Maintain (n, sum) partials from a CHANGE FEED
    * ([[graft.sinks.Snapshots.changes]]): inserts add, deletes subtract —
    * the z-set/DBSP view of aggregation, which handles overwrites and
    * upserts, not just appends. Keys whose count reaches 0 drop out.
    *
    * Scope is deliberately count/sum(/avg at read): those are INVERTIBLE.
    * min/max are not — a delete of the current extremum needs the base data
    * — so they stay with [[partial]]/[[merge]] on insert-only feeds (or a
    * recompute of just the delete-touched keys).
    *
    * At 100 TB: the delta aggregate touches only the changed files the CDF
    * resolves (one hour of an hourly table), and the merge joins two
    * key-sized tables — history is never rescanned. */
  def applyChanges(
      state: DataFrame, // at least: keys, n, sum_<v>
      changes: DataFrame, // rows + _change_type ('insert'/'delete')
      keys: Seq[String],
      valueCol: String): DataFrame = {
    val sign = when(col("_change_type") === "delete", lit(-1L)).otherwise(lit(1L))
    val delta = changes
      .groupBy(keys.map(col): _*)
      .agg(sum(sign).as("n"),
        sum(sign * col(valueCol)).as(s"sum_$valueCol"))
    state.select((keys.map(col) :+ col("n") :+ col(s"sum_$valueCol")): _*)
      .unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"),
        sum(col(s"sum_$valueCol")).as(s"sum_$valueCol"))
      .filter(col("n") > 0)
  }
}
