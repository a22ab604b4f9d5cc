package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.Weather

/** Event-time derivation (F9-F13): `glue/bronze_to_silver_openweather.py:88-101`
  * parses the ISO8601-Z contract string into `ts` and projects partition
  * columns `dt` (yyyy-MM-dd) / `hour` (HH), then stamps `loaded_at`.
  *
  * `dt`/`hour` are the lake partition keys — every downstream incremental read
  * prunes on them, which is what makes the advertised last-completed-hour
  * backfill (`README.md:188-190`) an O(one-partition) scan instead of a full
  * prefix scan at 100 TB.
  */
object EventTime {

  /** null on malformed input (try_to_timestamp), matching the reference's
    * lenient parse rather than ANSI's throw-on-mismatch. */
  def parseIso(c: Column): Column = try_to_timestamp(c, lit(Weather.IsoFormat))

  def dtOf(ts: Column): Column = date_format(ts, "yyyy-MM-dd")
  def hourOf(ts: Column): Column = date_format(ts, "HH")

  /** Derive ts/dt/hour from the raw ISO string column + stamp loaded_at. */
  def derive(df: DataFrame, isoCol: String = "fetched_at_utc"): DataFrame =
    df.withColumn("ts", parseIso(col(isoCol)))
      .withColumn("dt", dtOf(col("ts")))
      .withColumn("hour", hourOf(col("ts")))
      .withColumn("loaded_at", current_timestamp())

  /** Same derivation from an existing timestamp column (events-table shape). */
  def deriveFromTimestamp(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.withColumn("dt", dtOf(col(tsCol)))
      .withColumn("hour", hourOf(col(tsCol)))

  /** The README's "last completed UTC hour" target (`README.md:186-190`):
    * (dt, hour) pair for now() - 1 hour. */
  def lastCompletedHour(): (Column, Column) = {
    val t = current_timestamp() - expr("INTERVAL 1 HOUR")
    (dtOf(t), hourOf(t))
  }

  /** Partition-pruning predicate for an incremental read — the
    * advertised-but-unimplemented `--dt_filter`/`--hour_filter` semantics. */
  def partitionPredicate(dtFilter: Option[String], hourFilter: Option[String]): Column = {
    val dtP = dtFilter.map(col("dt") === _)
    val hP = hourFilter.map(col("hour") === _)
    (dtP.toSeq ++ hP.toSeq).reduceOption(_ && _).getOrElse(lit(true))
  }
}
