package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Lake-layer writers.
  *
  * Bronze (S6): GZIP NDJSON under `dt=/hour=` hive partitions — the Firehose
  * landing format (`README.md:145-154`).
  *
  * Gold (S8): parquet, same partitioning, sorted within partitions on the
  * reference's SORTKEY `(city, fetched_at_utc)` analog (`redshift/init.sql:17`)
  * so min/max row-group stats give scan-time skipping on the sort prefix —
  * the lake equivalent of a Redshift sort key.
  *
  * Scale notes: `partitionBy` keeps writes parallel per partition;
  * `sortWithinPartitions` is a local sort (no shuffle beyond the partition
  * exchange Spark already does for partitionBy at write).
  */
object LakeWriter {

  /** Bronze NDJSON.gz append, arrival-time partitioned. */
  def writeBronze(df: DataFrame, path: String, partitionCols: Seq[String] = Seq("dt", "hour")): Unit =
    df.write.mode("append")
      .partitionBy(partitionCols: _*)
      .option("compression", "gzip")
      .json(path)

  /** Gold parquet append, partitioned + sorted-within-partition. */
  def writeGold(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String] = Seq("dt", "hour"),
      sortCols: Seq[String] = Seq("city", "fetched_at_utc")): Unit = {
    val sortable = sortCols.filter(df.columns.contains)
    val sorted =
      if (sortable.isEmpty) df
      else df.sortWithinPartitions(sortable.map(col): _*)
    sorted.write.mode("append")
      .partitionBy(partitionCols.filter(df.columns.contains): _*)
      .parquet(path)
  }

  /** Format-agnostic partitioned write: `parquet` (default), `orc`, `json`,
    * `csv` — the storage format is a parameter, not an architecture
    * decision. CSV gets headers; columnar formats keep their native
    * min/max stats for scan-time skipping. */
  def writeFormat(
      df: DataFrame,
      path: String,
      format: String = "parquet",
      partitionCols: Seq[String] = Seq.empty): Unit = {
    val w = df.write.mode("append").format(format)
    val withOpts = if (format == "csv") w.option("header", "true") else w
    (if (partitionCols.nonEmpty) withOpts.partitionBy(partitionCols.filter(df.columns.contains): _*)
     else withOpts).save(path)
  }

  /** Matching read; text formats (csv/json) take the explicit contract
    * schema so types round-trip without an inference pass. */
  def readFormat(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      format: String = "parquet",
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val r = spark.read.format(format)
    val withSchema = schema.fold(r)(r.schema)
    val withOpts = if (format == "csv") withSchema.option("header", "true") else withSchema
    withOpts.load(path)
  }

  /** Idempotent gold load: overwrite exactly the partitions present in this
    * batch (dynamic partition overwrite), leaving the rest of the table
    * untouched — re-running a batch replaces instead of duplicating, making
    * `README.md:219`'s idempotency claim actually true. */
  def writeGoldIdempotent(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String] = Seq("dt", "hour")): Unit =
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)
}
