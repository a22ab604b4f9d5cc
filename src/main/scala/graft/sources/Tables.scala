package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated star-schema / extension tables
  * (`TESTDATA.md`). Explicit by-name accessors so query code reads like the
  * SQL it mirrors. Parquet scans get column pruning + predicate pushdown from
  * Catalyst for free; at 100 TB these would be partitioned table paths, and
  * the same `spark.read.parquet(dir)` picks up hive-style partition dirs.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, d: String): DataFrame   = table(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame   = table(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame = table(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = table(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame     = table(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame   = table(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame = table(spark, d, "lineitem")
  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects outright. Read it as a long (nanos since epoch) and floor
    * to microseconds — the same truncation DuckDB applies when it surfaces the
    * column as a µs TIMESTAMP, so oracle comparisons line up. Integer `div`
    * (not `/`) keeps the full 64-bit precision; double division would lose
    * low-order digits at 1.7e18 nanos.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(spark: SparkSession, d: String): DataFrame  = table(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")
}
