package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All capabilities live in `graft.queries.*` / `graft.ops.*` / `graft.ext.*`;
  * this object is just the registry the driver harness reads.
  */
object SparkEntry {

  /** Every registered capability, in registration order. */
  def allQueries: Seq[QueryDef] =
    CoreBattery.all ++ RelationalBattery.all ++ PipelineBattery.all ++
      ExtensionBattery.all ++ BreadthBattery.all ++ GraphBattery.all ++
      CurationBattery.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
