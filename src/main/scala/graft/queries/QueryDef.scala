package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine capability: a Spark DataFrame builder plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query. The
  * driver hash-compares the two on sf0.01 — column names/types must line up
  * exactly, so every computed column is aliased identically on both sides and
  * double aggregates are rounded to pin low-order float bits.
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, build, Some(oracle))
  def rowsOnly(name: String)(build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, build, None)
}
