package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.StructType

/** Contract-schema conformance: the cast-or-null loop of
  * `glue/bronze_to_silver_openweather.py:70-86`, collapsed into ONE `select`.
  *
  * The reference does `withColumn` per column (13 chained projections); a
  * single projection keeps the whole conform inside one whole-stage-codegen
  * span and gives Catalyst one node to push column pruning through — at
  * 100 TB the difference is 13 generated projections vs 1.
  *
  * Uses `try_cast`, which is null-on-mismatch under Spark 4's default ANSI
  * mode — matching the reference's `float()/int()`-with-None semantics
  * (a plain `cast` would throw on the first malformed value).
  */
object Conform {

  /** Every contract column cast to its type; columns absent from `df`
    * materialize as typed nulls; extra input columns are dropped. */
  def toContract(df: DataFrame, contract: StructType): DataFrame = {
    val present = df.columns.toSet
    df.select(contract.fields.toSeq.map { f =>
      val base = if (present.contains(f.name)) col(f.name) else lit(null)
      base.try_cast(f.dataType).as(f.name)
    }: _*)
  }

  /** Variant keeping pass-through columns not named in the contract
    * (e.g. partition columns already derived upstream). */
  def toContractKeepExtra(df: DataFrame, contract: StructType): DataFrame = {
    val contractNames = contract.fields.map(_.name).toSet
    val extras = df.columns.filterNot(contractNames.contains).map(col).toSeq
    val present = df.columns.toSet
    val conformed = contract.fields.toSeq.map { f =>
      val base = if (present.contains(f.name)) col(f.name) else lit(null)
      base.try_cast(f.dataType).as(f.name)
    }
    df.select(conformed ++ extras: _*)
  }
}
