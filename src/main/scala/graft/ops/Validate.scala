package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range-validation tagging (F19/P10): the fetcher's
  * `lambda/ingest_weather/handler.py:92-100` appends error codes to a
  * `validation_errors` array when a value is null or out of range, WITHOUT
  * dropping the row — bad records flow through tagged.
  *
  * Pure built-ins (`array` + `filter` higher-order function), so the whole
  * tagging is one codegen'd projection; no UDF, no shuffle.
  */
object Validate {

  /** One rule: error code + the predicate under which the code fires. */
  final case class Rule(code: String, firesWhen: Column)

  /** null-or-out-of-range rule, the reference's shape
    * (`value is None or not (lo <= value <= hi)`). */
  def rangeRule(c: Column, code: String, lo: Double, hi: Double): Rule =
    Rule(code, c.isNull || !c.between(lo, hi))

  /** Reference rules (handler.py:93-97) for the weather contract. */
  def weatherRules(df: DataFrame): Seq[Rule] = Seq(
    rangeRule(df("temp_c"), "temp_c_out_of_range_or_null", -90, 60),
    rangeRule(df("humidity"), "humidity_out_of_range_or_null", 0, 100),
    Rule("pressure_out_of_range_or_null", df("pressure").isNull || df("pressure") <= 0))

  /** Column holding the compacted error array for the given rules. */
  def errorsColumn(rules: Seq[Rule]): Column =
    filter(
      array(rules.map(r => when(r.firesWhen, lit(r.code))): _*),
      x => x.isNotNull)

  /** Tag `df` with `validation_errors` (array<string>) + `n_errors` (int). */
  def tag(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val errs = errorsColumn(rules)
    df.withColumn("validation_errors", errs)
      .withColumn("n_errors", size(col("validation_errors")))
  }
}
