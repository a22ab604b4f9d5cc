package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the reference's ad-hoc DQ SQL
  * (`redshift/init.sql:19-55`: row count, fully-null rows, per-column null
  * distribution, duplicate keys) generalized into a rule API that evaluates
  * EVERY rule in ONE aggregation pass over the table (single scan, map-side
  * partials), instead of one query per check.
  *
  * Uniqueness is the exception — it needs its own shuffle on the key — and
  * is exposed separately so callers don't pay it unless asked.
  */
object DqCheck {

  final case class Rule(name: String, metric: Column, pass: Column)

  /** count(*) == expected (or > 0 when no expectation). */
  def rowCount(min: Long = 1): Rule =
    Rule("row_count", count(lit(1)), count(lit(1)) >= min)

  /** No row where ALL the given columns are null (init.sql:30-36). */
  def noFullyNullRows(cols: Seq[String]): Rule = {
    val allNull = cols.map(col(_).isNull).reduce(_ && _)
    val m = sum(when(allNull, 1).otherwise(0))
    Rule("fully_null_rows", m, m === 0)
  }

  /** Null fraction of a column stays under a bound (init.sql:39-44). */
  def maxNullFraction(c: String, bound: Double): Rule = {
    val frac = sum(when(col(c).isNull, 1).otherwise(0)).cast("double") / count(lit(1))
    Rule(s"null_fraction_$c", round(frac, 6), frac <= bound)
  }

  /** Values inside [lo, hi] (nulls don't fail the range rule). */
  def valuesInRange(c: String, lo: Double, hi: Double): Rule = {
    val bad = sum(when(col(c).isNotNull && !col(c).between(lo, hi), 1).otherwise(0))
    Rule(s"out_of_range_$c", bad, bad === 0)
  }

  /** Evaluate all rules in one pass → (rule, metric, passed) report. */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val aggs = rules.flatMap(r => Seq(
      r.metric.cast("double").as(s"${r.name}__m"),
      r.pass.as(s"${r.name}__p")))
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = rules.map(r => struct(
      lit(r.name).as("rule"),
      col(s"${r.name}__m").as("metric"),
      col(s"${r.name}__p").as("passed")))
    row.select(explode(array(entries: _*)).as("r"))
      .select(col("r.rule"), col("r.metric"), col("r.passed"))
  }

  /** Duplicate-key audit (init.sql:47-52): one shuffle on the key. */
  def duplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    Dedup.duplicates(df, keys)
}
