package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted two-phase aggregation for skewed keys.
  *
  * A plain `groupBy(key).agg(...)` hash-partitions every row of a hot key to
  * ONE reducer; at 100 TB a single pathological key (empty string, null-ish
  * sentinel, one dominant customer) stalls the stage. Salting splits each
  * key into `salts` sub-groups aggregated in parallel, then re-aggregates
  * the per-salt partials — correct for any algebraic aggregate expressed as
  * (partial, merge) pairs.
  *
  * Spark's map-side partial aggregation already handles MODERATE skew (each
  * map task pre-combines); explicit salting is for the case where even the
  * per-reducer merge of one key's partials dominates — or where AQE's
  * skew-join split (which handles joins, not aggregations) can't help.
  *
  * The salt is deterministic (hash of the whole row modulo `salts`), so
  * results are reproducible and the operator stays oracle-comparable.
  */
object SkewAgg {

  /** Two-phase salted sum/count/avg-style aggregation.
    *
    * @param partials  (alias → partial aggregate over the raw rows), e.g.
    *                  "s" -> sum($"x"), "c" -> count(lit(1))
    * @param finals    final merge over the partial columns, e.g.
    *                  sum($"s").as("total"), sum($"c").as("n")
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      salts: Int,
      partials: Seq[(String, Column)],
      finals: Seq[Column]): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(xxhash64(struct(df.columns.map(col): _*)), lit(salts)))
    val phase1 = salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(partials.head._2.as(partials.head._1),
        partials.tail.map { case (n, c) => c.as(n) }: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(finals.head, finals.tail: _*)
  }
}
