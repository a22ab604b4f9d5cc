package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation}

/** Pipeline observability (SURVEY §2.4 A6 / §2.9 T8): the reference logs
  * row counts at every stage with EXTRA actions (`glue:52,63,104` — each a
  * full rescan of bronze). `observe()` attaches the same counters to the
  * single real action: metrics ride along with the job, zero extra scans —
  * the 100 TB-safe replacement for gate `count()`s.
  */
object Metrics {

  /** Attach named aggregate metrics to `df`; read them from the returned
    * Observation after the FIRST action on the returned frame. */
  def observed(df: DataFrame, name: String, metrics: Seq[Column]): (DataFrame, Observation) = {
    val obs = Observation(name)
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}
