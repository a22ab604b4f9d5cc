package graft.ops

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class MetricsSpec extends SparkSpec {
  import spark.implicits._

  test("observe() counters ride the single action, replacing gate counts") {
    val df = Seq((1, "a"), (2, null), (3, "c")).toDF("id", "v")
    val (observed, obs) = Metrics.observed(df, "ingest", Seq(
      count(lit(1)).as("rows"),
      sum(when($"v".isNull, 1).otherwise(0)).as("null_v")))
    observed.collect() // ONE action; metrics attach to it
    val m = obs.get
    assert(m("rows") == 3L && m("null_v") == 1L)
  }
}

class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("HLL count-distinct within 5% of exact; sketch median within 2% band") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val approx = li.agg(
      approx_count_distinct($"l_partkey").as("ad"),
      percentile_approx($"l_extendedprice", lit(0.5), lit(10000)).as("p50"))
      .head()
    val exact = li.agg(
      countDistinct($"l_partkey").as("d"),
      expr("percentile(l_extendedprice, 0.5)").as("p50"))
      .head()
    val (ad, d) = (approx.getLong(0).toDouble, exact.getLong(0).toDouble)
    assert(math.abs(ad - d) / d < 0.05)
    val (ap, ep) = (approx.getDouble(1), exact.getDouble(1))
    assert(math.abs(ap - ep) / ep < 0.02)
  }

  test("exact regime: low-cardinality HLL and over-provisioned percentile equal exact") {
    // What q_approx_stats' hash oracle relies on: within HLL++'s
    // linear-counting range the estimate IS the count, and a percentile
    // whose accuracy exceeds the group size retains every value.
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val got = li.groupBy($"l_returnflag").agg(
      approx_count_distinct($"l_linestatus").as("ad"),
      percentile_approx($"l_quantity", lit(0.5), lit(1000000)).as("p50"))
    val want = li.groupBy($"l_returnflag").agg(
      countDistinct($"l_linestatus").as("d"),
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)").as("p50"))
    val g = got.collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val w = want.collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(g == w, s"exact-regime approx aggregates must equal exact: $g vs $w")
  }
}
