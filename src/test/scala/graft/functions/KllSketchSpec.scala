package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KllSketchSpec extends SparkSpec {
  import spark.implicits._
  import KllSketch._

  test("below k the sketch retains everything: quantiles are exact") {
    val bytes = spark.range(1, 102).select(lit("g").as("g"), $"id".cast("double").as("v"))
      .groupBy($"g").agg(kll_sketch_agg($"v").as("sk"))
      .head().getAs[Array[Byte]]("sk")
    assert(quantile(bytes, 0.5) == 51.0)
    assert(quantile(bytes, 0.0) == 1.0)
    assert(quantile(bytes, 1.0) == 101.0)
  }

  test("100k uniform values: p50/p90 within the guaranteed rank error") {
    val n = 100000
    val df = spark.range(n).select(lit("g").as("g"), $"id".cast("double").as("v"))
    val bytes = df.repartition(8)
      .groupBy($"g").agg(kll_sketch_agg($"v").as("sk"))
      .head().getAs[Array[Byte]]("sk")
    val eps = rankError(bytes) * 2 // two-sided safety on the one-sided bound
    assert(eps < 0.04, s"default k should bound rank error tightly, got $eps")
    for (r <- Seq(0.25, 0.5, 0.9)) {
      val est = quantile(bytes, r)
      val estRank = est / n // uniform 0..n-1: value ≈ rank · n
      assert(math.abs(estRank - r) <= eps,
        s"quantile($r) = $est → rank ${estRank}, off by more than $eps")
    }
  }
}
