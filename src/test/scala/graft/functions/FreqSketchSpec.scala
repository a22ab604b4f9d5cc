package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FreqSketchSpec extends SparkSpec {
  import spark.implicits._
  import FreqSketch._

  test("exact regime: distinct items fit the map → maxError 0, counts exact") {
    // 10 items, skewed counts 1000, 900, ... 100
    val df = spark.range(10).select($"id".as("item"), (lit(1000) - $"id" * 100).as("n"))
      .select($"item", explode(sequence(lit(1), $"n")).as("rep"))
    val bytes = df.agg(freq_sketch_agg($"item", 64).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    assert(maxError(bytes) == 0L)
    val got = frequentItems(bytes).map(r => r._1 -> r._2).toMap
    assert(got(0L) == 1000L && got(5L) == 500L && got(9L) == 100L)
  }

  test("purging regime: planted 10% heavy hitter always surfaces (no false negatives)") {
    // 100k rows: 10% are item 42, the rest spread over 50k distinct items —
    // far beyond maxMapSize 64, so the sketch purges constantly
    val df = spark.range(100000).select(
      when($"id" % 10 === 0, 42L).otherwise($"id" + 1000000).as("item"))
    val bytes = df.repartition(8).agg(freq_sketch_agg($"item", 64).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    assert(maxError(bytes) > 0L) // genuinely in the approximate regime
    val rows = frequentItems(bytes)
    val hh = rows.find(_._1 == 42L)
    assert(hh.isDefined, "true heavy hitter missed — violates NO_FALSE_NEGATIVES")
    val (_, est, lb, ub) = hh.get
    assert(lb <= 10000L && 10000L <= ub, s"true count 10000 outside [$lb, $ub]")
    assert(lb <= est && est <= ub)
  }
}
