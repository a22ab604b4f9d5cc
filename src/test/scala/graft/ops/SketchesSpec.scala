package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("bloom-pruned semi join is bit-identical to the plain semi join") {
    val big = spark.range(20000).select(($"id" % 997).as("k"), $"id".as("v"))
    val small = spark.range(50).select(($"id" * 13).as("sk")) // 50 keys, some matching
    val exact = big.join(small, big("k") === col("sk"), "left_semi")
      .collect().map(_.toSeq).toSet
    val viaBloom = Sketches.bloomSemiJoin(big, small, "k", "sk", expectedKeys = 100)
      .collect().map(_.toSeq).toSet
    assert(viaBloom == exact)
    assert(exact.nonEmpty)
  }

  test("bloom-pruned semi join on STRING keys matches the plain semi join") {
    val big = spark.range(5000).select(
      concat(lit("key"), ($"id" % 321).cast("string")).as("k"), $"id".as("v"))
    val small = spark.range(20).select(concat(lit("key"), ($"id" * 7).cast("string")).as("sk"))
    val exact = big.join(small, big("k") === col("sk"), "left_semi")
      .collect().map(_.toSeq).toSet
    val got = Sketches.bloomSemiJoin(big, small, "k", "sk", expectedKeys = 100)
      .collect().map(_.toSeq).toSet
    assert(got == exact && exact.nonEmpty)
  }

  test("two-pass heavy hitters are exact: same keys and counts as GROUP BY HAVING") {
    // skewed stream: key "hot" dominates, a few warm keys, long tail
    val df = spark.range(30000).select(
      when($"id" % 3 === 0, "hot")
        .when($"id" % 31 === 0, concat(lit("warm"), ($"id" % 5).cast("string")))
        .otherwise(concat(lit("cold"), ($"id" % 4000).cast("string"))).as("k"))
    val exact = df.groupBy("k").agg(count(lit(1)).as("n"))
      .filter($"n" >= 300)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Sketches.heavyHitters(df, "k", threshold = 300)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exact)
    assert(exact.contains("hot"))
  }
}
