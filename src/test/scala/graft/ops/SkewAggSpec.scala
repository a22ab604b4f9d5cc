package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewAggSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals the plain group-by on heavily skewed data") {
    // 90% of rows on one hot key
    val df = (0 until 2000).map { i =>
      (if (i % 10 == 0) s"k${i % 7}" else "HOT", i.toDouble)
    }.toDF("k", "x")
    val salted = SkewAgg.saltedAgg(df, Seq("k"), salts = 16,
        partials = Seq("s" -> sum($"x"), "c" -> count(lit(1)), "mx" -> max($"x")),
        finals = Seq(sum($"s").as("total"), sum($"c").as("n"), max($"mx").as("mx")))
      .orderBy("k").collect().toSeq
    val plain = df.groupBy("k")
      .agg(sum($"x").as("total"), count(lit(1)).as("n"), max($"x").as("mx"))
      .orderBy("k").collect().toSeq
    assert(salted == plain)
  }

  test("phase 1 actually splits the hot key across salts") {
    val df = Seq.fill(100)(("HOT", 1.0)).toDF("k", "x")
    val salted = df.withColumn("_salt",
      pmod(xxhash64(struct(df.columns.map(col): _*)), lit(8)))
    // all rows identical → one salt bucket; vary the rows to spread
    val varied = (0 until 100).map(i => ("HOT", i.toDouble)).toDF("k", "x")
      .withColumn("_salt", pmod(xxhash64(struct(col("k"), col("x"))), lit(8)))
    assert(varied.select("_salt").distinct().count() > 1)
    assert(salted.select("_salt").distinct().count() == 1) // degenerate case documented
  }
}
