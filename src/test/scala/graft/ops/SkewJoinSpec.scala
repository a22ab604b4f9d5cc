package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join, row for row") {
    val big = spark.range(10000).select(
      (when($"id" % 100 === 0, "cold").otherwise("hot")).as("k"), // 99% skew
      $"id".as("v"))
    val small = Seq(("hot", 1), ("cold", 2), ("absent", 3)).toDF("k", "tag")
    val salted = SkewJoin.saltedInnerJoin(big, small, Seq("k"), salts = 4)
      .groupBy("k", "tag").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val plain = big.join(small, "k")
      .groupBy("k", "tag").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(salted == plain)
    assert(salted.map(_._1) == Set("hot", "cold")) // inner join drops 'absent'
  }

  test("big-side rows spread across salt values") {
    val big = spark.range(1000).select(lit("hot").as("k"), $"id".as("v"))
    val salts = big.withColumn("_salt",
      pmod(xxhash64(struct(col("k"), col("v"))), lit(8L)))
      .select("_salt").distinct().count()
    assert(salts > 4) // the single hot key occupies most of the 8 salt lanes
  }
}
