package graft.sinks

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketing = pre-shuffling at write time: two tables bucketed on the same
  * key with the same bucket count join WITHOUT a shuffle exchange — the
  * co-located fact-fact join strategy for repeated joins at 100 TB (pay the
  * shuffle once at load, never per query).
  */
class BucketedJoinSpec extends SparkSpec {

  test("join of co-bucketed tables plans without a shuffle exchange") {
    val wh = Files.createTempDirectory("graft-bucketed").toString
    val broadcastBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      spark.range(1000)
        .select(col("id").as("k"), (col("id") * 2).as("a"))
        .write.bucketBy(4, "k").sortBy("k")
        .option("path", s"$wh/t_left").mode("overwrite").saveAsTable("t_left")
      spark.range(1000)
        .select(col("id").as("k"), (col("id") * 3).as("b"))
        .write.bucketBy(4, "k").sortBy("k")
        .option("path", s"$wh/t_right").mode("overwrite").saveAsTable("t_right")

      val joined = spark.table("t_left").join(spark.table("t_right"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 1000)

      // and the result is correct
      val r = joined.filter(col("k") === 7).select("a", "b").head()
      assert(r.getLong(0) == 14L && r.getLong(1) == 21L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastBefore)
      spark.sql("DROP TABLE IF EXISTS t_left")
      spark.sql("DROP TABLE IF EXISTS t_right")
    }
  }
}
