package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketedSpec extends SparkSpec {
  import spark.implicits._

  private def facts = (
    (1L to 400L).map(i => (i, s"left_$i", (i % 7).toInt)).toDF("k", "lv", "lg"),
    (1L to 400L).flatMap(i => Seq((i, i * 10.0), (i, i * 20.0))).toDF("k", "rv"))

  test("co-located join on bucketed tables plans with zero shuffle exchanges") {
    val (a, b) = facts
    Bucketed.writeBucketed(a, "bkt_left", 4, "k")
    Bucketed.writeBucketed(b, "bkt_right", 4, "k")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bkt_left")
        .join(spark.table("bkt_right"), "k")
      joined.collect() // finalize the adaptive plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed co-located join must not shuffle either side:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("bucketed join returns exactly the plain join's rows") {
    val (a, b) = facts
    Bucketed.writeBucketed(a, "bkt_left2", 4, "k")
    Bucketed.writeBucketed(b, "bkt_right2", 4, "k")
    def agg(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
      l.join(r, "k").groupBy($"lg")
        .agg(round(sum($"rv"), 2).as("s"), count(lit(1)).as("n"))
        .collect().map(x => (x.getInt(0), x.getDouble(1), x.getLong(2))).toSet
    assert(agg(spark.table("bkt_left2"), spark.table("bkt_right2")) == agg(a, b))
  }

  test("writeBucketed is idempotent within a session and self-heals stale dirs") {
    val df = Seq((1L, "x")).toDF("k", "v")
    assert(Bucketed.writeBucketed(df, "bkt_idem", 2, "k"))
    assert(!Bucketed.writeBucketed(df, "bkt_idem", 2, "k"), "second call must no-op")
    // simulate a dead catalog with surviving files: drop the catalog entry
    // only, leaving the directory behind — the next write must recover
    spark.sql("DROP TABLE bkt_idem")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val dir = new java.io.File(warehouse, "bkt_idem")
    if (!dir.exists()) dir.mkdirs() // DROP TABLE on managed removes files
    new java.io.File(dir, "stale-leftover").createNewFile()
    assert(Bucketed.writeBucketed(df, "bkt_idem", 2, "k"), "must rebuild after catalog loss")
    assert(spark.table("bkt_idem").count() == 1)
  }
}
