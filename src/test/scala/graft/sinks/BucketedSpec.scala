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

  test("bucketed join stays Exchange-free under AQE coalescing with a skewed key") {
    // AQE interplay: adaptive coalescing and skew-join splitting both work
    // by inserting/rewriting Exchanges — neither may touch a join whose
    // children are co-located by on-disk bucketing (bucketed scan outputs
    // are not coalescible shuffle partitions, and AQE's skew handling must
    // not re-shuffle a side to split the hot key, which would forfeit the
    // amortized layout). Pin that with skew present and coalescing tuned
    // aggressively, the plan still has zero Exchanges on either side.
    val hot = 7L
    val left = ((1L to 200L).map(i => (i, s"l$i")) ++
      (1 to 300).map(j => (hot, s"hot$j"))).toDF("k", "lv")
    val right = ((1L to 200L).map(i => (i, i * 1.0)) ++
      (1 to 300).map(j => (hot, j * 1.0))).toDF("k", "rv")
    Bucketed.writeBucketed(left, "bkt_skew_l", 4, "k")
    Bucketed.writeBucketed(right, "bkt_skew_r", 4, "k")
    val prev = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_skew_l").join(spark.table("bkt_skew_r"), "k")
      val n = joined.count()
      assert(n == left.join(right, "k").count(), "AQE plan must not change results")
      joined.collect() // finalize the adaptive plan before inspecting it
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"AQE must not re-introduce a shuffle into the bucketed join:\n$plan")
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("stale-dir delete refuses any target outside the warehouse root") {
    val warehouse = java.nio.file.Files.createTempDirectory("bkt-contain").toFile
    val outside = java.nio.file.Files.createTempDirectory("bkt-escape").toFile
    val victim = new java.io.File(outside, "precious"); victim.mkdirs()
    // a crafted ../-smuggling table name canonicalizes outside the root
    val crafted = new java.io.File(warehouse, "../" + outside.getName + "/precious")
    intercept[IllegalArgumentException] { Bucketed.rmContained(crafted, warehouse) }
    assert(victim.exists(), "containment guard must leave the outside dir intact")
    // the warehouse root itself is not a valid target either (separator check)
    intercept[IllegalArgumentException] { Bucketed.rmContained(warehouse, warehouse) }
    // a genuinely contained dir still deletes
    val inside = new java.io.File(warehouse, "tbl"); inside.mkdirs()
    new java.io.File(inside, "part-0").createNewFile()
    Bucketed.rmContained(inside, warehouse)
    assert(!inside.exists())
  }

  test("rebuilding against regenerated data vacuums the stale vintage table") {
    val df = (1L to 20L).map(i => (i, i * 2.0)).toDF("k", "v")
    // same logical table (name, source, geometry, key), two data vintages
    val t1 = Bucketed.tableName("facts", "/spec/dir", 4, "k", "aaaa1111")
    val t2 = Bucketed.tableName("facts", "/spec/dir", 4, "k", "bbbb2222")
    Bucketed.writeBucketed(df, t1, 4, "k")
    assert(spark.catalog.tableExists(t1))
    Bucketed.writeBucketed(df, t2, 4, "k")
    assert(!spark.catalog.tableExists(t1),
      "stale vintage must be dropped when its successor builds")
    assert(spark.table(t2).count() == 20, "current vintage must serve")
    // a different bucket KEY is a different identity — never a vacuum target
    val otherKey = Bucketed.tableName("facts", "/spec/dir", 4, "v", "cccc3333")
    Bucketed.writeBucketed(df, otherKey, 4, "v")
    assert(spark.catalog.tableExists(t2) && spark.catalog.tableExists(otherKey))
    // names outside the tableName convention are never candidates
    Bucketed.writeBucketed(df, "bkt_plain_name", 2, "k")
    Bucketed.writeBucketed(df,
      Bucketed.tableName("facts", "/spec/dir", 4, "k", "dddd4444"), 4, "k")
    assert(spark.catalog.tableExists("bkt_plain_name"))
  }

  test("writeBucketed is safe under concurrent same-table builds") {
    val df = (1L to 50L).map(i => (i, s"v$i")).toDF("k", "v")
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 4).map(_ => new Thread(() => {
      if (Bucketed.writeBucketed(df, "bkt_race", 2, "k")) builds.incrementAndGet()
      ()
    }))
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(builds.get() == 1, "exactly one racer must perform the build")
    assert(spark.table("bkt_race").count() == 50)
  }
}
