package graft.sinks

import java.nio.file.Files

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.functions._

class LakeMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-maint").toString + "/t"

  test("upsert: updates replace by key, inserts append, untouched partitions survive") {
    val path = tmp()
    val base = Seq(
      ("austin", "2025-08-29", 1, 10.0),
      ("boston", "2025-08-29", 1, 20.0),
      ("chicago", "2025-08-30", 1, 30.0) // other partition — must be untouched
    ).toDF("city", "dt", "v", "temp")
    base.write.partitionBy("dt").parquet(path)

    val updates = Seq(
      ("austin", "2025-08-29", 2, 11.5), // replaces austin
      ("denver", "2025-08-29", 1, 5.0)   // new key, same partition
    ).toDF("city", "dt", "v", "temp")
    LakeMaintenance.upsert(spark, path, updates,
      keys = Seq("city"), partitionCols = Seq("dt"), orderCol = "v")

    val out = spark.read.parquet(path)
    assert(out.count() == 4)
    assert(out.filter($"city" === "austin").select($"temp").as[Double].head() == 11.5)
    assert(out.filter($"city" === "chicago").count() == 1) // untouched partition intact
    assert(Dedup.duplicates(out, Seq("city")).isEmpty)
  }

  test("upsert into an empty target just inserts; within-batch ties keep latest") {
    val path = tmp()
    val updates = Seq(
      ("austin", "2025-08-29", 1, 10.0),
      ("austin", "2025-08-29", 2, 99.0) // same key twice in one batch
    ).toDF("city", "dt", "v", "temp")
    LakeMaintenance.upsert(spark, path, updates,
      keys = Seq("city"), partitionCols = Seq("dt"), orderCol = "v")
    val out = spark.read.parquet(path).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Double]("temp") == 99.0)
  }

  test("upsert is idempotent: re-applying the same batch changes nothing") {
    val path = tmp()
    val updates = Seq(("a", "2025-08-29", 1, 1.0), ("b", "2025-08-29", 1, 2.0))
      .toDF("city", "dt", "v", "temp")
    LakeMaintenance.upsert(spark, path, updates, Seq("city"), Seq("dt"), "v")
    LakeMaintenance.upsert(spark, path, updates, Seq("city"), Seq("dt"), "v")
    assert(spark.read.parquet(path).count() == 2)
  }

  test("SCD2: changed keys close with validity range; unchanged pass through") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.from(java.time.Instant.parse(s))
    val history = Seq(
      ("austin", "TX", ts("2025-01-01T00:00:00Z"), null.asInstanceOf[Timestamp], true),
      ("boston", "MA", ts("2025-01-01T00:00:00Z"), null.asInstanceOf[Timestamp], true),
      // an already-closed old version
      ("austin", "OLD", ts("2024-01-01T00:00:00Z"), ts("2025-01-01T00:00:00Z"), false)
    ).toDF("city", "state", "valid_from", "valid_to", "is_current")
    val changes = Seq(("austin", "TX2", ts("2025-08-29T00:00:00Z")))
      .toDF("city", "state", "changed_at")

    val out = LakeMaintenance.scd2Apply(history, changes, Seq("city"), "changed_at")
    assert(out.count() == 4)
    val austin = out.filter($"city" === "austin")
      .orderBy($"valid_from")
      .select("state", "is_current").as[(String, Boolean)].collect().toSeq
    assert(austin == Seq(("OLD", false), ("TX", false), ("TX2", true)))
    // the closed TX version got its valid_to stamped with the change ts
    val closedTx = out.filter($"city" === "austin" && $"state" === "TX").head()
    assert(closedTx.getTimestamp(closedTx.fieldIndex("valid_to")) == ts("2025-08-29T00:00:00Z"))
    // boston untouched and still current
    assert(out.filter($"city" === "boston" && $"is_current").count() == 1)
    // exactly one current row per key
    val currents = out.filter($"is_current").groupBy("city").count()
      .select("count").as[Long].collect()
    assert(currents.forall(_ == 1L))
  }

  test("compaction shrinks file count, preserves data exactly") {
    val path = tmp()
    // 8 tiny files in one partition
    spark.range(800).select(
        lit("2025-08-29").as("dt"), col("id"), (col("id") * 2).as("v"))
      .repartition(8)
      .write.partitionBy("dt").parquet(path)
    val before = spark.read.parquet(s"$path/dt=2025-08-29")
    val beforeFiles = before.inputFiles.length
    val beforeSum = before.agg(sum("v")).head().getLong(0)
    assert(beforeFiles == 8)

    LakeMaintenance.compactPartition(spark, path, "dt=2025-08-29")
    val after = spark.read.parquet(s"$path/dt=2025-08-29")
    assert(after.inputFiles.length == 1)
    assert(after.count() == 800)
    assert(after.agg(sum("v")).head().getLong(0) == beforeSum)

    // no temp/backup residue, and nothing visible to partition discovery
    // beyond the real partition dir (hidden names start with . or _)
    val entries = new java.io.File(path).listFiles().map(_.getName)
      .filterNot(n => n.startsWith(".") || n.startsWith("_"))
    assert(entries.toSet == Set("dt=2025-08-29"))
    // whole-table read still sees exactly one copy of the partition
    assert(spark.read.parquet(path).count() == 800)
  }

  test("upsert probe: existing-but-empty target dir behaves as first write") {
    val path = tmp()
    new java.io.File(path).mkdirs() // exists, but holds no parquet files
    val updates = Seq(("a", "2025-08-29", 1, 1.0)).toDF("city", "dt", "v", "temp")
    LakeMaintenance.upsert(spark, path, updates, Seq("city"), Seq("dt"), "v")
    assert(spark.read.parquet(path).count() == 1)
  }
}
