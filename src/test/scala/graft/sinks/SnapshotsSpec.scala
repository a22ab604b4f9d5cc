package graft.sinks

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-snap").toString + "/t"

  test("append commits accumulate; every version stays readable (time travel)") {
    val t = tmp()
    val v1 = Snapshots.commit(Seq((1, "a"), (2, "b")).toDF("k", "v"), t)
    val v2 = Snapshots.commit(Seq((3, "c")).toDF("k", "v"), t)
    assert((v1, v2) == (1L, 2L))
    assert(Snapshots.read(spark, t).count() == 3)
    assert(Snapshots.read(spark, t, Some(1L)).count() == 2) // time travel
    assert(Snapshots.versions(spark, t) == Seq(1L, 2L))
  }

  test("overwrite commit replaces the snapshot, prior version unchanged") {
    val t = tmp()
    Snapshots.commit(Seq((1, "old")).toDF("k", "v"), t)
    Snapshots.commit(Seq((9, "new"), (10, "new2")).toDF("k", "v"), t, SaveMode.Overwrite)
    assert(Snapshots.read(spark, t).select("v").as[String].collect().toSet == Set("new", "new2"))
    assert(Snapshots.read(spark, t, Some(1L)).select("v").as[String].head() == "old")
  }

  test("vacuum drops unreferenced data dirs but keeps retained versions intact") {
    val t = tmp()
    Snapshots.commit(Seq((1, "x")).toDF("k", "v"), t)
    Snapshots.commit(Seq((2, "y")).toDF("k", "v"), t, SaveMode.Overwrite)
    Snapshots.commit(Seq((3, "z")).toDF("k", "v"), t)
    // default grace window: a just-written dir is NOT vacuumable even when
    // unreferenced (it may belong to a concurrent commit that hasn't
    // published its manifest yet)
    Snapshots.vacuum(spark, t, retainLast = 2)
    assert(new java.io.File(s"$t/data").listFiles().length == 3)
    // with the window waived (no concurrent writers), orphans drop
    Snapshots.vacuum(spark, t, retainLast = 2, minAgeMs = 0L)
    assert(Snapshots.versions(spark, t) == Seq(2L, 3L))
    assert(Snapshots.read(spark, t).select("k").as[Int].collect().toSet == Set(2, 3))
    // v1's orphaned data dir is gone
    val dataDirs = new java.io.File(s"$t/data").listFiles().map(_.getName)
    assert(dataDirs.length == 2)
  }

  test("compact publishes a new version; pinned old versions still read") {
    val t = tmp()
    (1 to 4).foreach(i => Snapshots.commit(
      spark.range(200).select(($"id" + i * 1000).as("k")).repartition(4), t))
    val before = Snapshots.read(spark, t)
    assert(before.inputFiles.length >= 8) // many small files across commits
    val v = Snapshots.compact(spark, t, targetFileRows = 1000000L)
    val after = Snapshots.read(spark, t)
    assert(after.inputFiles.length == 1)
    assert(after.count() == 800)
    // time travel to a pre-compaction version still works
    assert(Snapshots.read(spark, t, Some(v - 1)).count() == 800)
  }

  test("partitioned: dynamic overwrite replaces only touched partitions") {
    val t = tmp()
    val day1 = Seq(("2025-01-01", 1, "a"), ("2025-01-01", 2, "b"),
      ("2025-01-02", 3, "c")).toDF("dt", "k", "v")
    Snapshots.commitPartitioned(day1, t, Seq("dt"))
    assert(Snapshots.partitions(spark, t) == Seq("dt=2025-01-01", "dt=2025-01-02"))
    // dynamic overwrite of ONLY dt=2025-01-02
    val fix = Seq(("2025-01-02", 9, "fixed")).toDF("dt", "k", "v")
    Snapshots.commitPartitioned(fix, t, Seq("dt"), SaveMode.Overwrite)
    val now = Snapshots.read(spark, t)
    assert(now.count() == 3) // 2 surviving day-1 rows + 1 replacement
    assert(now.filter($"dt" === "2025-01-02").select("v").as[String].collect().toSeq == Seq("fixed"))
    assert(now.filter($"dt" === "2025-01-01").count() == 2) // untouched
    // time travel to pre-fix still shows the original day-2 row
    assert(Snapshots.read(spark, t, Some(1L))
      .filter($"dt" === "2025-01-02").select("v").as[String].collect().toSeq == Seq("c"))
  }

  test("partitioned: append accumulates within a partition; pruned read scans only matching dirs") {
    val t = tmp()
    Snapshots.commitPartitioned(
      Seq(("2025-01-01", 1), ("2025-01-02", 2)).toDF("dt", "k"), t, Seq("dt"))
    Snapshots.commitPartitioned(
      Seq(("2025-01-01", 10)).toDF("dt", "k"), t, Seq("dt"))
    val all = Snapshots.read(spark, t)
    assert(all.count() == 3)
    val pruned = Snapshots.read(spark, t, None, p => p("dt") == "2025-01-01")
    assert(pruned.select("k").as[Int].collect().toSet == Set(1, 10))
    // the prune happened at the MANIFEST, before file I/O: every input file
    // sits under a dt=2025-01-01 path
    assert(pruned.inputFiles.nonEmpty && pruned.inputFiles.forall(_.contains("dt=2025-01-01")))
  }

  test("partitioned: compact rewrites each partition to one file, history intact") {
    val t = tmp()
    (1 to 3).foreach { i =>
      Snapshots.commitPartitioned(
        Seq(("a", i), ("b", i * 100)).toDF("g", "k").repartition(2), t, Seq("g"))
    }
    val before = Snapshots.read(spark, t)
    assert(before.inputFiles.length > 2)
    val v = Snapshots.compact(spark, t)
    val after = Snapshots.read(spark, t)
    assert(after.count() == 6 && after.inputFiles.length == 2) // one per partition
    assert(Snapshots.partitions(spark, t) == Seq("g=a", "g=b"))
    assert(Snapshots.read(spark, t, Some(v - 1)).count() == 6)
    // vacuum drops the pre-compaction small files once out of retention
    Snapshots.vacuum(spark, t, retainLast = 1, minAgeMs = 0L)
    assert(Snapshots.read(spark, t).count() == 6)
  }

  test("partitioned and plain commits don't mix; specs decode hive escaping") {
    val t = tmp()
    Snapshots.commitPartitioned(Seq(("x y", 1)).toDF("g", "k"), t, Seq("g"))
    intercept[IllegalArgumentException] {
      Snapshots.commit(Seq((1, "a")).toDF("k", "v"), t) // append to partitioned
    }
    intercept[IllegalArgumentException] { // overwrite must not de-partition
      Snapshots.commit(Seq((1, "a")).toDF("k", "v"), t, SaveMode.Overwrite)
    }
    assert(Snapshots.parseSpec(Snapshots.partitions(spark, t).head) == Map("g" -> "x y"))
    assert(Snapshots.read(spark, t).select("g").as[String].head() == "x y")
  }

  test("readers only see whole commits: no tmp manifests, immutable data dirs") {
    val t = tmp()
    Snapshots.commit(spark.range(100).select($"id", ($"id" * 2).as("v")), t)
    val names = new java.io.File(s"$t/_manifests").listFiles().map(_.getName)
      .filterNot(_.startsWith(".")) // local-FS .crc sidecars; hidden anyway
    assert(names.nonEmpty && names.forall(_.matches("v\\d{5}\\.json"))) // no tmp residue
    assert(Snapshots.read(spark, t).agg(sum($"v")).head().getLong(0) == 9900L)
  }
}
