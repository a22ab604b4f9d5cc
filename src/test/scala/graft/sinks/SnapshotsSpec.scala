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
    Snapshots.vacuum(spark, t, retainLast = 2)
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

  test("readers only see whole commits: no tmp manifests, immutable data dirs") {
    val t = tmp()
    Snapshots.commit(spark.range(100).select($"id", ($"id" * 2).as("v")), t)
    val names = new java.io.File(s"$t/_manifests").listFiles().map(_.getName)
      .filterNot(_.startsWith(".")) // local-FS .crc sidecars; hidden anyway
    assert(names.nonEmpty && names.forall(_.matches("v\\d{5}\\.json"))) // no tmp residue
    assert(Snapshots.read(spark, t).agg(sum($"v")).head().getLong(0) == 9900L)
  }
}
