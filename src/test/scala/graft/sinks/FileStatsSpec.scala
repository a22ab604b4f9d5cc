package graft.sinks

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FileStatsSpec extends SparkSpec {
  import spark.implicits._

  test("per-file zone maps: one row per file; pruning keeps every matching row") {
    val path = Files.createTempDirectory("graft-stats").toString + "/t"
    // 8 files, each covering a disjoint key range (sorted write = tight ranges)
    spark.range(8000).select($"id".as("k"), ($"id" * 3).as("v"))
      .repartitionByRange(8, $"k")
      .sortWithinPartitions($"k")
      .write.parquet(path)
    val df = spark.read.parquet(path)
    val stats = FileStats.collect(df, Seq("k"))
    assert(stats.count() == df.inputFiles.length.toLong)
    assert(stats.agg(sum($"n_rows")).head().getLong(0) == 8000L)

    val probe = 4242L
    val cands = FileStats.candidateFiles(stats, "k", lit(probe))
      .as[String].collect().toSet
    assert(cands.size == 1) // disjoint ranges → exactly one file can hold it
    // completeness: scanning ONLY candidate files still finds the row
    val found = spark.read.parquet(cands.toSeq: _*).filter($"k" === probe).count()
    assert(found == 1L)
  }

  test("per-file blooms prune point lookups where zone maps cannot") {
    val path = Files.createTempDirectory("graft-stats").toString + "/t"
    // adversarial for zone maps: keys hash-scattered across 8 files, so
    // every file's [min, max] spans nearly the whole domain
    spark.range(8000)
      .select(concat(lit("u"), $"id").as("k"), ($"id" % 97).as("v"))
      .repartition(8, $"k")
      .write.parquet(path)
    val df = spark.read.parquet(path)
    val stats = FileStats.collectWithBloom(df, Seq("k"), "k",
      expectedPerFile = 2000, fpp = 0.01).cache()
    assert(stats.count() == df.inputFiles.length.toLong)

    // zone maps are useless here: every file's range admits the probe
    val zoneCands = FileStats.candidateFiles(stats, "k", lit("u4242")).count()
    assert(zoneCands == df.inputFiles.length.toLong)

    // bloom: the one file really holding the key is always a candidate,
    // and an absent key prunes (almost) everything
    val hit = FileStats.candidateFilesPoint(stats, "k", lit("u4242"))
      .as[String].collect().toSet
    assert(spark.read.parquet(hit.toSeq: _*).filter($"k" === "u4242").count() == 1L)
    assert(hit.size <= 2) // 1 true file + rare false positives
    val absent = FileStats.candidateFilesPoint(stats, "k", lit("nope-xyz")).count()
    assert(absent <= 1, s"absent key matched $absent files")

    // exactness: candidate-file scan + exact predicate == full-scan filter
    val full = df.filter($"k" === "u4242").collect().toSeq
    val prunedScan = spark.read.parquet(hit.toSeq: _*)
      .filter($"k" === "u4242").collect().toSeq
    assert(prunedScan == full)
  }
}
