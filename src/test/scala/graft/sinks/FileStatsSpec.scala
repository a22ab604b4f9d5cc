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
}
