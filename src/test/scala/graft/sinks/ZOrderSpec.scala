package graft.sinks

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("morton2 interleaves bits correctly and preserves locality") {
    assert(ZOrder.morton2(0L, 0L) == 0L)
    assert(ZOrder.morton2(1L, 0L) == 1L)  // x → even bit positions
    assert(ZOrder.morton2(0L, 1L) == 2L)  // y → odd bit positions
    assert(ZOrder.morton2(3L, 3L) == 15L) // 0b1111
    // nearby points → nearby codes (same quadrant shares high bits)
    val base = ZOrder.morton2(1000, 1000)
    val near = ZOrder.morton2(1001, 1001)
    val far = ZOrder.morton2(1000000, 1000000)
    assert(math.abs(base - near) < math.abs(base - far))
  }

  test("z-ordered files bound BOTH dimensions; sort-by-a bounds only one") {
    // uniform 2-d grid where a and b are independent
    val df = spark.range(4096).select(
      (col("id") % 64).as("a"), (col("id") / 64).as("b"))
    val zPath = Files.createTempDirectory("graft-z").toString + "/z"
    val aPath = Files.createTempDirectory("graft-z").toString + "/a"
    ZOrder.writeZordered(df, zPath, "a", "b", numFiles = 16)
    df.repartitionByRange(16, col("a")).sortWithinPartitions("a")
      .write.parquet(aPath)

    def avgSpread(path: String, dim: String): Double = {
      val withFile = spark.read.parquet(path)
        .withColumn("f", input_file_name())
      val spreads = withFile.groupBy("f")
        .agg((max(col(dim)) - min(col(dim))).as("spread"))
        .select(avg("spread")).head().getDouble(0)
      spreads
    }
    // sort-by-a: tight on a, but each file spans nearly ALL of b
    assert(avgSpread(aPath, "b") > 50)
    // z-order: BOTH dimensions bounded well below their full range (64)
    assert(avgSpread(zPath, "a") < 40)
    assert(avgSpread(zPath, "b") < 40)
  }

  test("3-dimension z-order: zone-map pruning skips files on EVERY dimension") {
    import graft.sinks.FileStats
    val df = spark.range(32768).select(
      ($"id" % 32).as("x"),
      (($"id" / 32) % 32).as("y"),
      (($"id" / 1024) % 32).as("z"))
    val path = Files.createTempDirectory("graft-z3").toString + "/t"
    ZOrder.writeZorderedN(df, path, Seq("x", "y", "z"), numFiles = 32)
    val read = spark.read.parquet(path)
    assert(read.count() == 32768)
    val nFiles = read.inputFiles.length
    // point predicates on each dimension should prune most files via the
    // per-file min/max stats — the whole reason to z-order 3 columns
    Seq("x", "y", "z").foreach { dim =>
      val stats = FileStats.collect(read, Seq(dim))
      val cands = FileStats.candidateFiles(stats, dim, lit(7L)).count()
      assert(cands.toDouble / nFiles <= 0.6, s"$dim: $cands of $nFiles files")
    }
  }
}
