package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The reference runs `ANALYZE` after every load (`glue:132`,
  * `redshift/init.sql` SORTKEY notes) so the warehouse optimizer has fresh
  * statistics. Spark's equivalent: `ANALYZE TABLE ... COMPUTE STATISTICS`
  * feeds row counts / sizes (and per-column NDV with FOR COLUMNS) to the
  * cost-based optimizer for join reordering and broadcast decisions. */
class CatalogStatsSpec extends SparkSpec {
  import spark.implicits._

  test("ANALYZE TABLE populates CBO row-count and column statistics") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stats-t").toString
    spark.range(1234).select($"id", ($"id" % 7).cast("string").as("k"))
      .write.option("path", s"$dir/t").saveAsTable("graft_stats_t")
    try {
      spark.sql("ANALYZE TABLE graft_stats_t COMPUTE STATISTICS FOR COLUMNS id, k")
      // plan-level stats surface the analyzed numbers only under CBO
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val stats = spark.table("graft_stats_t").queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(1234)))
      val kStats = stats.attributeStats.find(_._1.name == "k").map(_._2)
      assert(kStats.exists(_.distinctCount.exists(_ == BigInt(7))))
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.sql("DROP TABLE IF EXISTS graft_stats_t")
    }
  }
}
