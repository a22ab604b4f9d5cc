package graft

import org.apache.spark.sql.SparkSession

/** Builds the engine's SparkSession with the scale posture in ONE place,
  * so every entry point (Verify, Bench, Etl, user code) runs under the same
  * contract. The local `cores` parameter maps 1:1 onto a cluster deployment:
  * on a real cluster, drop `.master` and size `shuffle.partitions` to
  * 2-3× total executor cores.
  */
object SessionFactory {

  def builder(appName: String, cores: Int): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .master(s"local[$cores]")
      // one shuffle partition per slot locally; 2-3× executor cores on a
      // cluster (small enough to avoid tiny-task overhead, large enough
      // that a partition of a 100 TB shuffle fits in executor memory)
      .config("spark.sql.shuffle.partitions", cores)
      // AQE: runtime re-plan — coalesces empty/small shuffle partitions,
      // switches to broadcast when a side turns out small, splits skewed
      // sort-merge-join partitions
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // split large files so scan parallelism tracks the cluster, not the
      // writer's file layout
      .config("spark.sql.files.maxPartitionBytes", s"${128 * 1024 * 1024}")
      // deterministic timestamps against the DuckDB oracle and the lake
      .config("spark.sql.session.timeZone", "UTC")
      // managed-table home (bucketed snapshot tables) outside the repo,
      // PER-PROCESS: the in-memory catalog dies with the JVM, so sharing a
      // warehouse across processes would let one process's catalog-miss
      // "self-heal" delete a table another process is actively scanning —
      // a pid-scoped dir makes stale-dir recovery race-free by construction
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft-warehouse-${ProcessHandle.current().pid()}")
      .config("spark.ui.enabled", "false")

  /** Session with the engine's extensions (as-of join strategy) installed. */
  def create(appName: String = "graft", cores: Int = 8): SparkSession = {
    val spark = builder(appName, cores)
      .withExtensions(new plans.GraftExtensions)
      .getOrCreate()
    ops.DdbUnwrap.register(spark)
    spark
  }
}
