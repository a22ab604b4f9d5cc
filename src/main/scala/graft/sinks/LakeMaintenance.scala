package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Lake table maintenance: MERGE-style upsert and small-file compaction on
  * plain partitioned parquet — the table-format operations a lakehouse needs
  * that raw parquet doesn't provide (Delta/Iceberg would supply them as
  * `MERGE INTO` / `OPTIMIZE`; neither ships in this environment, so the
  * engine implements the same semantics on the open format).
  *
  * Both operators are PARTITION-SCOPED: they rewrite only the hive
  * partitions the change set touches (dynamic partition overwrite), never
  * the whole table — at 100 TB an upsert of one hour's data rewrites one
  * partition, not 8760 of them.
  */
object LakeMaintenance {

  /** MERGE semantics: rows in `updates` replace target rows with the same
    * natural key; unmatched update rows insert. Only partitions present in
    * `updates` (by `partitionCols` values) are read and rewritten.
    *
    * `orderCol` breaks ties WITHIN the updates batch (latest wins).
    */
  def upsert(
      spark: SparkSession,
      targetPath: String,
      updates: DataFrame,
      keys: Seq[String],
      partitionCols: Seq[String],
      orderCol: String): Unit = {
    require(keys.nonEmpty && partitionCols.nonEmpty)
    val dedupedUpdates = graft.ops.Dedup.keepLatest(updates, keys, orderCol)
    // Existence probe must distinguish "target absent/empty" (first write)
    // from transient read failures: treating an FS blip as "absent" would
    // skip the merge branch and dynamic-overwrite surviving rows away.
    // Only path-not-found / no-parquet-files map to false; anything else
    // (throttling, corrupt footer, permissions) propagates.
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(targetPath), spark.sparkContext.hadoopConfiguration)
    val exists =
      fs.exists(new org.apache.hadoop.fs.Path(targetPath)) && {
        try spark.read.parquet(targetPath).take(1).nonEmpty
        catch {
          case e: org.apache.spark.sql.AnalysisException
              if Option(e.getCondition).exists(c =>
                c.startsWith("PATH_NOT_FOUND") ||
                  c.startsWith("UNABLE_TO_INFER_SCHEMA")) =>
            false // dir exists but holds no data files: nothing to merge
        }
      }
    val merged =
      if (!exists) dedupedUpdates
      else {
        // read ONLY the touched partitions (pruned via the partition-value
        // semi-join predicate), keep target rows whose key has no update
        val touched = updates.select(partitionCols.map(col): _*).distinct()
        val target = spark.read.parquet(targetPath)
          .join(broadcast(touched), partitionCols, "left_semi")
        val survivors = target.join(
          dedupedUpdates.select(keys.map(col): _*).distinct(),
          keys, "left_anti")
        survivors.unionByName(dedupedUpdates.select(survivors.columns.map(col): _*))
      }
    merged.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(targetPath)
  }

  /** SCD Type-2 apply: merge a batch of dimension changes into a history
    * table keeping full validity ranges. Current rows whose key appears in
    * the batch are CLOSED (`valid_to` = the change's effective ts,
    * `is_current` = false) and the new version opens with
    * `valid_to = null, is_current = true`. Rows with unchanged keys pass
    * through untouched. Returns the new history frame (caller writes it —
    * at scale via [[upsert]]-style partition-scoped rewrite).
    *
    * `changes` must carry the key columns, the tracked attribute columns,
    * and `effectiveTsCol`; one change per key per batch (pre-dedup with
    * `Dedup.keepLatest`).
    */
  def scd2Apply(
      history: DataFrame,
      changes: DataFrame,
      keys: Seq[String],
      effectiveTsCol: String): DataFrame = {
    val ch = changes.withColumn("_eff", col(effectiveTsCol))
    val chKeys = ch.select(keys.map(col) :+ col("_eff"): _*).distinct()
    // close currently-open versions of changed keys
    val closed = history
      .join(broadcast(chKeys), keys)
      .withColumn("valid_to",
        when(col("is_current"), col("_eff")).otherwise(col("valid_to")))
      .withColumn("is_current", lit(false))
      .drop("_eff")
    val untouched = history.join(broadcast(chKeys.select(keys.map(col): _*)), keys, "left_anti")
    val opened = ch
      .withColumn("valid_from", col("_eff"))
      .withColumn("valid_to", lit(null).cast(history.schema("valid_to").dataType))
      .withColumn("is_current", lit(true))
      .drop("_eff")
    untouched
      .unionByName(closed)
      .unionByName(opened.select(history.columns.map(col): _*))
  }

  /** Compact a partition's small files to ~`targetFileRows` rows per file.
    * Rewrites only that partition directory, preserving its data exactly. */
  def compactPartition(
      spark: SparkSession,
      tablePath: String,
      partitionDir: String, // e.g. "dt=2025-08-29/hour=14"
      targetFileRows: Long = 1000000L): Unit = {
    val path = s"$tablePath/$partitionDir"
    val df = spark.read.parquet(path)
    val rows = df.count()
    val nFiles = math.max(1, math.ceil(rows.toDouble / targetFileRows).toInt)
    val compacted = df.coalesce(nFiles)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tablePath), spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    // Temp and backup dirs carry a leading "." so Spark's file listing
    // (hiddenFileFilter) never picks them up during a concurrent read.
    val tmp = new org.apache.hadoop.fs.Path(
      dst.getParent, s".${dst.getName}._compact_tmp")
    val old = new org.apache.hadoop.fs.Path(
      dst.getParent, s".${dst.getName}._compact_old")
    compacted.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    // Swap via rename-aside, never delete-then-rename: every intermediate
    // state keeps a complete copy of the partition on disk. A crash between
    // the two renames leaves the data in the hidden backup dir (recoverable)
    // instead of permanently deleted.
    fs.delete(old, true) // stale backup from a prior crashed run
    if (!fs.rename(dst, old))
      throw new java.io.IOException(s"compactPartition: cannot move $dst aside")
    if (!fs.rename(tmp, dst)) {
      fs.rename(old, dst) // roll back: restore the original partition
      throw new java.io.IOException(s"compactPartition: cannot install $tmp")
    }
    fs.delete(old, true)
  }
}
