package graft.sinks

import org.apache.spark.sql.DataFrame

/** Hive-bucketed snapshot tables — the co-located fact-fact join lever.
  *
  * A shuffle-free join needs both sides hash-partitioned the same way ON
  * DISK: `bucketBy(n, key).sortBy(key)` writes each table as n bucket files
  * per partition, hashed on the join key, each bucket sorted. Two tables
  * bucketed to the same n on their join keys then sort-merge join with NO
  * Exchange on either side — at 100 TB that removes the single largest cost
  * of a fact-fact join (re-shuffling both tables per query) and amortizes it
  * into the one-time write. The same layout serves every subsequent join on
  * that key (the warehouse-ETL "cluster by join key" discipline).
  *
  * Bucketed metadata lives in the session catalog; with the in-memory
  * catalog a NEW session starts blank, so [[writeBucketed]] is idempotent
  * within a session (catalog probe — the serve path pays zero build cost)
  * and self-healing across sessions (a stale on-disk directory without a
  * catalog entry is cleared and rebuilt). On a real deployment the catalog
  * is Hive/Glue and the build runs once, period.
  */
object Bucketed {

  /** Per-table-name build locks: two queries in one session racing
    * writeBucketed on the same table would interleave the check-then-act
    * (probe → delete → saveAsTable) and corrupt the build. Striping by
    * table name keeps unrelated builds concurrent. */
  private val buildLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Recursive delete, CONTAINED: refuses any target whose canonical path
    * escapes the canonical warehouse root — a malformed table name (e.g.
    * one smuggling `..`) must fail loudly, never delete outside the
    * warehouse. listFiles() is null on I/O/permission errors; treat that
    * as empty rather than NPE-ing mid-cleanup. */
  private[sinks] def rmContained(target: java.io.File, warehouseRoot: java.io.File): Unit = {
    val rootCanon = warehouseRoot.getCanonicalPath
    require(target.getCanonicalPath.startsWith(rootCanon + java.io.File.separator),
      s"refusing to delete ${target.getCanonicalPath}: outside warehouse root $rootCanon")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(); ()
    }
    rm(target)
  }

  /** Write `df` as a managed parquet table bucketed+sorted on `key`.
    * No-op when the table already exists in the session catalog.
    * Returns true when a build actually ran. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, key: String): Boolean = {
    // lock key is lowercased to match the catalog's and the warehouse
    // dir's case-insensitive identity: 'Foo' and 'foo' are the SAME table
    // to both, so they must take the same build lock
    val lock = buildLocks.computeIfAbsent(table.toLowerCase, _ => new Object)
    lock.synchronized {
      val spark = df.sparkSession
      if (spark.catalog.tableExists(table)) false
      else {
        // in-memory catalog: table files may survive from a previous session
        // whose catalog died with it — clear them or saveAsTable fails
        val warehouse = new java.io.File(
          spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))
        val loc = new java.io.File(warehouse, table.toLowerCase)
        if (loc.exists()) rmContained(loc, warehouse)
        df.write
          .bucketBy(buckets, key)
          .sortBy(key)
          .format("parquet")
          .saveAsTable(table)
        // a fresh build is the moment a regenerated source strands its old
        // vintage — reclaim stale same-identity tables now (no-op otherwise)
        vacuumStaleSiblings(spark, table)
        true
      }
    }
  }

  /** Fingerprint-suffixed [[tableName]]s: `<name>_bkt_<key12>_b<n>_<fp>`.
    * Everything before the trailing fingerprint is the table's stable
    * IDENTITY; the fingerprint is the data vintage. */
  private val FingerprintedName = "(.*_bkt_[0-9a-f]{12}_b[0-9]+_)[0-9a-f]+".r

  /** Drop stale VINTAGES of a fingerprint-keyed bucketed table: catalog
    * tables sharing `table`'s identity prefix but carrying a different
    * fingerprint can only be earlier builds of the same logical table
    * against since-regenerated source data — unreachable (every reader
    * recomputes the fingerprint) yet still holding a full bucketed copy
    * of a fact table on disk. Only names matching the [[tableName]]
    * convention participate; arbitrary user tables are never touched. */
  private[sinks] def vacuumStaleSiblings(
      spark: org.apache.spark.sql.SparkSession, table: String): Unit =
    table.toLowerCase match {
      case FingerprintedName(identity) =>
        spark.catalog.listTables().collect()
          .map(_.name.toLowerCase)
          .filter(n => n.startsWith(identity) && n != table.toLowerCase &&
            FingerprintedName.matches(n))
          .foreach(stale => spark.sql(s"DROP TABLE IF EXISTS `$stale`"))
      case _ => ()
    }

  /** Stable catalog identifier for (logical name, source dir, bucket
    * geometry, bucket KEY, data fingerprint) — the table-name twin of
    * `IndexStore.indexDir`. The key column and the source fingerprint are
    * part of the identity: a re-bucketing on a different column or a
    * regenerated source must MISS the old table and rebuild, never serve
    * rows bucketed wrong or stale (the persisted-ANN-index discipline). */
  def tableName(name: String, sfDir: String, buckets: Int, key: String,
      fingerprint: String): String =
    s"${name}_bkt_${graft.ext.IndexStore.dirKey(s"$sfDir|$key")}_b${buckets}_$fingerprint"
}
