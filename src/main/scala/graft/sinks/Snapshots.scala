package graft.sinks

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Manifest-based snapshot isolation for plain parquet — the minimal core
  * of what a table format (Delta/Iceberg) provides on top of a file system:
  *
  *  - **atomic commits**: a commit writes immutable data files into a fresh
  *    directory, then publishes a manifest via write-temp + rename — readers
  *    either see the whole commit or none of it;
  *  - **snapshot isolation**: a read resolves ONE manifest version and scans
  *    exactly the directories it names; concurrent appends/overwrites
  *    publish new manifests and never disturb a running read;
  *  - **time travel**: every retained manifest version stays readable.
  *
  * Layout:
  * {{{
  *   table/data/c-<version>-<uuid>/part-*.parquet   immutable per-commit dirs
  *   table/_manifests/v00001.json                   {"version":1,"dirs":[...]}
  * }}}
  *
  * The manifest is one small JSON file per version — at 100 TB the data
  * volume is in the (never-rewritten) parquet; commit cost is one rename.
  * The data/ subtree is never listed by readers (only manifest dirs are),
  * so orphaned dirs from failed commits are invisible until vacuumed.
  */
object Snapshots {

  private val mapper = new ObjectMapper()

  private def fs(spark: SparkSession, table: String): FileSystem =
    FileSystem.get(new java.net.URI(table), spark.sparkContext.hadoopConfiguration)

  private def manifestDir(table: String) = new Path(s"$table/_manifests")

  private def manifestPath(table: String, v: Long) =
    new Path(manifestDir(table), f"v$v%05d.json")

  /** All committed versions, ascending (empty if the table doesn't exist). */
  def versions(spark: SparkSession, table: String): Seq[Long] = {
    val f = fs(spark, table)
    if (!f.exists(manifestDir(table))) Seq.empty
    else f.listStatus(manifestDir(table)).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.matches("v\\d{5}\\.json") => n.substring(1, 6).toLong }
      .sorted
  }

  private def readManifest(f: FileSystem, table: String, v: Long): Seq[String] = {
    val in = f.open(manifestPath(table, v))
    val bytes = try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
    val node = mapper.readTree(bytes)
    val dirs = Seq.newBuilder[String]
    node.get("dirs").forEach(d => dirs += d.asText())
    dirs.result()
  }

  /** Commit `df` as the next version. `Append` keeps prior data dirs in the
    * new manifest; `Overwrite` starts the version from only this commit's
    * files. Returns the committed version number. */
  def commit(df: DataFrame, table: String, mode: SaveMode = SaveMode.Append): Long = {
    require(mode == SaveMode.Append || mode == SaveMode.Overwrite,
      s"unsupported snapshot commit mode $mode")
    val spark = df.sparkSession
    val f = fs(spark, table)
    val prev = versions(spark, table)
    val v = prev.lastOption.getOrElse(0L) + 1
    val dataDir = f"$table/data/c-$v%05d-${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.mode(SaveMode.ErrorIfExists).parquet(dataDir)
    val dirs =
      if (mode == SaveMode.Overwrite || prev.isEmpty) Seq(dataDir)
      else readManifest(f, table, prev.last) :+ dataDir
    val root = mapper.createObjectNode()
    root.put("version", v)
    val arr = root.putArray("dirs")
    dirs.foreach(arr.add)
    // publish atomically: temp write, then rename into the versioned name
    f.mkdirs(manifestDir(table))
    val tmp = new Path(manifestDir(table), f".v$v%05d.json.tmp")
    val out = f.create(tmp, true)
    try out.write(mapper.writeValueAsBytes(root)) finally out.close()
    if (!f.rename(tmp, manifestPath(table, v)))
      throw new java.io.IOException(s"snapshot commit race on $table v$v")
    v
  }

  /** Read a snapshot: the latest version by default, or any retained one. */
  def read(spark: SparkSession, table: String, version: Option[Long] = None): DataFrame = {
    val f = fs(spark, table)
    val vs = versions(spark, table)
    require(vs.nonEmpty, s"no snapshots at $table")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"version $v not in $vs")
    val dirs = readManifest(f, table, v)
    spark.read.parquet(dirs: _*)
  }

  /** Compact the current snapshot to ~`targetFileRows` rows per file as a
    * NEW version — readers pinned to older manifests are untouched (no
    * rename-aside dance needed once commits are manifest-published; compare
    * [[LakeMaintenance.compactPartition]] for the raw-directory variant).
    * Old small files become unreferenced and fall to [[vacuum]]. */
  def compact(spark: SparkSession, table: String, targetFileRows: Long = 1000000L): Long = {
    val df = read(spark, table)
    val rows = df.count()
    val nFiles = math.max(1, math.ceil(rows.toDouble / targetFileRows).toInt)
    commit(df.coalesce(nFiles), table, SaveMode.Overwrite)
  }

  /** Drop data dirs referenced by no retained manifest (failed commits,
    * overwritten versions after `retainLast` manifests are pruned). */
  def vacuum(spark: SparkSession, table: String, retainLast: Int = 2): Unit = {
    val f = fs(spark, table)
    val vs = versions(spark, table)
    val keep = vs.takeRight(math.max(1, retainLast))
    vs.dropRight(math.max(1, retainLast))
      .foreach(v => f.delete(manifestPath(table, v), false))
    val live = keep.flatMap(readManifest(f, table, _)).toSet
    val dataRoot = new Path(s"$table/data")
    if (f.exists(dataRoot))
      f.listStatus(dataRoot).foreach { st =>
        if (!live.contains(st.getPath.toString) &&
            !live.exists(_.endsWith(st.getPath.toUri.getPath)))
          f.delete(st.getPath, true)
      }
  }
}
