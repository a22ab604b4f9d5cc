package graft.sinks

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Interop with the Delta Lake TRANSACTION-LOG format (the open protocol:
  * one JSON file of actions per committed version under `_delta_log/`,
  * zero-padded 20-digit version names; `protocol`, `metaData`, `add` and
  * `remove` actions; data paths relative to the table root) — implemented
  * from the published protocol spec, no Delta runtime involved.
  *
  * Two directions:
  *   - [[export]]: publish the CURRENT [[Snapshots]] version of a table as
  *     a Delta log beside the data it already has. Snapshot commit dirs
  *     are immutable and live under the table root, so the log simply
  *     references them relative — no data copy, and any standard Delta
  *     reader (Spark+delta, DuckDB delta, Trino, polars) can now scan the
  *     engine's table.
  *   - [[read]]: scan a Delta table through its log — replay the JSON
  *     commits in version order, accumulate `add` minus `remove` (path
  *     identity, the protocol's reconciliation rule), and read exactly the
  *     live files, hive partition columns materialized from each add's
  *     `partitionValues`. This is the manifest-resolved scan discipline
  *     ([[Snapshots.read]]) applied to the external format: no directory
  *     listing, partition pruning available BEFORE any file IO.
  *
  * Scope (documented, deliberate): protocol v1 readers — JSON commits, no
  * parquet checkpoint files, no deletion vectors, no column mapping. An
  * exported log always satisfies that floor (protocol minReaderVersion=1).
  */
object DeltaExport {

  private val mapper = new ObjectMapper()

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logDir(table: String) = new Path(s"$table/_delta_log")

  private def versionFile(table: String, v: Long) =
    new Path(logDir(table), f"$v%020d.json")

  /** Publish the current snapshot version of `table` as Delta commit 0 (or
    * the next Delta version when a log already exists: prior live files are
    * `remove`d and the current set re-`add`ed — a full-snapshot republish,
    * which the protocol allows and readers reconcile exactly).
    *
    * Data files are NEVER moved or rewritten: the log references the
    * snapshot's immutable commit-dir files relative to the table root.
    * Returns the Delta version written. */
  def export(spark: SparkSession, table: String): Long = {
    val f = fs(spark, table)
    val vs = Snapshots.versions(spark, table)
    require(vs.nonEmpty, s"no snapshots at $table")
    val current = Snapshots.read(spark, table)
    val schemaJson = current.schema.json
    val partCols = Snapshots.partitions(spark, table) match {
      case Seq() => Seq.empty[String]
      case specs => Snapshots.parseSpec(specs.head).keys.toSeq
        .sortBy(k => specs.head.split('/').indexWhere(_.startsWith(k + "=")))
    }
    // live parquet files with their partition values, via the same
    // manifest resolution the engine reads with (inputFiles resolves from
    // the manifest, not a listing)
    val root = f.makeQualified(new Path(table)).toString.stripSuffix("/")
    val files = current.inputFiles.toSeq.sorted.map { uri =>
      val qualified = f.makeQualified(new Path(new java.net.URI(uri))).toString
      require(qualified.startsWith(root + "/"),
        s"data file $qualified outside table root $root")
      val rel = qualified.stripPrefix(root + "/")
      val st = f.getFileStatus(new Path(new java.net.URI(uri)))
      // partition values parse from the path's k=v segments (the commit
      // dirs are hive-layout for partitioned tables)
      val pv = rel.split('/').filter(_.contains('=')).map { kv =>
        val i = kv.indexOf('=')
        kv.substring(0, i) -> java.net.URLDecoder.decode(
          kv.substring(i + 1), java.nio.charset.StandardCharsets.UTF_8)
      }.toMap
      (rel, st.getLen, st.getModificationTime, pv)
    }
    val priorVersions = listDeltaVersions(f, table)
    val v = priorVersions.lastOption.map(_ + 1).getOrElse(0L)
    val priorLive: Set[String] =
      if (priorVersions.isEmpty) Set.empty
      else liveAdds(f, table, priorVersions).map(_._1).toSet

    val sb = new StringBuilder
    def line(json: String): Unit = { sb.append(json); sb.append('\n') }
    if (v == 0L) {
      val proto = mapper.createObjectNode()
      proto.putObject("protocol").put("minReaderVersion", 1).put("minWriterVersion", 2)
      line(mapper.writeValueAsString(proto))
      val metaW = mapper.createObjectNode()
      val meta = metaW.putObject("metaData")
      meta.put("id", java.util.UUID.randomUUID().toString)
      val fmt = meta.putObject("format")
      fmt.put("provider", "parquet")
      fmt.putObject("options")
      meta.put("schemaString", schemaJson)
      val pc = meta.putArray("partitionColumns")
      partCols.foreach(pc.add)
      meta.putObject("configuration")
      meta.put("createdTime", System.currentTimeMillis())
      line(mapper.writeValueAsString(metaW))
    }
    val nowMs = System.currentTimeMillis()
    val currentSet = files.map(_._1).toSet
    priorLive.diff(currentSet).toSeq.sorted.foreach { gone =>
      val rmW = mapper.createObjectNode()
      val rm = rmW.putObject("remove")
      rm.put("path", gone)
      rm.put("deletionTimestamp", nowMs)
      rm.put("dataChange", true)
      line(mapper.writeValueAsString(rmW))
    }
    files.filterNot(fi => priorLive.contains(fi._1)).foreach {
      case (rel, len, mtime, pv) =>
        val addW = mapper.createObjectNode()
        val add = addW.putObject("add")
        add.put("path", rel) // spec: URL-encoded relative path; ours are plain
        val pvo = add.putObject("partitionValues")
        pv.toSeq.sortBy(_._1).foreach { case (k, vv) => pvo.put(k, vv) }
        add.put("size", len)
        add.put("modificationTime", mtime)
        add.put("dataChange", true)
        line(mapper.writeValueAsString(addW))
    }
    // write-temp + rename: same atomic publish discipline as Snapshots
    f.mkdirs(logDir(table))
    val tmp = new Path(logDir(table), f".$v%020d.json.tmp")
    val out = f.create(tmp, true)
    try out.write(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (!f.rename(tmp, versionFile(table, v)))
      throw new java.io.IOException(s"delta export race on $table v$v")
    v
  }

  private def listDeltaVersions(f: FileSystem, table: String): Seq[Long] =
    if (!f.exists(logDir(table))) Seq.empty
    else f.listStatus(logDir(table)).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.matches("\\d{20}\\.json") => n.stripSuffix(".json").toLong }
      .sorted

  /** Replay the log through `versions`: live (path, partitionValues) set. */
  private def liveAdds(
      f: FileSystem,
      table: String,
      versions: Seq[Long]): Seq[(String, Map[String, String])] = {
    val live = scala.collection.mutable.LinkedHashMap.empty[String, Map[String, String]]
    versions.foreach { v =>
      val in = f.open(versionFile(table, v))
      val body = try org.apache.commons.io.IOUtils.toString(
        in, java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      body.split('\n').filter(_.nonEmpty).foreach { l =>
        val node = mapper.readTree(l)
        if (node.has("add")) {
          val a = node.get("add")
          val pv = Map.newBuilder[String, String]
          if (a.has("partitionValues"))
            a.get("partitionValues").fields().forEachRemaining { e =>
              pv += e.getKey -> (if (e.getValue.isNull) null else e.getValue.asText())
            }
          live += decodePath(a.get("path").asText()) -> pv.result()
        } else if (node.has("remove")) {
          live -= decodePath(node.get("remove").get("path").asText())
        }
      }
    }
    live.toSeq
  }

  private def decodePath(p: String): String =
    java.net.URLDecoder.decode(p, java.nio.charset.StandardCharsets.UTF_8)

  /** Scan a Delta table (log-resolved, no directory listing). The latest
    * version by default; any version whose JSON commits are retained
    * otherwise (Delta time travel). `partitionFilter` prunes on each add's
    * `partitionValues` BEFORE any file IO — same contract as
    * [[Snapshots.read]]. */
  def read(
      spark: SparkSession,
      table: String,
      version: Option[Long] = None,
      partitionFilter: Map[String, String] => Boolean = _ => true): DataFrame = {
    val f = fs(spark, table)
    val all = listDeltaVersions(f, table)
    require(all.nonEmpty, s"no _delta_log at $table")
    val upTo = version.getOrElse(all.last)
    require(all.contains(upTo), s"delta version $upTo not in $all")
    val versions = all.filter(_ <= upTo)
    // metaData from the earliest retained commit that carries it
    val metaNode = versions.iterator.map { v =>
      val in = f.open(versionFile(table, v))
      val body = try org.apache.commons.io.IOUtils.toString(
        in, java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      body.split('\n').filter(_.nonEmpty).map(mapper.readTree)
        .find(_.has("metaData")).map(_.get("metaData"))
    }.collectFirst { case Some(m) => m }
      .getOrElse(throw new IllegalStateException(s"no metaData action in $table log"))
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(metaNode.get("schemaString").asText())
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val partCols = {
      val b = Seq.newBuilder[String]
      metaNode.get("partitionColumns").forEach(c => b += c.asText())
      b.result()
    }
    val live = liveAdds(f, table, versions)
      .filter { case (_, pv) => partitionFilter(pv) }
    val dataCols = schema.filterNot(fld => partCols.contains(fld.name))
    val dataSchema = org.apache.spark.sql.types.StructType(dataCols)
    if (live.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    if (partCols.isEmpty)
      spark.read.schema(dataSchema).parquet(live.map(t => s"$table/${t._1}"): _*)
    else {
      // group files by identical partition tuple; literal partition columns
      // attach per group from the log's partitionValues (the protocol's
      // source of truth — hive path segments are not re-parsed)
      import org.apache.spark.sql.functions.lit
      live.groupBy(_._2).toSeq.sortBy(_._1.toSeq.sortBy(_._1).mkString(","))
        .map { case (pv, paths) =>
          val base = spark.read.schema(dataSchema)
            .parquet(paths.map(t => s"$table/${t._1}"): _*)
          partCols.foldLeft(base) { (df, c) =>
            val field = schema(c)
            df.withColumn(c, lit(pv.getOrElse(c, null)).cast(field.dataType))
          }
        }
        .reduce(_.unionByName(_))
        .select(schema.fieldNames.map(org.apache.spark.sql.functions.col).toSeq: _*)
    }
  }
}
