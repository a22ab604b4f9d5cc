package graft.sinks

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Iceberg interop: export the current snapshot as spec-conformant v2
  * metadata (metadata.json + manifest-list/manifest Avro referencing the
  * snapshot parquet in place), read back through the chain with partition
  * pruning, time-travel prior exports, and fail LOUDLY by name on every
  * documented scope boundary. */
class IcebergExportSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-iceberg").toString + "/t"

  test("roundtrip: unpartitioned snapshot → export → read is value-identical; re-export appends a snapshot") {
    val t = tmp()
    Snapshots.commit(Seq((1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5))
      .toDF("k", "v", "x"), t)
    val s1 = IcebergExport.export(spark, t)
    val back = IcebergExport.read(spark, t).orderBy($"k")
      .as[(Int, String, Double)].collect().toSeq
    assert(back == Seq((1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5)))
    // the export copied NO data: every referenced file lives under data/
    val meta = java.nio.file.Paths.get(s"$t/metadata")
    assert(Files.list(meta).toArray.map(_.toString).exists(_.endsWith("v1.metadata.json")))

    // overwrite + re-export: the chain gains a snapshot, the old one is
    // still readable by id (time travel)
    Snapshots.commit(Seq((9, "z", 9.9)).toDF("k", "v", "x"), t, SaveMode.Overwrite)
    val s2 = IcebergExport.export(spark, t)
    assert(s2 != s1)
    assert(IcebergExport.read(spark, t).as[(Int, String, Double)].collect().toSeq ==
      Seq((9, "z", 9.9)))
    val old = IcebergExport.read(spark, t, snapshotId = Some(s1)).orderBy($"k")
      .as[(Int, String, Double)].collect().toSeq
    assert(old == Seq((1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5)),
      "prior snapshot must stay readable by id")
    assert(Files.list(meta).toArray.map(_.toString).exists(_.endsWith("v2.metadata.json")))
  }

  test("roundtrip: partitioned table — typed partition columns from the manifest, pruning before file IO") {
    val t = tmp()
    Snapshots.commitPartitioned(
      Seq(("en", 1L, 10), ("en", 2L, 20), ("de", 3L, 30), ("fr", 4L, 40))
        .toDF("lang", "id", "n"),
      t, Seq("lang"))
    IcebergExport.export(spark, t)
    val back = IcebergExport.read(spark, t)
      .select($"lang", $"id", $"n").orderBy($"id")
      .as[(String, Long, Int)].collect().toSeq
    assert(back == Seq(("en", 1L, 10), ("en", 2L, 20), ("de", 3L, 30), ("fr", 4L, 40)))
    // pruned read: only the matching partition's files are in the plan
    val pruned = IcebergExport.read(spark, t,
      partitionFilter = pv => pv.get("lang").contains("de"))
    assert(pruned.inputFiles.forall(_.contains("lang=de")),
      s"pruning leaked files: ${pruned.inputFiles.mkString(",")}")
    assert(pruned.select($"id".as[Long]).collect().toSeq == Seq(3L))
    // record_count landed in the manifest (spec-required), summed = rows
    val conf = spark.sparkContext.hadoopConfiguration
    val md = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$t/metadata/v1.metadata.json")), "UTF-8")
    val listUri = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
      .readTree(md).get("snapshots").get(0).get("manifest-list").asText()
    val entries = {
      val in = new org.apache.avro.mapred.FsInput(
        new org.apache.hadoop.fs.Path(new java.net.URI(listUri)), conf)
      val rd = new org.apache.avro.file.DataFileReader(
        in, new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord]())
      try { val b = Seq.newBuilder[org.apache.avro.generic.GenericRecord]
        while (rd.hasNext) b += rd.next(); b.result() } finally rd.close()
    }
    assert(entries.map(_.get("added_rows_count").asInstanceOf[Long]).sum == 4L)

    // dynamic partition overwrite → re-export reflects only the new state
    Snapshots.commitPartitioned(Seq(("en", 9L, 90)).toDF("lang", "id", "n"),
      t, Seq("lang"), SaveMode.Overwrite)
    IcebergExport.export(spark, t)
    val after = IcebergExport.read(spark, t)
      .select($"lang", $"id".as[Long]).as[(String, Long)].collect().toSet
    assert(after == Set(("en", 9L), ("de", 3L), ("fr", 4L)))
  }

  test("scope limits fail LOUDLY by name: format-version, transforms, delete manifests, delete files, nested types") {
    val t = tmp()
    Snapshots.commitPartitioned(Seq(("en", 1)).toDF("lang", "n"), t, Seq("lang"))
    IcebergExport.export(spark, t)
    val metaP = java.nio.file.Paths.get(s"$t/metadata/v1.metadata.json")
    val good = new String(Files.readAllBytes(metaP), "UTF-8")

    // future format-version → refused by version number
    Files.write(metaP, good.replace("\"format-version\":2", "\"format-version\":3")
      .getBytes("UTF-8"))
    val e1 = intercept[UnsupportedOperationException](IcebergExport.read(spark, t))
    assert(e1.getMessage.contains("format-version 3"), e1.getMessage)

    // non-identity transform → refused by transform name
    Files.write(metaP, good.replace("\"transform\":\"identity\"",
      "\"transform\":\"bucket[16]\"").getBytes("UTF-8"))
    val e2 = intercept[UnsupportedOperationException](IcebergExport.read(spark, t))
    assert(e2.getMessage.contains("bucket[16]"), e2.getMessage)

    // nested schema type → refused by type name
    Files.write(metaP, good.replace("\"type\":\"string\"",
      """"type":{"type":"struct","schema-id":9,"fields":[]}""").getBytes("UTF-8"))
    intercept[Exception](IcebergExport.read(spark, t)) // struct node → loud
    Files.write(metaP, good.getBytes("UTF-8")) // restore

    // DELETE MANIFEST (content=1 in the list) → refused by name
    val f = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val listUri = mapper.readTree(good).get("snapshots").get(0)
      .get("manifest-list").asText()
    val listPath = new org.apache.hadoop.fs.Path(new java.net.URI(listUri))
    val conf = spark.sparkContext.hadoopConfiguration
    def readList() = {
      val in = new org.apache.avro.mapred.FsInput(listPath, conf)
      val rd = new org.apache.avro.file.DataFileReader(
        in, new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord]())
      try { val b = Seq.newBuilder[org.apache.avro.generic.GenericRecord]
        while (rd.hasNext) b += rd.next(); b.result() } finally rd.close()
    }
    val origEntries = readList()
    def rewriteList(entries: Seq[org.apache.avro.generic.GenericRecord]): Unit = {
      val w = new org.apache.avro.file.DataFileWriter(
        new org.apache.avro.generic.GenericDatumWriter[
          org.apache.avro.generic.GenericRecord](IcebergExport.manifestListSchema))
      val out = f.create(listPath, true)
      try { w.create(IcebergExport.manifestListSchema, out)
        entries.foreach(w.append); w.close() }
      finally { try out.close() catch { case _: java.io.IOException => () } }
    }
    val doctored = origEntries.map { r =>
      val c = new org.apache.avro.generic.GenericData.Record(
        IcebergExport.manifestListSchema)
      IcebergExport.manifestListSchema.getFields.forEach(fd =>
        c.put(fd.name(), r.get(fd.name())))
      c.put("content", Int.box(1)) // delete manifest
      c
    }
    rewriteList(doctored)
    val e3 = intercept[UnsupportedOperationException](IcebergExport.read(spark, t))
    assert(e3.getMessage.contains("DELETE manifest"), e3.getMessage)
    rewriteList(origEntries) // restore

    // DELETE FILE (data_file.content != 0) → refused by name
    val manifestPath = new org.apache.hadoop.fs.Path(
      new java.net.URI(origEntries.head.get("manifest_path").toString))
    val mSchema = IcebergExport.manifestSchema(Seq("lang" -> "\"string\""))
    def readManifest() = {
      val in = new org.apache.avro.mapred.FsInput(manifestPath, conf)
      val rd = new org.apache.avro.file.DataFileReader(
        in, new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord]())
      try { val b = Seq.newBuilder[org.apache.avro.generic.GenericRecord]
        while (rd.hasNext) b += rd.next(); b.result() } finally rd.close()
    }
    val origManifest = readManifest()
    val doctoredM = origManifest.map { r =>
      val df0 = r.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
      val dfS = mSchema.getField("data_file").schema()
      val pS = dfS.getField("partition").schema()
      val p = new org.apache.avro.generic.GenericData.Record(pS)
      val p0 = df0.get("partition").asInstanceOf[org.apache.avro.generic.GenericRecord]
      pS.getFields.forEach(fd => p.put(fd.name(),
        Option(p0.get(fd.name())).map(_.toString).orNull))
      val df = new org.apache.avro.generic.GenericData.Record(dfS)
      df.put("content", Int.box(1)) // position-delete file
      df.put("file_path", df0.get("file_path").toString)
      df.put("file_format", df0.get("file_format").toString)
      df.put("partition", p)
      df.put("record_count", df0.get("record_count"))
      df.put("file_size_in_bytes", df0.get("file_size_in_bytes"))
      val e = new org.apache.avro.generic.GenericData.Record(mSchema)
      e.put("status", r.get("status"))
      e.put("snapshot_id", r.get("snapshot_id"))
      e.put("sequence_number", r.get("sequence_number"))
      e.put("file_sequence_number", r.get("file_sequence_number"))
      e.put("data_file", df)
      e
    }
    val w2 = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](mSchema))
    val out2 = f.create(manifestPath, true)
    try { w2.create(mSchema, out2); doctoredM.foreach(w2.append); w2.close() }
    finally { try out2.close() catch { case _: java.io.IOException => () } }
    val e4 = intercept[UnsupportedOperationException](IcebergExport.read(spark, t))
    assert(e4.getMessage.contains("delete file"), e4.getMessage)

    // export side: nested column types refuse loudly too
    val t2 = tmp()
    Snapshots.commit(Seq((1, Seq(1.0, 2.0))).toDF("k", "emb"), t2)
    val e5 = intercept[UnsupportedOperationException](IcebergExport.export(spark, t2))
    assert(e5.getMessage.contains("out of scope"), e5.getMessage)
  }
}
