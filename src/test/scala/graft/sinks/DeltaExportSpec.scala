package graft.sinks

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.SaveMode

/** Delta transaction-log interop: the exported log is protocol-v1 JSON a
  * standard Delta reader accepts (checked structurally against the spec),
  * republish reconciles via remove+add, and the reader resolves files from
  * the log alone with partition pruning before IO. */
class DeltaExportSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-delta").toString + "/t"

  test("export writes a spec-shaped v1 log; read round-trips data and partition columns") {
    val t = tmp()
    Snapshots.commitPartitioned(
      Seq(("a", 1, "x"), ("a", 2, "y"), ("b", 3, "z")).toDF("g", "k", "v"),
      t, Seq("g"))
    val v = DeltaExport.export(spark, t)
    assert(v == 0L)
    val log = new java.io.File(s"$t/_delta_log/00000000000000000000.json")
    assert(log.exists, "zero-padded 20-digit version file (protocol naming)")
    val actions = scala.io.Source.fromFile(log).getLines().toSeq
      .map(new com.fasterxml.jackson.databind.ObjectMapper().readTree)
    // first commit carries protocol + metaData; adds reference RELATIVE paths
    assert(actions.exists(a => a.has("protocol") &&
      a.get("protocol").get("minReaderVersion").asInt == 1))
    val meta = actions.find(_.has("metaData")).map(_.get("metaData"))
    assert(meta.isDefined)
    assert(meta.get.get("format").get("provider").asText == "parquet")
    assert(meta.get.get("partitionColumns").get(0).asText == "g")
    val adds = actions.filter(_.has("add")).map(_.get("add"))
    assert(adds.nonEmpty)
    assert(adds.forall(a => !a.get("path").asText.startsWith("/") &&
      a.get("size").asLong > 0))
    assert(adds.forall(a => a.get("partitionValues").has("g")))

    val back = DeltaExport.read(spark, t)
    assert(back.columns.toSeq.sorted == Seq("g", "k", "v"))
    assert(back.select("g", "k", "v").as[(String, Int, String)].collect().toSet ==
      Set(("a", 1, "x"), ("a", 2, "y"), ("b", 3, "z")))
  }

  test("republish reconciles: removes dropped files, reader sees exactly the current snapshot") {
    val t = tmp()
    Snapshots.commitPartitioned(Seq(("a", 1), ("b", 2)).toDF("g", "k"), t, Seq("g"))
    DeltaExport.export(spark, t)
    // overwrite partition a with new content; b carries forward
    Snapshots.commitPartitioned(Seq(("a", 10)).toDF("g", "k"), t, Seq("g"),
      SaveMode.Overwrite)
    val v1 = DeltaExport.export(spark, t)
    assert(v1 == 1L)
    val body = scala.io.Source.fromFile(
      new java.io.File(s"$t/_delta_log/00000000000000000001.json")).mkString
    assert(body.contains("\"remove\""), "replaced file must be removed in the delta")
    val cur = DeltaExport.read(spark, t)
      .select($"k", $"g").as[(Int, String)].collect().toSet
    assert(cur.map(_._1) == Set(10, 2))
    // Delta time travel: version 0 still reads the pre-overwrite rows
    val v0 = DeltaExport.read(spark, t, Some(0L))
      .select($"k", $"g").as[(Int, String)].collect().toSet
    assert(v0.map(_._1) == Set(1, 2))
  }

  test("partition pruning happens at the log: only matching files are scanned") {
    val t = tmp()
    Snapshots.commitPartitioned(
      (1 to 20).map(i => (s"p${i % 4}", i)).toDF("g", "k"), t, Seq("g"))
    DeltaExport.export(spark, t)
    val pruned = DeltaExport.read(spark, t,
      partitionFilter = pv => pv.get("g").contains("p1"))
    assert(pruned.inputFiles.forall(_.contains("g=p1")),
      "scan set must resolve from the log's partitionValues before IO")
    assert(pruned.select("k").as[Int].collect().toSet == Set(1, 5, 9, 13, 17))
  }

  test("checkpoints: written on the interval, read checkpoint-first, survive vacuumed JSON commits") {
    val t = tmp()
    Snapshots.commitPartitioned(Seq(("a", 1), ("b", 2)).toDF("g", "k"), t, Seq("g"))
    DeltaExport.export(spark, t, checkpointInterval = 2) // v0: json only
    Snapshots.commitPartitioned(Seq(("a", 10)).toDF("g", "k"), t, Seq("g"),
      SaveMode.Overwrite)
    DeltaExport.export(spark, t, checkpointInterval = 2) // v1: json only
    Snapshots.commitPartitioned(Seq(("b", 20)).toDF("g", "k"), t, Seq("g"),
      SaveMode.Overwrite)
    val v2 = DeltaExport.export(spark, t, checkpointInterval = 2) // v2: + checkpoint
    assert(v2 == 2L)
    val log = new java.io.File(s"$t/_delta_log")
    assert(new java.io.File(log, "00000000000000000002.checkpoint.parquet").isFile,
      "single-FILE checkpoint at the protocol name")
    val lc = new java.io.File(log, "_last_checkpoint")
    assert(lc.exists)
    val lcNode = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(scala.io.Source.fromFile(lc).mkString)
    assert(lcNode.get("version").asLong == 2L && lcNode.get("size").asLong > 2)

    def rows() = DeltaExport.read(spark, t)
      .select($"k", $"g").as[(Int, String)].collect().toSet
    val expected = Set((10, "a"), (20, "b"))
    assert(rows() == expected)
    // the protocol's reason checkpoints exist: old JSON commits vacuumed,
    // the reader resolves from the checkpoint + the (empty) tail
    for (v <- Seq("00000000000000000000.json", "00000000000000000001.json"))
      assert(new java.io.File(log, v).delete())
    assert(rows() == expected, "read must resolve from the checkpoint alone")
    // a version BELOW the checkpoint is now genuinely unresolvable — loudly
    intercept[IllegalArgumentException] {
      DeltaExport.read(spark, t, Some(1L))
    }
    // a later JSON-only export replays as tail on top of the checkpoint
    Snapshots.commitPartitioned(Seq(("a", 99)).toDF("g", "k"), t, Seq("g"),
      SaveMode.Overwrite)
    val v3 = DeltaExport.export(spark, t, checkpointInterval = 2)
    assert(v3 == 3L)
    assert(rows() == Set((99, "a"), (20, "b")))
  }

  test("unpartitioned tables export and read back; empty filter yields typed empty") {
    val t = tmp()
    Snapshots.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), t)
    DeltaExport.export(spark, t)
    val back = DeltaExport.read(spark, t)
    assert(back.as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
    val none = DeltaExport.read(spark, t, partitionFilter = _ => false)
    assert(none.columns.toSeq == Seq("id", "s") && none.isEmpty)
  }
}
