package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The streaming exact-substring gate: documents that substantially
  * duplicate the standing corpus (or a lower-id batch peer) never enter;
  * replays no-op at both tables. */
class DupSpanIngestSpec extends SparkSpec {
  import spark.implicits._

  // 30 unique tokens per doc — every 8-gram of a copy duplicates the
  // original, so a verbatim copy has dup_frac 1.0
  private def text(seed: String): String =
    (1 to 30).map(i => s"$seed$i").mkString(" ")

  test("ingest admits novel docs, rejects near-copies, keeps one intra-batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-dupspan").toString
    val (docsT, gramT) = (s"$dir/docs", s"$dir/grams")
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = StreamingOps.startDupSpanIngest(
      mem.toDF().toDF("doc_id", "text"), docsT, gramT, s"$dir/ckpt",
      maxDupFrac = 0.5,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    def corpusIds() = graft.sinks.Snapshots.read(spark, docsT)
      .select("doc_id").as[Long].collect().toSet

    // batch 1: three disjoint docs — all admitted
    mem.addData(Seq((1L, text("alpha")), (2L, text("beta")), (3L, text("gamma"))))
    q.processAllAvailable()
    assert(corpusIds() == Set(1L, 2L, 3L))

    // batch 2: 10 = verbatim copy of 1 (rejected against the index);
    // 11 = 22 of doc 2's tokens + 8 fresh → grams at positions 1..15 of 23
    // are doc-2 substrings, dup_frac 15/23 ≈ 0.65 > 0.5 (rejected);
    // 12/13 = identical twins (canonical-keep admits 12 only);
    // 14 = novel (admitted); 15 = short doc, no grams (admitted)
    val halfBeta = ((1 to 22).map(i => s"beta$i") ++
      (1 to 8).map(i => s"delta$i")).mkString(" ")
    mem.addData(Seq((10L, text("alpha")), (11L, halfBeta),
      (12L, text("epsilon")), (13L, text("epsilon")),
      (14L, text("zeta")), (15L, "tiny doc")))
    q.processAllAvailable()
    q.stop()
    assert(corpusIds() == Set(1L, 2L, 3L, 12L, 14L, 15L),
      "copies and mostly-duplicated docs must not enter; one twin survives")

    // the gram index holds only admitted docs' grams, bucket-partitioned
    val specs = graft.sinks.Snapshots.partitions(spark, gramT)
    assert(specs.nonEmpty && specs.forall(_.startsWith("bucket=")))
    val idxGrams = graft.sinks.Snapshots.read(spark, gramT)
      .select("gram").as[String].collect()
    assert(!idxGrams.exists(_.contains("delta")),
      "rejected docs must not poison the index")

    // replay containment: same (appId, batchId) watermark no-ops both legs
    val lastDocs = graft.sinks.Snapshots
      .lastTxn(spark, docsT, "graft-dupspan-ingest-docs").get
    val beforeD = graft.sinks.Snapshots.versions(spark, docsT)
    graft.sinks.Snapshots.commit(
      graft.sinks.Snapshots.read(spark, docsT).limit(1),
      docsT, org.apache.spark.sql.SaveMode.Append,
      txn = Some("graft-dupspan-ingest-docs" -> lastDocs))
    assert(graft.sinks.Snapshots.versions(spark, docsT) == beforeD)
    val lastGrams = graft.sinks.Snapshots
      .lastTxn(spark, gramT, "graft-dupspan-ingest-grams").get
    val beforeG = graft.sinks.Snapshots.versions(spark, gramT)
    graft.sinks.Snapshots.commitPartitioned(
      graft.sinks.Snapshots.read(spark, gramT).limit(1)
        .select(col("bucket"), col("gram")),
      gramT, Seq("bucket"), org.apache.spark.sql.SaveMode.Append,
      txn = Some("graft-dupspan-ingest-grams" -> lastGrams))
    assert(graft.sinks.Snapshots.versions(spark, gramT) == beforeG)
  }

  test("a later batch defers to the standing copy admitted from an earlier twin") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-dupspan2").toString
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = StreamingOps.startDupSpanIngest(
      mem.toDF().toDF("doc_id", "text"), s"$dir/docs", s"$dir/grams",
      s"$dir/ckpt", maxDupFrac = 0.5,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    mem.addData(Seq((100L, text("omega"))))
    q.processAllAvailable()
    // smaller id arriving later still loses: the standing copy wins on
    // index membership, not id order
    mem.addData(Seq((5L, text("omega"))))
    q.processAllAvailable()
    q.stop()
    val ids = graft.sinks.Snapshots.read(spark, s"$dir/docs")
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(100L), s"standing copy must win, got $ids")
  }
}
