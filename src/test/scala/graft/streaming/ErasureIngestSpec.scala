package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.Snapshots

/** The streaming GDPR-erasure gate: requests tombstone the requested docs
  * plus their TRANSITIVE near-dup twins via pruned index probes,
  * re-requests and replays no-op, erasedCorpus is correct immediately, and
  * applyErasure physically rewrites only affected partitions (dropping ones
  * that empty out). */
class ErasureIngestSpec extends SparkSpec {
  import spark.implicits._

  // 40-token sliding windows shifted by 4: adjacent windows are Jaccard
  // 36/44 ≈ 0.82 pairs, two apart only 32/48 ≈ 0.67 — a genuine chain
  private def win(pfx: String, from: Int): String =
    (from until from + 40).map(i => s"$pfx$i").mkString(" ")

  test("transitive tombstoning, idempotent re-request, pruned physical rewrite") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-erasure").toString
    val (docsT, tokT, tombT) = (s"$dir/docs", s"$dir/tokens", s"$dir/tombs")
    val buckets = 8

    // corpus: chain 0–1–2 (0–2 NOT directly linked), twin pair 10/11,
    // singleton 20 — seeded with the gate's table layout
    val docs = Seq(
      (0L, win("t", 0)), (1L, win("t", 4)), (2L, win("t", 8)),
      (10L, win("u", 0)), (11L, win("u", 4)), (20L, win("z", 0))
    ).toDF("doc_id", "text")
      .withColumn("dbucket", pmod($"doc_id", lit(buckets)))
    Snapshots.commitPartitioned(docs, docsT, Seq("dbucket"))
    val toks = docs.select($"doc_id",
        explode(array_distinct(graft.ext.TextAnalysis.tokens($"text"))).as("token"))
      .withColumn("bucket", pmod(xxhash64($"token"), lit(buckets)))
    Snapshots.commitPartitioned(toks.select($"bucket", $"token", $"doc_id"),
      tokT, Seq("bucket"))

    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val q = StreamingOps.startErasureIngest(
      mem.toDF().select($"value".as("doc_id")), docsT, tokT, tombT,
      s"$dir/ckpt", buckets = buckets,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      def tombs() = Snapshots.read(spark, tombT)
        .select($"doc_id".as[Long], $"reason".as[String], $"hop".as[Int])
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap

      // batch 1: request doc 0 → the whole chain goes, including the
      // transitively-linked doc 2; the u-pair and the singleton stay
      mem.addData(0L)
      q.processAllAvailable()
      val t1 = tombs()
      assert(t1 == Map(0L -> ("requested", 0), 1L -> ("collateral", 1),
        2L -> ("collateral", 2)))
      val live1 = StreamingOps.erasedCorpus(spark, docsT, tombT)
        .select($"doc_id".as[Long]).collect().toSet
      assert(live1 == Set(10L, 11L, 20L))

      // batch 2: re-requesting an erased doc is a no-op — no new tombstones,
      // no new tombstone version
      val vBefore = Snapshots.versions(spark, tombT)
      mem.addData(0L)
      q.processAllAvailable()
      assert(Snapshots.versions(spark, tombT) == vBefore)

      // batch 3: a singleton request takes out only itself (hop-0)
      mem.addData(20L)
      q.processAllAvailable()
      assert(tombs() - 0L - 1L - 2L == Map(20L -> ("requested", 0)))
      assert(StreamingOps.erasedCorpus(spark, docsT, tombT)
        .select($"doc_id".as[Long]).collect().toSet == Set(10L, 11L))
    } finally q.stop()

    // phase two: physical rewrite. Erased ids {0,1,2,20} live in dbuckets
    // {0,1,2,4}; dbucket=2 also holds the surviving doc 10, so it rewrites
    // to just that row while dbuckets 0,1,4 DROP from the manifest.
    StreamingOps.applyErasure(spark, docsT, tokT, tombT, buckets)
    assert(Snapshots.read(spark, docsT).select($"doc_id".as[Long])
      .collect().toSet == Set(10L, 11L))
    assert(Snapshots.partitions(spark, docsT).sorted ==
      Seq("dbucket=2", "dbucket=3"))
    val tokenIds = Snapshots.read(spark, tokT)
      .select($"doc_id".as[Long]).distinct().collect().toSet
    assert(tokenIds == Set(10L, 11L))

    // idempotent: a second pass leaves identical content and partitions
    StreamingOps.applyErasure(spark, docsT, tokT, tombT, buckets)
    assert(Snapshots.read(spark, docsT).select($"doc_id".as[Long])
      .collect().toSet == Set(10L, 11L))
    assert(Snapshots.partitions(spark, docsT).sorted ==
      Seq("dbucket=2", "dbucket=3"))

    // phase three — vacuum completes PHYSICAL erasure: pre-rewrite commit
    // dirs still hold the erased texts (time travel); dropping history with
    // retainLast=1 + no grace window must leave NO parquet file on disk
    // containing an erased doc's content, in either table
    for (t <- Seq(docsT, tokT)) Snapshots.vacuum(spark, t, retainLast = 1, minAgeMs = 0L)
    val erasedTokens = Set("t0", "t12", "t47", "z0") // spread across erased docs
    def leakedIn(table: String): Long = {
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(table))
        .filter(p => p.toString.endsWith(".parquet")).toArray.map(_.toString)
      assert(files.nonEmpty)
      spark.read.parquet(files: _*).select($"doc_id".as[Long])
        .filter(col("doc_id").isin(0L, 1L, 2L, 20L)).count()
    }
    assert(leakedIn(docsT) == 0L, "erased doc row survives on disk after vacuum")
    assert(leakedIn(tokT) == 0L, "erased doc token survives on disk after vacuum")
    // time travel to pre-erasure versions is gone with the history
    assert(Snapshots.versions(spark, docsT).size == 1)
    assert(erasedTokens.forall(tk => Snapshots.read(spark, tokT)
      .filter($"token" === tk).isEmpty))
  }

  test("a chain longer than maxHops stops at the cap and resumes on re-request") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-erasure-cap").toString
    val (docsT, tokT, tombT) = (s"$dir/docs", s"$dir/tokens", s"$dir/tombs")
    val buckets = 4
    // chain 0–1–2–3: with maxHops=1 only 0 and its direct twin 1 go
    val docs = (0L to 3L).map(i => (i, win("c", 4 * i.toInt)))
      .toDF("doc_id", "text")
      .withColumn("dbucket", pmod($"doc_id", lit(buckets)))
    Snapshots.commitPartitioned(docs, docsT, Seq("dbucket"))
    val toks = docs.select($"doc_id",
        explode(array_distinct(graft.ext.TextAnalysis.tokens($"text"))).as("token"))
      .withColumn("bucket", pmod(xxhash64($"token"), lit(buckets)))
    Snapshots.commitPartitioned(toks.select($"bucket", $"token", $"doc_id"),
      tokT, Seq("bucket"))

    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val q = StreamingOps.startErasureIngest(
      mem.toDF().select($"value".as("doc_id")), docsT, tokT, tombT,
      s"$dir/ckpt", buckets = buckets, maxHops = 1,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      mem.addData(0L)
      q.processAllAvailable()
      def ids() = Snapshots.read(spark, tombT)
        .select($"doc_id".as[Long]).collect().toSet
      assert(ids() == Set(0L, 1L))
      // re-requesting the frontier's edge resumes the walk one hop further
      mem.addData(1L)
      q.processAllAvailable()
      assert(ids() == Set(0L, 1L, 2L))
    } finally q.stop()
  }
}
