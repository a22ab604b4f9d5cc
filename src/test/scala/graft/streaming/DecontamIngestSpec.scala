package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.Snapshots

/** The streaming benchmark-decontamination gate: batches count shared
  * 3-grams against the newest benchmark snapshot and land partitioned by
  * verdict; registering a new benchmark hot-swaps mid-stream; clean-side
  * reads prune flagged docs at the partition level. */
class DecontamIngestSpec extends SparkSpec {
  import spark.implicits._

  private val evalSentence = "the quick brown fox jumps over the lazy dog"

  test("flags docs sharing >= minShared grams; benchmark hot-swap; verdict partitions prune") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-decontam").toString
    val (benchT, outT) = (s"$dir/bench", s"$dir/out")

    val v1 = StreamingOps.registerBenchmark(
      Seq(evalSentence).toDF("text"), "text", benchT)
    assert(v1 == 1L)

    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = StreamingOps.startDecontaminationIngest(
      mem.toDF().toDF("doc_id", "text"), benchT, outT, s"$dir/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      mem.addData(Seq(
        // embeds a 5-token eval run → 3 shared 3-grams → contaminated
        (1L, s"intro words then the quick brown fox jumps and more text"),
        // shares two tokens but no full 3-gram → clean
        (2L, "quick results from brown paper surveys entirely novel prose"),
        // empty-ish doc, no grams → clean with n_shared 0
        (3L, "too short")))
      q.processAllAvailable()
      val t1 = Snapshots.read(spark, outT)
        .select($"doc_id".as[Long], $"n_shared".as[Long],
          $"contaminated".cast("boolean").as[Boolean], $"bench_version".as[Long])
        .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(t1(1L) == (3L, true, 1L), s"got $t1")
      assert(t1(2L)._1 == 0L && !t1(2L)._2)
      assert(t1(3L) == (0L, false, 1L))

      // REGISTER a new benchmark — the next batch must score against it
      // and carry its version; standing rows keep their provenance
      val v2 = StreamingOps.registerBenchmark(
        Seq("entirely novel prose about benchmark rotation").toDF("text"),
        "text", benchT)
      assert(v2 == 2L)
      mem.addData(Seq(
        (10L, s"the quick brown fox jumps"),               // old bench: now clean
        (11L, "entirely novel prose about benchmark hits"))) // new bench: 3 grams
      q.processAllAvailable()
      val t2 = Snapshots.read(spark, outT)
        .select($"doc_id".as[Long], $"n_shared".as[Long],
          $"contaminated".cast("boolean").as[Boolean], $"bench_version".as[Long])
        .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(t2(10L) == (0L, false, 2L))
      assert(t2(11L) == (3L, true, 2L))
      assert(t2(1L) == (3L, true, 1L)) // provenance of old rows intact
    } finally q.stop()

    // the verdict is the partition key: a clean-side read prunes
    assert(Snapshots.partitions(spark, outT).sorted ==
      Seq("contaminated=false", "contaminated=true"))
    val clean = Snapshots.read(spark, outT,
      partitionFilter = m => m.get("contaminated").contains("false"))
    assert(clean.select($"doc_id".as[Long]).collect().toSet == Set(2L, 3L, 10L))
  }
}
