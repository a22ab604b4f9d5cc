package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.Snapshots

/** The streaming quality-admission gate: batches score against the newest
  * model snapshot and land partitioned by verdict; a retrain hot-swaps
  * mid-stream (next batch serves the new version, rows carry provenance);
  * admitted-side reads prune at the partition level. */
class QualityIngestSpec extends SparkSpec {
  import spark.implicits._

  private def doc(pos: Boolean, n: Int): String =
    (if (pos) Seq("good", "clean", "prose") else Seq("spam", "junk", "noise"))
      .map(w => s"$w") // fixed three-word vocab per class
      .padTo(n, if (pos) "good" else "spam").mkString(" ")

  test("scores against the live model; retrain hot-swaps; verdict partitions prune") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-quality").toString
    val (modelT, outT) = (s"$dir/model", s"$dir/out")

    // seed model: good/clean/prose = positive, spam/junk/noise = negative
    val seed = (0L until 40L).map { i =>
      val pos = i % 2 == 0
      (i, doc(pos, 5), pos, true)
    }.toDF("doc_id", "text", "label", "is_train")
      .withColumn("toks", graft.ext.TextAnalysis.tokens($"text"))
    val v1 = StreamingOps.trainQualityModel(seed, "toks", "label", "is_train", modelT)
    assert(v1 == 1L)

    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = StreamingOps.startQualityIngest(
      mem.toDF().toDF("doc_id", "text"), modelT, outT, s"$dir/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      mem.addData(Seq((100L, doc(pos = true, 5)), (101L, doc(pos = false, 5))))
      q.processAllAvailable()
      val t1 = Snapshots.read(spark, outT)
        .select($"doc_id".as[Long], $"admitted".cast("boolean").as[Boolean],
          $"model_version".as[Long])
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(t1 == Map(100L -> (true, 1L), 101L -> (false, 1L)))

      // RETRAIN with the labels flipped — the next batch must route by the
      // NEW model and carry its version; standing rows are untouched
      val flipped = seed.withColumn("label", !$"label")
      val v2 = StreamingOps.trainQualityModel(flipped, "toks", "label", "is_train", modelT)
      assert(v2 == 2L)
      mem.addData(Seq((200L, doc(pos = true, 5)), (201L, doc(pos = false, 5))))
      q.processAllAvailable()
      val t2 = Snapshots.read(spark, outT)
        .select($"doc_id".as[Long], $"admitted".cast("boolean").as[Boolean],
          $"model_version".as[Long])
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(t2(200L) == (false, 2L) && t2(201L) == (true, 2L))
      assert(t2(100L) == (true, 1L)) // provenance of old rows intact
    } finally q.stop()

    // the verdict is the partition key: an admitted-only read prunes
    assert(Snapshots.partitions(spark, outT).sorted ==
      Seq("admitted=false", "admitted=true"))
    val adm = Snapshots.read(spark, outT,
      partitionFilter = m => m.get("admitted").contains("true"))
    assert(adm.select($"doc_id".as[Long]).collect().toSet == Set(100L, 201L))
  }
}
