package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.Snapshots

/** The PRODUCTION CHAIN, composed (VERDICT r16 item 6): quality admission →
  * benchmark decontamination → semantic dedup → content-addressed chunk
  * store, run as ONE flowing pipeline — each stage's feed is the prior
  * stage's admitted partition — across 3 micro-batches, with the
  * out-of-band maintenance loop racing all five tables throughout.
  * Each gate is spec'd alone elsewhere and the batch composition is
  * oracled (`q_pretrain_pipeline`); composition is where ordering and
  * provenance bugs live, so this spec pins:
  *   - per-stage provenance columns (model/bench versions, scores, counts);
  *   - the final corpus matching the BATCH composition's verdicts on the
  *     same input (same admit set, same clean set, same dedup survivors);
  *   - replay no-ops at every stage (fresh checkpoint, same appId);
  *   - zero maintenance-loop errors while racing the live gates.
  */
class ComposedGatesSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-embedding: hashed bag-of-words into 64 dims,
  // L2-normalized — identical texts get identical vectors (cos = 1), the
  // distinct texts below land well apart (cos ≤ ~0.75)
  private def embed(text: String): Array[Double] = {
    val v = new Array[Double](64)
    text.toLowerCase.split("\\s+").filter(_.nonEmpty).foreach { w =>
      val h = scala.util.hashing.MurmurHash3.stringHash(w)
      v(((h % 64) + 64) % 64) += 1.0
    }
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0.0) v else v.map(_ / n)
  }

  private def norm(s: String): String =
    s.trim.toLowerCase.split("\\s+").mkString(" ")

  test("quality → decontamination → semantic dedup → chunk store as one pipeline, maintenance racing all tables") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-composed").toString
    val modelT = s"$dir/model"
    val benchT = s"$dir/bench"
    val qualT = s"$dir/quality"
    val decoT = s"$dir/decontam"
    val corpT = s"$dir/semcorpus"
    val chunkT = s"$dir/chunks"
    val manT = s"$dir/manifest"

    // ---- fixtures ---------------------------------------------------------
    // quality model: good/clean/prose positive, spam/junk/noise negative
    val seed = (0L until 40L).map { i =>
      val pos = i % 2 == 0
      val words = if (pos) Seq("good", "clean", "prose") else Seq("spam", "junk", "noise")
      (i, words.padTo(6, words.head).mkString(" "), pos, true)
    }.toDF("doc_id", "text", "label", "is_train")
      .withColumn("toks", graft.ext.TextAnalysis.tokens($"text"))
    assert(StreamingOps.trainQualityModel(seed, "toks", "label", "is_train", modelT) == 1L)
    // decontamination benchmark: one eval passage's 3-grams
    assert(StreamingOps.registerBenchmark(
      Seq("alpha beta gamma delta epsilon zeta eta theta").toDF("text"),
      "text", benchT) == 1L)

    // ---- the input corpus (7 docs over 3 batches) -------------------------
    val tA = Seq.fill(40)("good clean prose").mkString(" ")
    val tB = Seq.fill(20)("clean clean clean clean prose").mkString(" ")
    val tC = Seq.fill(20)("prose prose prose good").mkString(" ")
    val tX = Seq.fill(20)("good clean prose").mkString(" ") +
      " alpha beta gamma delta epsilon" // 3 grams shared with the benchmark
    val tS = Seq.fill(20)("spam junk noise").mkString(" ")
    val batches: Seq[Seq[(Long, String)]] = Seq(
      Seq(1L -> tA, 2L -> tS),             // admitted; spam-rejected
      Seq(3L -> tX, 4L -> tA, 5L -> tB),   // contaminated; dup-of-1; novel
      Seq(6L -> tC, 7L -> tS))             // novel; spam-rejected
    val allDocs = batches.flatten

    // ---- the four gates + the maintenance loop ----------------------------
    val trg = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0)
    val memQ = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val memD = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val memS = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Double])]
    val memC = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val qQ = StreamingOps.startQualityIngest(
      memQ.toDF().toDF("doc_id", "text"), modelT, qualT, s"$dir/ckptQ", trigger = trg)
    val qD = StreamingOps.startDecontaminationIngest(
      memD.toDF().toDF("doc_id", "text"), benchT, decoT, s"$dir/ckptD", trigger = trg)
    val qS = StreamingOps.startSemDedupIngest(
      memS.toDF().toDF("id", "v"), corpT, s"$dir/ckptS", minCos = 0.92, trigger = trg)
    val qC = StreamingOps.startChunkStoreIngest(
      memC.toDF().toDF("doc_id", "text"), chunkT, manT, s"$dir/ckptC", trigger = trg)
    val loop = StreamingOps.startMaintenanceLoop(
      spark, Seq(qualT, decoT, corpT, chunkT, manT),
      intervalMs = 150, maxBasesPerSpec = 2,
      onCompact = StreamingOps.chunkStoreMaintenanceRestamp(spark, chunkT))

    val textOf = allDocs.toMap
    val fedD = scala.collection.mutable.Set.empty[Long]
    val fedS = scala.collection.mutable.Set.empty[Long]
    val fedC = scala.collection.mutable.Set.empty[Long]
    try {
      batches.foreach { b =>
        // stage 1: raw docs → quality verdicts
        memQ.addData(b)
        qQ.processAllAvailable()
        // stage 2 feed: the quality table's ADMITTED partition (new docs)
        val admitted = Snapshots.read(spark, qualT,
            partitionFilter = m => m.get("admitted").contains("true"))
          .select($"doc_id".as[Long]).collect().toSeq
          .filterNot(fedD).sorted
        fedD ++= admitted
        if (admitted.nonEmpty) {
          memD.addData(admitted.map(id => id -> textOf(id)))
          qD.processAllAvailable()
        }
        // stage 3 feed: the decontamination table's CLEAN partition
        val clean = Snapshots.read(spark, decoT,
            partitionFilter = m => m.get("contaminated").contains("false"))
          .select($"doc_id".as[Long]).collect().toSeq
          .filterNot(fedS).sorted
        fedS ++= clean
        if (clean.nonEmpty) {
          memS.addData(clean.map(id => id -> embed(textOf(id))))
          qS.processAllAvailable()
        }
        // stage 4 feed: the semantic-dedup SURVIVORS (corpus rows)
        val kept = Snapshots.read(spark, corpT)
          .select($"id".as[Long]).collect().toSeq
          .filterNot(fedC).sorted
        fedC ++= kept
        if (kept.nonEmpty) {
          memC.addData(kept.map(id => id -> textOf(id)))
          qC.processAllAvailable()
        }
      }

      // ---- per-stage provenance + verdicts --------------------------------
      val qual = Snapshots.read(spark, qualT)
        .select($"doc_id".as[Long], $"admitted".cast("boolean").as[Boolean],
          $"model_version".as[Long]).collect()
      assert(qual.map(_._1).toSet == (1L to 7L).toSet, "quality gate saw all docs")
      assert(qual.forall(_._3 == 1L), "quality provenance: serving model version")
      val admitSet = qual.filter(_._2).map(_._1).toSet
      assert(admitSet == Set(1L, 3L, 4L, 5L, 6L), s"admit verdicts: $admitSet")
      val deco = Snapshots.read(spark, decoT)
        .select($"doc_id".as[Long], $"contaminated".cast("boolean").as[Boolean],
          $"n_shared".as[Long], $"bench_version".as[Long]).collect()
      assert(deco.map(_._1).toSet == admitSet, "decontam saw exactly the admitted docs")
      assert(deco.forall(_._4 == 1L), "decontam provenance: serving bench version")
      val contaminated = deco.filter(_._2).map(_._1).toSet
      assert(contaminated == Set(3L), s"contamination verdicts: $contaminated")
      assert(deco.find(_._1 == 3L).get._3 >= 3L, "n_shared provenance on the hit")
      val corpusIds = Snapshots.read(spark, corpT).select($"id".as[Long]).collect().toSet
      assert(corpusIds == Set(1L, 5L, 6L), s"semantic dedup survivors: $corpusIds")

      // ---- final corpus: reconstruct byte-exact ---------------------------
      val finalDocs = StreamingOps.reconstruct(spark, manT, chunkT)
        .as[(Long, String)].collect().toMap
      assert(finalDocs.keySet == Set(1L, 5L, 6L), s"chunk store holds ${finalDocs.keySet}")
      assert(finalDocs(1L) == norm(tA) && finalDocs(5L) == norm(tB) &&
        finalDocs(6L) == norm(tC), "reconstruction drifted")

      // ---- the BATCH composition on the same input agrees -----------------
      val batchDocs = allDocs.toDF("doc_id", "text")
        .withColumn("toks", graft.ext.TextAnalysis.tokens($"text"))
        .localCheckpoint()
      val model = Snapshots.read(spark, modelT)
      val batchAdmit = graft.ext.QualityFilter
        .scoreWith(batchDocs, "doc_id", "toks", model)
        .filter(round($"score", 6) > 0.0)
        .select($"doc_id".as[Long]).collect().toSet
      assert(batchAdmit == admitSet, "streamed admit set != batch composition")
      val bench = Snapshots.read(spark, benchT)
      val gramN = 3
      val batchContam = batchDocs
        .filter($"doc_id".isInCollection(batchAdmit))
        .select($"doc_id", explode(array_distinct(
          transform(sequence(lit(1), size($"toks") - (gramN - 1)),
            i => array_join(slice($"toks", i, lit(gramN)), " ")))).as("gram"))
        .join(broadcast(bench), Seq("gram"))
        .groupBy($"doc_id").agg(count(lit(1)).as("n"))
        .filter($"n" >= 3).select($"doc_id".as[Long]).collect().toSet
      assert(batchContam == contaminated, "streamed contamination != batch composition")
      val cleanAdmitted = (batchAdmit -- batchContam).toSeq.sorted
      val cells = graft.ext.SemDedup.gridCells(
        cleanAdmitted.map(id => id -> embed(textOf(id))).toDF("id", "v"), 4, 64)
      val batchKeep = graft.ext.SemDedup
        .dedupDeltaBounded(cells.limit(0), cells, minCos = 0.92, maxCellSize = 4096)
        .filter($"keep").select($"vec_id".as[Long]).collect().toSet
      assert(batchKeep == corpusIds, "streamed dedup survivors != batch composition")
    } finally {
      loop.stop()
      Seq(qQ, qD, qS, qC).foreach(_.stop())
    }
    assert(loop.errors.get() == 0L, "maintenance loop errored while racing the gates")

    // ---- replay no-ops at EVERY stage ------------------------------------
    // fresh checkpoints restart batchIds at 0; the same appIds' txn
    // watermarks (advanced to the original batch 2) swallow the re-delivery
    val rowsQ = Snapshots.read(spark, qualT).count()
    val rowsD = Snapshots.read(spark, decoT).count()
    val vsS = Snapshots.versions(spark, corpT).size
    val rowsM = Snapshots.read(spark, manT).count()
    val vsC = Snapshots.versions(spark, chunkT).size
    val memQ2 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val memD2 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val memS2 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Double])]
    val memC2 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val rQ = StreamingOps.startQualityIngest(
      memQ2.toDF().toDF("doc_id", "text"), modelT, qualT, s"$dir/ckptQ2", trigger = trg)
    val rD = StreamingOps.startDecontaminationIngest(
      memD2.toDF().toDF("doc_id", "text"), benchT, decoT, s"$dir/ckptD2", trigger = trg)
    val rS = StreamingOps.startSemDedupIngest(
      memS2.toDF().toDF("id", "v"), corpT, s"$dir/ckptS2", minCos = 0.92, trigger = trg)
    val rC = StreamingOps.startChunkStoreIngest(
      memC2.toDF().toDF("doc_id", "text"), chunkT, manT, s"$dir/ckptC2", trigger = trg)
    try {
      memQ2.addData(allDocs)
      memD2.addData(Seq(1L -> tA, 4L -> tA, 5L -> tB))
      memS2.addData(Seq(1L -> embed(tA), 5L -> embed(tB)))
      memC2.addData(Seq(1L -> tA, 5L -> tB))
      Seq(rQ, rD, rS, rC).foreach(_.processAllAvailable())
      assert(Snapshots.read(spark, qualT).count() == rowsQ, "quality replay appended")
      assert(Snapshots.read(spark, decoT).count() == rowsD, "decontam replay appended")
      assert(Snapshots.versions(spark, corpT).size == vsS, "semdedup replay committed")
      assert(Snapshots.read(spark, manT).count() == rowsM, "manifest replay appended")
      assert(Snapshots.versions(spark, chunkT).size == vsC, "chunk replay committed")
    } finally Seq(rQ, rD, rS, rC).foreach(_.stop())
  }

  test("erase composes into the live chain: loud refusal against an in-flight batch, then final corpus = batch semantics minus the erased docs") {
    // VERDICT r17 item 6: the five-table composition above races
    // maintenance but never erases mid-flight. This drives the same chain,
    // then BETWEEN micro-batches (1) proves the writer lease forces the
    // documented wait-or-loud-refusal against a held (in-flight) batch
    // lease, (2) erases a stored doc while the gates and the maintenance
    // loop stay live, (3) flows one more batch through, and (4) pins the
    // final corpus to the sibling test's batch verdicts MINUS the erased
    // doc, byte-exact, with the standalone sweep a no-op afterward.
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-composed-erase").toString
    val modelT = s"$dir/model"; val benchT = s"$dir/bench"
    val qualT = s"$dir/quality"; val decoT = s"$dir/decontam"
    val corpT = s"$dir/semcorpus"; val chunkT = s"$dir/chunks"
    val manT = s"$dir/manifest"
    val seed = (0L until 40L).map { i =>
      val pos = i % 2 == 0
      val words = if (pos) Seq("good", "clean", "prose") else Seq("spam", "junk", "noise")
      (i, words.padTo(6, words.head).mkString(" "), pos, true)
    }.toDF("doc_id", "text", "label", "is_train")
      .withColumn("toks", graft.ext.TextAnalysis.tokens($"text"))
    assert(StreamingOps.trainQualityModel(seed, "toks", "label", "is_train", modelT) == 1L)
    assert(StreamingOps.registerBenchmark(
      Seq("alpha beta gamma delta epsilon zeta eta theta").toDF("text"),
      "text", benchT) == 1L)
    val tA = Seq.fill(40)("good clean prose").mkString(" ")
    val tB = Seq.fill(20)("clean clean clean clean prose").mkString(" ")
    val tC = Seq.fill(20)("prose prose prose good").mkString(" ")
    val tX = Seq.fill(20)("good clean prose").mkString(" ") +
      " alpha beta gamma delta epsilon"
    val tS = Seq.fill(20)("spam junk noise").mkString(" ")
    val batches: Seq[Seq[(Long, String)]] = Seq(
      Seq(1L -> tA, 2L -> tS),
      Seq(3L -> tX, 4L -> tA, 5L -> tB),
      Seq(6L -> tC, 7L -> tS))
    val textOf = batches.flatten.toMap
    val trg = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0)
    val memQ = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val memD = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val memS = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Double])]
    val memC = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val qQ = StreamingOps.startQualityIngest(
      memQ.toDF().toDF("doc_id", "text"), modelT, qualT, s"$dir/ckptQ", trigger = trg)
    val qD = StreamingOps.startDecontaminationIngest(
      memD.toDF().toDF("doc_id", "text"), benchT, decoT, s"$dir/ckptD", trigger = trg)
    val qS = StreamingOps.startSemDedupIngest(
      memS.toDF().toDF("id", "v"), corpT, s"$dir/ckptS", minCos = 0.92, trigger = trg)
    val qC = StreamingOps.startChunkStoreIngest(
      memC.toDF().toDF("doc_id", "text"), chunkT, manT, s"$dir/ckptC", trigger = trg)
    val loop = StreamingOps.startMaintenanceLoop(
      spark, Seq(qualT, decoT, corpT, chunkT, manT),
      intervalMs = 150, maxBasesPerSpec = 2,
      onCompact = StreamingOps.chunkStoreMaintenanceRestamp(spark, chunkT))
    val fedD = scala.collection.mutable.Set.empty[Long]
    val fedS = scala.collection.mutable.Set.empty[Long]
    val fedC = scala.collection.mutable.Set.empty[Long]
    def drive(b: Seq[(Long, String)]): Unit = {
      memQ.addData(b)
      qQ.processAllAvailable()
      val admitted = Snapshots.read(spark, qualT,
          partitionFilter = m => m.get("admitted").contains("true"))
        .select($"doc_id".as[Long]).collect().toSeq.filterNot(fedD).sorted
      fedD ++= admitted
      if (admitted.nonEmpty) {
        memD.addData(admitted.map(id => id -> textOf(id)))
        qD.processAllAvailable()
      }
      val clean = Snapshots.read(spark, decoT,
          partitionFilter = m => m.get("contaminated").contains("false"))
        .select($"doc_id".as[Long]).collect().toSeq.filterNot(fedS).sorted
      fedS ++= clean
      if (clean.nonEmpty) {
        memS.addData(clean.map(id => id -> embed(textOf(id))))
        qS.processAllAvailable()
      }
      val kept = Snapshots.read(spark, corpT)
        .select($"id".as[Long]).collect().toSeq.filterNot(fedC).sorted
      fedC ++= kept
      if (kept.nonEmpty) {
        memC.addData(kept.map(id => id -> textOf(id)))
        qC.processAllAvailable()
      }
    }
    try {
      drive(batches(0))
      drive(batches(1))
      // store now holds docs 1 and 5 (the sibling test's verdicts). An
      // erase against an IN-FLIGHT batch (its lease held) must refuse
      // loudly naming the holder, not wait forever and not proceed.
      Snapshots.acquireLease(spark, manT, "in-flight-ingest-batch", waitMs = 0L)
      val refusal = intercept[java.io.IOException] {
        StreamingOps.chunkStoreErase(spark, manT, chunkT, Seq(1L),
          leaseWaitMs = 300L)
      }
      assert(refusal.getMessage.contains("in-flight-ingest-batch") &&
        refusal.getMessage.contains("writer lease"), refusal.getMessage)
      // the refused erase changed NOTHING
      assert(StreamingOps.reconstruct(spark, manT, chunkT)
        .select($"doc_id".as[Long]).collect().toSet == Set(1L, 5L))
      Snapshots.releaseLease(spark, manT, "in-flight-ingest-batch")
      // between micro-batches the lease is free: erase doc 1 while the
      // gates are live and the maintenance loop keeps racing all tables
      val chunksBefore = Snapshots.read(spark, chunkT).count()
      StreamingOps.chunkStoreErase(spark, manT, chunkT, Seq(1L))
      assert(Snapshots.read(spark, manT).filter($"doc_id" === 1L).count() == 0,
        "erased doc's manifests survived")
      assert(Snapshots.read(spark, chunkT).count() < chunksBefore,
        "erased doc's unique chunks survived")
      // the chain keeps flowing after the erase
      drive(batches(2))
      // final corpus = the sibling test's batch verdicts {1,5,6} minus the
      // erased doc — byte-exact for the survivors, doc 1 gone for good
      val finalDocs = StreamingOps.reconstruct(spark, manT, chunkT)
        .as[(Long, String)].collect().toMap
      assert(finalDocs.keySet == Set(5L, 6L), s"final corpus: ${finalDocs.keySet}")
      assert(finalDocs(5L) == norm(tB) && finalDocs(6L) == norm(tC),
        "reconstruction drifted after the composed erase")
      // the standalone sweep (same lease discipline) is a no-op on the
      // already-consistent store
      val afterErase = Snapshots.read(spark, chunkT).count()
      StreamingOps.sweepOrphanChunks(spark, manT, chunkT)
      assert(Snapshots.read(spark, chunkT).count() == afterErase,
        "sweep disturbed a consistent store")
    } finally {
      loop.stop()
      Seq(qQ, qD, qS, qC).foreach(_.stop())
    }
    assert(loop.errors.get() == 0L,
      "maintenance loop errored while racing the gates and the erase")
  }
}
