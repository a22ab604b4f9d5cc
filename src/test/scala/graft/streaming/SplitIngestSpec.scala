package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The streaming split-stable ingest gate: arriving documents inherit the
  * split of their near-dup cluster, a component linked to two splits is
  * quarantined (as is anything linked to a quarantined doc), fresh docs get
  * the canonical md5-bucket rule, standing assignments never change, and
  * replays no-op. */
class SplitIngestSpec extends SparkSpec {
  import spark.implicits._

  // 20 unique tokens per seed; a "near" variant swaps 2 of them, giving
  // Jaccard 18/22 ≈ 0.818 ≥ 0.8, while disjoint seeds share nothing
  private def base(seed: String): String =
    (1 to 20).map(i => s"$seed$i").mkString(" ")
  private def near(seed: String, tag: String): String =
    ((1 to 18).map(i => s"$seed$i") ++ Seq(s"$tag-a", s"$tag-b")).mkString(" ")

  private def jac(a: String, b: String): Double = {
    val (sa, sb) = (a.split(" ").toSet, b.split(" ").toSet)
    sa.intersect(sb).size.toDouble / sa.union(sb).size
  }

  private def freshSplit(comp: Long): String =
    Seq(comp).toDF("c").select(graft.ext.Splits.splitOf($"c")).as[String].head()

  test("inherit / quarantine / fresh assignment; stability; replay no-op") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-splitingest").toString
    val (docsT, tokT) = (s"$dir/docs", s"$dir/tokens")
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = StreamingOps.startSplitIngest(
      mem.toDF().toDF("doc_id", "text"), docsT, tokT, s"$dir/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    def table() = graft.sinks.Snapshots.read(spark, docsT)
      .select($"doc_id".as[Long], $"split".as[String]).collect().toMap

    // pick ids whose singleton (fresh) clusters land in train and val, so a
    // cross-split bridge is constructible later
    val trainId = (1L to 60L).find(freshSplit(_) == "train").get
    val valId = (1L to 60L).find(freshSplit(_) == "val").get

    // batch 1: two unrelated fresh docs → the md5 rule assigns their own ids
    mem.addData(Seq((trainId, base("alpha")), (valId, base("beta"))))
    q.processAllAvailable()
    val t1 = table()
    assert(t1(trainId) == "train" && t1(valId) == "val")

    // batch 2: a near-dup of each standing doc → inherits that doc's split
    mem.addData(Seq((101L, near("alpha", "x")), (102L, near("beta", "y"))))
    q.processAllAvailable()
    val t2 = table()
    assert(t2(101L) == "train", "near-dup of a train doc must inherit train")
    assert(t2(102L) == "val", "near-dup of a val doc must inherit val")

    // batch 3: a drift chain crossing from alpha (train) to beta (val) in
    // one batch — 2 tokens swap per hop, so every hop is ≥ 0.8 and the
    // chain is ONE component linked to both splits → entirely quarantined
    val alphaToks = (1 to 20).map(i => s"alpha$i")
    val betaToks = (1 to 20).map(i => s"beta$i")
    val chain = (0 to 10).map { k =>
      (300L + k) -> (alphaToks.drop(2 * k) ++ betaToks.take(2 * k)).mkString(" ")
    }
    (0 until 10).foreach(k =>
      assert(jac(chain(k)._2, chain(k + 1)._2) >= 0.8, s"hop $k broke the chain"))
    assert(jac(chain.head._2, base("alpha")) >= 0.8)
    assert(jac(chain.last._2, base("beta")) >= 0.8)
    mem.addData(chain)
    q.processAllAvailable()
    val t3 = table()
    chain.foreach { case (id, _) =>
      assert(t3(id) == "quarantine", s"bridge-chain doc $id must quarantine")
    }
    // stability: standing assignments are untouched by later batches
    assert(t3(trainId) == "train" && t3(valId) == "val" && t3(101L) == "train")

    // batch 4 (the nq > 0 leg): a near-dup of a QUARANTINED chain middle —
    // far from both seed clusters (≤ 10 shared tokens → jac ≤ 1/3), so its
    // only links are quarantined docs → it must quarantine too
    val midNear = (chain(5)._2.split(" ").drop(2) ++ Seq("w-a", "w-b")).mkString(" ")
    assert(jac(midNear, chain(5)._2) >= 0.8)
    assert(jac(midNear, base("alpha")) < 0.8 && jac(midNear, base("beta")) < 0.8)
    mem.addData(Seq((400L, midNear)))
    q.processAllAvailable()
    assert(table()(400L) == "quarantine",
      "near-dup of a quarantined doc is boundary-ambiguous and must quarantine")
    q.stop()

    // replay containment: the (appId, batchId) txn watermark no-ops a rerun
    val lastDocs = graft.sinks.Snapshots
      .lastTxn(spark, docsT, "graft-split-ingest-docs").get
    val before = graft.sinks.Snapshots.versions(spark, docsT)
    graft.sinks.Snapshots.commitPartitioned(
      graft.sinks.Snapshots.read(spark, docsT).limit(1)
        .select($"dbucket", $"doc_id", $"text", $"split"),
      docsT, Seq("dbucket"), org.apache.spark.sql.SaveMode.Append,
      txn = Some("graft-split-ingest-docs" -> lastDocs))
    assert(graft.sinks.Snapshots.versions(spark, docsT) == before)

    // the global zero-leakage contract on the final table: no ≥ 0.8 pair
    // carries two different non-quarantine splits
    val all = graft.sinks.Snapshots.read(spark, docsT)
      .select($"doc_id", $"text", $"split").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    for {
      (ia, ta, sa) <- all; (ib, tb, sb) <- all
      if ia < ib && sa != "quarantine" && sb != "quarantine" && sa != sb
    } assert(jac(ta, tb) < 0.8, s"leakage: $ia($sa) ~ $ib($sb)")
  }
}
