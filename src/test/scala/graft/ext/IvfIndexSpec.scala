package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = (0L until 60L).map { i =>
    // three well-separated blobs in 8-d
    val blob = (i % 3).toInt
    val v = Array.tabulate(8)(j =>
      (if (j / 3 == blob) 10.0 else 0.0) + math.sin(i * 13 + j) * 0.5)
    (i, v)
  }.toDF("id", "vec")

  test("train produces k centroids with the input dimensionality") {
    val c = IvfIndex.train(vecs, k = 3)
    assert(c.count() == 3)
    assert(c.select(size($"centroid")).as[Int].collect().forall(_ == 8))
  }

  test("inverted lists cover every vector exactly once") {
    val centroids = IvfIndex.train(vecs, k = 3)
    val lists = IvfIndex.build(vecs, centroids)
    assert(lists.count() == 60)
    assert(lists.select("id").distinct().count() == 60)
  }

  test("clustered blobs land in the same inverted list") {
    val centroids = IvfIndex.train(vecs, k = 3)
    val lists = IvfIndex.build(vecs, centroids)
    // all members of a blob share one cluster_id
    val spread = lists.withColumn("blob", $"id" % 3)
      .groupBy("blob").agg(countDistinct("cluster_id").as("nc"))
      .select("nc").as[Long].collect()
    assert(spread.forall(_ == 1L))
  }

  test("trainCached: first call trains and persists, second call loads the same codebook") {
    val cacheKey = s"ivf-traincache-test-${System.nanoTime()}"
    val c1 = IvfIndex.trainCached(vecs, k = 3, cacheKey)
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1)
    val c2 = IvfIndex.trainCached(vecs, k = 3, cacheKey)
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1)
    assert(c1.length == 3)
    assert(c1.toSeq == c2.toSeq, "cache hit must return the identical codebook")
    // and the cached codebook serves search identically to a fresh train
    val fresh = IvfIndex.train(vecs, k = 3)
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1)
    assert(c1.toSeq == fresh.toSeq)
  }

  test("nprobe = nClusters degrades exactly to brute force") {
    val queries = vecs.filter($"id" < 5)
    val brute = Similarity.bruteForceTopK(queries, vecs, k = 3)
      .select("query_id", "neighbor_id", "cos", "rank")
      .orderBy("query_id", "rank").collect().toSeq
    val centroids = IvfIndex.train(vecs, k = 3)
    val ivf = IvfIndex.search(queries, IvfIndex.build(vecs, centroids),
        centroids, k = 3, nprobe = 3)
      .select("query_id", "neighbor_id", "cos", "rank")
      .orderBy("query_id", "rank").collect().toSeq
    assert(ivf == brute)
  }

  test("q_ann_recall: 10 queries, recall5 a multiple of 1/5 in [0,1]") {
    val out = graft.SparkEntry.queries("q_ann_recall")(spark, "/root/testdata/sf0.001")
      .orderBy($"query_id").collect()
    assert(out.length == 10)
    assert(out.map(_.getLong(0)).toSeq == (0L until 10L))
    out.map(_.getDouble(1)).foreach { r =>
      assert(r >= 0.0 && r <= 1.0)
      assert((r * 5).isWhole, s"recall5 $r is not a multiple of 1/5")
    }
  }

  test("nprobe = 1 still finds in-blob neighbors (the common case)") {
    val queries = vecs.filter($"id" === 0L) // blob 0
    val centroids = IvfIndex.train(vecs, k = 3)
    val ivf = IvfIndex.search(queries, IvfIndex.build(vecs, centroids),
      centroids, k = 3, nprobe = 1)
    val neighbors = ivf.select("neighbor_id").as[Long].collect()
    assert(neighbors.length == 3)
    assert(neighbors.forall(_ % 3 == 0)) // same blob
  }

  test("appendDelta: maintained index ≡ rebuild; replayed batch no-ops") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-idx").toString + "/idx"
    val corpus = vecs.filter($"id" < 45)
    val delta = vecs.filter($"id" >= 45)
    assert(IvfIndex.buildIndex(corpus, dir, nClusters = 3))
    IvfIndex.appendDelta(delta, dir, txn = Some("t" -> 1L))
    // searches over the maintained index match a rebuild from corpus ∪ delta
    // with the SAME frozen centroids (assignment depends only on centroids)
    val centroids = graft.sinks.Snapshots.read(spark, s"$dir/centroids")
    val queries = vecs.filter($"id" < 4)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4)).toSeq
    val maintained = IvfIndex.searchIndexed(spark, queries, dir, k = 5, nprobe = 3)
      .select($"query_id", $"neighbor_id", $"cos", $"rank")
    val rebuilt = IvfIndex.search(queries, IvfIndex.build(vecs, centroids),
        centroids, k = 5, nprobe = 3)
      .select($"query_id", $"neighbor_id", $"cos", $"rank")
    assert(key(maintained) == key(rebuilt))
    // the delta is actually IN the index (deterministic: read the lists
    // table — a search assertion can be satisfied by corpus neighbors)
    val served = graft.sinks.Snapshots.read(spark, s"$dir/lists")
      .filter($"id" >= 45).count()
    assert(served == 15, s"expected all 15 delta vectors in the lists, got $served")
    // and a delta query is answerable through the index with in-blob results
    val dq = IvfIndex.searchIndexed(spark, vecs.filter($"id" === 45L), dir,
      k = 1, nprobe = 1).select("neighbor_id").as[Long].collect()
    assert(dq.nonEmpty && dq.forall(_ % 3 == 45L % 3)) // same blob
    // replaying the same (appId, batchId) is an idempotent no-op
    val vBefore = graft.sinks.Snapshots.versions(spark, s"$dir/lists").last
    IvfIndex.appendDelta(delta, dir, txn = Some("t" -> 1L))
    assert(graft.sinks.Snapshots.versions(spark, s"$dir/lists").last == vBefore)
    assert(key(IvfIndex.searchIndexed(spark, queries, dir, k = 5, nprobe = 3)
      .select($"query_id", $"neighbor_id", $"cos", $"rank")) == key(rebuilt))
  }

  test("integer-quantized train (q_ivf_train_exact): bit-deterministic across partition layouts") {
    // The fixed-point regime's whole claim is that Lloyd's on integer-valued
    // vectors is order-independent (exact sums < 2^53) — so the assignment
    // must be IDENTICAL under a different shuffle-partition setting, where a
    // float-valued train could legally drift in the last mantissa bits.
    val d = "/root/testdata/sf0.001"
    val q = graft.SparkEntry.queries("q_ivf_train_exact")
    def run(): Seq[(Long, Int)] =
      q(spark, d).collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    val a = run()
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val b = try { spark.conf.set("spark.sql.shuffle.partitions", "7"); run() }
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert(a == b, "integer-regime assignment must not depend on partition layout")
    // non-degenerate: every vector assigned, more than one cluster in use
    assert(a.map(_._1).distinct.size == a.size)
    assert(a.map(_._2).distinct.size > 1)
    assert(a.map(_._2).forall(c => c >= 0 && c < 4))
  }
}
