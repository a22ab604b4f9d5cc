package graft.ext

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class PqIndexSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def emb = Tables.embeddings(spark, sf)
    .select($"vec_id".as("id"), $"embedding".as("vec"))

  test("codes are m bytes; encoding is deterministic") {
    val books = PqIndex.train(emb, m = 8, k = 16, sampleN = 200, iters = 3)
    assert(books.length == 8 && books(0).length <= 16 && books(0)(0).length == 8)
    val enc1 = PqIndex.encode(emb, books).orderBy("id").collect()
    val enc2 = PqIndex.encode(emb, books).orderBy("id").collect()
    assert(enc1.forall(_.getAs[Array[Byte]]("code").length == 8))
    assert(enc1.map(_.getAs[Array[Byte]]("code").toSeq).toSeq ==
      enc2.map(_.getAs[Array[Byte]]("code").toSeq).toSeq)
  }

  test("persisted index: searchIndexed ≡ in-path train+encode+search, build idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-idx").toString + "/idx"
    val books = PqIndex.buildIndex(emb, dir, m = 8, k = 16, sampleN = 200, iters = 3)
    // second build loads the SAME model instead of retraining
    val reloaded = PqIndex.buildIndex(emb, dir, m = 8, k = 16, sampleN = 200, iters = 3)
    assert(books.flatten.flatten.toSeq == reloaded.flatten.flatten.toSeq)
    val queries = emb.filter($"id" < 3)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select($"query_id", $"neighbor_id", $"adist", $"rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4)).toSeq
    val inline = PqIndex.search(queries, PqIndex.encode(emb, books), books, topK = 5)
    val indexed = PqIndex.searchIndexed(spark, queries, dir, topK = 5)
    assert(key(indexed) == key(inline))
  }

  test("ADC ranking recalls most exact-L2 neighbors (recall@10)") {
    val books = PqIndex.train(emb, m = 16, k = 256, sampleN = 2000, iters = 5)
    val queries = emb.filter($"id" < 5)
    val got = PqIndex.search(queries, PqIndex.encode(emb, books), books, topK = 10)
      .select($"query_id", $"neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // exact L2 top-10 per query, computed directly on the collected vectors
    val all = emb.select($"id", $"vec".cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val exact = (0L until 5L).flatMap { q =>
      val qv = all(q)
      all.toSeq.filter(_._1 != q)
        .map { case (id, v) =>
          var s = 0.0
          var i = 0
          while (i < qv.length) { val t = qv(i) - v(i); s += t * t; i += 1 }
          (id, s)
        }
        .sortBy { case (id, s) => (s, id) }.take(10)
        .map { case (id, _) => (q, id) }
    }.toSet

    val recall = (exact intersect got).size.toDouble / exact.size
    assert(recall >= 0.7, s"recall@10 = $recall") // 64x compression, byte codes
  }

  test("integer-quantized PQ (q_pq_*_exact): bit-deterministic across partition layouts") {
    // Same claim as the IVF fixed-point entries: training sums on
    // integer-valued subvectors are exact, so codes and ADC rankings must
    // be IDENTICAL under a different shuffle layout.
    val d = "/root/testdata/sf0.001"
    val enc = graft.SparkEntry.queries("q_pq_encode_exact")
    val srch = graft.SparkEntry.queries("q_pq_search_exact")
    def run(): (Seq[(Long, Int, Int)], Seq[(Long, Long, Double, Int)]) = (
      enc(spark, d).collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq,
      srch(spark, d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq)
    val a = run()
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val b = try { spark.conf.set("spark.sql.shuffle.partitions", "7"); run() }
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert(a == b, "integer-regime PQ must not depend on partition layout")
    // non-degenerate: both subspaces use more than one code
    val bySub = a._1.groupBy(_._2).view.mapValues(_.map(_._3).distinct.size)
    assert(bySub.values.forall(_ > 1), s"degenerate codebooks: $bySub")
    assert(a._2.nonEmpty && a._2.forall(t => t._4 >= 1 && t._4 <= 5))
  }
}
