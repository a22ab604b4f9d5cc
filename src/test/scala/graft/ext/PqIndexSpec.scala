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
}
