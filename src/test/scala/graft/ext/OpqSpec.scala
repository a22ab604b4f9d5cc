package graft.ext

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class OpqSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def emb = Tables.embeddings(spark, sf)
    .select($"vec_id".as("id"), $"embedding".as("vec"))

  test("learned rotation is orthonormal and preserves L2 distance") {
    val sample = PqIndex.sampleVectors(emb, 300)
    val r = Opq.rotationFor(sample, m = 8)
    val d = r.length
    // R·Rᵀ = I
    for (i <- 0 until d; j <- 0 until d) {
      val dot = (0 until d).map(k => r(i)(k) * r(j)(k)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9, s"R·Rᵀ[$i][$j] = $dot")
    }
    val (x, y) = (sample(0), sample(1))
    def l2(a: Array[Double], b: Array[Double]) =
      math.sqrt(a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum)
    assert(math.abs(l2(Opq.apply(r, x), Opq.apply(r, y)) - l2(x, y)) < 1e-9)
  }

  test("jacobi eigen reconstructs the matrix") {
    val a = Array(
      Array(4.0, 1.0, 0.5),
      Array(1.0, 3.0, -0.2),
      Array(0.5, -0.2, 2.0))
    val (values, vectors) = Opq.jacobiEigen(a)
    // A·v_k = λ_k·v_k for every eigenpair
    for (k <- 0 until 3; i <- 0 until 3) {
      val av = (0 until 3).map(j => a(i)(j) * vectors(j)(k)).sum
      assert(math.abs(av - values(k) * vectors(i)(k)) < 1e-9)
    }
  }

  private def exactTop10(all: Map[Long, Array[Double]]): Set[(Long, Long)] =
    (0L until 5L).flatMap { q =>
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

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select($"query_id", $"neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("OPQ recall@10 meets the PQ floor on the embeddings table") {
    val model = Opq.train(emb, m = 16, k = 256, sampleN = 2000, iters = 5)
    val queries = emb.filter($"id" < 5)
    val opq = pairs(Opq.search(queries, Opq.encode(emb, model), model, topK = 10))
    val all = emb.select($"id", $"vec".cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val recall = (exactTop10(all) intersect opq).size.toDouble / 50
    assert(recall >= 0.7, s"OPQ recall@10 = $recall")
  }

  test("OPQ beats plain PQ when variance concentrates in one raw subspace") {
    // Adversarial-for-PQ data: nearly all energy in dims 0..3, which
    // dimension-order splitting hands to a SINGLE subquantizer (4 bits of
    // code for the whole signal at k=16). OPQ's eigenvalue allocation
    // spreads the 4 strong directions across 4 subspaces. On the near-
    // isotropic synthetic embeddings the rotation is a no-op by design —
    // this skew is the case it exists for.
    val skew = udf((v: Seq[Double]) =>
      v.zipWithIndex.map { case (x, i) => if (i < 4) x * 10.0 else x * 0.1 })
    val data = emb.select($"id", skew($"vec".cast("array<double>")).as("vec"))
    val queries = data.filter($"id" < 5)
    val all = data.select($"id", $"vec")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val exact = exactTop10(all)

    val m = 16; val k = 16
    val opqModel = Opq.train(data, m = m, k = k, sampleN = 2000, iters = 5)
    val opq = pairs(Opq.search(queries, Opq.encode(data, opqModel), opqModel, topK = 10))
    val books = PqIndex.train(data, m = m, k = k, sampleN = 2000, iters = 5)
    val pq = pairs(PqIndex.search(queries, PqIndex.encode(data, books), books, topK = 10))

    val recallOpq = (exact intersect opq).size.toDouble / 50
    val recallPq = (exact intersect pq).size.toDouble / 50
    assert(recallOpq > recallPq, s"OPQ $recallOpq vs PQ $recallPq")
    assert(recallOpq >= 0.5, s"OPQ recall@10 on skewed data = $recallOpq")
  }
  test("permutationModel: rotation is a variance-balanced permutation matrix") {
    // integer vectors whose per-dim variance grows with the dim index and
    // sits above 1 — the log-product greedy's balancing regime (for λ<1
    // the rule still mirrors the engine's eigen path bit-for-bit, but
    // degenerates to stuffing one bucket, so it isn't what's asserted)
    val d = 8
    val synth = (0L until 200L).map { id =>
      (id, Array.tabulate(d)(i => ((id * 2654435761L + i) % (10 + 10 * i)).toDouble))
    }
    val sdf = synth.map { case (id, v) => (id, v.toSeq) }.toDF("id", "vec")
    val model = Opq.permutationModel(sdf, m = 2, k = 4, sampleN = 200, iters = 2)
    val r = model.rotation
    // each row/column has exactly one 1.0 (a permutation = orthonormal)
    assert(r.forall(row => row.count(_ == 1.0) == 1 && row.forall(x => x == 0.0 || x == 1.0)))
    assert((0 until d).forall(cCol => r.count(row => row(cCol) == 1.0) == 1))
    val perm = r.map(_.indexWhere(_ == 1.0))
    // allocation balances total variance: the top-variance dim and the
    // runner-up land in DIFFERENT subspaces (greedy log-product rule)
    val sample = synth.map(_._2)
    val n = sample.length
    val mean = Array.tabulate(d)(i => sample.map(_(i)).sum / n)
    val varr = Array.tabulate(d)(i => sample.map(v => { val t = v(i) - mean(i); t * t }).sum / n)
    assert(varr.forall(_ > 1.0), "synthetic variances must sit in the balancing regime")
    val byVar = varr.zipWithIndex.sortBy { case (v, idx) => (-v, idx) }.map(_._2)
    val sub = d / 2
    def subspaceOf(dim: Int) = perm.indexWhere(_ == dim) / sub
    assert(subspaceOf(byVar(0)) != subspaceOf(byVar(1)),
      "two highest-variance dims must split across subspaces")
    // the permuted model still round-trips through the shared machinery
    assert(Opq.encode(sdf, model).count() == 200)
  }

  test("persisted index: searchIndexed ≡ in-path rotate+encode+search") {
    val dir = java.nio.file.Files.createTempDirectory("graft-opq-idx").toString + "/idx"
    val model = Opq.buildIndex(emb, dir, m = 8, k = 16, sampleN = 200, iters = 3)
    val queries = emb.filter($"id" < 3)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4)).toSeq
    val inline = Opq.search(queries, Opq.encode(emb, model), model, topK = 5)
    val indexed = Opq.searchIndexed(spark, queries, dir, topK = 5)
    assert(key(indexed) == key(inline))
  }
}
