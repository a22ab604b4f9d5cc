package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the compact-code ANN tier, complementing
  * [[IvfIndex]] (coarse partition pruning) and [[Quantize]] (scalar int8):
  * each vector splits into `m` subvectors, each subspace learns `k`
  * centroids, and a vector encodes as `m` one-byte codes (m bytes vs 8·d
  * for doubles — 64× smaller at d=64, m=8).
  *
  * Search uses asymmetric distance computation (ADC): per query, an m×k
  * table of exact subspace distances query↔centroid is precomputed ONCE;
  * each candidate then costs m byte-indexed table lookups — no float math
  * per candidate. Ranking by ADC distance approximates exact L2 ranking
  * (= cosine ranking for normalized vectors).
  *
  * Scale shape: codebooks train on a BOUNDED deterministic sample at the
  * driver (industry practice — PQ codebooks for billion-vector indexes
  * train on ~10⁵ samples); encoding is a map-only projection with the
  * codebooks in the task closure; search is map-only scoring + a bounded
  * top-k aggregate. Nothing driver-side scales with table size.
  */
object PqIndex {

  /** codebooks(sub)(centroid)(dim) — trained by per-subspace Lloyd's on the
    * first `sampleN` vectors by id (deterministic). */
  def train(
      vectors: DataFrame, // (id, vec)
      m: Int = 8,
      k: Int = 16,
      sampleN: Int = 10000,
      iters: Int = 5): Array[Array[Array[Double]]] =
    trainOnPoints(sampleVectors(vectors, sampleN), m, k, iters)

  /** Deterministic bounded training sample: the first `sampleN` ids. */
  private[ext] def sampleVectors(vectors: DataFrame, sampleN: Int): Array[Array[Double]] =
    vectors
      .select(col("id"), col("vec").cast("array<double>").as("v"))
      .orderBy("id").limit(sampleN)
      .collect().map(_.getSeq[Double](1).toArray)

  /** Subspace codebooks from in-memory points — shared with [[IvfPq]],
    * which trains on coarse-quantizer RESIDUALS instead of raw vectors. */
  private[ext] def trainOnPoints(
      sample: Array[Array[Double]],
      m: Int,
      k: Int,
      iters: Int): Array[Array[Array[Double]]] = {
    require(sample.nonEmpty, "empty training sample")
    val d = sample.head.length
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val sub = d / m
    Array.tabulate(m) { j =>
      val pts = sample.map(v => java.util.Arrays.copyOfRange(v, j * sub, (j + 1) * sub))
      // value-level dedupe: Array equality is reference-based, so a plain
      // pts.distinct would keep duplicate subvectors as duplicate seeds
      var cents = pts.map(_.toSeq).distinct.take(k).map(_.toArray)
      var it = 0
      while (it < iters) {
        val sums = Array.fill(cents.length)(new Array[Double](sub))
        val counts = new Array[Int](cents.length)
        pts.foreach { p =>
          val c = nearest(p, cents)
          counts(c) += 1
          var i = 0
          while (i < sub) { sums(c)(i) += p(i); i += 1 }
        }
        cents = cents.indices.map { c =>
          if (counts(c) == 0) cents(c)
          else { val o = new Array[Double](sub); var i = 0
            while (i < sub) { o(i) = sums(c)(i) / counts(c); i += 1 }; o }
        }.toArray
        it += 1
      }
      cents
    }
  }

  private[ext] def nearest(p: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      var dd = 0.0
      var i = 0
      while (i < p.length) { val t = p(i) - cents(c)(i); dd += t * t; i += 1 }
      if (dd < bestD) { bestD = dd; best = c } // ties: first (lowest code)
      c += 1
    }
    best
  }

  /** Map-only encode: (id, code: binary), code(j) = nearest centroid of
    * subvector j. Codebooks ride the task closure (m·k·sub doubles). */
  def encode(vectors: DataFrame, codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    val enc = udf((v: Seq[Double]) => {
      val arr = v.toArray
      val code = new Array[Byte](m)
      var j = 0
      while (j < m) {
        code(j) = nearest(
          java.util.Arrays.copyOfRange(arr, j * sub, (j + 1) * sub), codebooks(j)).toByte
        j += 1
      }
      code
    })
    vectors.select(col("id"), enc(col("vec").cast("array<double>")).as("code"))
  }

  /** ADC table for one query vector: flat m·k doubles, entry (j, c) =
    * ||q_j − centroid_jc||². */
  private[ext] def adcTable(q: Array[Double], codebooks: Array[Array[Array[Double]]]): Array[Double] = {
    val m = codebooks.length
    val k = codebooks(0).length
    val sub = codebooks(0)(0).length
    val t = new Array[Double](m * k)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < k) {
        var dd = 0.0
        var i = 0
        while (i < sub) { val x = q(j * sub + i) - codebooks(j)(c)(i); dd += x * x; i += 1 }
        t(j * k + c) = dd
        c += 1
      }
      j += 1
    }
    t
  }

  /** BUILD JOB: train codebooks and materialize the code table ONCE (codes
    * snapshot first, then the model file — its presence marks a complete
    * index). Load-or-build: an existing index is reused, so queries through
    * [[searchIndexed]] never re-train. */
  def buildIndex(
      vectors: DataFrame,
      dir: String,
      m: Int = 8,
      k: Int = 16,
      sampleN: Int = 10000,
      iters: Int = 5): Array[Array[Array[Double]]] =
    IndexStore.load[Array[Array[Array[Double]]]](s"$dir/model.bin").getOrElse {
      val books = train(vectors, m, k, sampleN, iters)
      graft.sinks.Snapshots.commit(encode(vectors, books), s"$dir/codes",
        org.apache.spark.sql.SaveMode.Overwrite)
      IndexStore.save(s"$dir/model.bin", books)
      books
    }

  /** SEARCH-ONLY path against a [[buildIndex]]-persisted index: load the
    * codebooks (kilobytes), scan the m-byte codes. ADC is a full-scan method
    * by design — the win is the 8·d/m code compression, not pruning (IVF+PQ
    * composes both). No training in the query path. */
  def searchIndexed(
      spark: org.apache.spark.sql.SparkSession,
      queries: DataFrame,
      dir: String,
      topK: Int): DataFrame = {
    val books = IndexStore.load[Array[Array[Array[Double]]]](s"$dir/model.bin")
      .getOrElse(throw new IllegalStateException(s"no PQ index at $dir — run buildIndex"))
    search(queries, graft.sinks.Snapshots.read(spark, s"$dir/codes"), books, topK)
  }

  /** Approximate top-k by ADC distance (ascending). Output:
    * (query_id, neighbor_id, adist, rank) — ranked with the bounded top-k
    * aggregate, so the shuffle carries ≤ topK rows per partial. */
  def search(
      queries: DataFrame, // (id, vec)
      encoded: DataFrame, // (id, code) from encode()
      codebooks: Array[Array[Array[Double]]],
      topK: Int,
      roundTo: Int = 6): DataFrame = {
    val k = codebooks(0).length
    val tableUdf = udf((v: Seq[Double]) => adcTable(v.toArray, codebooks))
    val q = queries.select(col("id").as("query_id"),
      tableUdf(col("vec").cast("array<double>")).as("tbl"))
    val scoreUdf = udf((code: Array[Byte], tbl: Seq[Double]) => {
      var s = 0.0
      var j = 0
      while (j < code.length) { s += tbl(j * k + (code(j) & 0xFF)); j += 1 }
      s
    })
    encoded.select(col("id").as("neighbor_id"), col("code"))
      .crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(scoreUdf(col("code"), col("tbl")), roundTo).as("adist"))
      .groupBy("query_id")
      // top-k by SMALLEST distance: feed the max-heap the negated value
      .agg(graft.functions.TopKAggregate.top_k(-col("adist"), col("neighbor_id"), topK).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("query_id"), col("e.id").as("neighbor_id"),
        (-col("e.v")).as("adist"), (col("pos") + 1).cast("int").as("rank"))
  }
}
