package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF+PQ — the composed billion-scale ANN index (the FAISS `IndexIVFPQ`
  * shape, re-expressed Spark-first): a coarse quantizer partitions vectors
  * into `nlist` inverted lists, and within each list a vector stores only
  * the PQ code of its RESIDUAL (v − coarse centroid). Residuals concentrate
  * near the origin, so the same codebook budget quantizes them far more
  * accurately than raw vectors — that is what makes the composition beat
  * either tier alone.
  *
  * Search probes the `nprobe` nearest lists per query; for each probed list
  * the query builds an ADC table from its OWN residual against that list's
  * centroid, so every candidate in the list costs m byte-indexed lookups.
  *
  * Scale shape: train touches a bounded sample at the driver; encode is a
  * map-only projection (centroids + codebooks in the task closure); the
  * probe join partitions by `cluster_id` — written as a
  * `partitionBy(cluster_id)` table, a search reads nprobe/nlist of the
  * data and the shuffle carries ≤ topK rows per partial.
  */
object IvfPq {

  final case class Model(
      centroids: Array[Array[Double]], // index = cluster_id
      books: Array[Array[Array[Double]]])

  private def nearestCentroid(v: Array[Double], cents: Array[Array[Double]]): Int =
    PqIndex.nearest(v, cents)

  private def residual(v: Array[Double], c: Array[Double]): Array[Double] = {
    val r = new Array[Double](v.length)
    var i = 0
    while (i < v.length) { r(i) = v(i) - c(i); i += 1 }
    r
  }

  /** Coarse centroids by whole-vector Lloyd's, then PQ codebooks on the
    * sample's residuals — both from one bounded deterministic sample. */
  def train(
      vectors: DataFrame, // (id, vec)
      nlist: Int = 16,
      m: Int = 16,
      k: Int = 256,
      sampleN: Int = 10000,
      iters: Int = 5): Model = {
    val sample = PqIndex.sampleVectors(vectors, sampleN)
    val coarse = PqIndex.trainOnPoints(sample, m = 1, k = nlist, iters = iters)(0)
    val residuals = sample.map(v => residual(v, coarse(nearestCentroid(v, coarse))))
    Model(coarse, PqIndex.trainOnPoints(residuals, m, k, iters))
  }

  /** Map-only encode: (id, cluster_id, code) — code = PQ(v − centroid). */
  def encode(vectors: DataFrame, model: Model): DataFrame = {
    val m = model.books.length
    val sub = model.books(0)(0).length
    val enc = udf((v: Seq[Double]) => {
      val arr = v.toArray
      val c = nearestCentroid(arr, model.centroids)
      val r = residual(arr, model.centroids(c))
      val code = new Array[Byte](m)
      var j = 0
      while (j < m) {
        code(j) = PqIndex.nearest(
          java.util.Arrays.copyOfRange(r, j * sub, (j + 1) * sub), model.books(j)).toByte
        j += 1
      }
      (c, code)
    })
    vectors
      .select(col("id"), enc(col("vec").cast("array<double>")).as("e"))
      .select(col("id"), col("e._1").as("cluster_id"), col("e._2").as("code"))
  }

  /** Probe-limited ADC top-k. Output: (query_id, neighbor_id, adist, rank). */
  def search(
      queries: DataFrame, // (id, vec)
      encoded: DataFrame, // from encode()
      model: Model,
      topK: Int,
      nprobe: Int,
      roundTo: Int = 6): DataFrame = {
    val k = model.books(0).length
    // per query: its nprobe nearest lists, each with the ADC table of the
    // query's residual against THAT list's centroid
    val probeUdf = udf((v: Seq[Double]) => {
      val arr = v.toArray
      model.centroids.indices
        .map { c =>
          var dd = 0.0
          var i = 0
          while (i < arr.length) { val t = arr(i) - model.centroids(c)(i); dd += t * t; i += 1 }
          (c, dd)
        }
        .sortBy { case (c, dd) => (dd, c) }
        .take(nprobe)
        .map { case (c, _) =>
          (c, PqIndex.adcTable(residual(arr, model.centroids(c)), model.books).toSeq)
        }
    })
    val q = queries
      .select(col("id").as("query_id"),
        explode(probeUdf(col("vec").cast("array<double>"))).as("p"))
      .select(col("query_id"), col("p._1").as("cluster_id"), col("p._2").as("tbl"))
    val scoreUdf = udf((code: Array[Byte], tbl: Seq[Double]) => {
      var s = 0.0
      var j = 0
      while (j < code.length) { s += tbl(j * k + (code(j) & 0xFF)); j += 1 }
      s
    })
    encoded.select(col("id").as("neighbor_id"), col("cluster_id"), col("code"))
      .join(broadcast(q), "cluster_id") // co-partitioned by list at scale
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(scoreUdf(col("code"), col("tbl")), roundTo).as("adist"))
      .groupBy("query_id")
      .agg(graft.functions.TopKAggregate.top_k(-col("adist"), col("neighbor_id"), topK).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("query_id"), col("e.id").as("neighbor_id"),
        (-col("e.v")).as("adist"), (col("pos") + 1).cast("int").as("rank"))
  }

  /** BUILD JOB: train coarse+residual quantizers, materialize the code table
    * once hive-partitioned by `cluster_id` — so a probe reads nprobe/nlist
    * of the files (manifest-level pruning, no LIST over unprobed lists). */
  def buildIndex(
      vectors: DataFrame,
      dir: String,
      nlist: Int = 16,
      m: Int = 16,
      k: Int = 256,
      sampleN: Int = 10000): Model =
    IndexStore.load[Model](s"$dir/model.bin").getOrElse {
      val model = train(vectors, nlist, m, k, sampleN)
      graft.sinks.Snapshots.commitPartitioned(encode(vectors, model),
        s"$dir/lists", Seq("cluster_id"), org.apache.spark.sql.SaveMode.Overwrite)
      IndexStore.save(s"$dir/model.bin", model)
      model
    }

  /** SEARCH-ONLY path: the probed cluster set resolves driver-side from the
    * (bounded) query batch, the code table is read through a manifest-level
    * partition filter, then ADC-scored. No training in the query path. */
  def searchIndexed(
      spark: org.apache.spark.sql.SparkSession,
      queries: DataFrame,
      dir: String,
      topK: Int,
      nprobe: Int): DataFrame = {
    val model = IndexStore.load[Model](s"$dir/model.bin")
      .getOrElse(throw new IllegalStateException(s"no IVFPQ index at $dir — run buildIndex"))
    val probeUdf = udf((v: Seq[Double]) => {
      val arr = v.toArray
      model.centroids.indices.map { c =>
        var dd = 0.0
        var i = 0
        while (i < arr.length) { val t = arr(i) - model.centroids(c)(i); dd += t * t; i += 1 }
        (c, dd)
      }.sortBy { case (c, dd) => (dd, c) }.take(nprobe).map(_._1)
    })
    val probed: Set[String] = queries
      .select(explode(probeUdf(col("vec").cast("array<double>"))).as("c"))
      .distinct().collect().map(_.get(0).toString).toSet
    val codes = graft.sinks.Snapshots.read(spark, s"$dir/lists",
        partitionFilter = spec => spec.get("cluster_id").exists(probed))
      .select(col("id"), col("cluster_id").cast("int").as("cluster_id"), col("code"))
    search(queries, codes, model, topK, nprobe)
  }
}
