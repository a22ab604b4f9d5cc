package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic deduplication (SemDeDup / D4 family, Abbas et al. 2023;
  * Tirumala et al. 2023): partition the embedding space into clusters, call
  * within-cluster pairs above a cosine threshold semantic duplicates, keep
  * one canonical member per duplicate group. Unlike the LSH near-dup family
  * (`Similarity`), clustering here is a PARTITION — every vector belongs to
  * exactly one cell, and candidate pairs are generated within cells only.
  *
  * Two clustering backends, one dedup core:
  *   - [[gridCells]]: md5-hyperplane sign grid ([[Similarity.portablePlanes]])
  *     — deterministic and reproducible from the md5 spec alone, so an
  *     external engine derives identical cells (the hash-oracle path,
  *     `q_semdedup`);
  *   - [[kmeansCells]]: IVF k-means cells ([[IvfIndex]]) — the production
  *     backend the papers use; centroid-shaped cells track the data
  *     distribution, so near-dups co-locate with higher recall than a
  *     data-oblivious grid. Float k-means is engine-specific → its query is
  *     rows-only, with grid-agreement pinned in `SemDedupSpec`.
  *
  * SCALE: the within-cell self-join shuffles each side once on cluster_id;
  * pair cost is Σ|cell|², never |corpus|². Resolution (grid bits / k) is
  * the knob that bounds cell size; a hot cell is salted or split like any
  * skewed join key. The duplicate graph is tiny relative to the corpus
  * (only above-threshold pairs), so [[Components]]' bounded-collect fast
  * path usually resolves it locally and the survivors join back broadcast.
  *
  * KNOWN PROPERTY (inherent to the family, spec-pinned): near-dups that
  * straddle a cell boundary are not candidates and survive dedup — the
  * recall/cost trade every clustered dedup makes. Raise recall with finer
  * thresholds inside bigger cells, or run a second pass with jittered
  * centroids; exhaustive recall needs the LSH family instead.
  */
object SemDedup {

  /** Deterministic grid clustering: cell id = `gridBits` hyperplane sign
    * bits (bit r = sign of the index-order dot with md5 plane r).
    * Input (id, v: array<double>) → (id, v, cluster_id: int). */
  def gridCells(vectors: DataFrame, gridBits: Int, dim: Int = 64): DataFrame = {
    val planes = Similarity.portablePlanes(gridBits, dim)
    val cellVal = (0 until gridBits).map { r =>
      when(graft.functions.VectorDistances.dot_product(col("v"), lit(planes(r))) > 0.0,
        lit(1 << r)).otherwise(lit(0))
    }.reduce(_ + _)
    vectors.select(col("id"), col("v")).withColumn("cluster_id", cellVal.cast("int"))
  }

  /** Production clustering: nearest-centroid cells from `centroids`
    * (train once per corpus vintage via [[IvfIndex.trainCached]]; the
    * assignment itself is map-side, no shuffle).
    * Input (id, v: array<double>) → (id, v, cluster_id: int). */
  def kmeansCells(vectors: DataFrame, centroids: DataFrame): DataFrame =
    IvfIndex.build(vectors.select(col("id"), col("v").as("vec")), centroids)
      .select(col("id"), col("vec").as("v"), col("cluster_id").cast("int").as("cluster_id"))

  /** The dedup core: within-cluster pairs with round(cos, roundTo) ≥ minCos
    * form the duplicate graph; connected components label groups; each
    * group keeps its MINIMUM id. Returns one row per input vector:
    * (vec_id, cluster_id, keep). Rounding before the threshold keeps the
    * float boundary aligned with external oracles (the q_cosine_topk
    * discipline). */
  def dedup(cells: DataFrame, minCos: Double, roundTo: Int = 6): DataFrame = {
    val pairs = cells.select(col("id").as("id_a"), col("v").as("va"), col("cluster_id"))
      .join(cells.select(col("id").as("id_b"), col("v").as("vb"), col("cluster_id")),
        "cluster_id")
      .filter(col("id_a") < col("id_b"))
      .filter(round(Similarity.cosine(col("va"), col("vb")), roundTo) >= minCos)
      .select("id_a", "id_b")
    val dropped = Components.connectedComponents(pairs, "id_a", "id_b")
      .filter(col("id") =!= col("component"))
      .select(col("id")).withColumn("_drop", lit(1))
    cells.select(col("id"), col("cluster_id"))
      .join(dropped, Seq("id"), "left")
      .select(col("id").as("vec_id"), col("cluster_id"), col("_drop").isNull.as("keep"))
  }
}
