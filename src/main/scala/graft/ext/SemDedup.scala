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
  * the coarse knob that bounds cell size; a hot cell is split like any
  * skewed join key — [[splitHotCells]] refines oversized cells by
  * secondary hyperplane bits until every cell fits `maxCellSize`
  * ([[dedupBounded]] composes it with the dedup core). The duplicate
  * graph is tiny relative to the corpus
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

  /** Hot-cell guard: refine any cell holding more than `maxCellSize`
    * vectors by appending secondary hyperplane sign bits until every cell
    * fits (or `maxRounds` planes are exhausted). The within-cell pair cost
    * of [[dedup]] is Σ|cell|², so ONE pathological cell — a corpus whose
    * embeddings concentrate in a single grid/k-means region — degrades the
    * self-join toward |corpus|²; this is the skewed-join-key split applied
    * to the clustering itself.
    *
    * Mechanics: cluster ids become PATH strings (`"7"` → `"7.1.0"`), so a
    * split cell's children can never collide with an untouched cell's id.
    * Split planes are [[Similarity.portablePlanes]] rows `firstPlane +
    * round` — deterministic, and disjoint from [[gridCells]]'s planes
    * (rows 0..gridBits-1) as long as firstPlane ≥ gridBits, so a split
    * re-uses no bit the cell was built from (re-using one would split
    * nothing: every member shares that sign by construction).
    *
    * EXECUTION is closed-form, not iterative: because hot cells split in
    * LOCKSTEP (a cell is hot or not as a whole, so all members of a
    * bit-prefix group stop or continue together), round-by-round
    * refinement is equivalent to "each vector's final id is its SHORTEST
    * bit-prefix whose group size ≤ maxCellSize" (prefix-group sizes are
    * non-increasing in depth, so the small-prefix set is upward-closed
    * and its minimum is exactly where the iteration stops). That collapses
    * maxRounds dependent count+join rounds — whose growing lineage
    * re-executed the input scan O(rounds²) times — into one bit
    * projection, one prefix-size aggregate, and one join back by `id`
    * (which must uniquely key rows — the invariant [[dedup]]'s
    * min-id-canonical rule already relies on). Constant shuffle count
    * regardless of maxRounds; nothing data-sized on the driver.
    *
    * RECALL: identical in kind to the cell-boundary trade the family
    * already makes — a near-dup pair straddling a split boundary stops
    * being a candidate. Splitting only triggers past maxCellSize, so the
    * trade is paid exactly where the quadratic blow-up would be.
    *
    * IRREDUCIBLE cells — e.g. > maxCellSize bit-identical vectors, which
    * no hyperplane can separate — survive all rounds; they are reported
    * loudly on stderr and left intact (for true duplicates the |cell|²
    * pairs ARE the dedup's work product; run exact dedup first if a corpus
    * is dominated by byte-identical embeddings). */
  def splitHotCells(cells: DataFrame, maxCellSize: Long, dim: Int = 64,
      maxRounds: Int = 6, firstPlane: Int = 32): DataFrame = {
    require(maxCellSize > 0, "maxCellSize must be positive")
    require(firstPlane >= 0 && maxRounds >= 0, "negative plane range")
    val planes = Similarity.portablePlanes(firstPlane + maxRounds, dim)
    val base = cells.withColumn("cluster_id", col("cluster_id").cast("string"))
    // candidate id at depth L: raw id, then raw id + "." + b1 [+ "." + b2 …]
    // — byte-identical to the strings the round-by-round form produced
    val bits = (0 until maxRounds).map { r =>
      when(graft.functions.VectorDistances
          .dot_product(col("v"), lit(planes(firstPlane + r))) > 0.0,
        lit("1")).otherwise(lit("0"))
    }
    // checkpoint right after the bit projection: everything downstream then
    // references a materialized column instead of the 6×dim literal-plane
    // expression tree, which Catalyst would otherwise inline into every
    // prefix at every depth and re-analyze per action (~4.5 s of pure
    // PLANNING per call at 2k rows before this cut)
    val withBits = base.withColumn("_bits", array(bits: _*)).localCheckpoint()
    val withIds = withBits
      .withColumn("_ids", array((0 to maxRounds).map { l =>
        if (l == 0) col("cluster_id")
        else concat(col("cluster_id"), lit("."),
          array_join(slice(col("_bits"), 1, l), "."))
      }: _*))
    // one aggregate: the size of every prefix group at every depth (map-side
    // partial count absorbs the (maxRounds+1)× row expansion pre-shuffle);
    // keep only the SMALL prefixes — the ones a vector may stop at
    val smallPrefixes = withIds
      .select(explode(col("_ids")).as("_pfx"))
      .groupBy(col("_pfx")).agg(count(lit(1)).as("_n"))
      .filter(col("_n") <= maxCellSize)
      .select(col("_pfx"))
    // each vector's refined id = its shallowest small prefix; vectors whose
    // every prefix stays hot fall back to the full-depth id (the loud
    // residual case below)
    val chosen = withIds
      .select(col("id"), posexplode(col("_ids")).as(Seq("_lvl", "_pfx")))
      .join(smallPrefixes, Seq("_pfx"))
      .groupBy(col("id"))
      .agg(min(struct(col("_lvl"), col("_pfx"))).as("_m"))
      .select(col("id"), col("_m._pfx").as("_chosen"))
    val refined = withIds.join(chosen, Seq("id"), "left")
      .withColumn("cluster_id",
        coalesce(col("_chosen"), element_at(col("_ids"), maxRounds + 1)))
      .drop("_bits", "_ids", "_chosen")
      .localCheckpoint() // pin: the residual probe below must not recompute
    // a cell surviving past maxRounds must be LOUD, because the caller's
    // pair cost is about to be quadratic in its size
    val residual = refined.groupBy("cluster_id").agg(count(lit(1)).as("_n"))
      .filter(col("_n") > maxCellSize)
      .agg(count(lit(1)).as("cells"), max(col("_n")).as("largest"))
      .collect()(0)
    if (residual.getLong(0) > 0)
      System.err.println(
        s"[semdedup] ${residual.getLong(0)} cell(s) still exceed " +
        s"maxCellSize=$maxCellSize after $maxRounds split rounds " +
        s"(largest=${residual.getLong(1)}): vectors are too similar for " +
        "hyperplane splits - run exact dedup first or raise maxCellSize")
    refined
  }

  /** [[dedup]] behind the hot-cell guard: cells are [[splitHotCells]]-
    * refined to at most `maxCellSize` members first, so the within-cell
    * pair cost is ≤ Σ min(|cell|, maxCellSize)² by construction. The
    * production entry point for corpora whose embedding distribution is
    * not known to be spread. */
  def dedupBounded(cells: DataFrame, minCos: Double, maxCellSize: Long,
      roundTo: Int = 6, dim: Int = 64, maxRounds: Int = 6,
      firstPlane: Int = 32): DataFrame =
    dedup(splitHotCells(cells, maxCellSize, dim, maxRounds, firstPlane),
      minCos, roundTo)

  /** Joint hot-cell refinement for the delta-vs-corpus form: corpus and
    * delta cells are [[splitHotCells]]-refined TOGETHER (one tagged union,
    * shared split planes), so both sides land in IDENTICAL refined ids —
    * the requirement for [[dedupDelta]]'s cluster-id equijoin. Refinement
    * here is a DECISION-TIME device: the corpus table keeps its raw
    * cluster-id layout (manifest pruning unchanged); only the pair
    * generation sees refined cells, recomputed per call from the
    * deterministic planes. */
  def refineTogether(corpusCells: DataFrame, deltaCells: DataFrame,
      maxCellSize: Long, dim: Int = 64, maxRounds: Int = 6,
      firstPlane: Int = 32): (DataFrame, DataFrame) = {
    val tagged = corpusCells.select(col("id"), col("v"), col("cluster_id"))
      .withColumn("_side", lit("c"))
      .unionByName(deltaCells.select(col("id"), col("v"), col("cluster_id"))
        .withColumn("_side", lit("d")))
    val refined = splitHotCells(tagged, maxCellSize, dim, maxRounds, firstPlane)
      .localCheckpoint() // split rounds ran actions already; pin the result
    (refined.filter(col("_side") === "c").drop("_side"),
      refined.filter(col("_side") === "d").drop("_side"))
  }

  /** [[dedupDelta]] behind the hot-cell guard ([[refineTogether]]): each
    * delta row pairs with at most `maxCellSize` members of its refined
    * cell, so per-batch candidate-edge cost is ≤ |delta|·maxCellSize +
    * Σ|delta_c|² REGARDLESS of how large any single corpus cell has grown
    * — the streaming-ingest complement of [[dedupBounded]], fixing the
    * exact skew that one hot corpus cell would otherwise impose on every
    * batch that touches it. Same recall trade as all splitting: a
    * delta–corpus near-dup straddling a split boundary stops being a
    * candidate, paid only where the quadratic blow-up would be. */
  def dedupDeltaBounded(corpusCells: DataFrame, deltaCells: DataFrame,
      minCos: Double, maxCellSize: Long, roundTo: Int = 6, dim: Int = 64,
      maxRounds: Int = 6, firstPlane: Int = 32): DataFrame = {
    val (c, d) = refineTogether(corpusCells, deltaCells, maxCellSize, dim,
      maxRounds, firstPlane)
    dedupDelta(c, d, minCos, roundTo)
  }

  /** DELTA-vs-CORPUS form (the [[SetSimJoin.joinDelta]] discipline applied
    * to semantic dedup): decide keep/drop for a DELTA batch against a
    * standing corpus WITHOUT re-pairing the corpus. Candidate edges are
    * delta–delta and delta–corpus pairs within shared cells only — the
    * corpus–corpus |corpus|² term the full [[dedup]] would pay is never
    * generated, so a daily ingest costs Σ_cell (|delta_c|² + |delta_c|·
    * |corpus_c|), linear in the corpus. Both sides must be clustered with
    * the SAME backend/planes (one [[gridCells]]/[[kmeansCells]] call over
    * each side with shared parameters).
    *
    * Semantics: connected components over those edges, keep = component
    * MINIMUM id — [[dedup]]'s canonical rule, so with time-ordered ids
    * (corpus ingested before delta ⇒ smaller ids, the natural ingest
    * layout) a delta doc semantically matching the corpus is always
    * dropped in favor of the standing copy. Output covers DELTA rows only:
    * (vec_id, cluster_id, keep).
    *
    * EQUIVALENCE (spec-pinned): when the corpus is internally dup-free at
    * `minCos` — which it is in steady state, being the output of a prior
    * dedup at the same threshold — corpus–corpus edges don't exist, so
    * this incremental form returns exactly [[dedup]](corpus ∪ delta)
    * restricted to delta rows. A corpus with residual internal dups only
    * weakens transitive merging ACROSS its dup groups (components that a
    * corpus–corpus edge would have bridged), never the direct
    * delta-vs-corpus verdicts. */
  def dedupDelta(corpusCells: DataFrame, deltaCells: DataFrame,
      minCos: Double, roundTo: Int = 6): DataFrame = {
    val da = deltaCells.select(col("id").as("id_a"), col("v").as("va"), col("cluster_id"))
    val dd = da
      .join(deltaCells.select(col("id").as("id_b"), col("v").as("vb"), col("cluster_id")),
        "cluster_id")
      .filter(col("id_a") < col("id_b"))
      .filter(round(Similarity.cosine(col("va"), col("vb")), roundTo) >= minCos)
      .select("id_a", "id_b")
    val dc = da
      .join(corpusCells.select(col("id").as("id_b"), col("v").as("vb"), col("cluster_id")),
        "cluster_id")
      .filter(col("id_a") =!= col("id_b"))
      .filter(round(Similarity.cosine(col("va"), col("vb")), roundTo) >= minCos)
      .select("id_a", "id_b")
    val dropped = Components.connectedComponents(dd.unionByName(dc), "id_a", "id_b")
      .filter(col("id") =!= col("component"))
      .select(col("id")).withColumn("_drop", lit(1))
    deltaCells.select(col("id"), col("cluster_id"))
      .join(dropped, Seq("id"), "left")
      .select(col("id").as("vec_id"), col("cluster_id"), col("_drop").isNull.as("keep"))
  }

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
