package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic dedup semantics on a planted fixture: scaled copies of a base
  * vector are perfect semantic duplicates (cosine exactly 1) AND provably
  * co-locate under BOTH clustering backends — hyperplane signs and
  * cosine-to-centroid are scale-invariant — so the fixture isolates the
  * dedup core from clustering luck. */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64

  private def randVec(seed: Int): Array[Double] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(dim)(rnd.nextDouble() * 2 - 1)
  }

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    for (i <- 0 until dim) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
    dot / math.sqrt(na * nb)
  }

  // ids 1-4: scalings of base1 (dup group, canonical 1); ids 10-12:
  // scalings of base2 (dup group, canonical 10); id 20: singleton
  private def fixture: Seq[(Long, Array[Double])] = {
    val b1 = randVec(101); val b2 = randVec(202); val b3 = randVec(303)
    assert(cosine(b1, b2) < 0.5 && cosine(b1, b3) < 0.5 && cosine(b2, b3) < 0.5,
      "fixture sanity: concept bases must be well separated")
    Seq[(Long, Array[Double])](
      (1L, b1), (2L, b1.map(_ * 1.001)), (3L, b1.map(_ * 0.97)), (4L, b1.map(_ * 2.5)),
      (10L, b2), (11L, b2.map(_ * 1.01)), (12L, b2.map(_ * 0.5)),
      (20L, b3))
  }

  private def keepSet(result: org.apache.spark.sql.DataFrame): Set[Long] =
    result.filter(col("keep")).select("vec_id").as[Long].collect().toSet

  test("grid backend drops exactly the planted non-canonical duplicates") {
    val df = fixture.toDF("id", "v")
    val out = SemDedup.dedup(SemDedup.gridCells(df, gridBits = 4), minCos = 0.95)
    assert(out.count() == 8, "one row per input vector")
    assert(keepSet(out) == Set(1L, 10L, 20L),
      "each dup group keeps its minimum id; singletons survive")
  }

  test("kmeans backend agrees with the grid on the planted fixture") {
    val df = fixture.toDF("id", "v")
    val centroids = IvfIndex.train(df.select(col("id"), col("v").as("vec")), k = 3)
    val out = SemDedup.dedup(SemDedup.kmeansCells(df, centroids), minCos = 0.95)
    assert(keepSet(out) == Set(1L, 10L, 20L))
  }

  test("streaming semantic-dedup ingest keeps the corpus dup-free across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-semingest").toString
    val table = s"$dir/corpus"
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Double])]
    val q = graft.streaming.StreamingOps.startSemDedupIngest(
      mem.toDF().toDF("id", "v"), table, s"$dir/ckpt", minCos = 0.95,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    val byId = fixture.map { case (id, v) => id -> v.toSeq }.toMap
    // batch 1: the three concepts — all novel, all accepted
    mem.addData(Seq(1L, 10L, 20L).map(id => (id, byId(id))))
    q.processAllAvailable()
    def corpusIds() = graft.sinks.Snapshots.read(spark, table)
      .select("id").as[Long].collect().toSet
    assert(corpusIds() == Set(1L, 10L, 20L))
    // batch 2: dups of standing concepts + one genuinely new concept —
    // only the new concept enters; within-batch dups (2,3 both ≈ concept 1)
    // are also rejected against the standing copy
    mem.addData((fixture.filterNot(f => Set(1L, 10L, 20L)(f._1))
      :+ (30L, randVec(505))).map { case (id, v) => (id, v.toSeq) })
    q.processAllAvailable()
    q.stop()
    assert(corpusIds() == Set(1L, 10L, 20L, 30L),
      "corpus admits only semantically novel vectors")
    // replay containment: re-committing the last batch's rows with the same
    // (appId, batchId) watermark is a no-op at the table
    val lastBatch = graft.sinks.Snapshots.lastTxn(spark, table, "graft-semdedup-ingest").get
    val before = graft.sinks.Snapshots.versions(spark, table)
    graft.sinks.Snapshots.commitPartitioned(
      graft.sinks.Snapshots.read(spark, table).limit(1)
        .select(col("id"), col("v"), col("cluster_id")),
      table, Seq("cluster_id"), org.apache.spark.sql.SaveMode.Append,
      txn = Some("graft-semdedup-ingest" -> lastBatch))
    assert(graft.sinks.Snapshots.versions(spark, table) == before)
  }

  test("dedupDelta ≡ full dedup on delta rows when the corpus is dup-free") {
    // corpus = the three canonical concept vectors (internally dup-free at
    // the threshold — the steady-state precondition); delta = everything
    // else from the fixture plus a genuinely new concept (id 30)
    val all = fixture :+ (30L, randVec(505))
    val df = all.toDF("id", "v")
    val cells = SemDedup.gridCells(df, gridBits = 4)
    val corpusIds = Set(1L, 10L, 20L)
    val corpus = cells.filter(col("id").isin(corpusIds.toSeq: _*))
    val delta = cells.filter(!col("id").isin(corpusIds.toSeq: _*))
    val incr = SemDedup.dedupDelta(corpus, delta, minCos = 0.95)
    // the incremental verdicts must equal the full dedup's, row for row
    val full = SemDedup.dedup(cells, minCos = 0.95)
      .filter(!col("vec_id").isin(corpusIds.toSeq: _*))
    def rows(r: org.apache.spark.sql.DataFrame) = r
      .select("vec_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(rows(incr) == rows(full),
      "incremental must reproduce the full dedup on a dup-free corpus")
    // direct semantics: corpus-matched deltas dropped, new concept kept
    assert(keepSet(incr) == Set(30L),
      "deltas matching the standing corpus are dropped; novel content survives")
    assert(incr.count() == delta.count(), "one verdict per delta row")
  }

  /** Concentrated fixture for the hot-cell guard: `n` DIVERSE vectors that
    * all land in one 4-bit grid cell. Random vectors are biased toward the
    * all-positive quadrant of planes 0..3 (adding 0.5·Σp_r), then filtered
    * to the largest actual cell — so cell membership is exact by
    * construction while the vectors stay random otherwise, which is what
    * lets SECONDARY planes divide them (a cell of near-copies of one base
    * would agree on most secondary signs too). */
  private def concentrated(n: Int, pool: Int = 900): Seq[(Long, Array[Double])] = {
    val p = Similarity.portablePlanes(4, dim)
    def sig(v: Array[Double]): Int =
      (0 until 4).map { r =>
        if ((0 until dim).map(i => v(i) * p(r)(i)).sum > 0) 1 << r else 0
      }.sum
    // bias kept small (0.3): a heavy bias correlates the fixture with
    // SECONDARY planes too (dot(Σp_r, p_s) ≠ 0), which wastes split rounds
    // on planes every member agrees on — more candidates instead
    val cands = (0 until pool).map { s =>
      val v = randVec(1000 + s)
      (0 until dim).map(i =>
        v(i) + 0.3 * (p(0)(i) + p(1)(i) + p(2)(i) + p(3)(i))).toArray
    }
    val best = cands.groupBy(sig).maxBy(_._2.size)._2
    assert(best.size >= n, s"fixture sanity: largest cell ${best.size} < $n")
    best.take(n).zipWithIndex.map { case (v, i) => (i.toLong, v) }
  }

  private def cellSizes(cells: org.apache.spark.sql.DataFrame): Map[String, Long] =
    cells.groupBy(col("cluster_id").cast("string").as("c"))
      .agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap

  test("splitHotCells bounds every cell and therefore the quadratic pair cost") {
    val df = concentrated(48).toDF("id", "v")
    val cells = SemDedup.gridCells(df, gridBits = 4)
    val before = cellSizes(cells)
    assert(before.size == 1 && before.values.head == 48L,
      "fixture sanity: all 48 vectors start in ONE cell")
    val split = SemDedup.splitHotCells(cells, maxCellSize = 10, maxRounds = 12)
    val after = cellSizes(split)
    assert(split.count() == 48, "splitting must lose no rows")
    assert(after.values.sum == 48L)
    assert(after.values.max <= 10L,
      s"every cell must fit maxCellSize after splitting, got $after")
    // the scale property the guard exists for: pair cost drops from
    // |cell|² to Σ|cell|² ≤ maxCellSize·N
    assert(after.values.map(x => x * x).sum <= 10L * 48,
      "post-split pair cost must be bounded by maxCellSize·N")
    // membership is REFINED, never reshuffled: each split id is a path
    // extension of the original cell id
    val orig = before.keys.head
    assert(after.keys.forall(c => c == orig || c.startsWith(orig + ".")),
      s"split cells must be path-children of the original cell, got ${after.keys}")
  }

  test("splitHotCells is a no-op on cells already within bound") {
    val df = fixture.toDF("id", "v")
    val cells = SemDedup.gridCells(df, gridBits = 4)
    val split = SemDedup.splitHotCells(cells, maxCellSize = 100)
    assert(cellSizes(split) == cellSizes(cells),
      "no cell over the bound → identical cell assignment (modulo string cast)")
  }

  test("dedupBounded still drops co-located duplicates after splitting") {
    // positive scalings share EVERY hyperplane sign (scale-invariance), so
    // planted dup pairs co-locate through any number of split rounds —
    // splitting bounds cost without touching these pairs' candidacy
    val base = concentrated(24)
    val dups = base.take(4).map { case (id, v) => (id + 1000L, v.map(_ * 1.01)) }
    val df = (base ++ dups).toDF("id", "v")
    val out = SemDedup.dedupBounded(
      SemDedup.gridCells(df, gridBits = 4), minCos = 0.95, maxCellSize = 8)
    assert(out.count() == 28, "one row per input vector")
    assert(keepSet(out) == base.map(_._1).toSet,
      "each planted dup group keeps its minimum id; all originals survive")
  }

  test("an irreducible hot cell survives all rounds and warns loudly") {
    // bit-identical vectors: no hyperplane can ever separate them
    val v = randVec(777)
    val df = (0 until 12).map(i => (i.toLong, v)).toDF("id", "v")
    val cells = SemDedup.gridCells(df, gridBits = 4)
    val errBuf = new java.io.ByteArrayOutputStream()
    val realErr = System.err
    val split =
      try {
        System.setErr(new java.io.PrintStream(errBuf, true))
        val s = SemDedup.splitHotCells(cells, maxCellSize = 8, maxRounds = 3)
        s.count() // force the residual check before restoring stderr
        s
      } finally System.setErr(realErr)
    assert(cellSizes(split).values.toSeq == Seq(12L),
      "identical vectors stay one cell — splitting must not scatter them")
    assert(errBuf.toString.contains("[semdedup]") &&
        errBuf.toString.contains("maxCellSize=8"),
      s"irreducible hot cell must warn loudly, got: '${errBuf.toString}'")
  }

  test("joint refinement bounds delta-corpus candidate edges as the corpus grows") {
    // One hot raw cell. Raw dedupDelta pairs every delta row with EVERY
    // corpus co-member — |delta|·|corpus_c|, growing with the corpus.
    // refineTogether splits the cell until ≤ maxCellSize members, so each
    // delta row sees at most maxCellSize - 1 corpus co-members no matter
    // how big the corpus cell gets: the per-batch edge bound the streaming
    // ingest inherits.
    val all = concentrated(104, pool = 4000)
    val delta = all.take(8)
    def corpusSlice(n: Int) = all.slice(8, 8 + n)
    val maxCell = 12L
    def edges(corpusN: Int, refine: Boolean): Long = {
      val cCells = SemDedup.gridCells(corpusSlice(corpusN).toDF("id", "v"), gridBits = 4)
      val dCells = SemDedup.gridCells(delta.toDF("id", "v"), gridBits = 4)
      val (c, d) =
        if (refine) SemDedup.refineTogether(cCells, dCells, maxCell, maxRounds = 24)
        else (cCells, dCells)
      d.select(col("cluster_id").cast("string").as("cluster_id"), col("id").as("id_a"))
        .join(c.select(col("cluster_id").cast("string").as("cluster_id"),
          col("id").as("id_b")), "cluster_id")
        .count()
    }
    assert(edges(48, refine = false) == 8L * 48 && edges(96, refine = false) == 8L * 96,
      "fixture sanity: unrefined edges grow linearly with the corpus (one hot cell)")
    val bound = 8L * (maxCell - 1) // each delta row: ≤ maxCell-1 co-members
    val (e48, e96) = (edges(48, refine = true), edges(96, refine = true))
    assert(e48 <= bound && e96 <= bound,
      s"refined edges must stay under |delta|·(maxCellSize-1)=$bound " +
        s"independent of corpus size, got $e48 (corpus 48) / $e96 (corpus 96)")
  }

  test("streaming ingest drops a corpus-matching delta whose id is SMALLER (corpus bias)") {
    // Under the plain min-id keep rule this delta (id 5 < corpus id 100)
    // would become the component minimum and be ACCEPTED, planting a
    // semantic dup pair in the corpus. The ingest's corpus-side id bias
    // makes the standing copy win for any id order.
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-semingest-bias").toString
    val table = s"$dir/corpus"
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Double])]
    val q = graft.streaming.StreamingOps.startSemDedupIngest(
      mem.toDF().toDF("id", "v"), table, s"$dir/ckpt", minCos = 0.95,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    val b = randVec(606)
    mem.addData(Seq((100L, b.toSeq)))
    q.processAllAvailable()
    mem.addData(Seq((5L, b.map(_ * 1.01).toSeq))) // semantic dup, smaller id
    q.processAllAvailable()
    q.stop()
    val ids = graft.sinks.Snapshots.read(spark, table)
      .select("id").as[Long].collect().toSet
    assert(ids == Set(100L),
      s"the standing corpus copy must win regardless of id order, got $ids")
  }

  test("non-overlapping batch ingests against an empty corpus side; corrupted table fails") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-semingest-probe").toString
    val table = s"$dir/corpus"
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Double])]
    val q = graft.streaming.StreamingOps.startSemDedupIngest(
      mem.toDF().toDF("id", "v"), table, s"$dir/ckpt", minCos = 0.95,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    val b = randVec(707)
    mem.addData(Seq((1L, b.toSeq)))
    q.processAllAvailable()
    // -b flips every hyperplane sign → a cell disjoint from the corpus's:
    // exercises the explicit overlap probe's "no matching partition" leg
    mem.addData(Seq((2L, b.map(-_).toSeq)))
    q.processAllAvailable()
    assert(graft.sinks.Snapshots.read(spark, table)
      .select("id").as[Long].collect().toSet == Set(1L, 2L),
      "a batch overlapping no corpus partition must still ingest")
    // corrupt every manifest: the next overlapping batch must FAIL, not
    // silently compare against an empty corpus and admit duplicates
    new java.io.File(s"$table/_manifests").listFiles()
      .foreach(f => java.nio.file.Files.write(f.toPath, "not json{".getBytes))
    mem.addData(Seq((3L, b.toSeq)))
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    assert(ex.getMessage != null)
    q.stop()
  }

  test("cell-boundary near-dups survive — the family's documented recall trade") {
    // Construct two near-identical vectors on OPPOSITE sides of grid plane 0:
    // v = b - ((d0-1)/64)·p0 has p0·v = +1, w = b - ((d0+1)/64)·p0 has
    // p0·w = -1 (p0·p0 = 64 since entries are ±1). The shift is 2/64 of a
    // unit ±1 vector against ||b|| ~ √(64/3), so cos(v, w) stays ≥ 0.99.
    val p = Similarity.portablePlanes(4, dim)
    val b = randVec(404)
    def dot(x: Array[Double], y: Array[Double]) = (0 until dim).map(i => x(i) * y(i)).sum
    val d0 = dot(b, p(0))
    val v = (0 until dim).map(i => b(i) - (d0 - 1) / 64.0 * p(0)(i)).toArray
    val w = (0 until dim).map(i => b(i) - (d0 + 1) / 64.0 * p(0)(i)).toArray
    assert(dot(v, p(0)) > 0 && dot(w, p(0)) < 0, "fixture sanity: plane-0 signs differ")
    for (r <- 1 until 4)
      assert(dot(v, p(r)) * dot(w, p(r)) > 0,
        s"fixture sanity: plane-$r sign must not flip (|p·b| too small — reseed)")
    assert(cosine(v, w) > 0.99, "fixture sanity: the straddling pair is a true near-dup")
    val df = Seq((1L, v), (2L, w)).toDF("id", "v")
    val out = SemDedup.dedup(SemDedup.gridCells(df, gridBits = 4), minCos = 0.95)
    assert(keepSet(out) == Set(1L, 2L),
      "straddling near-dups are not candidates — inherent recall/cost trade")
  }
}
