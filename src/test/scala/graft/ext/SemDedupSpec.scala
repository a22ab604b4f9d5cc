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
