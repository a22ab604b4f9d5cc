package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search over an `array<float>` column.
  *
  * Two paths:
  *  - brute-force cosine top-k — the exact baseline. Queries are broadcast,
  *    candidates stream; per-query top-k via window. Cost O(|Q|·|C|), which
  *    is the right baseline shape when |Q| is small and |C| is a full scan;
  *  - random-hyperplane LSH buckets — the scale path. Each vector gets a
  *    b-bit signature (sign of dot with b deterministic hyperplanes);
  *    near-duplicate candidates are generated per signature band with a
  *    shuffle equi-join, never an all-pairs product.
  *
  * All vector math is `zip_with`/`aggregate` over double-cast arrays —
  * built-in higher-order functions, no UDF in the hot path.
  */
object Similarity {

  /** Cast to array<double> — keeps the arithmetic in double on both engine
    * and oracle sides. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Brute-force exact top-k neighbors for each query vector.
    * Output: (query_id, neighbor_id, cos, rank), rank 1..k per query.
    * Ties broken by neighbor id for determinism. */
  def bruteForceTopK(
      queries: DataFrame, // (id, vec)
      candidates: DataFrame, // (id, vec)
      k: Int,
      roundTo: Int = 6): DataFrame = {
    val q = queries.select(col("id").as("query_id"), asDouble(col("vec")).as("qv"))
    val c = candidates.select(col("id").as("neighbor_id"), asDouble(col("vec")).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("cv")), roundTo).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplane component for (plane i, dim j):
    * a cheap integer hash folded to [-1, 1). No RNG state, identical on every
    * executor, reproducible across runs. */
  private def planeComponent(i: Int, j: Column): Column = {
    val h = pmod(xxhash64(lit(i), j), lit(1000000L)).cast("double")
    h / lit(500000.0) - lit(1.0)
  }

  /** b-bit random-hyperplane signature of a vector column. */
  def rhpSignature(vec: Column, bits: Int): Column = {
    val v = asDouble(vec)
    transform(sequence(lit(0), lit(bits - 1)), i =>
      when(
        aggregate(
          zip_with(v, sequence(lit(0), size(v) - 1),
            (x, j) => x * planeComponentExpr(i, j)),
          lit(0.0), (acc, x) => acc + x) >= 0, 1).otherwise(0))
  }

  // helper usable inside transform lambdas (Column i, Column j)
  private def planeComponentExpr(i: Column, j: Column): Column = {
    val h = pmod(xxhash64(i, j), lit(1000000L)).cast("double")
    h / lit(500000.0) - lit(1.0)
  }

  /** LSH candidate pairs: vectors sharing at least one of `bands` signature
    * bands (each `bits/bands` bits), verified with exact cosine ≥ minCos.
    * Output: (id_a, id_b, cos). */
  def lshNearDupPairs(
      vectors: DataFrame, // (id, vec)
      minCos: Double,
      bits: Int = 16,
      bands: Int = 4,
      roundTo: Int = 6): DataFrame = {
    require(bits % bands == 0)
    val rows = bits / bands
    val sigs = vectors.select(
        col("id"), asDouble(col("vec")).as("v"),
        rhpSignature(col("vec"), bits).as("sig"))
      .withColumn("bandh",
        transform(sequence(lit(0), lit(bands - 1)), j =>
          xxhash64(j, slice(col("sig"), j * rows + 1, lit(rows)))))
    val exploded = sigs.select(col("id"), col("v"),
      posexplode(col("bandh")).as(Seq("band_idx", "band_hash")))
    val a = exploded.toDF("id_a", "v_a", "band_idx", "band_hash")
    val b = exploded.toDF("id_b", "v_b", "band_idx", "band_hash")
    a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("v_a"), col("v_b")), roundTo).as("cos"))
      .groupBy("id_a", "id_b")
      .agg(max("cos").as("cos"))
      .filter(col("cos") >= minCos)
  }
}
