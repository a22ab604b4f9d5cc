package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection:
  * shingle → k-permutation minhash signature → banded bucket join.
  *
  * Scale design:
  *  - the signature is computed per-row with higher-order array functions
  *    (`transform` + `array_min`) — NO explode, NO shuffle, one codegen'd
  *    projection regardless of k;
  *  - k hash permutations are simulated as `xxhash64(i, shingle)` (seeded by
  *    the permutation index), so no coefficient tables ship to executors;
  *  - candidate generation explodes only b band hashes per doc (not k, not
  *    the shingles) and self-joins on (band, hash) — the standard LSH join.
  *    At 100 TB the join key space is uniform 64-bit hashes, so the shuffle
  *    is balanced; skew can only come from true near-dup clusters, which is
  *    inherent to the problem (AQE skew-join handles pathological buckets).
  */
object MinHash {

  /** Word n-gram shingles (distinct) of the lowercased text. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = TextAnalysis.tokens(text)
    val grams = transform(
      sequence(lit(1), greatest(size(toks) - (n - 1), lit(0))),
      i => concat_ws(" ", slice(toks, i, lit(n))))
    array_distinct(when(size(toks) >= n, grams)
      .otherwise(when(size(toks) > 0, array(concat_ws(" ", toks)))
        .otherwise(array().cast("array<string>"))))
  }

  /** k-wide minhash signature (array<long>); null-safe: empty shingle set →
    * signature of Long.MaxValue sentinels. */
  def signature(shinglesCol: Column, k: Int = 64): Column =
    transform(sequence(lit(0), lit(k - 1)), i =>
      coalesce(
        array_min(transform(shinglesCol, s => xxhash64(i, s))),
        lit(Long.MaxValue)))

  /** Estimated Jaccard = fraction of agreeing signature positions. */
  def estJaccard(sigA: Column, sigB: Column, k: Int = 64): Column =
    size(filter(zip_with(sigA, sigB, (x, y) => x === y), b => b))
      .cast("double") / lit(k.toDouble)

  /** Banded LSH bucket keys: b hashes, each over r consecutive signature
    * positions (k = b*r). */
  def bandHashes(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), j =>
      xxhash64(j, slice(sig, j * rows + 1, lit(rows))))

  /** End-to-end candidate pairs: docs sharing ≥1 LSH band, with their
    * estimated Jaccard. `df` must have an `idCol` and a text column.
    * Returns (id_a, id_b, est_jaccard), id_a < id_b, distinct. */
  def candidatePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 64,
      bands: Int = 16,
      shingleN: Int = 3): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val rows = k / bands
    val withSig = df.select(
        col(idCol).as("doc"),
        signature(shingles(col(textCol), shingleN), k).as("sig"))
      .withColumn("bands", bandHashes(col("sig"), bands, rows))
    // cache would help twice-read here; the plan below reuses the exchange.
    val exploded = withSig.select(
      col("doc"), col("sig"),
      posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
    val a = exploded.toDF("doc_a", "sig_a", "band_idx", "band_hash")
    val b = exploded.toDF("doc_b", "sig_b", "band_idx", "band_hash")
    a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        estJaccard(col("sig_a"), col("sig_b"), k).as("est_jaccard"))
      .groupBy("doc_a", "doc_b")
      .agg(max("est_jaccard").as("est_jaccard"))
  }
}
