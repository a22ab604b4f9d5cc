package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join (Ed-Join shape): all pairs of strings
  * within Levenshtein distance ≤ maxDist, WITHOUT the all-pairs product.
  *
  * Filter chain, every step relational:
  *
  *  1. q-gram PREFIX filter: strings are decomposed into positional q-grams;
  *     each string keeps only its `maxDist·q + 1` rarest grams under a
  *     single global (frequency, gram) order. One edit operation destroys at
  *     most q grams, so two strings within maxDist share at least one of
  *     their rarest-(maxDist·q+1) grams (pigeonhole) — the candidate join
  *     runs on prefix grams only, which kills the "every document contains
  *     'the'" candidate explosion that a plain shared-gram join suffers.
  *  2. length filter: |len(a) − len(b)| ≤ maxDist rides the candidate join.
  *  3. exact verify: Spark's codegen'd `levenshtein` on the deduped
  *     candidate pairs.
  *
  * At 100 TB: gram frequencies are one aggregate over the corpus (partial
  * aggregation reduces per-key BEFORE the exchange, so a hot gram like
  * "the" never concentrates its posting list in one task; re-usable as a
  * broadcast/bucketed table), the prefix join shuffles ids+grams only,
  * and the verify touches candidate pairs — linear-ish for realistic
  * near-dup densities. Same candidates-then-verify discipline as
  * [[SetSimJoin]] / [[MinHash]].
  *
  * COMPLETENESS: the q-gram pigeonhole guarantee (one edit destroys ≤ q
  * grams, so strings within maxDist share a rarest-prefix gram) needs both
  * strings to carry > maxDist·q grams, i.e. length ≥ (maxDist+1)·q. Pairs
  * where either side is shorter go through a SECOND, direct pass: every
  * string shorter than (maxDist+1)·q + maxDist (a short string's partner
  * can exceed it by at most maxDist chars) is length-bucketed with bucket
  * width maxDist+1; each string lands in its own bucket and probes every
  * bucket overlapping [len−maxDist, len+maxDist] (≤ 3 buckets), so every
  * |Δlen| ≤ maxDist pair meets without a cross join. Candidates from both
  * passes are unioned, deduped, and levenshtein-verified together, making
  * the operator exact for ALL string lengths.
  */
object EditJoin {

  def join(
      df: DataFrame,
      idCol: String,
      strCol: String,
      maxDist: Int,
      q: Int = 3): DataFrame = {
    require(maxDist >= 0 && q >= 1)
    val prefixLen = maxDist * q + 1

    val base = df.select(col(idCol).as("id"), col(strCol).as("s"))
      .filter(col("s").isNotNull)
    // q-grams; strings shorter than q contribute themselves as a single
    // gram so short strings still generate candidates. Dedup happens
    // INSIDE the row with array_distinct before the explode — a map-side
    // projection instead of a corpus-wide (id, gram) shuffle.
    val grams = base.select(col("id"),
        explode(array_distinct(when(length(col("s")) < q, array(col("s")))
          .otherwise(expr(s"transform(sequence(1, length(s) - ${q - 1}), i -> substring(s, i, $q))"))))
          .as("gram"))

    // one global rarity order: gram frequency asc, gram asc (total order so
    // both sides of a pair rank identically). Frequency via aggregate +
    // rejoin, NOT count-over-window: partial aggregation collapses each
    // gram's count map-side, so a stop-word-frequency gram costs one long
    // per partition instead of materializing its whole posting list in a
    // single window partition; the rejoin on gram is AQE-skew-splittable.
    val gramFreq = grams.groupBy("gram").agg(count(lit(1)).as("df"))
    val ranked = grams.join(gramFreq, "gram")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df"), col("gram"))))
      .filter(col("rn") <= prefixLen)
      .select(col("id"), col("gram"))

    val gramCand = ranked.toDF("id_a", "gram")
      .join(ranked.toDF("id_b", "gram"), "gram")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")

    // Direct pass for strings below the pigeonhole bound: bucket width
    // maxDist+1; own-bucket ⋈ probed-buckets covers every |Δlen| ≤ maxDist
    // pair among strings short enough to pair with a sub-bound string.
    val shortMax = (maxDist + 1) * q + maxDist
    val shorts = base.filter(length(col("s")) < shortMax)
      .select(col("id"), length(col("s")).as("len"))
    val w = maxDist + 1
    val ownBucket = shorts.select(col("id").as("id_a"),
      floor(col("len") / w).as("bk"))
    val probed = shorts.select(col("id").as("id_b"),
      explode(sequence(
        floor((col("len") - maxDist) / w),
        floor((col("len") + maxDist) / w))).as("bk"))
    val shortCand = ownBucket.join(probed, "bk")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")

    val cand = gramCand.union(shortCand).distinct()

    // thresholded levenshtein: banded O(maxDist·n) with early termination
    // (returns -1 past the bound) instead of the full O(n·m) matrix — the
    // verify is the arithmetic hot spot, so the band is a ~len/maxDist×
    // saving per candidate pair
    cand
      .join(base.toDF("id_a", "s_a"), "id_a")
      .join(base.toDF("id_b", "s_b"), "id_b")
      .filter(abs(length(col("s_a")) - length(col("s_b"))) <= maxDist)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("s_a"), col("s_b"), maxDist).as("dist"))
      .filter(col("dist") >= 0)
  }
}
