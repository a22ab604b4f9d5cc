package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Set-similarity self-join with PREFIX FILTERING (the PPJoin family): all
  * document pairs whose token-set Jaccard ≥ `threshold`, without comparing
  * all pairs.
  *
  * Why not brute force: exact all-pairs is |D|²/2 comparisons — 5·10¹³ at
  * 10M docs. Why not only LSH: MinHash banding is probabilistic (misses
  * near-threshold pairs). Prefix filtering is EXACT: order each doc's
  * tokens by ascending global frequency; if J(a,b) ≥ t, then a and b must
  * share at least one token within their first |x| − ⌈t·|x|⌉ + 1 tokens
  * (else the overlap is too small to reach t even if everything after the
  * prefixes matched). So candidates = pairs sharing ≥ 1 PREFIX token, and
  * rare-first ordering makes prefixes meet on RARE tokens — tiny candidate
  * lists where an unordered inverted index would put every doc pair sharing
  * "the" into one bucket.
  *
  * Scale shape: token-frequency count (one corpus shuffle), per-doc ranking
  * window (hash-partitioned by doc id), candidate equi-join on prefix
  * tokens CARRYING IDS ONLY (same discipline as [[MinHash.candidatePairs]]),
  * distinct, then one verification join that fetches each doc's token array
  * once per surviving pair. Frequency-ascending order bounds join fan-in:
  * the hottest tokens sit at the END of every prefix, so most prefix
  * entries are rare tokens with short postings lists.
  */
object SetSimJoin {

  /** Shared rounding slack for every threshold·size product in this file:
    * t·sz computed in doubles can land one ulp past its exact rational value
    * (t = 9/11, sz = 77 → 63.0000…01), which would shorten a ceil'd prefix
    * below the completeness bound or reject an exactly-at-threshold pair in
    * the size filter. One constant keeps the self-join and delta forms in
    * lockstep — the at-threshold specs pin both. */
  private val CeilSlack = 1e-9

  /** (doc_a, doc_b, jaccard) for all pairs with Jaccard ≥ `threshold`;
    * doc_a < doc_b. Exact — spec-pinned against the brute-force join.
    *
    * Token sets are SORTED at creation (one O(n log n) per doc) so the
    * per-pair verification is [[graft.functions.SortedOverlapCount]]'s
    * single merge pass instead of `array_intersect`'s per-row hash set —
    * pairs vastly outnumber docs, so sorting at the source is the cheap
    * side of that trade (guide §1.2: per-task work after the algorithm).
    * Sorting is unobservable in the result: Jaccard uses only set sizes,
    * and the prefix rank orders by (corpus frequency, token), not by
    * array position. */
  def join(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1, "threshold must be in (0, 1]")
    val toks = docs.select(
        col(idCol).as("sid"),
        sort_array(array_distinct(TextAnalysis.tokens(col(textCol)))).as("toks"))
      .filter(size(col("toks")) > 0)
    val tokCounts = toks.select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("tf"))
    // rank each doc's tokens rarest-first (ties by token string — any fixed
    // total order preserves the prefix-filter guarantee) and keep the
    // prefix; CeilSlack keeps ⌈t·sz⌉ at its exact rational value
    val prefix = toks
      .select(col("sid"), size(col("toks")).as("sz"), explode(col("toks")).as("tok"))
      .join(tokCounts, "tok")
      .withColumn("rn", row_number().over(
        Window.partitionBy("sid").orderBy(col("tf"), col("tok"))))
      .filter(col("rn") <= col("sz") - ceil(lit(threshold) * col("sz") - lit(CeilSlack)) + 1)
      .select("sid", "sz", "tok")
    // LENGTH FILTER (exact, PPJoin-standard): J(a,b) ≥ t forces
    // t·max(|a|,|b|) ≤ inter ≤ min(|a|,|b|) — prune size-mismatched
    // candidates BEFORE the distinct and the payload join, where they are
    // two small ints instead of two token arrays; CeilSlack absorbs double
    // rounding in t·max so an exactly-at-threshold pair (e.g. sizes 8 and
    // 10 at t = 0.8) can never be dropped.
    val cand = prefix.toDF("a", "sz_a", "tok")
      .join(prefix.toDF("b", "sz_b", "tok"), Seq("tok"))
      .filter(col("a") < col("b") &&
        least(col("sz_a"), col("sz_b")) >=
          lit(threshold) * greatest(col("sz_a"), col("sz_b")) - lit(CeilSlack))
      .select("a", "b")
      .distinct()
    cand
      .join(toks.toDF("a", "toks_a"), "a")
      .join(toks.toDF("b", "toks_b"), "b")
      .withColumn("inter",
        graft.functions.SortedOverlapCount.sorted_overlap_count(
          col("toks_a"), col("toks_b")))
      .withColumn("uni", size(col("toks_a")) + size(col("toks_b")) - col("inter"))
      .filter(col("inter") > 0 && col("inter") / col("uni") >= threshold)
      .select(col("a").as("doc_a"), col("b").as("doc_b"),
        (col("inter") / col("uni")).as("jaccard"))
  }

  /** DELTA-vs-CORPUS form (R-S PPJoin): all (delta doc, corpus doc) pairs
    * with Jaccard ≥ `threshold` — the daily-ingest dedup shape, where a
    * small delta is checked against the standing corpus WITHOUT re-running
    * the corpus self-join. Token rarity comes from CORPUS statistics alone
    * (the stable side; at 100 TB that aggregate is computed once per
    * maintenance cycle and reused across deltas). Delta tokens absent from
    * the corpus coalesce to frequency 0 = rarest: both sides still rank
    * under one total (frequency, token) order, so the prefix-filter
    * guarantee holds for cross pairs; corpus-absent tokens can never match
    * a corpus token anyway, so ranking them first only shrinks the
    * candidate set. Output: (delta_id, corpus_id, jaccard). Exact —
    * spec-pinned against the brute-force cross join. */
  def joinDelta(
      corpus: DataFrame,
      delta: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1, "threshold must be in (0, 1]")
    // sorted at creation for the merge-pass verify — see [[join]]
    def toks(df: DataFrame) = df.select(
        col(idCol).as("sid"),
        sort_array(array_distinct(TextAnalysis.tokens(col(textCol)))).as("toks"))
      .filter(size(col("toks")) > 0)
    val ctoks = toks(corpus)
    val dtoks = toks(delta)
    val tokCounts = ctoks.select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("tf"))
    def prefix(t: DataFrame) = t
      .select(col("sid"), size(col("toks")).as("sz"), explode(col("toks")).as("tok"))
      .join(tokCounts, Seq("tok"), "left")
      .withColumn("tf", coalesce(col("tf"), lit(0L)))
      .withColumn("rn", row_number().over(
        Window.partitionBy("sid").orderBy(col("tf"), col("tok"))))
      .filter(col("rn") <= col("sz") - ceil(lit(threshold) * col("sz") - lit(CeilSlack)) + 1)
      .select("sid", "sz", "tok")
    val cand = prefix(dtoks).toDF("a", "sz_a", "tok")
      .join(prefix(ctoks).toDF("b", "sz_b", "tok"), Seq("tok"))
      .filter(least(col("sz_a"), col("sz_b")) >=
        lit(threshold) * greatest(col("sz_a"), col("sz_b")) - lit(CeilSlack))
      .select("a", "b")
      .distinct()
    cand
      .join(dtoks.toDF("a", "toks_a"), "a")
      .join(ctoks.toDF("b", "toks_b"), "b")
      .withColumn("inter",
        graft.functions.SortedOverlapCount.sorted_overlap_count(
          col("toks_a"), col("toks_b")))
      .withColumn("uni", size(col("toks_a")) + size(col("toks_b")) - col("inter"))
      .filter(col("inter") > 0 && col("inter") / col("uni") >= threshold)
      .select(col("a").as("delta_id"), col("b").as("corpus_id"),
        (col("inter") / col("uni")).as("jaccard"))
  }
}
