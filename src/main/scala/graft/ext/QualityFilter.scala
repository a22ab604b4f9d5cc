package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the discriminative sibling of the
  * heuristic gate ([[TextAnalysis.qualityScore]]), the LM-perplexity filter
  * ([[NgramLm]]) and DSIR importance weights: a multinomial Naive Bayes
  * classifier over hashed unigram buckets, trained on a seed-labeled slice
  * and applied corpus-wide (the fastText-style quality filter every modern
  * pretraining pipeline runs; cf. the reference's validation gating in
  * glue/bronze_to_silver_openweather.py:64-83, which keeps or drops rows by
  * a fixed rule — this is the learned version of that gate).
  *
  * Scale shape: training is ONE conditional partial aggregate over the
  * token stream of the seed slice (64-row result), scoring is a map-side
  * join of the token stream against the BROADCAST 64-row weight table
  * followed by one keyed partial aggregate per document — no shuffle ever
  * carries more than (doc_id, partial sum), and nothing is quadratic.
  * Hashed buckets keep the model size FIXED (64 rows) no matter how large
  * the training vocabulary grows, which is what makes the weight broadcast
  * valid at any corpus size.
  *
  * Determinism: md5-derived buckets, integer counts, and add-one-smoothed
  * log ratios of integer totals — the only float surface is the per-doc sum
  * of ≤ n_tokens bucket weights, pinned by round(·, 6) at the consumer.
  */
object QualityFilter {

  /** Fixed hashed-feature space. 64 keeps the oracle mirror exact and the
    * broadcast trivially small; a production vocabulary would raise this
    * (2^18 is typical for fastText) without changing any plan shape. */
  val NumBuckets = 64

  /** Bucket of one token: first two md5 nibbles mod [[NumBuckets]] —
    * identical to the DSIR bucketing so the two scorers share feature
    * space (and the oracle's strpos-nibble mirror). */
  def bucketOf(w: Column): Column =
    pmod(conv(substring(md5(w), 1, 2), 16, 10).cast("int"), lit(NumBuckets))

  /** Train the model from the `trainCol` slice: one conditional partial
    * aggregate → per-bucket class counts, padded to the full bucket domain
    * (unseen-in-train buckets still get their principled smoothed weight,
    * not a silent drop), reduced to add-one-smoothed log-likelihood-ratio
    * weights. Returns the SERIALIZABLE model frame: (b, lw) for buckets
    * 0..[[NumBuckets]]−1 plus the class-prior row at b = −1 — 65 rows total,
    * persistable as a snapshot table for hot-swappable serving
    * ([[graft.streaming.StreamingOps.startQualityIngest]]). */
  def model(
      docs: DataFrame,
      toksCol: String,
      labelCol: String,
      trainCol: String): DataFrame = {
    val spark = docs.sparkSession
    val tok = docs.filter(col(trainCol))
      .select(col(labelCol).as("label"), explode(col(toksCol)).as("w"))
      .withColumn("b", bucketOf(col("w")))
      .drop("w")
    val cnt = tok.groupBy(col("b"))
      .agg(sum(when(col("label"), 1L).otherwise(0L)).as("cp"),
        sum(when(!col("label"), 1L).otherwise(0L)).as("cn"))
    val full = spark.range(NumBuckets).select(col("id").cast("int").as("b"))
      .join(cnt, Seq("b"), "left")
      .select(col("b"), coalesce(col("cp"), lit(0L)).as("cp"),
        coalesce(col("cn"), lit(0L)).as("cn"))
    val tots = full.agg(sum(col("cp")).as("tp_"), sum(col("cn")).as("tn_"))
    val wt = full.crossJoin(broadcast(tots))
      .select(col("b"),
        (log((col("cp") + 1.0) / (col("tp_") + NumBuckets.toDouble)) -
          log((col("cn") + 1.0) / (col("tn_") + NumBuckets.toDouble))).as("lw"))
    val prior = docs.filter(col(trainCol))
      .agg(sum(when(col(labelCol), 1L).otherwise(0L)).as("np"),
        sum(when(!col(labelCol), 1L).otherwise(0L)).as("nn"))
      .select(lit(-1).as("b"),
        log((col("np") + 1.0) / (col("nn") + 1.0)).as("lw"))
    wt.unionByName(prior)
  }

  /** Score every row of `docs` with a trained [[model]] frame: returns
    * (idCol, score), score = prior + Σ_tokens lw_b. Zero-token documents
    * score exactly the class prior. The 65-row model broadcasts, token
    * scoring is map-side, and the only shuffle carries (id, partial sum). */
  def scoreWith(
      docs: DataFrame,
      idCol: String,
      toksCol: String,
      model: DataFrame): DataFrame = {
    val wt = model.filter(col("b") >= 0)
    val prior = model.filter(col("b") === -1).select(col("lw").as("prior"))
    val sums = docs.select(col(idCol), explode(col(toksCol)).as("w"))
      .withColumn("b", bucketOf(col("w")))
      .join(broadcast(wt), Seq("b"))
      .groupBy(col(idCol))
      .agg(sum(col("lw")).as("sw"))
    docs.select(col(idCol))
      .join(sums, Seq(idCol), "left")
      .crossJoin(broadcast(prior))
      .select(col(idCol), (col("prior") + coalesce(col("sw"), lit(0.0))).as("score"))
  }

  /** Train on the `trainCol` slice of `docs` and score EVERY row: returns
    * (idCol, score) where score = ln((nPos+1)/(nNeg+1)) + Σ_tokens lw_b,
    * lw_b the add-one-smoothed class log-likelihood ratio of the token's
    * bucket. Zero-token documents score exactly the class prior.
    *
    * `docs` must carry `idCol`, a tokenized array column `toksCol`, a
    * boolean `labelCol` (the seed label) and a boolean `trainCol`.
    */
  def scores(
      docs: DataFrame,
      idCol: String,
      toksCol: String,
      labelCol: String,
      trainCol: String): DataFrame =
    scoreWith(docs, idCol, toksCol, model(docs, toksCol, labelCol, trainCol))
}
