package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus bigram language model + perplexity-style quality scoring — the
  * CCNet-shape filter every large-scale training-data pipeline runs: score
  * each document by how probable its token stream is under a language model
  * trained on the corpus itself, then drop the high-perplexity tail
  * (boilerplate, gibberish, non-linguistic text).
  *
  * Model: add-α (Laplace) smoothed bigram LM.
  *   P(w2|w1) = (c(w1,w2) + α) / (c(w1) + α·V)
  * where c(w1) = Σ_w2 c(w1,w2) (so the conditional sums to 1 over the
  * smoothed vocabulary) and V = corpus vocabulary size.
  *
  * Scale shape (the full job is three shuffles, all on balanced-or-AQE keys):
  *  1. bigram extraction is a per-row JVM pass (UDF sliding window — the
  *     higher-order-function form re-evaluates the tokenizer per element in
  *     interpreted mode, see [[MinHash.signatureFromText]]) + one explode —
  *     narrow;
  *  2. `groupBy(w1, w2)` count — the one corpus-sized shuffle (inherent:
  *     it IS the model training);
  *  3. scoring joins are on word keys. Word frequencies are Zipfian, so
  *     c(w1) lookups skew toward stopwords — AQE skew-join splits those
  *     reducers; the unigram table itself is vocabulary-sized and usually
  *     broadcastable outright.
  *
  * Reference anchor: the reference's quality gates are range checks on
  * weather fields (`lambda/ingest_weather/handler.py:92-100`); this is the
  * text-corpus analog the task brief mandates for the extension surface.
  */
object NgramLm {

  /** (w1, w2) bigram pairs of the whitespace-lowercased token stream, as
    * one JVM pass per row. Empty/1-token/null docs yield no rows. */
  private val bigramsUdf = udf((t: String) =>
    if (t == null) Array.empty[(String, String)]
    else {
      val toks = t.trim.toLowerCase(java.util.Locale.ROOT)
        .split("\\s+").filter(_.nonEmpty)
      if (toks.length < 2) Array.empty[(String, String)]
      else Array.tabulate(toks.length - 1)(i => (toks(i), toks(i + 1)))
    })

  /** Exploded (idCol, w1, w2) bigram stream of a document table. */
  def docBigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), explode(bigramsUdf(col(textCol))).as("bg"))
      .select(col(idCol), col("bg._1").as("w1"), col("bg._2").as("w2"))

  /** Train on `docs`, score every doc: (idCol, n_bigrams, avg_logp) where
    * avg_logp = mean over the doc's bigrams of ln P(w2|w1). Perplexity is
    * exp(-avg_logp); avg_logp is returned directly because it round-trips
    * through a fixed-decimal oracle compare more stably. Docs with fewer
    * than two tokens produce no row (no bigram evidence to score). */
  def score(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      alpha: Double = 1.0): DataFrame = {
    val bg = docBigrams(docs, idCol, textCol)
    val bgc = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val ugc = bgc.groupBy("w1").agg(sum("c2").as("c1"))
    // V: corpus vocabulary — count over the token stream, not the bigram
    // table, so 1-token docs still contribute vocabulary
    val vocab = docs.select(explode(
        filter(split(lower(trim(col(textCol))), "\\s+"), w => length(w) > 0)
      ).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    bg
      .join(bgc, Seq("w1", "w2"))
      .join(ugc, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col(idCol),
        log((col("c2") + alpha) / (col("c1") + col("v") * alpha)).as("logp"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), avg("logp").as("avg_logp"))
  }
}
