package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over a `documents`
  * table: tokenization, language ID (stopword-hit heuristic), quality
  * scoring, document fingerprinting.
  *
  * Everything here is a per-row projection built from `functions._`
  * higher-order array functions — fully codegen'd, zero shuffles, so the
  * operators scale linearly with input splits on any cluster size.
  */
object TextAnalysis {

  /** Whitespace tokens of the lowercased text; empty/blank text → []. */
  def tokens(text: Column): Column =
    when(trim(text) === "", array().cast("array<string>"))
      .otherwise(split(lower(trim(text)), "\\s+"))

  /** Token count (whitespace tokenization). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword proxy count: alphanumeric runs + individual punctuation
    * marks each count as one token (regex tokenizer, the cheap stand-in for a
    * real BPE vocab; same regex runs verbatim in the DuckDB oracle). */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Minimal per-language stopword lists for the langId heuristic. Small on
    * purpose: they ship inside the generated code as array literals. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "los", "por"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我", "他", "这"))

  /** Number of distinct stopword hits for one language. */
  def stopwordHits(toks: Column, lang: String): Column =
    size(array_intersect(toks, array(stopwords(lang).map(lit): _*)))

  /** Language-ID heuristic: argmax of stopword hits with fixed precedence
    * en > es > de > fr > zh; no hits at all → 'und'. Deterministic by
    * construction (same CASE order on the oracle side).
    *
    * Implemented as ONE `aggregate` scan over an array of (lang, hits)
    * structs. A naive nested-CASE fold duplicates the accumulator twice per
    * level (`when(h > acc, h).otherwise(acc)`) — an exponentially sized
    * expression tree that breaks whole-stage codegen and falls back to
    * per-row interpretation. Inside the lambda, `acc`/`x` are lambda
    * variables (references), so the tree stays linear and codegen'd. The
    * strictly-greater scan makes the first language reaching the max win,
    * which is exactly the oracle's cascading `>=` CASE precedence. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val entries = Seq("en", "es", "de", "fr", "zh").map(l =>
      struct(lit(l).as("lang"), stopwordHits(toks, l).as("h")))
    val best = aggregate(
      array(entries: _*),
      struct(lit("und").as("lang"), lit(0).as("h")),
      (acc, x) => when(x.getField("h") > acc.getField("h"), x).otherwise(acc))
    best.getField("lang")
  }

  /** Quality-score components + composite in [0,1]:
    * length band, mean token length band, alpha-character ratio,
    * stopword density. The composite is a weighted sum rounded to 4dp. */
  def qualityComponents(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val nChars = length(text).cast("double")
    val alphaChars = length(regexp_replace(text, "[^A-Za-z]", "")).cast("double")
    val enHits = stopwordHits(toks, "en").cast("double")
    Seq(
      "n_tokens" -> nTok,
      "mean_token_len" -> when(nTok > 0, round((nChars - (nTok - 1)) / nTok, 4)).otherwise(0.0),
      "alpha_ratio" -> when(nChars > 0, round(alphaChars / nChars, 4)).otherwise(0.0),
      "stopword_density" -> when(nTok > 0, round(enHits / nTok, 4)).otherwise(0.0))
  }

  /** Composite quality score: rewards 20..500 tokens, high alpha ratio,
    * nonzero stopword density. */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val nChars = length(text).cast("double")
    val alphaChars = length(regexp_replace(text, "[^A-Za-z ]", "")).cast("double")
    val lengthOk = when(nTok >= 20 && nTok <= 500, 1.0).otherwise(0.0)
    val alphaRatio = when(nChars > 0, alphaChars / nChars).otherwise(lit(0.0))
    val nonEmpty = when(nTok > 0, 1.0).otherwise(0.0)
    round(lengthOk * 0.4 + alphaRatio * 0.4 + nonEmpty * 0.2, 4)
  }

  /** Content fingerprint: md5 of the whitespace-normalized lowercase text —
    * the exact-dedup key. md5 exists verbatim in DuckDB, so this one is
    * oracle-comparable end to end. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** 64-bit rolling-hash fingerprint (FNV-1a over the normalized text) —
    * cheaper than md5 when the value only needs to be a join/bucket key. */
  def fingerprint64(text: Column): Column =
    xxhash64(regexp_replace(lower(trim(text)), "\\s+", " "))
}
