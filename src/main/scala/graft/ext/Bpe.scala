package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword tokenizer (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units") — the learned
  * tokenizer a training-data pipeline actually runs, upgrading
  * [[TextAnalysis.bpeishTokenCount]]'s fixed regex proxy:
  *
  *  1. TRAIN ([[train]]): learn `nMerges` ranked merges from a BOUNDED
  *     deterministic sample at the driver — the same discipline as the PQ
  *     codebooks ([[PqIndex.train]]): subword vocabularies for
  *     billion-document corpora are trained on samples in practice
  *     (SentencePiece's default input cap), so nothing driver-side scales
  *     with the corpus. Deterministic end to end: sample = lowest ids;
  *     pair-count argmax ties break lexicographically.
  *  2. APPLY ([[tokens]]): a map-side projection — the ranked merge table
  *     rides the task closure (nMerges entries, KBs), each word encodes by
  *     the standard greedy loop (merge the lowest-rank adjacent pair
  *     present, all left-to-right occurrences, until none applies). No
  *     shuffle, no driver round-trips; cost is linear in corpus tokens.
  *
  * The end-of-word marker `</w>` makes detokenization exact
  * ([[detokenize]] ∘ [[tokens]] = whitespace-normalized input,
  * spec-pinned), which is what makes the tokenizer usable for sequence
  * packing round-trips, not just counting.
  */
object Bpe {

  /** Ranked merges: index IS the rank (lower = applied first). */
  type Merges = Seq[(String, String)]

  private val EndMark = "</w>"

  /** Symbol sequence a word starts from: its characters plus the
    * end-of-word marker fused onto the final character (the Sennrich
    * formulation — word-final symbols are distinct from word-internal
    * ones, so "est" inside a word and "est" ending a word merge
    * independently). */
  private[ext] def baseSymbols(word: String): Vector[String] = {
    if (word.isEmpty) Vector.empty
    else {
      val cs = word.toCharArray.map(_.toString).toVector
      cs.init :+ (cs.last + EndMark)
    }
  }

  /** One merge step: fuse every left-to-right non-overlapping occurrence
    * of the pair (a, b). */
  private[ext] def applyMerge(sym: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < sym.length) {
      if (i + 1 < sym.length && sym(i) == a && sym(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += sym(i); i += 1 }
    }
    out.result()
  }

  /** Learn `nMerges` ranked merges from the first `sampleN` docs by id.
    * Stops early when no adjacent pair occurs at least `minPairCount`
    * times (2 by default — a merge seen once generalizes nothing). */
  def train(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      nMerges: Int,
      sampleN: Int = 2048,
      minPairCount: Long = 2L): Merges = {
    // word-frequency table from the deterministic sample; training only
    // ever touches the (word, freq) vocabulary, never the docs again
    val words: Map[String, Long] = docs
      .select(col(idCol).as("id"), col(textCol).as("t"))
      .orderBy("id").limit(sampleN)
      .select(explode(split(lower(trim(col("t"))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    var vocab: Map[Vector[String], Long] =
      words.toSeq.map { case (w, n) => baseSymbols(w) -> n }
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    val merges = Seq.newBuilder[(String, String)]
    var m = 0
    var exhausted = false
    while (m < nMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (sym, n) =>
        var i = 0
        while (i + 1 < sym.length) {
          val p = (sym(i), sym(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        // argmax with a TOTAL deterministic order: count desc, then pair
        // lexicographic — training must not depend on hash-map iteration
        val ((a, b), best) = pairCounts.minBy { case ((x, y), n) => (-n, x, y) }
        if (best < minPairCount) exhausted = true
        else {
          merges += ((a, b))
          vocab = vocab.toSeq.map { case (sym, n) => applyMerge(sym, a, b) -> n }
            .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
          m += 1
        }
      }
    }
    merges.result()
  }

  /** Greedy encode of one word under ranked merges: repeatedly apply the
    * LOWEST-RANK merge whose pair is present, until none applies. */
  private[ext] def encodeWord(word: String, rank: Map[(String, String), Int]): Vector[String] = {
    var sym = baseSymbols(word)
    var done = sym.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bi = -1
      var i = 0
      while (i + 1 < sym.length) {
        rank.get((sym(i), sym(i + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bi = i }
        }
        i += 1
      }
      if (bi < 0) done = true
      else {
        sym = applyMerge(sym, sym(bi), sym(bi + 1))
        done = sym.length < 2
      }
    }
    sym
  }

  /** array<string> of subword tokens for a text column — whitespace words
    * each greedy-encoded; word-final subwords carry the `</w>` marker.
    * Lowercases with Locale.ROOT so apply-time casing matches [[train]]'s
    * locale-independent Spark `lower()` regardless of the executor JVM's
    * default locale (e.g. Turkish dotted/dotless I). */
  def tokens(text: Column, merges: Merges): Column = {
    val rank: Map[(String, String), Int] = merges.zipWithIndex.toMap
    udf((t: String) => {
      if (t == null) null
      else t.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty)
        .flatMap(w => encodeWord(w, rank)).toSeq
    }).apply(text)
  }

  /** Exact inverse of [[tokens]] up to whitespace normalization: subwords
    * concatenate within a word; `</w>` markers restore the spaces. */
  def detokenize(tokens: Seq[String]): String =
    tokens.mkString("").replace(EndMark, " ").trim
}
