package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003 —
  * "Winnowing: Local Algorithms for Document Fingerprinting", the MOSS
  * algorithm): hash every k-token shingle, then keep the MINIMUM hash of
  * each window of `w` consecutive shingles. The selected set is a
  * position-independent fingerprint with a guarantee the MinHash/SimHash
  * families don't give: any shared token run of length >= k + w - 1 is
  * DETECTED (both documents select at least one common fingerprint from
  * it), and nothing shorter than k is ever matched — so it sits between
  * exact-substring dedup (q_dup_ngram_spans' every-position explode) and
  * whole-document sketches, at density ~2/(w+1) of positions instead of 1.
  *
  * Scale shape: fingerprint selection is a per-row higher-order-array
  * projection (codegen'd, zero shuffles); pairing is an inverted-index
  * equi-join on the fingerprint value — one shuffle, never all-pairs. The
  * load-bearing knob at 100 TB is `maxDf`: a boilerplate shingle shared by
  * thousands of documents would otherwise mint a quadratic bucket (the
  * same hot-key failure the SetSimJoin prefix filter and the SemDedup
  * hot-cell split guard against), and carries no near-dup signal — so
  * fingerprints with document frequency > maxDf are dropped before the
  * self-join, bounding every bucket to maxDf² candidate pairs.
  *
  * Hashing is the battery's portable 16-bit md5-nibble family (exactly
  * mirrorable in DuckDB via the strpos-nibble idiom), domain-tagged "w:".
  * Collisions at 16 bits only ADD candidate shared fingerprints; the
  * `overlap` ratio both engines compute is over the same hash space.
  */
object Winnowing {

  /** 16-bit portable shingle hash: first 4 hex nibbles of md5("w:" ++ s). */
  def hash16(s: Column): Column =
    conv(substring(md5(concat(lit("w:"), s)), 1, 4), 16, 10).cast("int")

  /** PRODUCTION-SPEED 16-bit shingle hash: the low bits of the JVM
    * xxhash64 — one fused hash per shingle instead of md5 + hex decode.
    * Engine-specific by design (rows-only twin); WinnowingSpec pins that
    * planted near-dups surface through both hash families identically. */
  def fastHash16(s: Column): Column =
    xxhash64(lit("w:"), s).bitwiseAND(lit(0xffffL)).cast("int")

  /** One row per (id, fingerprint), DISTINCT per document. Documents with
    * fewer than k tokens yield no fingerprints (no k-shingle exists);
    * every document with at least one shingle yields at least one
    * fingerprint (the final short window clamps, matching list-slice
    * clamping in the SQL mirror). */
  def fingerprints(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      w: Int = 8,
      portable: Boolean = true): DataFrame = {
    val h: Column => Column = if (portable) hash16 else fastHash16
    val shingleHashes = transform(
      sequence(lit(1), size(col("toks")) - (k - 1)),
      i => h(array_join(slice(col("toks"), i, lit(k)), " ")))
    val windowMins = transform(
      sequence(lit(1), greatest(lit(1), size(col("hs")) - (w - 1))),
      i => array_min(slice(col("hs"), i, lit(w))))
    docs
      .select(col(idCol).as("id"), TextAnalysis.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= k)
      .withColumn("hs", shingleHashes)
      .select(col("id"), explode(array_distinct(windowMins)).as("fp"))
  }

  /** Near-duplicate pair report off the inverted fingerprint index:
    * (doc_a, doc_b, shared, overlap) for pairs sharing >= minShared
    * retained fingerprints, where overlap is the Jaccard of the two
    * retained-fingerprint sets. `maxDf` drops boilerplate fingerprints
    * (df > maxDf) BEFORE per-document counting, so the overlap denominator
    * is over fingerprints that could have matched. */
  def nearDupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      w: Int = 8,
      minShared: Int = 2,
      maxDf: Int = 100,
      portable: Boolean = true): DataFrame = {
    // materialize once: the df cut, the kept join, and BOTH sides of the
    // pair self-join read this frame — without the checkpoint Catalyst
    // re-derives the tokenize→shingle→hash→window pipeline four times
    val fp = fingerprints(docs, idCol, textCol, k, w, portable).localCheckpoint()
    val df = fp.groupBy(col("fp")).agg(count(lit(1)).as("df"))
    // one shuffle key (fp) shared by the df filter and the pair join
    val kept = fp.join(df.filter(col("df") <= maxDf), "fp")
    val perDoc = kept.groupBy(col("id")).agg(count(lit(1)).as("nfp"))
    // singleton fingerprints (df = 1) can't pair — pure pruning, the
    // per-doc counts above are taken before this cut
    val joinable = kept.filter(col("df") >= 2)
    val a = joinable.select(col("fp"), col("id").as("doc_a"))
    val b = joinable.select(col("fp"), col("id").as("doc_b"))
    a.join(b, Seq("fp"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .join(perDoc.select(col("id").as("doc_a"), col("nfp").as("nfp_a")), "doc_a")
      .join(perDoc.select(col("id").as("doc_b"), col("nfp").as("nfp_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("shared"),
        round(col("shared").cast("double") /
          (col("nfp_a") + col("nfp_b") - col("shared")), 4).as("overlap"))
  }
}
