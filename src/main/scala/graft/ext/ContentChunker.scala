package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-defined chunking (the LBFS/FastCDC discipline, word-level): a
  * chunk boundary falls AFTER token i exactly when the hash of the 3-gram
  * ending at i clears the boundary mask — so boundaries are a function of
  * LOCAL content only. That is the property fixed-size chunking
  * (q_chunk_documents) lacks: inserting one token there shifts every
  * downstream chunk, turning a 1-token edit into a whole-document re-store;
  * here the cut points re-synchronize within one gram of the edit and every
  * chunk after it hashes identically. Content-addressed storage, transport
  * dedup, and incremental-corpus diffing all hinge on exactly this.
  *
  * Scale shape: chunking is a per-row higher-order-array projection
  * (codegen'd, zero shuffles); the shared-chunk report is one hash groupBy
  * on the chunk digest — the same one-shuffle inverted-index discipline as
  * exact dedup, applied at sub-document granularity. Expected chunk length
  * is `mask` tokens (geometric); the md5-nibble gram hash is the battery's
  * portable family, domain-tagged "c:".
  */
object ContentChunker {

  /** 16-bit portable gram hash: first 4 hex nibbles of md5("c:" ++ s). */
  def hash16(s: Column): Column =
    conv(substring(md5(concat(lit("c:"), s)), 1, 4), 16, 10).cast("int")

  /** One row per (id, chunk_idx 1-based, chunk token array). Interior
    * boundaries only (positions 3..n-1, so every chunk is non-empty and
    * the final tokens always close the last chunk); documents with no
    * tokens yield no rows, short documents yield one whole-doc chunk. */
  def chunks(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      mask: Int = 16): DataFrame = {
    val n = size(col("toks"))
    val boundaryAt = (i: Column) =>
      hash16(array_join(slice(col("toks"), i - 2, lit(3)), " ")) % mask === 0
    val bpos = when(n >= lit(4),
        filter(sequence(lit(3), n - 1), boundaryAt))
      .otherwise(array().cast("array<int>"))
    val starts = concat(array(lit(0)), col("bpos"))
    val ends = concat(col("bpos"), array(n))
    docs
      .select(col(idCol).as("id"), TextAnalysis.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) > 0)
      .withColumn("bpos", bpos)
      .select(col("id"), posexplode(
        transform(sequence(lit(1), size(col("bpos")) + 1),
          j => slice(col("toks"), element_at(starts, j) + 1,
            element_at(ends, j) - element_at(starts, j)))))
      .select(col("id"), (col("pos") + 1).cast("int").as("chunk_idx"),
        col("col").as("ctoks"))
  }

  /** The dedup view: every chunk with its digest and the number of DISTINCT
    * documents holding an identical chunk — sub-document exact dedup off
    * one groupBy on the content digest. */
  def chunkReport(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      mask: Int = 16): DataFrame = {
    // materialize once: the digest groupBy and the join back both read
    // this frame — without the checkpoint the chunking pipeline runs twice
    val ch = chunks(docs, idCol, textCol, mask)
      .select(col("id"), col("chunk_idx"),
        size(col("ctoks")).cast("int").as("n_tok"),
        md5(array_join(col("ctoks"), " ")).as("chunk_hash"))
      .localCheckpoint()
    val shared = ch.groupBy(col("chunk_hash"))
      .agg(countDistinct(col("id")).as("n_docs"))
    ch.join(shared, Seq("chunk_hash"))
      .select(col("id"), col("chunk_idx"), col("n_tok"),
        col("chunk_hash"), col("n_docs"))
  }
}
