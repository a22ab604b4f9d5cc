package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Materialized inverted text index: the postings a lexical search engine
  * keeps, as a lake table — (doc_id, word, tf, dl) — plus BM25 serving and
  * INCREMENTAL maintenance from a document change feed.
  *
  * Why materialize: [[graft.queries.ExtensionBattery]]'s q_bm25_search
  * re-tokenizes the corpus per query. At 100 TB the tokenize+aggregate pass
  * dominates; the postings table is built once (index-build job), persisted
  * partitioned/bucketed by word, and each query touches only its terms'
  * postings. Degenerate per-term skew ("the") is the classic hot-postings
  * problem — stopword pruning or df-capped terms bound it upstream.
  *
  * Why incremental: an hourly corpus delta should cost an hourly index
  * delta. [[applyChanges]] consumes the snapshot CDF
  * ([[graft.sinks.Snapshots.changes]]): deleted docs' postings anti-join
  * out, inserted docs' postings append — maintained index ≡ full rebuild
  * (spec-pinned), cost ∝ changed docs.
  */
object TextIndex {

  /** Postings of a document table: one row per (doc, word) with the term
    * frequency and the doc's token length (denormalized for BM25's length
    * normalization — no doc-table join at query time). */
  def buildPostings(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs
      .select(col(idCol).as("doc_id"),
        explode(split(lower(col(textCol)), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
    val dl = tok.groupBy(col("doc_id")).agg(count(lit(1)).cast("double").as("dl"))
    tok.groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).cast("double").as("tf"))
      .join(dl, "doc_id")
  }

  /** BM25 over the postings table (k1=1.2, b=0.75 — same scoring as the
    * from-scratch q_bm25_search, so the two paths are oracle-identical).
    * Corpus stats (N, avgdl, per-term df) derive from the index itself:
    * index-sized aggregates, no touch of the raw text. */
  def searchBm25(
      postings: DataFrame,
      terms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val spark = postings.sparkSession
    import spark.implicits._
    val termDf = terms.toDF("word")
    // only the query terms' postings participate from here on — at scale
    // the postings table is partitioned/bucketed by word, so this join IS
    // the index lookup
    val hits = postings.join(broadcast(termDf), "word")
    // N and avgdl are corpus-level (index-sized, term-independent); df is
    // computed from the term-filtered postings only — identical values, a
    // 3-term aggregate instead of a full-vocabulary shuffle
    val docLens = postings.select(col("doc_id"), col("dl")).distinct()
    val stats = docLens.agg(count(lit(1)).cast("double").as("n"), avg(col("dl")).as("avgdl"))
    val dfq = hits.groupBy(col("word"))
      .agg(countDistinct(col("doc_id")).cast("double").as("df"))
    val score = log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
      col("tf") * (k1 + 1) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl")))
    hits
      .join(dfq, "word")
      .crossJoin(broadcast(stats))
      .groupBy(col("doc_id"))
      .agg(round(sum(score), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }

  /** Maintain postings from a documents change feed (`_change_type`
    * 'insert'/'delete' + the document columns): deleted docs drop, inserted
    * docs tokenize and append. An updated doc arrives as delete+insert
    * (how [[graft.sinks.Snapshots.changes]] renders overwrites), so the
    * result is exactly `buildPostings(current corpus)`. */
  def applyChanges(
      postings: DataFrame,
      changes: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val deleted = changes.filter(col("_change_type") === "delete")
      .select(col(idCol).as("doc_id")).distinct()
    val inserted = changes.filter(col("_change_type") === "insert")
      .select(col(idCol), col(textCol))
    // anti-join out BOTH deleted and re-inserted ids: an upsert-as-append
    // feed emits an insert for an id that already has postings, and keeping
    // the stale rows would double-score the doc (maintained != rebuild)
    val stale = deleted.unionByName(
      inserted.select(col(idCol).as("doc_id"))).distinct()
    postings.join(stale, Seq("doc_id"), "left_anti")
      .unionByName(buildPostings(inserted, idCol, textCol))
  }
}
