package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

class TextIndexSpec extends SparkSpec {
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select($"doc_id", $"word", $"tf", $"dl")
      .collect().map(_.toSeq).toSet

  test("postings: one row per (doc, word), tf counts repeats, dl is doc length") {
    val docs = Seq((1L, "a b a"), (2L, "b")).toDF("doc_id", "text")
    val p = TextIndex.buildPostings(docs, "doc_id", "text")
      .collect().map(r => ((r.getLong(0), r.getString(1)), (r.getDouble(2), r.getDouble(3)))).toMap
    assert(p == Map(
      (1L, "a") -> (2.0, 3.0), (1L, "b") -> (1.0, 3.0), (2L, "b") -> (1.0, 1.0)))
  }

  test("indexed BM25 equals the from-scratch scorer") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val viaIndex = TextIndex.searchBm25(
      TextIndex.buildPostings(docs, "doc_id", "text"), Seq("spark", "query", "data"), 20)
    // from-scratch reference (same shape as q_bm25_search)
    val tok = docs.select($"doc_id", explode(split(lower($"text"), "\\s+")).as("word"))
      .filter(length($"word") > 0)
    val dl = tok.groupBy($"doc_id").agg(count(lit(1)).cast("double").as("dl"))
    val tf = tok.groupBy($"doc_id", $"word").agg(count(lit(1)).cast("double").as("tf"))
    val dfq = tok.groupBy($"word").agg(countDistinct($"doc_id").cast("double").as("df"))
    val stats = dl.agg(count(lit(1)).cast("double").as("n"), avg($"dl").as("avgdl"))
    val score = log(($"n" - $"df" + 0.5) / ($"df" + 0.5) + 1.0) *
      $"tf" * 2.2 / ($"tf" + lit(1.2) * (lit(0.25) + lit(0.75) * $"dl" / $"avgdl"))
    val direct = tf.join(broadcast(Seq("spark", "query", "data").toDF("word")), "word")
      .join(dfq, "word").join(dl, "doc_id").crossJoin(broadcast(stats))
      .groupBy($"doc_id").agg(round(sum(score), 6).as("bm25"))
      .orderBy($"bm25".desc, $"doc_id").limit(20)
    assert(viaIndex.collect().map(_.toSeq).toSeq == direct.collect().map(_.toSeq).toSeq)
  }

  test("applyChanges through a snapshot CDF equals a full rebuild (incl. overwrite)") {
    import graft.sinks.Snapshots
    val t = java.nio.file.Files.createTempDirectory("graft-tidx").toString + "/docs"
    Snapshots.commit(Seq((1L, "alpha beta"), (2L, "beta gamma")).toDF("doc_id", "text"), t)
    var postings = TextIndex.buildPostings(Snapshots.read(spark, t, Some(1L)), "doc_id", "text")
    Snapshots.commit(Seq((3L, "gamma delta alpha")).toDF("doc_id", "text"), t) // append
    postings = TextIndex.applyChanges(
      postings, Snapshots.changes(spark, t, 1L, 2L), "doc_id", "text")
    Snapshots.commit(Seq((9L, "epsilon")).toDF("doc_id", "text"), t, SaveMode.Overwrite)
    postings = TextIndex.applyChanges(
      postings, Snapshots.changes(spark, t, 2L, 3L), "doc_id", "text")
    val rebuilt = TextIndex.buildPostings(Snapshots.read(spark, t), "doc_id", "text")
    assert(canon(postings) == canon(rebuilt))
    assert(canon(postings).forall(_.head == 9L)) // only the overwrite survivor
  }

  test("applyChanges replaces, not duplicates, a re-inserted doc_id (upsert-as-append feed)") {
    val base = Seq((1L, "alpha beta"), (2L, "gamma")).toDF("doc_id", "text")
    var postings = TextIndex.buildPostings(base, "doc_id", "text")
    // the feed re-inserts doc 1 with new text and NO preceding delete
    val feed = Seq((1L, "delta delta")).toDF("doc_id", "text")
      .withColumn("_change_type", lit("insert"))
    postings = TextIndex.applyChanges(postings, feed, "doc_id", "text")
    val expect = TextIndex.buildPostings(
      Seq((1L, "delta delta"), (2L, "gamma")).toDF("doc_id", "text"), "doc_id", "text")
    assert(canon(postings) == canon(expect)) // stale alpha/beta rows are gone
  }
}
