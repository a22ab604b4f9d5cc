package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  test("bigram extraction: sliding pairs, lowercased, short/empty docs drop out") {
    val docs = Seq((1L, "A b  a"), (2L, "solo"), (3L, ""), (4L, null))
      .toDF("doc_id", "text")
    val bg = NgramLm.docBigrams(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(bg == Set((1L, "a", "b"), (1L, "b", "a")))
  }

  test("add-1 smoothed probabilities match the closed form") {
    // corpus: "a b a b" + "a c" → c(a,b)=2 c(b,a)=1 c(a,c)=1; c(a)=3 c(b)=1; V=3
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = NgramLm.score(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // doc1: bigrams (a,b),(b,a),(a,b); P(b|a)=(2+1)/(3+3)=.5, P(a|b)=(1+1)/(1+3)=.5
    assert(out(1L)._1 == 3L)
    assert(math.abs(out(1L)._2 - math.log(0.5)) < 1e-12)
    // doc2: one bigram (a,c); P(c|a)=(1+1)/(3+3)=1/3
    assert(out(2L)._1 == 1L)
    assert(math.abs(out(2L)._2 - math.log(1.0 / 3.0)) < 1e-12)
  }

  test("higher-perplexity (rarer-transition) docs score lower") {
    val common = (1 to 20).map(i => (i.toLong, "the quick brown fox jumps"))
    val rare = Seq((99L, "zxq qzx xqz zqx qxz"))
    val docs = (common ++ rare).toDF("doc_id", "text")
    val scores = NgramLm.score(docs, "doc_id", "text")
      .select($"doc_id", $"avg_logp").as[(Long, Double)].collect().toMap
    assert(scores(99L) < scores(1L)) // gibberish is less probable
  }
}
