package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SetSimJoinSpec extends SparkSpec {
  import spark.implicits._

  private def bruteForce(docs: org.apache.spark.sql.DataFrame, t: Double) = {
    val toks = docs.select($"doc_id".as("id"),
      array_distinct(TextAnalysis.tokens($"text")).as("tk"))
      .filter(size($"tk") > 0)
    toks.toDF("a", "ta").crossJoin(toks.toDF("b", "tb"))
      .filter($"a" < $"b")
      .withColumn("i", size(array_intersect($"ta", $"tb")))
      .withColumn("u", size($"ta") + size($"tb") - $"i")
      .filter($"i" > 0 && $"i" / $"u" >= t)
      .select($"a", $"b")
  }

  test("prefix-filtered join equals brute force at several thresholds") {
    // overlapping docs + noise; doc 4 is a permutation of doc 1 (J = 1.0)
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta zeta"),
      (3L, "alpha beta unrelated words here entirely"),
      (4L, "epsilon delta gamma beta alpha"),
      (5L, "totally different content again"),
      (6L, "more unrelated filler text"),
      (7L, "alpha beta gamma delta epsilon eta")
    ).toDF("doc_id", "text")
    for (t <- Seq(0.5, 0.7, 0.9)) {
      val fast = SetSimJoin.join(docs, "doc_id", "text", t)
        .select($"doc_a", $"doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val slow = bruteForce(docs, t)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(fast == slow, s"threshold $t")
    }
  }

  test("jaccard values are exact; identical sets score 1.0") {
    val docs = Seq((1L, "x y z"), (2L, "z y x"), (3L, "x y w")).toDF("doc_id", "text")
    val out = SetSimJoin.join(docs, "doc_id", "text", 0.4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(out((1L, 2L)) == 1.0)
    assert(math.abs(out((1L, 3L)) - 0.5) < 1e-12) // |{x,y}| / |{x,y,z,w}|
    assert(math.abs(out((2L, 3L)) - 0.5) < 1e-12)
  }

  test("joinDelta equals the brute-force delta×corpus join, incl. corpus-absent tokens") {
    val corpus = Seq(
      (1L, "a b c d"), (2L, "a b c e"), (3L, "p q r s"), (4L, "m n o")
    ).toDF("doc_id", "text")
    val delta = Seq(
      (10L, "a b c d"),     // exact dup of 1
      (11L, "p q r s t"),   // near 3
      (12L, "zz yy xx"),    // all tokens absent from corpus → no pairs
      (13L, "m n o zz")     // one corpus-absent token, still near 4
    ).toDF("doc_id", "text")
    Seq(0.5, 0.75, 0.8).foreach { t =>
      val fast = SetSimJoin.joinDelta(corpus, delta, "doc_id", "text", t)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val d = delta.toDF("delta_id", "dt"); val c = corpus.toDF("corpus_id", "ct")
      val brute = d.crossJoin(c)
        .select($"delta_id", $"corpus_id",
          array_distinct(split(lower($"dt"), "\\s+")).as("ta"),
          array_distinct(split(lower($"ct"), "\\s+")).as("tb"))
        .withColumn("inter", size(array_intersect($"ta", $"tb")))
        .withColumn("uni", size($"ta") + size($"tb") - $"inter")
        .filter($"inter" > 0 && $"inter" / $"uni" >= t)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(fast == brute, s"threshold $t: missing=${brute -- fast} extra=${fast -- brute}")
    }
  }

  test("at-threshold pair survives double rounding of the prefix bound") {
    // t = 9/11, |a| = 77: t·77 = 63.00000000000001 in doubles, so an
    // unslacked ceil gives 64 and shortens a's prefix to 14 — one below the
    // completeness bound of 15. The fixture pins the ONLY shared prefix
    // token at rank exactly 15 of a: a's 14 rarest tokens (freq 1) are
    // unique to a, rank 15 is the first shared token. b ⊂ a with |b| = 63,
    // so J = 63/77 = 9/11 — exactly at threshold. Without the 1e-9 slack
    // inside ceil (mirroring the size filter's) this pair is silently lost.
    val uniq = (1 to 14).map(i => f"u$i%02d")
    val shared = (1 to 63).map(i => f"c$i%02d")
    val docs = Seq(
      (1L, (uniq ++ shared).mkString(" ")), // 77 tokens
      (2L, shared.mkString(" "))            // 63 tokens
    ).toDF("doc_id", "text")
    val t = 9.0 / 11
    val self = SetSimJoin.join(docs, "doc_id", "text", t)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(self.contains((1L, 2L)), "at-threshold pair dropped by prefix rounding")
    assert(math.abs(self((1L, 2L)) - 63.0 / 77) < 1e-12)
    // same bound, delta-vs-corpus form (corpus-only frequencies: a's unique
    // tokens coalesce to 0 = rarest, preserving the rank-15 structure)
    val delta = SetSimJoin.joinDelta(
        docs.filter($"doc_id" === 2L), docs.filter($"doc_id" === 1L),
        "doc_id", "text", t)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(delta == Set((1L, 2L)), "joinDelta dropped the at-threshold pair")
  }

  test("prefix candidate set is smaller than all pairs (the point of the filter)") {
    // 30 docs in 3 disjoint vocabularies: cross-vocabulary pairs must be
    // pruned before verification
    val docs = (0 until 30).map { i =>
      val vocab = i % 3
      (i.toLong, s"v${vocab}w1 v${vocab}w2 v${vocab}w3 v${vocab}w${i / 3}")
    }.toDF("doc_id", "text")
    val out = SetSimJoin.join(docs, "doc_id", "text", 0.5)
    val brute = bruteForce(docs, 0.5)
    assert(out.select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      brute.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    // every surviving pair shares a vocabulary
    out.collect().foreach(r => assert(r.getLong(0) % 3 == r.getLong(1) % 3))
  }
}
