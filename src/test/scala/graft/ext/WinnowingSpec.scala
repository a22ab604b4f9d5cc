package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Winnowing fingerprint invariants (Schleimer et al. 2003). */
class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  private def fps(rows: Seq[(Long, String)], k: Int = 3, w: Int = 8): Map[Long, Set[Int]] =
    Winnowing.fingerprints(rows.toDF("id", "text"), "id", "text", k, w)
      .as[(Long, Int)].collect().groupBy(_._1).map { case (id, a) => id -> a.map(_._2).toSet }

  test("every doc with >= k tokens gets >= 1 fingerprint; shorter docs get none") {
    val m = fps(Seq(
      (1L, "alpha beta gamma"),                   // exactly k tokens
      (2L, "one two"),                            // k-1 tokens: no shingle
      (3L, "a b c d e f g h i j k l m n o p")))   // longer than one window
    assert(m(1L).nonEmpty)
    assert(!m.contains(2L))
    assert(m(3L).nonEmpty)
  }

  test("fingerprints are position-independent: a prefix insertion preserves interior selections") {
    val body = (1 to 60).map(i => s"tok$i").mkString(" ")
    val m = fps(Seq((1L, body), (2L, s"zz yy xx ww vv uu $body")))
    // the winnowing guarantee: any shared run of >= k + w - 1 tokens yields a
    // shared fingerprint; a 60-token shared body yields MANY
    val sharedFrac = (m(1L) & m(2L)).size.toDouble / m(1L).size
    assert(sharedFrac > 0.7, s"shifted copy shares only $sharedFrac of fingerprints")
  }

  test("disjoint texts share no fingerprints (16-bit collisions aside)") {
    val a = (1 to 40).map(i => s"left$i").mkString(" ")
    val b = (1 to 40).map(i => s"right$i").mkString(" ")
    val m = fps(Seq((1L, a), (2L, b)))
    assert((m(1L) & m(2L)).size <= 1) // tolerate at most one hash collision
  }

  test("selection is a subset of shingle hashes at density well below 1") {
    val body = (1 to 200).map(i => s"w$i").mkString(" ")
    val m = fps(Seq((1L, body)))
    // 198 shingles, window 8 → expected unique selections ≈ 2/(w+1) of
    // positions; far fewer than all shingles
    assert(m(1L).size < 100 && m(1L).size > 10)
  }

  test("nearDupPairs: identical docs overlap 1.0; maxDf drops boilerplate buckets") {
    val body = (1 to 30).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, body), (2L, body),                       // exact pair
      (3L, "completely different words entirely here now")) ++
      // 12 docs sharing ONE boilerplate sentence (and nothing else): with
      // maxDf = 4 the boilerplate fingerprints exceed df and are dropped,
      // so no boilerplate-only pair survives minShared
      (10L to 21L).map(i => (i, s"shared boiler plate sentence unique$i"))
    val pairs = Winnowing.nearDupPairs(docs.toDF("id", "text"), "id", "text",
        k = 3, w = 8, minShared = 2, maxDf = 4)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(pairs.exists { case (a, b, _, ov) => a == 1L && b == 2L && ov == 1.0 })
    assert(!pairs.exists { case (a, _, _, _) => a >= 10L }, s"boilerplate pair leaked: $pairs")
  }

  test("fast (xxhash64) and portable (md5) families find the same planted near-dup pairs") {
    val body = (1 to 80).map(i => s"p$i").mkString(" ")
    val docs = Seq(
      (1L, body), (2L, body),                        // exact pair
      (3L, s"shift one two $body"),                   // shifted near-dup
      (4L, "entirely different content over here now with many words")
    ).toDF("id", "text")
    def pairSet(portable: Boolean) =
      Winnowing.nearDupPairs(docs, "id", "text", portable = portable)
        .select($"doc_a".as[Long], $"doc_b".as[Long]).collect().toSet
    val (p, f) = (pairSet(portable = true), pairSet(portable = false))
    assert(p == f, s"portable $p != fast $f")
    assert(p.contains((1L, 2L)) && p.contains((1L, 3L)) && p.contains((2L, 3L)))
    assert(!p.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("detection guarantee: a shared run of k + w - 1 tokens produces a shared fingerprint") {
    val run = (1 to 10).map(i => s"run$i").mkString(" ") // k=3, w=8 → 10 tokens
    val m = fps(Seq(
      (1L, s"aa bb cc dd $run"),
      (2L, s"$run xx yy zz ww")))
    assert((m(1L) & m(2L)).nonEmpty)
  }
}
