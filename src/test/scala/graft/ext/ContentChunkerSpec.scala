package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Content-defined chunking invariants (the LBFS/FastCDC property set). */
class ContentChunkerSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(rows: Seq[(Long, String)], mask: Int = 16): Map[Long, Seq[Seq[String]]] =
    ContentChunker.chunks(rows.toDF("id", "text"), "id", "text", mask)
      .orderBy($"id", $"chunk_idx")
      .select($"id", $"ctoks")
      .as[(Long, Seq[String])].collect().toSeq
      .groupBy(_._1).map { case (id, a) => id -> a.map(_._2) }

  test("chunks partition the token stream exactly; every chunk non-empty") {
    val body = (1 to 300).map(i => s"tok$i").mkString(" ")
    val m = chunksOf(Seq((1L, body), (2L, "a b"), (3L, "single")))
    assert(m(1L).flatten == body.split(" ").toSeq)
    assert(m(1L).size > 1, "300 tokens should cut at least once at mask 16")
    assert(m(1L).forall(_.nonEmpty))
    assert(m(2L) == Seq(Seq("a", "b"))) // short doc: one whole-doc chunk
    assert(m(3L) == Seq(Seq("single")))
  }

  test("empty text yields no chunks") {
    assert(chunksOf(Seq((1L, ""), (2L, "   "))).isEmpty)
  }

  test("boundaries re-synchronize after an insertion: downstream chunks identical") {
    val body = (1 to 400).map(i => s"w$i").mkString(" ")
    val m = chunksOf(Seq((1L, body), (2L, s"inserted front matter $body")))
    val h1 = m(1L).map(_.mkString(" ")).toSet
    val h2 = m(2L).map(_.mkString(" ")).toSet
    // all but the first chunk(s) around the edit must re-synchronize; with
    // ~25 expected chunks, demand the overwhelming majority shared
    val frac = (h1 & h2).size.toDouble / h1.size
    assert(frac > 0.7, s"only $frac of chunks re-synchronized: ${h1.size} vs shared ${(h1 & h2).size}")
    // and the tail chunk specifically survives the front edit
    assert(m(1L).last == m(2L).last)
  }

  test("expected chunk length tracks the mask") {
    val body = (1 to 1000).map(i => s"t$i").mkString(" ")
    val m8 = chunksOf(Seq((1L, body)), mask = 8)(1L)
    val m32 = chunksOf(Seq((1L, body)), mask = 32)(1L)
    assert(m8.size > m32.size, s"mask 8 gave ${m8.size} chunks, mask 32 gave ${m32.size}")
    val mean8 = m8.map(_.size).sum.toDouble / m8.size
    assert(mean8 > 3 && mean8 < 25, s"mask-8 mean chunk length $mean8 out of range")
  }

  test("chunkReport: identical docs share every chunk digest; n_docs counts distinct holders") {
    val body = (1 to 200).map(i => s"s$i").mkString(" ")
    val rep = ContentChunker.chunkReport(
        Seq((1L, body), (2L, body), (3L, "totally unrelated words here")).toDF("id", "text"),
        "id", "text")
      .select($"id".as[Long], $"chunk_hash".as[String], $"n_docs".as[Long])
      .collect()
    assert(rep.filter(r => r._1 == 1L || r._1 == 2L).forall(_._3 == 2L))
    assert(rep.filter(_._1 == 3L).forall(_._3 == 1L))
  }
}
