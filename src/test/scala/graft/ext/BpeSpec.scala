package graft.ext

import graft.SparkSpec

/** BPE invariants: hand-checked first merge on the classic Sennrich
  * corpus, exact detokenization, determinism, and monotone compression. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the Sennrich paper's running example, frequencies included
  private def corpus = Seq(
    (1L, Array.fill(5)("low").mkString(" ")),
    (2L, Array.fill(2)("lower").mkString(" ")),
    (3L, Array.fill(6)("newest").mkString(" ")),
    (4L, Array.fill(3)("widest").mkString(" "))).toDF("doc_id", "text")

  test("first learned merge is the hand-computed argmax with lexicographic ties") {
    // (e,s) and (s,t</w>) both occur 9 times (newest x6 + widest x3);
    // the deterministic tie rule picks the lexicographically smaller pair
    val merges = Bpe.train(corpus, "doc_id", "text", nMerges = 3)
    assert(merges.head == ("e", "s"), s"got $merges")
    // with (e,s) fused, (es,t</w>) now counts 9 — it must be next
    assert(merges(1) == ("es", "t</w>"), s"got $merges")
  }

  test("detokenize ∘ tokens is identity up to whitespace normalization") {
    val merges = Bpe.train(corpus, "doc_id", "text", nMerges = 10)
    val texts = Seq("newest widest low", "  lower\tnewest ", "a lone xyzzy")
    texts.foreach { t =>
      val df = Seq(Tuple1(t)).toDF("t")
      val got = df.select(Bpe.tokens(df("t"), merges).as("k"))
        .collect()(0).getSeq[String](0)
      val norm = t.trim.toLowerCase(java.util.Locale.ROOT)
        .split("\\s+").filter(_.nonEmpty).mkString(" ")
      assert(Bpe.detokenize(got) == norm, s"round-trip broke for '$t': $got")
    }
  }

  test("training is deterministic and more merges never increase token count") {
    val m1 = Bpe.train(corpus, "doc_id", "text", nMerges = 8)
    val m2 = Bpe.train(corpus, "doc_id", "text", nMerges = 8)
    assert(m1 == m2, "same corpus must learn the same ranked merges")
    val doc = Seq(Tuple1("newest widest lowest")).toDF("t")
    val counts = Seq(0, 2, 4, 8).map { n =>
      val m = Bpe.train(corpus, "doc_id", "text", nMerges = n)
      doc.select(org.apache.spark.sql.functions.size(Bpe.tokens(doc("t"), m)))
        .collect()(0).getInt(0)
    }
    assert(counts == counts.sorted.reverse, s"token counts must be non-increasing: $counts")
    // zero merges = characters (with the end marker fused, count = chars)
    assert(counts.head == "newestwidestlowest".length)
  }

  test("BPE token counts drive the sharded sequence packer (the corpus-shaping composition)") {
    // the q_pack_sequences shape — sharded running-sum pack assignment —
    // fed by LEARNED subword counts instead of whitespace counts: the
    // pipeline a token-budgeted training-batch builder actually runs
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val words = Seq("low", "lower", "newest", "widest")
    val docs = (1L to 20L).map { i =>
      (i, (0 until (i % 5 + 1).toInt).map(j => words(((i + j) % 4).toInt)).mkString(" "))
    }.toDF("doc_id", "text")
    val merges = Bpe.train(docs, "doc_id", "text", nMerges = 10)
    val budget = 16
    val w = Window.partitionBy($"shard").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def packed = docs
      .select($"doc_id", ($"doc_id" % 4).as("shard"),
        size(Bpe.tokens($"text", merges)).cast("long").as("n_tok"))
      .withColumn("cum", sum($"n_tok").over(w))
      .select($"doc_id", $"n_tok",
        ($"shard" * 1000000 + floor(($"cum" - $"n_tok") / budget)).cast("long").as("pack_id"))
    val rows = packed.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 20)
    // a pack overruns the budget only when a single doc alone exceeds it
    rows.groupBy(_._3).foreach { case (pid, members) =>
      val total = members.map(_._2).sum
      assert(total <= budget + members.map(_._2).max,
        s"pack $pid exceeds budget + one-doc slack: $members")
    }
    // deterministic under a different shuffle layout
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val again = try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      packed.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert(rows.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("fixed merge table: greedy encode ≡ rank-ordered passes (the oracle's premise)") {
    // q_bpe_tokens_fixed's DuckDB mirror applies the 8 merges as ONE
    // left-to-right pass per rank, in rank order. That equals the engine's
    // greedy lowest-rank-first loop ONLY for a well-formed table (no
    // merge's output equals an earlier merge's operand — applying rank r
    // can then never re-enable a rank < r). Pin the well-formedness
    // structurally AND the end-to-end equivalence over every word of the
    // real documents corpus plus adversarial shapes.
    val merges = graft.queries.ExtensionBattery.fixedBpeMerges
    // structural well-formedness: output of rank r ∉ operands of ranks < r
    merges.zipWithIndex.foreach { case ((a, b), r) =>
      val out = a + b
      merges.take(r).foreach { case (pa, pb) =>
        assert(out != pa && out != pb,
          s"merge $r output '$out' equals an earlier operand — table not well-formed")
      }
    }
    val rank = merges.zipWithIndex.toMap
    def greedy(w: String): Vector[String] = Bpe.encodeWord(w, rank)
    def sequential(w: String): Vector[String] =
      merges.foldLeft(Bpe.baseSymbols(w)) { case (sym, (a, b)) =>
        Bpe.applyMerge(sym, a, b)
      }
    import org.apache.spark.sql.functions.{explode, split, lower, trim, length}
    val corpusWords = graft.sources.Tables
      .documents(spark, "/root/testdata/sf0.001")
      .select(explode(split(lower(trim($"text")), "\\s+")).as("w"))
      .filter(length($"w") > 0).distinct().as[String].collect()
    val adversarial = Seq("the", "other", "row", "rows", "throw", "thow",
      "erin", "stale", "alin", "thethe", "rowow", "x")
    (corpusWords ++ adversarial).foreach { w =>
      assert(greedy(w) == sequential(w),
        s"greedy and rank-ordered encodes diverge on '$w': " +
          s"${greedy(w)} vs ${sequential(w)}")
    }
  }

  test("rare pairs below minPairCount are never merged (no one-off memorization)") {
    val merges = Bpe.train(corpus, "doc_id", "text", nMerges = 1000)
    // every learned merge had support >= 2 in the sample; the singleton
    // words' unique pairs ("lower"'s r</w>) can only appear via support
    val df = Seq(Tuple1("qzj")).toDF("t")
    val toks = df.select(Bpe.tokens(df("t"), merges).as("k")).collect()(0).getSeq[String](0)
    assert(toks == Seq("q", "z", "j</w>"), s"unseen word must fall back to chars: $toks")
  }
}
