package graft.ext

import graft.SparkSpec
import graft.model.Weather
import graft.ops.{Conform, DdbUnwrap, Dedup}
import org.scalacheck.Gen

/** Property-based invariants (SURVEY.md §5): totality of the conform path on
  * arbitrary junk payloads, dedup idempotence, hash determinism. Generators
  * are sampled directly (the scalatest–scalacheck bridge artifact isn't in
  * the offline resolver), which keeps the same coverage shape: N random
  * cases per property, seeded by scalacheck's default RNG.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def forSamples[A](gen: Gen[A], n: Int)(f: A => Unit): Unit =
    Iterator.continually(gen.sample).flatten.take(n).foreach(f)

  private val junkString: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr, Gen.numStr,
    Gen.const(null: String), Gen.const(""), Gen.const("  "),
    Gen.const("not-a-number"), Gen.const("1e309"), Gen.const("-42.5"))

  test("conform is total: arbitrary junk strings cast-or-null, never throw") {
    forSamples(Gen.listOfN(12, junkString), n = 8) { values =>
      val df = values.map(Tuple1(_)).toDF("temp_c")
      val out = Conform.toContract(df, Weather.contract)
      assert(out.count() == values.size) // no row lost, no exception
      assert(out.schema == Weather.contract)
    }
  }

  test("dedup idempotence: f(f(x)) == f(x) on arbitrary keyed rows") {
    val rowsGen = Gen.listOfN(30, Gen.zip(Gen.choose(0, 5), Gen.choose(0, 100)))
    forSamples(rowsGen, n = 5) { rows =>
      val df = rows.toDF("k", "v")
      val once = Dedup.keepFirst(df, Seq("k"), Seq($"v".asc, $"k".asc))
      val twice = Dedup.keepFirst(once, Seq("k"), Seq($"v".asc, $"k".asc))
      assert(once.orderBy("k").collect().toSeq == twice.orderBy("k").collect().toSeq)
      assert(Dedup.duplicates(once, Seq("k")).isEmpty)
    }
  }

  test("minhash signature is deterministic and self-similarity is exact") {
    val shGen = Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty))
    forSamples(shGen, n = 50) { sh =>
      val a = MinHash.minhashSig(sh, 32)
      assert(a.toSeq == MinHash.minhashSig(sh, 32).toSeq)
      assert(a.forall(_ != Long.MaxValue)) // non-empty input fills every slot
    }
    assert(MinHash.minhashSig(Nil, 8).forall(_ == Long.MaxValue))
  }

  test("simhash of a permuted token bag is identical (order-free)") {
    forSamples(Gen.nonEmptyListOf(Gen.alphaNumStr), n = 50) { toks =>
      assert(SimHash.simhash64(toks) == SimHash.simhash64(scala.util.Random.shuffle(toks)))
    }
  }

  test("RollingHalo equals the naive window bitwise on random sparse timelines") {
    // Random bucket occupancies stress the shadow-pruning bound from every
    // side: empty days, single-row days, dense days, and frames that span
    // many buckets — any over-pruned halo or fold-order drift breaks
    // bitwise equality. Frame is small (7) so shadowing engages often.
    val dayGen = Gen.listOfN(14, Gen.choose(0, 12)) // rows per calendar day
    forSamples(dayGen, n = 4) { days =>
      var id = 0L
      val rows = days.zipWithIndex.flatMap { case (n, day) =>
        (1 to n).map { i =>
          id += 1
          (id, java.sql.Timestamp.valueOf(
            f"2024-07-${day + 1}%02d ${i % 24}%02d:00:00"),
            if (id % 2 == 0) "a" else "b", math.sin(id.toDouble) * 9)
        }
      }
      if (rows.nonEmpty) {
        val df = rows.toDF("event_id", "ts", "event_type", "value")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"event_type").orderBy($"ts", $"event_id")
          .rowsBetween(-7, -1)
        import org.apache.spark.sql.functions._
        def key(d: org.apache.spark.sql.DataFrame) = d
          .select($"event_id", $"mu", $"sigma", $"nprev")
          .as[(Long, Option[Double], Option[Double], Long)].collect()
          .map { case (i, mu, sg, np) =>
            i -> ((mu.map(java.lang.Double.doubleToLongBits),
              sg.map(java.lang.Double.doubleToLongBits), np)) }.toMap
        val naive = key(df
          .withColumn("mu", avg($"value").over(w))
          .withColumn("sigma", stddev_samp($"value").over(w))
          .withColumn("nprev", count($"value").over(w)))
        val halo = key(RollingHalo.precedingStats(
          df, "event_type", "ts", "event_id", "value", frame = 7))
        assert(naive == halo)
      }
    }
  }

  test("connected components match a union-find reference on random graphs") {
    val edgeGen = Gen.listOfN(30,
      Gen.zip(Gen.choose(0L, 19L), Gen.choose(0L, 19L)))
    forSamples(edgeGen, n = 5) { edges =>
      val real = edges.filter { case (a, b) => a != b }
      if (real.nonEmpty) {
        val got = Components.connectedComponents(real.toDF("src", "dst"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // union-find reference
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        real.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val expected = parent.keys.map(x => x -> find(x)).toMap
        assert(got == expected)
      }
    }
  }

  test("quantize reconstruction is bounded by scale/2 on random vectors") {
    val vecGen = Gen.listOfN(16, Gen.choose(-1000.0, 1000.0))
    forSamples(vecGen, n = 20) { v =>
      val df = Seq(Tuple1(v)).toDF("vec")
      val row = df.select(Quantize.quantize($"vec").as("z"))
        .select($"z.scale", Quantize.dequantize($"z.scale", $"z.q").as("dq"))
        .head()
      val scale = row.getDouble(0)
      val dq = row.getSeq[Double](1)
      v.zip(dq).foreach { case (a, b) =>
        assert(math.abs(a - b) <= scale / 2 + 1e-9, s"$a vs $b (scale $scale)")
      }
    }
  }

  test("intervalOverlap equals the theta join on random intervals and bin widths") {
    import org.apache.spark.sql.functions.col
    val ivGen = Gen.listOfN(25, Gen.zip(Gen.choose(0L, 60L), Gen.choose(0L, 15L)))
    forSamples(Gen.zip(ivGen, ivGen, Gen.choose(1L, 40L)), n = 4) {
      case (as, bs, w) =>
        val a = as.zipWithIndex.map { case ((lo, len), i) => (i.toLong, lo, lo + len) }
          .toDF("aid", "lo_a", "hi_a")
        val b = bs.zipWithIndex.map { case ((lo, len), i) => (i.toLong, lo, lo + len) }
          .toDF("bid", "lo_b", "hi_b")
        val got = graft.ops.RangeJoin.intervalOverlap(a, "lo_a", "hi_a", b, "lo_b", "hi_b", w)
          .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
        val theta = a.join(b, col("lo_a") <= col("hi_b") && col("lo_b") <= col("hi_a"))
          .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
        assert(got.length == theta.length, s"binWidth=$w: pair emitted 0 or >1 times")
        assert(got.toSet == theta.toSet, s"binWidth=$w")
    }
  }

  test("setsim prefix filter equals brute force on random token corpora") {
    import org.apache.spark.sql.functions._
    val vocab = Seq("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val docGen = Gen.chooseNum(2, 6).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)))
    forSamples(Gen.zip(Gen.listOfN(12, docGen), Gen.oneOf(0.4, 0.6, 0.8)), n = 4) {
      case (docLists, t) =>
        val docs = docLists.zipWithIndex
          .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toDF("doc_id", "text")
        val toks = docs.select($"doc_id".as("id"),
          array_distinct(TextAnalysis.tokens($"text")).as("tk"))
        val brute = toks.toDF("a", "ta").crossJoin(toks.toDF("b", "tb"))
          .filter($"a" < $"b")
          .withColumn("i", size(array_intersect($"ta", $"tb")))
          .withColumn("u", size($"ta") + size($"tb") - $"i")
          .filter($"i" > 0 && $"i" / $"u" >= t)
          .select("a", "b")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val fast = SetSimJoin.join(docs, "doc_id", "text", t)
          .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(fast == brute, s"threshold $t on $docLists")
    }
  }

  test("setsim matches brute force at rational thresholds on denominator-multiple sizes") {
    // Targets the prefix-bound rounding class: t = num/den with doc sizes at
    // multiples of den makes t·sz land on (or within one ulp of) whole
    // numbers, where an unslacked ceil over- or under-shoots the exact
    // ⌈t·sz⌉. Docs are mutation clusters of a shared base, so pair Jaccards
    // are rationals i/u sitting AT and just around the threshold — the
    // region a shortened prefix silently drops.
    import org.apache.spark.sql.functions._
    val vocab = (0 until 160).map(i => f"w$i%03d")
    val cases = for {
      den <- Gen.oneOf(7, 11, 13)
      num <- Gen.choose(den - 3, den - 1)
      mult <- Gen.oneOf(1, 3, 7) // sz = den, 3·den, 7·den (77 = the advice case)
      nMut <- Gen.choose(0, math.max(1, den - num + 2))
    } yield (num, den, den * mult, nMut)
    forSamples(cases, n = 12) { case (num, den, sz, nMut) =>
      val t = num.toDouble / den
      val base = vocab.take(sz)
      // cluster: base, plus variants replacing k tokens, plus a subset doc
      val docs = Seq(
        (0L, base),
        (1L, base.drop(nMut) ++ vocab.slice(sz, sz + nMut)),
        (2L, base.drop(1) ++ vocab.slice(sz + nMut, sz + nMut + 1)),
        (3L, base.take(math.max(1, sz - nMut)))
      ).map { case (i, ws) => (i, ws.mkString(" ")) }.toDF("doc_id", "text")
      val toks = docs.select($"doc_id".as("id"),
        array_distinct(TextAnalysis.tokens($"text")).as("tk"))
      val brute = toks.toDF("a", "ta").crossJoin(toks.toDF("b", "tb"))
        .filter($"a" < $"b")
        .withColumn("i", size(array_intersect($"ta", $"tb")))
        .withColumn("u", size($"ta") + size($"tb") - $"i")
        .filter($"i" > 0 && $"i" / $"u" >= t)
        .select("a", "b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val fast = SetSimJoin.join(docs, "doc_id", "text", t)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(fast == brute, s"t=$num/$den sz=$sz nMut=$nMut")
    }
  }

  test("edit join equals brute force on random strings straddling the pigeonhole bound") {
    // lengths 0..20 at maxDist 3, q 3: most strings sit BELOW (k+1)·q = 12,
    // exercising the short-bucket direct pass against the gram path
    val strGen = Gen.choose(0, 20).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    forSamples(Gen.listOfN(14, strGen), n = 4) { strs =>
      val df = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
      val maxDist = 3
      val got = EditJoin.join(df, "id", "s", maxDist)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val a = df.toDF("id_a", "s_a"); val b = df.toDF("id_b", "s_b")
      val brute = a.crossJoin(b).filter($"id_a" < $"id_b")
        .select($"id_a", $"id_b",
          org.apache.spark.sql.functions.levenshtein($"s_a", $"s_b").as("d"))
        .filter($"d" <= maxDist)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == brute, s"strings=$strs missing=${brute -- got} extra=${got -- brute}")
    }
  }

  test("ddb unwrap is total on arbitrary scalar tag maps and keeps every key") {
    val scalarGen: Gen[String] = Gen.oneOf(
      Gen.alphaNumStr.map(s => s"""{"S":"$s"}"""),
      Gen.choose(-1000000, 1000000).map(n => s"""{"N":"$n"}"""),
      Gen.oneOf(true, false).map(b => s"""{"BOOL":$b}"""))
    forSamples(Gen.listOfN(4, scalarGen), n = 50) { tags =>
      val fields = tags.zipWithIndex
        .map { case (tagged, i) => s""""k$i":$tagged""" }.mkString(",")
      val out = DdbUnwrap.unwrapJson(s"{$fields}")
      assert(out != null && out.startsWith("{"))
      tags.indices.foreach(i => assert(out.contains(s""""k$i":""")))
    }
  }

  test("dedupDelta ≡ full dedup on random corpora whose standing part is dup-free") {
    // Random vector populations with planted near-dup structure: base
    // concepts plus scaled copies (cosine exactly 1 to their base). The
    // corpus is what a prior full dedup kept — dup-free BY CONSTRUCTION at
    // the threshold — which is the documented precondition under which the
    // incremental form must reproduce the full run exactly.
    val dim = 16
    val vecGen: Gen[Array[Double]] =
      Gen.listOfN(dim, Gen.choose(-1.0, 1.0)).map(_.toArray)
    val popGen: Gen[Seq[(Long, Array[Double])]] = for {
      nBases <- Gen.choose(2, 5)
      bases <- Gen.listOfN(nBases, vecGen)
      copies <- Gen.listOfN(nBases, Gen.choose(0, 3))
      scales <- Gen.listOfN(12, Gen.choose(0.2, 3.0))
    } yield {
      val rows = bases.zip(copies).zipWithIndex.flatMap { case ((b, nc), i) =>
        (0 to nc).map(c => b.map(_ * scales((i * 4 + c) % 12)))
      }
      rows.zipWithIndex.map { case (v, i) => ((i + 1).toLong, v) }
    }
    forSamples(popGen, n = 6) { pop =>
      val df = pop.toDF("id", "v")
      val cells = SemDedup.gridCells(df, gridBits = 3, dim = dim)
      val full = SemDedup.dedup(cells, minCos = 0.999)
      val keptIds = full.filter(org.apache.spark.sql.functions.col("keep"))
        .select("vec_id").as[Long].collect().toSet
      // corpus = the survivors of the full run; delta = everything else
      val corpus = cells.filter($"id".isin(keptIds.toSeq: _*))
      val delta = cells.filter(!$"id".isin(keptIds.toSeq: _*))
      if (delta.count() > 0) {
        val incr = SemDedup.dedupDelta(corpus, delta, minCos = 0.999)
          .select("vec_id", "keep").as[(Long, Boolean)].collect().toMap
        // every delta row was dropped by the full run in favor of a kept
        // canonical that is still standing — the incremental run must agree
        assert(incr.values.forall(_ == false),
          s"incremental kept a vector the full run dropped: $incr")
        assert(incr.keySet == pop.map(_._1).toSet -- keptIds)
      }
    }
  }
}
