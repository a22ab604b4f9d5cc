package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the corpus-curation compositions (HybridSearch, hard-negative
  * mining, and the CurationBattery invariants the DuckDB hash oracle can't
  * express as cross-row properties). */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("rrf: fuses legs by reciprocal rank, ties to smaller id") {
    // leg1: a=1, b=2; leg2: b=1, c=2 →
    //   b = 1/62 + 1/61 (both legs), a = 1/61, c = 1/62 → order b, a, c
    val leg1 = Seq((10L, 1), (20L, 2)).toDF("id", "rank")
    val leg2 = Seq((20L, 1), (30L, 2)).toDF("id", "rank")
    val out = HybridSearch.rrf(Seq(leg1, leg2), limit = 10).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(20L, 10L, 30L))
    assert(out.map(_.getInt(2)).toSeq == Seq(1, 2, 3))
    val bScore = out.find(_.getLong(0) == 20L).get.getDouble(1)
    assert(math.abs(bScore - (1.0 / 62 + 1.0 / 61)) < 2e-6)
  }

  test("rrf: doc present in one leg only still scores; equal scores tie by id") {
    // both docs rank 1 in exactly one leg → identical scores, smaller id first
    val leg1 = Seq((5L, 1)).toDF("id", "rank")
    val leg2 = Seq((3L, 1)).toDF("id", "rank")
    val out = HybridSearch.rrf(Seq(leg1, leg2), limit = 2).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(3L, 5L))
    assert(out(0).getDouble(1) == out(1).getDouble(1))
  }

  test("rrf/rankLeg: refuse non-integral id columns instead of null-fusing them") {
    // a string id would cast("long") to NULL, silently merging every
    // unparseable id into one bogus group — the guard turns that into an
    // immediate, named error
    val strLeg = Seq(("a", 1), ("b", 2)).toDF("id", "rank")
    val e1 = intercept[IllegalArgumentException] {
      HybridSearch.rrf(Seq(strLeg))
    }
    assert(e1.getMessage.contains("integral"))
    val strScored = Seq(("a", 0.9)).toDF("doc_id", "score")
    val e2 = intercept[IllegalArgumentException] {
      HybridSearch.rankLeg(strScored, "doc_id", "score", depth = 3)
    }
    assert(e2.getMessage.contains("integral"))
    // int ids (not just long) remain accepted — lossless widening
    val intLeg = Seq((1, 1), (2, 2)).toDF("id", "rank")
    assert(HybridSearch.rrf(Seq(intLeg), limit = 2).collect().length == 2)
    // the guard covers EVERY leg: a string-id leg hiding behind an
    // integral head leg is the exact silent-null-fusion the guard refuses
    val e3 = intercept[IllegalArgumentException] {
      HybridSearch.rrf(Seq(intLeg, strLeg))
    }
    assert(e3.getMessage.contains("leg 1"))
  }

  test("rankLeg: truncates to depth with positional 1-based ranks") {
    val scored = Seq((1L, 0.9), (2L, 0.7), (3L, 0.8), (4L, 0.1))
      .toDF("doc_id", "score")
    val out = HybridSearch.rankLeg(scored, "doc_id", "score", depth = 3).collect()
    assert(out.map(r => (r.getLong(0), r.getInt(1))).toSeq ==
      Seq((1L, 1), (3L, 2), (2L, 3)))
  }

  test("hardNegatives: never returns a same-label neighbor; ranks dense, cos descending") {
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    val emb = Seq(
      (0L, v(1, 0, 0), 1), (1L, v(0.99, 0.1, 0), 1), // same label as query 0
      (2L, v(0.9, 0.3, 0), 2), (3L, v(0.5, 0.8, 0), 2),
      (4L, v(0, 1, 0), 3), (5L, v(-1, 0, 0), 3)
    ).toDF("id", "vec", "label")
    val out = Similarity.hardNegatives(emb.filter($"id" === 0L), emb, k = 3)
      .orderBy($"rank").collect()
    // id 1 (cos ≈ 0.995, highest overall) is excluded — same label
    assert(!out.map(_.getLong(1)).contains(1L))
    assert(out.map(_.getInt(3)).toSeq == Seq(1, 2, 3))
    val cos = out.map(_.getDouble(2)).toSeq
    assert(cos == cos.sorted.reverse)
    assert(out.head.getLong(1) == 2L) // nearest different-label vector
  }

  test("leakage split: a cluster never straddles splits; near-dup pairs co-assigned") {
    val split = graft.SparkEntry.queries("q_leakage_split")(spark, sf).cache()
    val straddling = split.groupBy($"cluster_id")
      .agg(countDistinct($"split").as("n"))
      .filter($"n" > 1)
    assert(straddling.count() == 0, "cluster assigned to >1 split")
    // the no-leakage contract, stated directly on the candidate pairs
    val docs = graft.sources.Tables.documents(spark, sf).filter($"doc_id" < 600)
    val pairs = SetSimJoin.join(docs, "doc_id", "text", 0.8)
    val s1 = split.select($"doc_id".as("doc_a"), $"split".as("split_a"))
    val s2 = split.select($"doc_id".as("doc_b"), $"split".as("split_b"))
    val crossed = pairs.join(s1, "doc_a").join(s2, "doc_b")
      .filter($"split_a" =!= $"split_b")
    assert(crossed.count() == 0, "near-dup pair straddles the split boundary")
    split.unpersist()
  }

  test("embedding drift: matches an independently-computed conditional mean") {
    val out = graft.SparkEntry.queries("q_embedding_drift")(spark, sf)
    // recompute through avg() filters (different aggregation path) and the
    // raw parquet — the battery's sum/count quotients must agree
    val ind = graft.sources.Tables.embeddings(spark, sf)
      .select($"label", ($"vec_id" % 2 === 0).as("even"),
        posexplode(expr(
          "transform(slice(embedding, 1, 8), x -> floor(CAST(x AS DOUBLE) * 8.0D + 0.5D))"))
          .as(Seq("pos", "qv")))
      .groupBy($"label", ($"pos" + 1).cast("int").as("dim"))
      .agg(avg(when($"even", $"qv")).as("ie"), avg(when(!$"even", $"qv")).as("io"))
    val joined = out.join(ind, Seq("label", "dim"))
      .select(abs($"mean_even" - $"ie").as("de"), abs($"mean_odd" - $"io").as("do"))
      .agg(max($"de"), max($"do")).head()
    assert(joined.getDouble(0) < 1e-6 && joined.getDouble(1) < 1e-6)
    // every label carries exactly dims 1..8
    val dims = out.groupBy($"label").agg(collect_set($"dim").as("ds"))
      .select($"ds").as[Seq[Int]].collect()
    assert(dims.nonEmpty && dims.forall(_.sorted == (1 to 8)))
  }

  test("split ingest: zero leakage — no assigned delta doc near-dups a foreign split") {
    val ingest = graft.SparkEntry.queries("q_split_ingest")(spark, sf).cache()
    val splits = ingest.select($"split").distinct().as[String].collect().toSet
    assert(splits.subsetOf(Set("train", "val", "test", "quarantine")))
    // the contract, stated directly on the candidate pairs: a delta doc
    // that RECEIVED a split must not be Jaccard-≥0.8-linked to a corpus
    // doc whose (corpus-rule) split differs — bridges must be quarantined.
    // Corpus splits are recomputed here by the entry's own corpus rule
    // (components over corpus-only pairs + the md5-bucket assignment).
    val docs = graft.sources.Tables.documents(spark, sf)
    val corpus = docs.filter($"doc_id" < 400)
    val delta = docs.filter($"doc_id" >= 400 && $"doc_id" < 500)
    val cross = SetSimJoin.joinDelta(corpus, delta, "doc_id", "text", 0.8)
    val corpusPairs = SetSimJoin.join(corpus, "doc_id", "text", 0.8)
    val comp = Components.connectedComponents(corpusPairs, "doc_a", "doc_b")
      .withColumnRenamed("id", "doc_id")
    val bucket = conv(substring(md5(concat(lit("split:"),
      coalesce($"component", $"doc_id").cast("long").cast("string"))), 1, 2),
      16, 10).cast("int")
    val corpusSplit = corpus.select($"doc_id")
      .join(comp, Seq("doc_id"), "left")
      .select($"doc_id".as("corpus_id"),
        when(bucket < 204, "train").when(bucket < 230, "val").otherwise("test")
          .as("corpus_split"))
    val verdict = cross
      .join(ingest.filter($"split" =!= "quarantine")
        .select($"doc_id".as("delta_id"), $"split".as("delta_split")), "delta_id")
      .join(corpusSplit, "corpus_id")
      .filter($"delta_split" =!= $"corpus_split")
    assert(verdict.count() == 0, "assigned delta doc near-dups a foreign-split corpus doc")
    // and at least one inherited assignment actually exercised the path
    assert(ingest.filter($"split" =!= "quarantine").count() > 0)
    ingest.unpersist()
  }

  test("ndcg eval: ranks dense, rel graded, ndcg in (0, 1], ndcg@1 matches closed form") {
    val out = graft.SparkEntry.queries("q_ndcg_eval")(spark, sf)
      .orderBy($"rank").collect()
    assert(out.map(_.getInt(0)).toSeq == (1 to 10))
    assert(out.map(_.getLong(1)).distinct.length == 10)
    assert(out.forall(r => r.getInt(2) >= 0 && r.getInt(2) <= 3))
    // dcg@k ≤ idcg@k for every k — the ideal ranking is a maximizer
    assert(out.forall(r => r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0 + 1e-9))
    // ndcg@1 = (2^rel₁ − 1) / (2^max_rel − 1): one division, checkable by hand
    val docs = graft.sources.Tables.documents(spark, sf)
    val maxRel = docs.select(
        size(array_intersect(array_distinct(TextAnalysis.tokens($"text")),
          array(lit("spark"), lit("query"), lit("data")))).as("rel"))
      .agg(max($"rel")).head().getInt(0)
    val expected = (math.pow(2, out.head.getInt(2)) - 1) / (math.pow(2, maxRel) - 1)
    assert(math.abs(out.head.getDouble(3) - expected) < 1e-6)
  }

  test("dsir weights: top-20 non-increasing; rank-1 weight matches a from-scratch recompute") {
    val out = graft.SparkEntry.queries("q_dsir_weights")(spark, sf)
      .orderBy($"rank").collect()
    assert(out.map(_.getInt(0)).toSeq == (1 to 20))
    val ws = out.map(_.getDouble(3)).toSeq
    assert(ws == ws.sorted.reverse)
    // independent recompute of the winner's weight: collect the (tiny)
    // bucket tables and fold the formula in plain Scala
    val docs = graft.sources.Tables.documents(spark, sf)
    val toks = docs.select($"doc_id", $"lang",
      explode(TextAnalysis.tokens($"text")).as("w"))
      .withColumn("b",
        pmod(conv(substring(md5($"w"), 1, 2), 16, 10).cast("int"), lit(64)))
    val tgt = toks.filter($"lang" === "en").groupBy($"b").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val raw = toks.groupBy($"b").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val (tt, tr) = (tgt.values.sum.toDouble, raw.values.sum.toDouble)
    val winner = out.head.getLong(1)
    val winnerBuckets = toks.filter($"doc_id" === winner)
      .select($"b").as[Int].collect()
    val expected = winnerBuckets.map { b =>
      math.log((tgt.getOrElse(b, 0L) + 1.0) / (tt + 64.0)) -
        math.log((raw(b) + 1.0) / (tr + 64.0))
    }.sum
    assert(math.abs(out.head.getDouble(3) - expected) < 1e-4)
  }

  test("cross-modal dedup: phash twins co-clustered; image evidence merges text-only clusters") {
    val out = graft.SparkEntry.queries("q_cross_modal_dedup")(spark, sf).cache()
    val canon = out.select($"doc_id", $"canonical")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every planted mod-32 image twin pair (i, i+32) with i < 32 shares a
    // component — the image leg's Hamming-0 edge guarantees the link
    (0L until 32L).foreach { i =>
      assert(canon.get(i).isEmpty == canon.get(i + 32).isEmpty)
      canon.get(i).foreach(c => assert(canon(i + 32) == c, s"twin ($i, ${i + 32}) split"))
    }
    // and the fusion is not vacuous: at least one component holds docs that
    // the TEXT leg alone would keep apart (the image bridge did real work)
    val docs = graft.sources.Tables.documents(spark, sf)
    val txtOnly = Components.connectedComponents(
        SetSimJoin.join(docs.filter($"doc_id" < 400), "doc_id", "text", 0.8),
        "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bridged = canon.keys.exists { id =>
      val c = canon(id)
      txtOnly.getOrElse(id, id) != txtOnly.getOrElse(c, c)
    }
    assert(bridged, "no component bridges two text-only clusters")
    out.unpersist()
  }

  test("tokenizer fertility: every word yields >= 1 subword, <= its character count + 1") {
    val out = graft.SparkEntry.queries("q_tokenizer_fertility")(spark, sf).collect()
    val docs = graft.sources.Tables.documents(spark, sf)
    assert(out.map(_.getLong(1)).sum == docs.count())
    out.foreach { r =>
      val (nWords, nSub) = (r.getLong(2), r.getLong(3))
      assert(nSub >= nWords, "a word encoded to zero subwords")
      assert(r.getDouble(4) >= 1.0, "fertility below 1")
      assert(r.getDouble(5) > 0.0)
    }
  }

  test("t-closeness: t in [0,1]; winner's EMD recomputes from raw distributions") {
    val out = graft.SparkEntry.queries("q_t_closeness")(spark, sf).collect()
    assert(out.length == 20)
    val ts = out.map(_.getDouble(3)).toSeq
    assert(ts == ts.sorted.reverse, "report not descending by risk")
    assert(ts.forall(t => t >= 0.0 && t <= 1.0 + 1e-9))
    // from-scratch ordered-EMD for the riskiest group
    val rows = graft.sources.Tables.customer(spark, sf)
      .select($"c_nationkey", $"c_mktsegment",
        floor($"c_acctbal" / 1000).cast("long").as("b"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val buckets = rows.map(_._3).distinct.sorted
    val (wn, ws) = (out.head.getInt(0), out.head.getString(1))
    val grp = rows.filter(r => r._1 == wn && r._2 == ws)
    assert(grp.length == out.head.getLong(2))
    def cdf(xs: Array[Long]) = buckets.map(b => xs.count(_ <= b).toDouble / xs.length)
    val emd = cdf(grp.map(_._3)).zip(cdf(rows.map(_._3)))
      .map { case (p, q) => math.abs(p - q) }.sum / (buckets.length - 1)
    assert(math.abs(out.head.getDouble(3) - emd) < 1e-6)
  }

  test("l-diversity: histogram partitions the QI groups and the customer rows") {
    val out = graft.SparkEntry.queries("q_l_diversity")(spark, sf).collect()
    val cust = graft.sources.Tables.customer(spark, sf)
    assert(out.map(_.getLong(2)).sum == cust.count())
    assert(out.map(_.getLong(1)).sum ==
      cust.select($"c_nationkey", $"c_mktsegment").distinct().count())
    assert(out.forall(_.getLong(0) >= 1))
  }

  test("mrr/map eval: metric identities hold against a from-scratch recompute of the leg") {
    val out = graft.SparkEntry.queries("q_mrr_map_eval")(spark, sf).head()
    val (mrr, map10, p10, r10) =
      (out.getDouble(0), out.getDouble(1), out.getDouble(2), out.getDouble(3))
    assert(mrr >= 0 && mrr <= 1 && map10 >= 0 && map10 <= 1 + 1e-9)
    assert(p10 >= 0 && p10 <= 1 && r10 >= 0 && r10 <= 1)
    // independent recompute: rerun the BM25 leg, label each hit, fold the
    // metric definitions in plain Scala
    val docs = graft.sources.Tables.documents(spark, sf)
    val terms = Seq("spark", "query", "data")
    val relSet = docs.select($"doc_id",
        array_intersect(array_distinct(TextAnalysis.tokens($"text")),
          array(terms.map(lit): _*)).as("hit"))
      .filter(size($"hit") > 0).select($"doc_id").as[Long].collect().toSet
    val leg = HybridSearch.rankLeg(
        TextIndex.searchBm25(TextIndex.buildPostings(docs, "doc_id", "text"),
          terms, 10), "doc_id", "bm25", 10)
      .orderBy($"rank").select($"doc_id").as[Long].collect()
    val hits = leg.map(relSet)
    val cumHits = hits.scanLeft(0)((a, h) => a + (if (h) 1 else 0)).tail
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val firstRel = hits.indexWhere(identity)
    assert(mrr == r6(if (firstRel < 0) 0.0 else 1.0 / (firstRel + 1)))
    val ap = hits.zipWithIndex.collect { case (true, i) =>
      cumHits(i).toDouble / (i + 1) }.sum / math.min(relSet.size, 10)
    assert(math.abs(map10 - ap) < 1e-6)
    assert(p10 == r6(cumHits.last / 10.0))
    assert(math.abs(r10 - cumHits.last.toDouble / relSet.size) < 1e-6)
  }

  test("mmr rerank: picks drawn from the top-20 pool; every pick maximizes the MMR score") {
    val out = graft.SparkEntry.queries("q_mmr_rerank")(spark, sf)
      .orderBy($"rank").collect()
    assert(out.map(_.getInt(0)).toSeq == (1 to 10))
    val picks = out.map(r => r.getLong(1) -> r.getDouble(2))
    assert(picks.map(_._1).distinct.length == 10)
    // independent recompute: collect the raw embeddings, rebuild the pool
    // and pairwise cosines in plain Scala, and check the greedy invariant —
    // at each step the chosen doc's 0.7·cos − 0.3·maxSimToPicked beats (or
    // ties with a smaller id than) every other unpicked pool member's
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val r = dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val qv = vecs(0L)
    val pool = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(qv, v)) }
      .sortBy { case (id, c) => (-c, id) }.take(20).toMap
    assert(picks.forall { case (id, c) => math.abs(pool(id) - c) < 1e-9 })
    for (i <- 1 until picks.length) {
      val chosen = picks.take(i).map(_._1)
      def score(id: Long) =
        0.7 * pool(id) - 0.3 * chosen.map(p => cos(vecs(id), vecs(p))).max
      val next = picks(i)._1
      val rivals = pool.keys.filterNot(chosen.contains(_)).filter(_ != next)
      assert(rivals.forall(r => score(r) < score(next) ||
        (score(r) == score(next) && r > next)),
        s"pick ${i + 1} ($next) is not the MMR argmax")
    }
  }

  test("semantic outliers: 20 most-isolated ascending; winner's nn_cos recomputes exactly") {
    val out = graft.SparkEntry.queries("q_semantic_outliers")(spark, sf)
      .orderBy($"nn_cos", $"vec_id").collect()
    assert(out.length == 20)
    assert(out.forall(_.getLong(0) < 500))
    val cs = out.map(_.getDouble(1)).toSeq
    assert(cs == cs.sorted, "report not ascending by isolation")
    // from-scratch nearest-neighbor for the most isolated vector
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .filter($"vec_id" < 500).select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val r = dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val winner = out.head.getLong(0)
    val nn = vecs.collect { case (id, v) if id != winner => cos(vecs(winner), v) }.max
    assert(math.abs(nn - out.head.getDouble(1)) < 1e-9)
    // and no vector outside the report is MORE isolated than the cutoff
    val cutoff = cs.last
    val worst = vecs.keys.filterNot(out.map(_.getLong(0)).contains(_)).map { id =>
      vecs.collect { case (o, v) if o != id => cos(vecs(id), v) }.max
    }.min
    assert(worst >= cutoff, "a more-isolated vector was left out of the report")
  }

  test("pretrain pipeline: yields are monotone under each successive gate") {
    val out = graft.SparkEntry.queries("q_pretrain_pipeline")(spark, sf).collect()
    val kept = out.map(_.getLong(1)).sum
    val docs = graft.sources.Tables.documents(spark, sf)
      .filter($"doc_id" >= 10 && $"doc_id" < 600)
      .withColumn("toks", TextAnalysis.tokens($"text"))
    val quality = docs.filter(length($"text") >= 100 && size($"toks") >= 20)
    val nQuality = quality.count()
    val nExact = quality.select(md5($"text")).distinct().count()
    // quality gate ≥ exact-dedup survivors ≥ final yield; tokens consistent
    assert(nQuality >= nExact && nExact >= kept && kept > 0)
    val langs = docs.select($"lang").distinct().as[String].collect().toSet
    assert(out.map(_.getString(0)).forall(langs))
  }

  test("quality classifier: learns a separable vocabulary and generalizes to held-out docs") {
    // positives speak {good, clean, prose}, negatives {spam, junk, noise};
    // train on ids % 5 != 0, eval held-out — a learned filter must get every
    // held-out doc right (the signal is fully separable), and the prior-only
    // score of a zero-token doc must equal ln((nPos+1)/(nNeg+1)).
    val docs = (0L until 100L).map { i =>
      val pos = i % 2 == 0
      val words = if (pos) Seq("good", "clean", "prose") else Seq("spam", "junk", "noise")
      (i, Seq.tabulate(5)(k => words((i + k).toInt % 3)), pos, i % 5 != 0)
    }.toDF("id", "toks", "label", "is_train")
    val out = QualityFilter.scores(docs, "id", "toks", "label", "is_train")
      .join(docs, Seq("id")).filter(!$"is_train")
      .select($"label", $"score" > 0).collect()
    assert(out.nonEmpty && out.forall(r => r.getBoolean(0) == r.getBoolean(1)))

    val lone = Seq((0L, Seq.empty[String], true, false),
      (1L, Seq("good"), true, true), (2L, Seq("spam"), false, true),
      (3L, Seq("spam"), false, true)).toDF("id", "toks", "label", "is_train")
    val prior = QualityFilter.scores(lone, "id", "toks", "label", "is_train")
      .filter($"id" === 0L).head().getDouble(1)
    assert(math.abs(prior - math.log(2.0 / 3.0)) < 1e-12)
  }

  test("quality select: exactly the per-language greedy prefix under the token budget") {
    val out = graft.SparkEntry.queries("q_quality_select")(spark, sf).collect()
      .map(r => (r.getString(1), r.getLong(0))) // (lang, doc_id)
    // from-scratch recompute: rank held-out docs by (round-6 score desc, id)
    // per language and take the maximal prefix with cumulative tokens <= 600
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"lang", $"n_chars", TextAnalysis.tokens($"text").as("toks"))
      .withColumn("label", size($"toks").between(30, 400) && $"n_chars" >= 150)
      .withColumn("is_train", pmod($"doc_id", lit(5)) =!= 0)
    val cand = docs.filter(!$"is_train")
      .join(QualityFilter.scores(docs, "doc_id", "toks", "label", "is_train"), Seq("doc_id"))
      .select($"lang", $"doc_id", size($"toks").cast("long").as("n"), round($"score", 6).as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // note .toSeq before flatMap: flatMapping a Map with (lang, id) results
    // would rebuild a Map keyed by lang and keep one doc per language
    val expected = cand.groupBy(_._1).toSeq.flatMap { case (lang, rows) =>
      var cum = 0L
      rows.sortBy(r => (-r._4, r._2)).takeWhile { r => cum += r._3; cum <= 600L }
        .map(r => (lang, r._2)).toSeq
    }.toSet
    assert(out.nonEmpty && out.toSet == expected)
  }

  test("erasure sweep: propagates through a transitive twin chain, spares the rest") {
    // doc 0 is requested; 40-token windows shifted by 4 make 0–1 and 1–2
    // Jaccard 36/44 ≈ 0.82 pairs while 0–2 is only 32/48 ≈ 0.67 — so doc 2
    // erases ONLY via transitivity; 10/11 form an unrequested twin pair and
    // survive; 20 is a singleton and survives.
    def win(pfx: String, from: Int) = (from until from + 40).map(i => s"$pfx$i").mkString(" ")
    val docs = Seq(
      (0L, win("t", 0)), (1L, win("t", 4)), (2L, win("t", 8)),
      (10L, win("u", 0)), (11L, win("u", 4)),
      (20L, win("z", 0))
    ).toDF("doc_id", "text")
    val out = Erasure.sweep(docs, "doc_id", "text", $"doc_id" === 0L)
      .select($"doc_id", $"erased").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(Seq(0L, 1L, 2L).forall(out(_)))
    assert(Seq(10L, 11L, 20L).forall(!out(_)))
    // and the erased set is cluster-closed: 10 and 11 share a fate
    assert(out(10L) == out(11L))
  }

  test("keep-best survivorship: the survivor is a longest member of its cluster") {
    val out = graft.SparkEntry.queries("q_neardup_keep_best")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty) // the sf0.001 corpus plants near-dup groups
    // recompute clusters from the candidate pairs and check, per reported
    // cluster: membership count matches, and the keeper attains the
    // cluster's max length with the smallest id among maxima
    val docs = graft.sources.Tables.documents(spark, sf).filter($"doc_id" < 600)
    val pairs = SetSimJoin.join(docs, "doc_id", "text", 0.8)
    val comp = Components.connectedComponents(pairs, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val chars = docs.select($"doc_id".as[Long], $"n_chars".as[Long]).collect().toMap
    val clusters = chars.keys.groupBy(id => comp.getOrElse(id, id))
    for ((cid, keepId, n, members) <- out) {
      val mem = clusters(cid).toSeq
      assert(mem.size.toLong == members && mem.size >= 2)
      val best = mem.map(id => (-chars(id), id)).min._2
      assert(keepId == best && n == chars(keepId))
    }
    // and every multi-member cluster is reported exactly once
    assert(out.map(_._1).toSet == clusters.filter(_._2.size >= 2).keySet)
  }

  test("uncertainty sample: each pick is a true argmin of |score| within its language") {
    val out = graft.SparkEntry.queries("q_uncertainty_sample")(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    // from-scratch: recompute held-out scores and check every ranked pick
    // dominates the rest of its language under (|round-6 score| asc, id)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"lang", $"n_chars",
        TextAnalysis.tokens($"text").as("toks"))
      .withColumn("label", size($"toks").between(30, 400) && $"n_chars" >= 150)
      .withColumn("is_train", pmod($"doc_id", lit(5)) =!= 0)
    val byLang = QualityFilter.scores(docs, "doc_id", "toks", "label", "is_train")
      .join(docs.filter(!$"is_train"), Seq("doc_id"))
      .select($"lang", $"doc_id", round($"score", 6).as[Double].as("q"))
      .as[(String, Long, Double)].collect()
      .groupBy(_._1).map { case (l, a) =>
        l -> a.map(t => (math.abs(t._3), t._2)).sorted.take(5).toSeq }
    for ((lang, grp) <- out.groupBy(_._1)) {
      val expect = byLang(lang)
      val got = grp.sortBy(_._2).map(p => (p._4, p._3)).toSeq
      assert(got == expect, s"$lang: $got != $expect")
    }
    // ranks are 1..k dense per language
    assert(out.groupBy(_._1).values.forall(g =>
      g.map(_._2).sorted.toSeq == (1 to g.length)))
  }

  test("calibration: bins partition the held-out slice; rates recompute from raw scores") {
    val out = graft.SparkEntry.queries("q_quality_calibration")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    // bins are distinct, within the clamp, and cover the whole held-out slice
    assert(out.map(_._1).distinct.length == out.length)
    assert(out.forall { case (b, _, _, _) => b >= -8 && b <= 8 })
    val heldOut = spark.read.parquet(s"$sf/documents.parquet")
      .filter(pmod($"doc_id", lit(5)) === 0).count()
    assert(out.map(_._2).sum == heldOut)
    // each bin's positive rate is internally consistent and a RATE
    assert(out.forall { case (_, n, p, r) =>
      p <= n && math.abs(r - p.toDouble / n) < 5e-5 })
    // calibration sanity: the most-confident negative bin has a lower
    // positive rate than the most-confident positive bin
    val byBin = out.sortBy(_._1)
    assert(byBin.head._4 <= byBin.last._4)
  }

  test("corpus diff: counts match direct slice arithmetic") {
    val out = graft.SparkEntry.queries("q_corpus_diff")(spark, sf)
      .agg(sum($"n_added"), sum($"n_removed"), sum($"n_changed"), sum($"n_unchanged"))
      .head()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def n(p: org.apache.spark.sql.Column) = docs.filter(p).count()
    val inOld = pmod($"doc_id", lit(11)) =!= 0
    val inNew = pmod($"doc_id", lit(17)) =!= 0
    val staled = pmod($"doc_id", lit(13)) === 0
    assert(out.getLong(0) == n(!inOld && inNew))   // added
    assert(out.getLong(1) == n(inOld && !inNew))   // removed
    assert(out.getLong(2) == n(inOld && inNew && staled))
    assert(out.getLong(3) == n(inOld && inNew && !staled))
  }
}
