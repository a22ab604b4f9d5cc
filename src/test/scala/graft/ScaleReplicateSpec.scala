package graft

import org.apache.spark.sql.functions._

/** The scaling-curve replicator must multiply DATA without multiplying
  * (or destroying) STRUCTURE — these are the invariants that make a
  * bench timing at the derived scale interpretable as "same workload,
  * N× the rows". */
class ScaleReplicateSpec extends SparkSpec {
  import spark.implicits._

  private val src = "/root/testdata/sf0.001"
  private lazy val out = {
    val dir = java.nio.file.Files.createTempDirectory("graft-scale-spec").toString + "/sf3x"
    ScaleReplicate.run(spark, src, dir, 3)
    dir
  }

  test("row counts: scaled tables x3, dims unchanged, replica 0 intact") {
    def n(d: String, t: String) = spark.read.parquet(s"$d/$t.parquet").count()
    Seq("customer", "supplier", "part", "orders", "lineitem", "events",
      "documents", "embeddings").foreach { t =>
      assert(n(out, t) == 3 * n(src, t), s"$t must triple")
    }
    Seq("region", "nation").foreach(t => assert(n(out, t) == n(src, t), s"$t is a dim"))
    // replica 0 is byte-identical source rows: same lineitem aggregate
    val a = sources.Tables.lineitem(spark, src).agg(sum($"l_quantity")).head.getDouble(0)
    val b = sources.Tables.lineitem(spark, out).filter($"l_orderkey" < 1000000000000L)
      .agg(sum($"l_quantity")).head.getDouble(0)
    assert(a == b, "replica 0 must be the untouched source")
  }

  test("referential integrity holds within every replica: join cardinality x3") {
    val srcJoin = sources.Tables.lineitem(spark, src)
      .join(sources.Tables.orders(spark, src), $"l_orderkey" === $"o_orderkey").count()
    val outJoin = sources.Tables.lineitem(spark, out)
      .join(sources.Tables.orders(spark, out), $"l_orderkey" === $"o_orderkey").count()
    assert(outJoin == 3 * srcJoin,
      "every lineitem must still find its order, and ONLY its own replica's")
  }

  test("embeddings: within-replica geometry exact, cross-replica cosines scrambled") {
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.zip(b).foreach { case (x, y) => dot += x * y; na += x * x; nb += y * y }
      dot / math.sqrt(na * nb)
    }
    val srcV = sources.Tables.embeddings(spark, src).filter($"vec_id" < 40)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect().toMap
    val outV = sources.Tables.embeddings(spark, out)
      .filter($"vec_id" % 1000000000000L < 40)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect().toMap
    val ids = srcV.keys.toSeq.sorted.take(10)
    // a ±1 diagonal transform preserves ALL pairwise cosines exactly
    for (k <- 1 to 2; i <- ids; j <- ids if i < j) {
      val (a, b) = (outV(i + k * 1000000000000L), outV(j + k * 1000000000000L))
      assert(math.abs(cos(a, b) - cos(srcV(i), srcV(j))) < 1e-6,
        s"within-replica-$k cosine must equal the source's for ($i,$j)")
    }
    // cross-replica self-cosines must fall far below every dup threshold
    val crossCos = ids.map(i => math.abs(cos(srcV(i), outV(i + 1000000000000L))))
    assert(crossCos.count(_ < 0.5) >= 8,
      s"sign-flip must scramble cross-replica cosines, got $crossCos")
  }

  test("documents: token renaming is bijective within a replica, disjoint across") {
    val outDocs = sources.Tables.documents(spark, out)
    def tokens(repl: Int): Set[String] = outDocs
      .filter($"doc_id" >= repl * 1000000000000L &&
        $"doc_id" < (repl + 1) * 1000000000000L)
      .select(explode(split($"text", "\\s+")).as("w")).filter(length($"w") > 0)
      .distinct().as[String].collect().toSet
    val (t0, t1, t2) = (tokens(0), tokens(1), tokens(2))
    assert(t0.intersect(t1).isEmpty && t1.intersect(t2).isEmpty && t0.intersect(t2).isEmpty,
      "token alphabets must be disjoint across replicas (no cross-replica dup pairs)")
    assert(t1.size == t0.size && t2.size == t0.size,
      "renaming must be a bijection: same vocabulary size per replica")
    // n_chars stays consistent with the renamed text
    val bad = outDocs.filter(length($"text").cast("long") =!= $"n_chars").count()
    assert(bad == 0, "n_chars must track the transformed text")
  }

  test("near-dup mode: a controlled twin fraction lands in a Jaccard band, deterministically; the rest stay disjoint") {
    // VERDICT r17 item 5: exact twins overfeed near-dup admission gates
    // (quadratic candidate pairs), disjoint twins starve them — the
    // near-dup mode must yield ~neardupRate of twins as true near-dups
    // (token Jaccard in a band below 1.0) and leave the rest
    // alphabet-disjoint, all reproducible bit-for-bit.
    val Off = 1000000000000L
    val base = java.nio.file.Files.createTempDirectory("graft-scale-nd").toString
    val dirA = s"$base/a"; val dirB = s"$base/b"
    ScaleReplicate.run(spark, src, dirA, 3, neardupRate = 0.3, mutationRate = 0.05)
    ScaleReplicate.run(spark, src, dirB, 3, neardupRate = 0.3, mutationRate = 0.05)

    // scaled row counts and replica-0 intactness hold in this mode too
    assert(spark.read.parquet(s"$dirA/documents.parquet").count() ==
      3 * spark.read.parquet(s"$src/documents.parquet").count())
    val docs = sources.Tables.documents(spark, dirA)
      .select($"doc_id".as[Long], $"text".as[String]).collect().toMap
    val srcDocs = sources.Tables.documents(spark, src)
      .select($"doc_id".as[Long], $"text".as[String]).collect().toMap
    val origIds = srcDocs.keys.toSeq.sorted
    assert(origIds.forall(i => docs(i) == srcDocs(i)), "replica 0 must stay untouched")

    // token-set Jaccard of every twin against its origin: bimodal by
    // construction — near twins high (most tokens survive the 5% edit),
    // distinct twins exactly 0 (disjoint alphabets)
    def toks(s: String): Set[String] = s.split("\\s+").filter(_.nonEmpty).toSet
    val jac = for (k <- 1 to 2; i <- origIds) yield {
      val (a, b) = (toks(srcDocs(i)), toks(docs(i + k * Off)))
      a.intersect(b).size.toDouble / a.union(b).size
    }
    val near = jac.filter(_ > 0.4)
    val frac = near.size.toDouble / jac.size
    assert(frac > 0.15 && frac < 0.45,
      s"near-twin fraction $frac drifted from neardupRate 0.3 (n=${jac.size})")
    assert(jac.filterNot(_ > 0.4).forall(_ == 0.0),
      "non-near twins must stay alphabet-disjoint (Jaccard 0)")
    // near twins are NEAR dups, never exact copies: the forced edit
    // guarantees a band STRICTLY below 1.0 even for short docs whose
    // independent per-token draws all miss
    assert(near.forall(_ < 1.0),
      s"exact-copy near twins: ${near.count(_ == 1.0)} of ${near.size}")
    assert(near.forall(_ > 0.5), s"near band floor broke: ${near.min}")

    // embeddings: the same controlled split — near twins cosine ≈ 1,
    // scrambled twins far below every dup threshold
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.zip(b).foreach { case (x, y) => dot += x * y; na += x * x; nb += y * y }
      dot / math.sqrt(na * nb)
    }
    val srcV = sources.Tables.embeddings(spark, src)
      .select($"vec_id".as[Long], $"embedding".as[Seq[Float]]).collect().toMap
    val outV = sources.Tables.embeddings(spark, dirA)
      .select($"vec_id".as[Long], $"embedding".as[Seq[Float]]).collect().toMap
    val vids = srcV.keys.toSeq.sorted.take(200)
    val cosines = for (k <- 1 to 2; i <- vids) yield cos(srcV(i), outV(i + k * Off))
    val nearV = cosines.count(_ > 0.95)
    val fracV = nearV.toDouble / cosines.size
    assert(fracV > 0.15 && fracV < 0.45, s"near embedding fraction $fracV vs rate 0.3")
    assert(cosines.count(c => math.abs(c) < 0.5) >= ((cosines.size - nearV) * 0.8).toInt,
      "scrambled twins must stay far below dup thresholds")

    // DETERMINISM: the same (src, copies, rates) reproduce byte-identical
    // twins — a curve measured today is re-measurable tomorrow
    val docsB = sources.Tables.documents(spark, dirB)
      .select($"doc_id".as[Long], $"text".as[String]).collect().toMap
    assert(docsB == docs, "document twins must be deterministic")
    val outVB = sources.Tables.embeddings(spark, dirB)
      .select($"vec_id".as[Long], $"embedding".as[Seq[Float]]).collect().toMap
    assert(vids.forall(i => (1 to 2).forall(k =>
      outVB(i + k * Off) == outV(i + k * Off))), "embedding twins must be deterministic")
  }
}
