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
}
