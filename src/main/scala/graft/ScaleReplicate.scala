package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up replication for the EMPIRICAL scaling curve
  * (SURVEY §9): derive an N×-larger sibling of a testdata dir by unioning
  * N key-shifted copies of every table, so per-family bench timings can be
  * measured against a real data-ratio instead of argued from plan shape.
  *
  * Replication must not corrupt the WORKLOAD STRUCTURE the queries
  * exercise, so each copy is the same corpus in a transformed frame:
  *
  *   - every key column shifts by `replica × 10^12` — referential
  *     integrity (orders↔lineitem, customer↔orders, part/supplier↔
  *     lineitem) holds within each replica, and join fan-outs/group sizes
  *     per key are EXACTLY the original's; fixed-literal query sets
  *     (`vec_id < 5` probes, `vec_id < 300` slices) keep replica 0 only,
  *     so serving-style queries scale corpus-side only — the honest shape
  *     for a fixed query load against N× data;
  *   - `documents.text` gets a per-replica BIJECTIVE token renaming
  *     (`word` → `word~k`, replica 0 untouched): within-replica shingle /
  *     n-gram / edit-distance structure is preserved exactly (a bijection
  *     on the token alphabet), while cross-replica Jaccard collapses to
  *     ~0 — so MinHash/SimHash dup families grow 5× in membership, not
  *     25× in pair count (which IDENTICAL copies would cause);
  *   - `embeddings.embedding` is multiplied by a per-replica deterministic
  *     ±1 sign mask (replica 0 = identity): a diagonal orthogonal
  *     transform, so ALL within-replica cosines — cluster structure,
  *     planted dup groups — are preserved bit-for-bit in geometry, while
  *     cross-replica cosines scramble to ≈ N(0, 1/√dim), far below every
  *     dup threshold in the battery; the corpus is N× the structure, not
  *     N² the duplicate pairs;
  *   - `region`/`nation` stay as-is (TPC-H dims do not scale with sf) and
  *     unshifted `c_nationkey`/`s_nationkey` still reference them.
  *
  * NEAR-DUP MODE (round-18, VERDICT r17 item 5): the disjoint-alphabet
  * replica is the right input for gates where duplicates get CHEAPER
  * (content/semantic dedup), but it starves near-dup admission gates of
  * the cross-replica candidates real corpora have — while EXACT twins
  * overfeed them (every band collides, candidate pairs grow
  * quadratically; SURVEY §9 r17 marked those curves unmeasurable). With
  * `neardupRate > 0`, each replica-k twin of a doc is, deterministically
  * by hash(doc_id, k):
  *   - with probability `neardupRate`: a NEAR-DUP — each token
  *     independently rewritten to `tok~mK` with probability
  *     `mutationRate` (hash(tok, pos, doc_id, k) decides, so twins are
  *     reproducible bit-for-bit across runs), plus ONE forced edit at a
  *     hash-chosen position so even a short doc's all-miss draw cannot
  *     degenerate to an exact copy — landing in a tunable Jaccard band
  *     strictly below 1.0;
  *   - otherwise: the DISTINCT bijective rename above (cross-replica
  *     Jaccard ~0).
  * Dup-family membership then grows ~(1 + copies·neardupRate) per doc —
  * candidate pairs grow LINEARLY with corpus size, the real-corpus shape.
  * Embeddings follow the same split: near twins get a per-component
  * deterministic relative jitter of ±2·mutationRate (cosine ≈ 1 − ε²/6,
  * well above every dup threshold), distinct twins keep the sign-mask
  * scramble.
  *
  * Usage: ScaleReplicate <srcSfDir> <outDir> <copies> [neardupRate] [mutationRate]
  * (e.g. /root/testdata/sf0.1 target/scale/sf0.5 5 0.1 0.05). Output is a
  * plain sibling-shaped dir readable by [[sources.Tables]]; point Bench at
  * it with SPARK_GRAFT_BENCH_WARMUP_DIR set explicitly (no sf0.001
  * sibling).
  */
object ScaleReplicate {

  private val Off = 1000000000000L // all source keys are far below 10^12

  private def shifted(df: DataFrame, keys: Seq[String], k: Int): DataFrame =
    keys.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(k.toLong * Off)))

  /** ±1 mask for replica k (k = 0 → all +1), deterministic in (k, i). */
  private[graft] def signMask(k: Int, dim: Int): Array[Double] = {
    if (k == 0) Array.fill(dim)(1.0)
    else {
      val rnd = new scala.util.Random(0xC0FFEEL + k)
      Array.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
    }
  }

  private def replicate(df: DataFrame, copies: Int)(copy: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until copies).map(k => copy(df, k)).reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    require(args.length >= 3 && args.length <= 5,
      "usage: ScaleReplicate <srcSfDir> <outDir> <copies> [neardupRate] [mutationRate]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    // getOrCreate may hand back a session someone else owns; only stop the
    // context when this main created it (tests drive run() directly).
    val hadActive = SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession).isDefined
    val spark = SessionFactory.builder("graft-scale-replicate", cpus.toInt).getOrCreate()
    try run(spark, args(0), args(1), args(2).toInt,
      neardupRate = if (args.length >= 4) args(3).toDouble else 0.0,
      mutationRate = if (args.length >= 5) args(4).toDouble else 0.05)
    finally if (!hadActive) spark.stop()
  }

  /** Replicates every table of `src` into `out` with `copies` structure-
    * preserving replicas. Does not own the session lifecycle.
    * `neardupRate` > 0 turns the documented fraction of document/embedding
    * twins into deterministic NEAR-dups (see the near-dup mode note);
    * 0 keeps every twin alphabet-disjoint/geometry-scrambled. */
  def run(
      spark: SparkSession,
      src: String,
      out: String,
      copies: Int,
      neardupRate: Double = 0.0,
      mutationRate: Double = 0.05): Unit = {
    require(copies >= 1, "copies must be >= 1")
    require(neardupRate >= 0.0 && neardupRate <= 1.0, "neardupRate in [0,1]")
    require(mutationRate >= 0.0 && mutationRate <= 1.0, "mutationRate in [0,1]")
    spark.sparkContext.setLogLevel("WARN")
    import sources.Tables

    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scale] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    write("region", Tables.region(spark, src))
    write("nation", Tables.nation(spark, src))
    write("customer", replicate(Tables.customer(spark, src), copies)(
      (d, k) => shifted(d, Seq("c_custkey"), k)))
    write("supplier", replicate(Tables.supplier(spark, src), copies)(
      (d, k) => shifted(d, Seq("s_suppkey"), k)))
    write("part", replicate(Tables.part(spark, src), copies)(
      (d, k) => shifted(d, Seq("p_partkey"), k)))
    write("orders", replicate(Tables.orders(spark, src), copies)(
      (d, k) => shifted(d, Seq("o_orderkey", "o_custkey"), k)))
    write("lineitem", replicate(Tables.lineitem(spark, src), copies)(
      (d, k) => shifted(d, Seq("l_orderkey", "l_partkey", "l_suppkey"), k)))
    write("events", replicate(Tables.events(spark, src), copies)(
      (d, k) => shifted(d, Seq("event_id", "user_id"), k)))
    // per-mille thresholds: integer hash buckets keep the twin choice and
    // the per-token edits exactly reproducible across runs and partitions
    val nearMille = math.round(neardupRate * 1000).toInt
    val mutMille = math.round(mutationRate * 1000).toInt
    write("documents", replicate(Tables.documents(spark, src), copies) { (d, k) =>
      val transformed =
        if (k == 0) d
        else {
          val renamed = regexp_replace(col("text"), "(\\S+)", s"$$1~$k")
          val text =
            if (nearMille == 0) renamed
            else {
              val toks = split(col("text"), "\\s+")
              // one FORCED edit position per near twin: a short doc's
              // independent 5% draws can all miss, and a zero-edit "near
              // twin" is an exact copy — re-feeding near-dup gates the
              // quadratic band collisions this mode exists to remove. The
              // forced position keeps every near twin strictly below
              // Jaccard 1.0 while leaving the band set by mutationRate.
              val forced = pmod(xxhash64(col("doc_id"), lit(k), lit(-1)),
                size(toks).cast("long"))
              val mutated = array_join(
                zip_with(toks, sequence(lit(0), size(toks) - 1), (tok, i) =>
                  when(pmod(xxhash64(tok, i, col("doc_id"), lit(k)), lit(1000))
                      < lit(mutMille) || i.cast("long") === forced,
                    concat(tok, lit(s"~m$k"))).otherwise(tok)), " ")
              when(pmod(xxhash64(col("doc_id"), lit(k)), lit(1000)) < lit(nearMille),
                mutated).otherwise(renamed)
            }
          d.withColumn("text", text)
            .withColumn("n_chars", length(col("text")).cast("long"))
        }
      shifted(transformed, Seq("doc_id"), k)
    })
    write("embeddings", replicate(Tables.embeddings(spark, src), copies) { (d, k) =>
      val dim = 64
      val transformed =
        if (k == 0) d
        else {
          val flipped = zip_with(col("embedding"),
            lit(signMask(k, dim).map(_.toFloat)), (x, s) => (x * s).cast("float"))
          val emb =
            if (nearMille == 0) flipped
            else {
              // relative jitter: x·(1 + ε·u), u deterministic in
              // (vec_id, component, k), uniform on [-1, 1] — scale-free,
              // cosine ≈ 1 − ε²/6 (ε = 2·mutationRate → ~0.998 at 0.05)
              val eps = 2.0 * mutationRate
              val jittered = zip_with(col("embedding"),
                sequence(lit(0), lit(dim - 1)), (x, i) =>
                  (x * (lit(1.0) + lit(eps) *
                    (pmod(xxhash64(col("vec_id"), i, lit(k)), lit(2001))
                      .cast("double") - lit(1000.0)) / lit(1000.0))).cast("float"))
              when(pmod(xxhash64(col("vec_id"), lit(k)), lit(1000)) < lit(nearMille),
                jittered).otherwise(flipped)
            }
          d.withColumn("embedding", emb)
        }
      shifted(transformed, Seq("vec_id"), k)
    })
  }
}
