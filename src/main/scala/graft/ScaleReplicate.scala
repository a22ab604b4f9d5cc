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
  * Usage: ScaleReplicate <srcSfDir> <outDir> <copies>
  * (e.g. /root/testdata/sf0.1 target/scale/sf0.5 5). Output is a plain
  * sibling-shaped dir readable by [[sources.Tables]]; point Bench at it
  * with SPARK_GRAFT_BENCH_WARMUP_DIR set explicitly (no sf0.001 sibling).
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
    require(args.length == 3, "usage: ScaleReplicate <srcSfDir> <outDir> <copies>")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    // getOrCreate may hand back a session someone else owns; only stop the
    // context when this main created it (tests drive run() directly).
    val hadActive = SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession).isDefined
    val spark = SessionFactory.builder("graft-scale-replicate", cpus.toInt).getOrCreate()
    try run(spark, args(0), args(1), args(2).toInt)
    finally if (!hadActive) spark.stop()
  }

  /** Replicates every table of `src` into `out` with `copies` structure-
    * preserving replicas. Does not own the session lifecycle. */
  def run(spark: SparkSession, src: String, out: String, copies: Int): Unit = {
    require(copies >= 1, "copies must be >= 1")
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
    write("documents", replicate(Tables.documents(spark, src), copies) { (d, k) =>
      val renamed =
        if (k == 0) d
        else d.withColumn("text", regexp_replace(col("text"), "(\\S+)", s"$$1~$k"))
          .withColumn("n_chars", length(col("text")).cast("long"))
      shifted(renamed, Seq("doc_id"), k)
    })
    write("embeddings", replicate(Tables.embeddings(spark, src), copies) { (d, k) =>
      val dim = 64
      val flipped =
        if (k == 0) d
        else d.withColumn("embedding",
          zip_with(col("embedding"), lit(signMask(k, dim).map(_.toFloat)),
            (x, s) => (x * s).cast("float")))
      shifted(flipped, Seq("vec_id"), k)
    })
  }
}
