package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Battery-wide output-shape invariant: every ORACLED entry must emit only
  * atomic (non-array / non-map / non-struct) output columns. The driver's
  * correctness checker canonicalizes results with pandas
  * `sort_values` over all columns before hashing, and array-typed cells are
  * unhashable there (`TypeError: unhashable type: 'numpy.ndarray'`) — this
  * is exactly how q_bpe_tokens_fixed went red in round 13 despite both
  * engines agreeing on the values. Nested payloads must be serialized to a
  * scalar on BOTH sides (array_join / array_to_string with a chr(31)
  * separator) before registration.
  */
class OracleContractSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** The ROWS-ONLY LEDGER (VERDICT r16 item 5): every registry entry
    * without an `oracleSql` twin gets only the driver's weaker rows-only
    * check, so each such entry needs a WRITTEN justification — previously
    * scattered across SURVEY §8, now pinned in code. A new entry slipping
    * in unoracled fails this spec by name; shrinking the set (oracling an
    * entry) requires deleting its ledger row, which is the desired
    * friction in the right direction. */
  private val rowsOnlyLedger: Map[String, String] = Map(
    // distributed float k-means: per-partition reduction order makes the
    // trained centroids run-dependent in final float bits; the fixed-point
    // twins (q_ivf_train_exact / q_ivf_search_exact) oracle the algorithm
    "q_semdedup_kmeans" -> "distributed-float-kmeans",
    "q_cosine_topk_ivf" -> "distributed-float-kmeans",
    "q_cosine_topk_ivf_indexed" -> "distributed-float-kmeans",
    // float twins of fully-oracled fixed-point production shapes
    "q_opq_topk" -> "float-twin-of-oracled (q_opq_alloc_exact)",
    "q_ivfpq_topk" -> "float-twin-of-oracled (q_ivfpq_search_exact)",
    // engine-hash LSH fast paths: xxhash64 has no DuckDB equivalent; each
    // has a portable-md5 oracled twin plus a fast≡portable agreement spec
    "q_minhash_neardup_fast" -> "engine-hash-fast-path (agreement spec)",
    "q_simhash_neardup_fast" -> "engine-hash-fast-path (agreement spec)",
    "q_winnow_neardup_fast" -> "engine-hash-fast-path (agreement spec)",
    "q_cosine_neardup_lsh_fast" -> "engine-hash-fast-path (agreement spec)",
    // serialized DataSketches HLL bytes — no cross-engine representation
    "q_hll_mergeable" -> "sketch-bytes (mergeability spec-pinned)",
    // learned BPE merge table depends on driver-sample tie-breaks; the
    // fixed-merges twin q_bpe_tokens_fixed is hash-oracled
    "q_bpe_tokens" -> "learned-bpe (oracled fixed twin q_bpe_tokens_fixed)")

  test("rows-only set is EXACTLY the justified ledger — no entry ships unoracled without a written reason") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val unjustified = (rowsOnly -- rowsOnlyLedger.keySet).toSeq.sorted
    assert(unjustified.isEmpty,
      s"registry entries with NO oracle and NO ledger justification: " +
        s"${unjustified.mkString(", ")} — add an oracleSql twin or a ledger row")
    val stale = (rowsOnlyLedger.keySet -- rowsOnly).toSeq.sorted
    assert(stale.isEmpty,
      s"ledger rows for entries that are now oracled (or gone): " +
        s"${stale.mkString(", ")} — delete the stale justification")
    // the oracled twins the justifications lean on must actually exist
    Seq("q_ivf_train_exact", "q_ivf_search_exact", "q_opq_alloc_exact",
        "q_ivfpq_search_exact", "q_bpe_tokens_fixed").foreach { twin =>
      assert(SparkEntry.oracleSql.contains(twin), s"justifying twin $twin unoracled")
    }
  }

  test("no oracled entry emits an array/map/struct output column") {
    val offenders = SparkEntry.oracleSql.keys.toSeq.sorted.flatMap { name =>
      val schema = SparkEntry.queries(name)(spark, sf).schema
      val nested = schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
                  f.dataType.isInstanceOf[MapType] ||
                  f.dataType.isInstanceOf[StructType] => f.name
      }
      if (nested.nonEmpty) Some(s"$name(${nested.mkString(",")})") else None
    }
    assert(offenders.isEmpty,
      s"oracled entries with non-atomic output columns: ${offenders.mkString("; ")}")
  }
}
