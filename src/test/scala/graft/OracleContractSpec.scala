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
