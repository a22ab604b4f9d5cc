package graft.ops

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/** DynamoDB type-tag unwrap (F18) — the one genuinely custom scalar in the
  * reference: `lambda/ddb_stream_forwarder/handler.py:44` deserializes a
  * DDB Streams `NewImage` (`{"city":{"S":"Austin"},"temp_c":{"N":"35.77"}}`)
  * into plain JSON.
  *
  * Implemented as a Scala UDF over JSON strings (SURVEY.md §2.10 verdict:
  * adequate; a Catalyst Expression only if codegen-hot). Jackson is already on
  * Spark's classpath. The UDF is a pure per-row map — embarrassingly parallel,
  * no state, no shuffle — so it scales linearly with input splits.
  */
object DdbUnwrap {

  private val mapper = new ObjectMapper()

  private val tags = Set("S", "N", "BOOL", "NULL", "M", "L", "SS", "NS", "BS", "B")

  /** A node is a type-tag wrapper iff it is an object with exactly one field
    * whose name is a DynamoDB type tag. */
  private def unwrapNode(node: JsonNode): JsonNode = node match {
    case o: ObjectNode if o.size() == 1 && tags.contains(o.fieldNames().next()) =>
      val tag = o.fieldNames().next()
      val v = o.get(tag)
      tag match {
        case "S" | "B" => v
        case "N" =>
          val s = v.asText()
          // integers stay integral, like boto3's Decimal → int/float split
          if (s.matches("-?\\d+")) mapper.getNodeFactory.numberNode(new java.math.BigInteger(s))
          else mapper.getNodeFactory.numberNode(new java.math.BigDecimal(s))
        case "BOOL" => v
        case "NULL" => mapper.getNodeFactory.nullNode()
        case "M" => unwrapMap(v.asInstanceOf[ObjectNode])
        case "L" => unwrapList(v.asInstanceOf[ArrayNode])
        case "SS" | "BS" => v
        case "NS" =>
          val arr = mapper.createArrayNode()
          v.forEach(n => arr.add(unwrapNode(
            mapper.createObjectNode().set[ObjectNode]("N", n))))
          arr
      }
    case o: ObjectNode => unwrapMap(o)
    case a: ArrayNode  => unwrapList(a)
    case other         => other
  }

  private def unwrapMap(o: ObjectNode): ObjectNode = {
    val out = mapper.createObjectNode()
    o.fields().forEachRemaining(e => out.set[ObjectNode](e.getKey, unwrapNode(e.getValue)))
    out
  }

  private def unwrapList(a: ArrayNode): ArrayNode = {
    val out = mapper.createArrayNode()
    a.forEach(n => out.add(unwrapNode(n)))
    out
  }

  /** JSON string of a type-tagged image → plain JSON string. */
  def unwrapJson(tagged: String): String =
    if (tagged == null) null
    else mapper.writeValueAsString(unwrapMap(mapper.readTree(tagged).asInstanceOf[ObjectNode]))

  private val unwrapUdf = udf((s: String) => unwrapJson(s))

  /** Column form: `ddb_unwrap(col)`. */
  def ddb_unwrap(c: Column): Column = unwrapUdf(c)

  /** Register for SQL use: `SELECT ddb_unwrap(new_image) FROM ...`. */
  def register(spark: SparkSession): Unit =
    spark.udf.register("ddb_unwrap", (s: String) => unwrapJson(s))
}
