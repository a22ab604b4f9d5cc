package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IngestNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def fromJson(lines: Seq[String]) = {
    val df = lines.toDF("j")
    df.select(
      get_json_object($"j", "$.city").as("city"),
      from_json(get_json_object($"j", "$.payload"), IngestNormalize.payloadSchema).as("payload"))
  }

  test("full payload: nested extraction, name precedence, raw struct") {
    val df = fromJson(Seq(
      """{"city":"Austin,US","payload":{"name":"Austin City","id":99,"dt":1724940000,
        |"sys":{"country":"US"},"coord":{"lat":30.27,"lon":-97.74},
        |"main":{"temp":35.8,"feels_like":39.1,"humidity":44,"pressure":1012},
        |"wind":{"speed":3.6},"weather":[{"main":"Clear","description":"clear sky"},{"main":"X","description":"y"}]}}"""
        .stripMargin.replaceAll("\n", "")))
    val r = IngestNormalize.normalize(df).head()
    assert(r.getAs[String]("city") == "Austin City") // payload.name wins
    assert(r.getAs[String]("country") == "US")       // from "Austin,US" split
    assert(r.getAs[Double]("temp_c") == 35.8)
    assert(r.getAs[Int]("humidity") == 44)
    assert(r.getAs[String]("weather_main") == "Clear") // weather[0], not [1]
    assert(r.getAs[org.apache.spark.sql.Row]("raw").getLong(0) == 99L)
    assert(r.getSeq[String](r.fieldIndex("validation_errors")).isEmpty)
  }

  test("fallback chains: missing name → city from split; country from sys") {
    val df = fromJson(Seq(
      """{"city":"Paris","payload":{"sys":{"country":"FR"},"main":{"temp":20.0,"humidity":50,"pressure":1000}}}"""))
    val r = IngestNormalize.normalize(df).head()
    assert(r.getAs[String]("city") == "Paris")
    assert(r.getAs[String]("country") == "FR") // split gave "", falls to sys.country
    assert(r.isNullAt(r.fieldIndex("weather_main"))) // no weather array
  }

  test("validation tags fire like handler.py:92-100; rows never dropped") {
    val df = fromJson(Seq(
      """{"city":"X","payload":{"main":{"temp":99.0,"humidity":101,"pressure":0}}}""",
      """{"city":"Y","payload":{"main":{}}}"""))
    val out = IngestNormalize.normalize(df)
    assert(out.count() == 2)
    val errs = out.select($"validation_errors").as[Seq[String]].collect()
    assert(errs(0) == Seq("temp_c_out_of_range_or_null",
      "humidity_out_of_range_or_null", "pressure_missing_or_invalid"))
    assert(errs(1) == Seq("temp_c_out_of_range_or_null",
      "humidity_out_of_range_or_null", "pressure_missing_or_invalid"))
  }

  test("whole normalization is one codegen'd projection (no UDF, no shuffle)") {
    val df = fromJson(Seq("""{"city":"A","payload":{"main":{"temp":1.0}}}"""))
    val plan = IngestNormalize.normalize(df).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }
}
