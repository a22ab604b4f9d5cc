package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingest normalization (E2): the fetcher's `normalize_weather_record`
  * (`lambda/ingest_weather/handler.py:56-102`) re-expressed as ONE
  * codegen'd projection of Column expressions — nested-field extraction
  * (F4), `weather[0]` first-element with default (F5), the `"Austin,US"`
  * split (F1), the coalesce fallback chains (F3), null-preserving numeric
  * casts (F6), ISO-Z fetch stamp (F8), the minimal `raw {id, dt}` struct,
  * and validation tagging (F19/P10) — rows tagged, never dropped.
  *
  * Input: one row per fetch with `city` (the configured "City,CC" string)
  * and `payload` (the parsed OpenWeather response struct). No UDF, no
  * shuffle; at any scale this is a map-only stage.
  */
object IngestNormalize {

  /** Schema of the OpenWeather response subset the reference touches. */
  val payloadSchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("id", LongType),
    StructField("dt", LongType),
    StructField("sys", StructType(Seq(StructField("country", StringType)))),
    StructField("coord", StructType(Seq(
      StructField("lat", DoubleType), StructField("lon", DoubleType)))),
    StructField("main", StructType(Seq(
      StructField("temp", DoubleType), StructField("feels_like", DoubleType),
      StructField("humidity", DoubleType), StructField("pressure", DoubleType)))),
    StructField("wind", StructType(Seq(StructField("speed", DoubleType)))),
    StructField("weather", ArrayType(StructType(Seq(
      StructField("main", StringType), StructField("description", StringType)))))))

  /** handler.py:66-69 — split "Austin,US" at the FIRST comma. */
  private def citySplit(city: Column): (Column, Column) = {
    val parts = split(city, ",", 2)
    (element_at(parts, 1),
      when(size(parts) > 1, element_at(parts, 2)).otherwise(lit("")))
  }

  /** Normalize one fetch row (`city`, `payload` struct) to the contract. */
  def normalize(df: DataFrame, app: String = "rxlan", stage: String = "dev"): DataFrame = {
    val p = col("payload")
    val (cityName, countryFromCity) = citySplit(col("city"))
    val w0 = element_at(p.getField("weather"), 1) // null-safe: null array → null
    val normalized = df.select(
      lit(app).as("app"),
      lit(stage).as("stage"),
      lit("openweather").as("source"),
      date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("fetched_at_utc"),
      coalesce(p.getField("name"), cityName).as("city"),
      // country_from_city or sys.country or "" (Python falsy-"" chain)
      coalesce(
        when(countryFromCity =!= "", countryFromCity),
        p.getField("sys").getField("country"),
        lit("")).as("country"),
      p.getField("coord").getField("lat").cast(DoubleType).as("lat"),
      p.getField("coord").getField("lon").cast(DoubleType).as("lon"),
      p.getField("main").getField("temp").cast(DoubleType).as("temp_c"),
      p.getField("main").getField("feels_like").cast(DoubleType).as("feels_like_c"),
      p.getField("main").getField("humidity").cast(IntegerType).as("humidity"),
      p.getField("main").getField("pressure").cast(IntegerType).as("pressure"),
      p.getField("wind").getField("speed").cast(DoubleType).as("wind_speed"),
      w0.getField("main").as("weather_main"),
      w0.getField("description").as("weather_description"),
      struct(
        p.getField("id").as("id"),
        p.getField("dt").as("dt")).as("raw"))
    // handler.py:92-100 validation, tagged not dropped
    Validate.tag(normalized, Seq(
      Validate.rangeRule(normalized("temp_c"), "temp_c_out_of_range_or_null", -90, 60),
      Validate.rangeRule(normalized("humidity"), "humidity_out_of_range_or_null", 0, 100),
      Validate.Rule("pressure_missing_or_invalid",
        normalized("pressure").isNull || normalized("pressure") <= 0)))
  }
}
