package graft.model

import org.apache.spark.sql.types._

/** The reference's normalized weather record contract.
  *
  * Fields per `lambda/ingest_weather/handler.py:71-89` and
  * `docs/ingest_payload.md:8-26`; gold DDL (17 cols) per
  * `glue/bronze_to_silver_openweather.py:111-131`.
  */
final case class WeatherRecord(
    app: String,
    stage: String,
    source: String,
    fetched_at_utc: String,
    city: String,
    country: String,
    lat: Option[Double],
    lon: Option[Double],
    temp_c: Option[Double],
    feels_like_c: Option[Double],
    humidity: Option[Int],
    pressure: Option[Int],
    wind_speed: Option[Double],
    clouds_pct: Option[Int],
    weather_main: String,
    weather_description: String)

object Weather {

  /** Ingest contract (13 conformed columns), the cast target of the
    * cast-or-null loop at `glue/bronze_to_silver_openweather.py:70-86`. */
  val contract: StructType = StructType(Seq(
    StructField("app", StringType),
    StructField("stage", StringType),
    StructField("source", StringType),
    StructField("fetched_at_utc", StringType),
    StructField("city", StringType),
    StructField("country", StringType),
    StructField("lat", DoubleType),
    StructField("lon", DoubleType),
    StructField("temp_c", DoubleType),
    StructField("feels_like_c", DoubleType),
    StructField("humidity", IntegerType),
    StructField("pressure", IntegerType),
    StructField("wind_speed", DoubleType),
    StructField("clouds_pct", IntegerType),
    StructField("weather_main", StringType),
    StructField("weather_description", StringType)))

  /** Gold schema = contract minus weather_* plus event-time + audit columns
    * (`glue/bronze_to_silver_openweather.py:111-131`). */
  val gold: StructType = StructType(
    contract.fields.filterNot(f => f.name.startsWith("weather_")) ++ Seq(
      StructField("ts", TimestampType),
      StructField("dt", StringType),
      StructField("hour", StringType),
      StructField("loaded_at", TimestampType)))

  /** ISO8601 Z format used by the fetcher (`handler.py:57`). */
  val IsoFormat = "yyyy-MM-dd'T'HH:mm:ss'Z'"
}
