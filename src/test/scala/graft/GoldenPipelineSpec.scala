package graft

import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import graft.model.Weather
import graft.ops.{Conform, Dedup, EventTime, JsonExpand, Validate}
import graft.sinks.LakeWriter
import graft.sources.BronzeReader
import org.apache.spark.sql.functions._

/** Golden end-to-end test of the reference's flagship lifecycle (SURVEY.md
  * §3 E1): gzip NDJSON bronze fixture → contract read → embedded-JSON
  * expansion → conform → validate → event-time derivation → idempotent gold
  * load → the full init.sql data-quality battery as invariants.
  */
class GoldenPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def writeGzNdjson(dir: String, name: String, lines: Seq[String]): Unit = {
    val f = java.nio.file.Paths.get(dir, name).toFile
    val out = new GZIPOutputStream(new java.io.FileOutputStream(f))
    out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    out.close()
  }

  // Five bronze records: a clean pair, an exact duplicate (at-least-once
  // retry), an out-of-range reading, and a malformed-numeric row.
  private val bronzeLines = Seq(
    """{"app":"rxlan","stage":"dev","source":"openweather","fetched_at_utc":"2025-08-29T14:05:09Z","city":"Austin","country":"US","lat":30.27,"lon":-97.74,"temp_c":35.8,"feels_like_c":39.1,"humidity":44,"pressure":1012,"wind_speed":3.6,"weather_main":"Clear","weather_description":"clear sky"}""",
    """{"app":"rxlan","stage":"dev","source":"openweather","fetched_at_utc":"2025-08-29T14:05:11Z","city":"Boston","country":"US","lat":42.36,"lon":-71.06,"temp_c":21.4,"feels_like_c":21.0,"humidity":60,"pressure":1015,"wind_speed":5.1,"weather_main":"Clouds","weather_description":"few clouds"}""",
    """{"app":"rxlan","stage":"dev","source":"openweather","fetched_at_utc":"2025-08-29T14:05:11Z","city":"Boston","country":"US","lat":42.36,"lon":-71.06,"temp_c":21.4,"feels_like_c":21.0,"humidity":60,"pressure":1015,"wind_speed":5.1,"weather_main":"Clouds","weather_description":"few clouds"}""",
    """{"app":"rxlan","stage":"dev","source":"openweather","fetched_at_utc":"2025-08-29T15:00:02Z","city":"Chicago","country":"US","temp_c":99.9,"humidity":101,"pressure":0}""",
    """{"app":"rxlan","stage":"dev","source":"openweather","fetched_at_utc":"2025-08-29T15:00:05Z","city":"Denver","country":"US","temp_c":"not-a-number","humidity":55,"pressure":1013}"""
  )

  test("bronze → silver → gold with the init.sql battery as invariants") {
    val bronzeDir = Files.createTempDirectory("graft-golden-bronze").toString
    val goldDir = Files.createTempDirectory("graft-golden-gold").toString + "/weather"
    writeGzNdjson(bronzeDir, "part-0.json.gz", bronzeLines)

    // 1. contract read (S7) — schema explicit, no inference pass
    val bronze = BronzeReader.readContract(spark, bronzeDir, Weather.contract)
    assert(bronze.count() == 5)

    // 2. conform (F7): Denver's "not-a-number" temp_c → null, not an error
    val conformed = Conform.toContract(bronze, Weather.contract)
    assert(conformed.filter($"city" === "Denver").select($"temp_c").head().isNullAt(0))

    // 3. validate (F19/P10): tags flow with rows, nothing dropped
    val validated = Validate.tag(conformed, Validate.weatherRules(conformed))
    assert(validated.count() == 5)
    assert(validated.filter($"city" === "Chicago").select($"n_errors").as[Int].head() == 3)
    assert(validated.filter($"city" === "Austin").select($"n_errors").as[Int].head() == 0)

    // 4. event time (F9-F13) + dedup (T7) + idempotent gold load ×2 (re-run)
    val silver = EventTime.derive(validated)
    val gold = Dedup.keepFirst(silver, Seq("city", "fetched_at_utc"), Seq($"ts"))
    LakeWriter.writeGoldIdempotent(gold, goldDir)
    LakeWriter.writeGoldIdempotent(gold, goldDir) // re-run must not duplicate

    val weather = spark.read.parquet(goldDir)
    weather.createOrReplaceTempView("weather")

    // 5. the init.sql battery as invariants (redshift/init.sql:19-55)
    // row count (sql:23): 4 after dedup of the Boston retry
    assert(spark.sql("SELECT count(*) FROM weather").as[Long].head() == 4L)
    // latest-N (sql:25-28)
    val latest = spark.sql(
      "SELECT city FROM weather ORDER BY ts DESC, city LIMIT 2").as[String].collect()
    assert(latest.toSeq == Seq("Denver", "Chicago"))
    // fully-null payload detector (sql:30-36) == 0
    assert(spark.sql(
      """SELECT count(*) FROM weather
        |WHERE temp_c IS NULL AND feels_like_c IS NULL AND humidity IS NULL
        |  AND pressure IS NULL AND wind_speed IS NULL""".stripMargin)
      .as[Long].head() == 0L)
    // per-column null distribution (sql:39-44)
    val nulls = spark.sql(
      """SELECT sum(CASE WHEN temp_c IS NULL THEN 1 ELSE 0 END),
        |       sum(CASE WHEN lat IS NULL THEN 1 ELSE 0 END)
        |FROM weather""".stripMargin).head()
    assert(nulls.getLong(0) == 1L && nulls.getLong(1) == 2L)
    // duplicate detection (sql:47-52) == 0 — idempotency is an invariant now
    assert(spark.sql(
      """SELECT count(*) FROM (SELECT city, ts FROM weather
        |GROUP BY city, ts HAVING count(*) > 1)""".stripMargin).as[Long].head() == 0L)
    // partition layout: dt/hour hive dirs, prunable
    val pruned = weather.filter($"dt" === "2025-08-29" && $"hour" === "15")
    assert(pruned.select("city").as[String].collect().toSet == Set("Chicago", "Denver"))
  }

  test("embedded-payload branch: bronze rows with a JSON-string payload column") {
    // the glue:42-61 conditional path: real payload arrives as a JSON string
    val df = Seq(
      (1, """{"city":"Austin","temp_c":35.8,"humidity":44}"""),
      (2, """{"city":"Boston","temp_c":21.4,"humidity":60}""")
    ).toDF("id", "payload")
    assert(JsonExpand.findJsonColumn(df).contains("payload"))
    val expanded = JsonExpand.withInference(df, "payload")
    assert(expanded.columns.toSet == Set("id", "city", "temp_c", "humidity"))
    assert(expanded.filter($"city" === "Austin").select($"temp_c").as[Double].head() == 35.8)
  }

  test("gold commits through the snapshot layer: hourly runs version the table") {
    import graft.sinks.Snapshots
    val t = java.nio.file.Files.createTempDirectory("graft-gold-snap").toString + "/gold"
    // hour-14 batch then hour-15 batch, each an atomic snapshot commit
    val h14 = Seq(("Austin", "2025-08-29T14:05:00Z", 35.1), ("Boston", "2025-08-29T14:10:00Z", 21.0))
      .toDF("city", "fetched_at_utc", "temp_c")
    val h15 = Seq(("Chicago", "2025-08-29T15:01:00Z", 18.5))
      .toDF("city", "fetched_at_utc", "temp_c")
    Snapshots.commit(h14, t)
    Snapshots.commit(h15, t)
    assert(Snapshots.read(spark, t).count() == 3)
    // the hour-14 snapshot is still exactly the hour-14 load (audit/replay)
    assert(Snapshots.read(spark, t, Some(1L)).select("city").as[String]
      .collect().toSet == Set("Austin", "Boston"))
    // compaction doesn't disturb history
    Snapshots.compact(spark, t)
    assert(Snapshots.read(spark, t).count() == 3)
    assert(Snapshots.read(spark, t, Some(1L)).count() == 2)
  }
}
