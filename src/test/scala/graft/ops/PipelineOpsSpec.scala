package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import graft.sinks.LakeWriter
import graft.sources.BronzeReader
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-operator specs for the reference-pipeline operator set
  * (SURVEY.md §2.2/§2.8/§2.10 → graft.ops).
  */
class ConformSpec extends SparkSpec {
  import spark.implicits._

  private val contract = StructType(Seq(
    StructField("a", IntegerType),
    StructField("b", DoubleType),
    StructField("missing", StringType)))

  test("casts present columns, materializes absent ones as typed nulls, drops extras") {
    val df = Seq(("1", "2.5", "extra")).toDF("a", "b", "junk")
    val out = Conform.toContract(df, contract)
    assert(out.schema == contract)
    val r = out.head()
    assert(r.getInt(0) == 1 && r.getDouble(1) == 2.5 && r.isNullAt(2))
  }

  test("unparseable values become null, not errors (cast-or-null semantics)") {
    val df = Seq(("not-a-number", "x")).toDF("a", "b")
    val r = Conform.toContract(df, contract).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("keepExtra variant preserves pass-through columns after the contract") {
    val df = Seq((1, "keep-me")).toDF("a", "extra")
    val out = Conform.toContractKeepExtra(df, contract)
    assert(out.columns.toSeq == Seq("a", "b", "missing", "extra"))
    assert(out.head().getString(3) == "keep-me")
  }
}

class ValidateSpec extends SparkSpec {
  import spark.implicits._

  test("reference weather rules tag nulls and out-of-range, keep clean rows empty") {
    val df = Seq(
      (25.0, 50, 1013),   // clean
      (99.0, 50, 1013),   // temp out of range
      (25.0, 101, 0)      // humidity high + pressure non-positive
    ).toDF("temp_c", "humidity", "pressure")
    val tagged = Validate.tag(df, Validate.weatherRules(df))
    val errs = tagged.select($"validation_errors").as[Seq[String]].collect()
    assert(errs(0).isEmpty)
    assert(errs(1) == Seq("temp_c_out_of_range_or_null"))
    assert(errs(2) == Seq("humidity_out_of_range_or_null", "pressure_out_of_range_or_null"))
    assert(tagged.select($"n_errors").as[Int].collect().toSeq == Seq(0, 1, 2))
  }

  test("rows are tagged, never dropped") {
    val df = Seq.fill(5)((null.asInstanceOf[java.lang.Double], 50, 1013))
      .toDF("temp_c", "humidity", "pressure")
    assert(Validate.tag(df, Validate.weatherRules(df)).count() == 5)
  }
}

class JsonExpandSpec extends SparkSpec {
  import spark.implicits._

  private val payloadSchema = StructType(Seq(
    StructField("x", LongType), StructField("y", StringType)))

  test("explicit schema expands embedded JSON into top-level columns") {
    val df = Seq((1, """{"x": 7, "y": "hi"}"""), (2, null)).toDF("id", "payload")
    val out = JsonExpand.withSchema(df, "payload", payloadSchema)
    assert(out.columns.toSeq == Seq("id", "x", "y"))
    val rows = out.orderBy("id").collect()
    assert(rows(0).getLong(1) == 7L && rows(0).getString(2) == "hi")
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2))
  }

  test("inference path lands on the explicit-schema result") {
    val df = Seq((1, """{"x": 7, "y": "hi"}""")).toDF("id", "payload")
    val a = JsonExpand.withSchema(df, "payload", payloadSchema).orderBy("id").collect()
    val b = JsonExpand.withInference(df, "payload").orderBy("id").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("all-null payload column falls through unchanged (glue:58-61 branch)") {
    val df = Seq((1, null: String)).toDF("id", "payload")
    val out = JsonExpand.withInference(df, "payload")
    assert(out.columns.toSeq == Seq("id", "payload"))
  }

  test("findJsonColumn picks payload over data, string-typed only") {
    val df1 = Seq((1, "{}", "{}")).toDF("id", "data", "payload")
    assert(JsonExpand.findJsonColumn(df1).contains("payload"))
    val df2 = Seq((1, 2)).toDF("id", "payload") // payload not a string
    assert(JsonExpand.findJsonColumn(df2).isEmpty)
  }
}

class DdbUnwrapSpec extends SparkSpec {
  import spark.implicits._

  test("unwraps scalar tags S/N/BOOL/NULL") {
    val in = """{"city":{"S":"Austin"},"temp":{"N":"35.77"},"n":{"N":"42"},"ok":{"BOOL":true},"gone":{"NULL":true}}"""
    val out = DdbUnwrap.unwrapJson(in)
    assert(out == """{"city":"Austin","temp":35.77,"n":42,"ok":true,"gone":null}""")
  }

  test("unwraps nested M and L recursively") {
    val in = """{"raw":{"M":{"id":{"N":"123"},"tags":{"L":[{"S":"a"},{"N":"1"}]}}}}"""
    assert(DdbUnwrap.unwrapJson(in) == """{"raw":{"id":123,"tags":["a",1]}}""")
  }

  test("set types SS/NS unwrap to plain arrays") {
    val in = """{"ss":{"SS":["a","b"]},"ns":{"NS":["1","2.5"]}}"""
    assert(DdbUnwrap.unwrapJson(in) == """{"ss":["a","b"],"ns":[1,2.5]}""")
  }

  test("null input stays null; works as a Column through the UDF") {
    val df = Seq("""{"k":{"S":"v"}}""", null).toDF("img")
    val out = df.select(DdbUnwrap.ddb_unwrap($"img").as("j")).collect()
    assert(out(0).getString(0) == """{"k":"v"}""")
    assert(out(1).isNullAt(0))
  }
}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def dupDf = Seq(
    ("austin", "t1", 1), ("austin", "t1", 2), // dup key, versions 1/2
    ("austin", "t2", 3),
    ("boston", "t1", 4)
  ).toDF("city", "ts", "v")

  test("keepFirst is deterministic under explicit ordering") {
    val out = Dedup.keepFirst(dupDf, Seq("city", "ts"), Seq($"v".asc))
      .orderBy("city", "ts").as[(String, String, Int)].collect().toSeq
    assert(out == Seq(("austin", "t1", 1), ("austin", "t2", 3), ("boston", "t1", 4)))
  }

  test("keepLatest keeps the max-version row per key") {
    val out = Dedup.keepLatest(dupDf, Seq("city", "ts"), "v")
      .filter($"city" === "austin" && $"ts" === "t1").as[(String, String, Int)].head()
    assert(out._3 == 2)
  }

  test("dedup is idempotent: f(f(x)) == f(x)") {
    val once = Dedup.keepFirst(dupDf, Seq("city", "ts"), Seq($"v".asc))
    val twice = Dedup.keepFirst(once, Seq("city", "ts"), Seq($"v".asc))
    assert(once.orderBy("city", "ts").collect().toSeq ==
      twice.orderBy("city", "ts").collect().toSeq)
  }

  test("duplicates audit matches init.sql:47-52 semantics and is empty after dedup") {
    val audit = Dedup.duplicates(dupDf, Seq("city", "ts"))
    assert(audit.as[(String, String, Long)].collect().toSeq == Seq(("austin", "t1", 2L)))
    val clean = Dedup.any(dupDf, Seq("city", "ts"))
    assert(Dedup.duplicates(clean, Seq("city", "ts")).isEmpty)
  }
}

class EventTimeSpec extends SparkSpec {
  import spark.implicits._

  test("ISO8601-Z parse + dt/hour derivation (glue:88-101)") {
    val df = Seq("2025-08-29T14:05:09Z").toDF("fetched_at_utc")
    val out = EventTime.derive(df).select("ts", "dt", "hour", "loaded_at").head()
    assert(out.getTimestamp(0).toInstant.toString == "2025-08-29T14:05:09Z")
    assert(out.getString(1) == "2025-08-29" && out.getString(2) == "14")
    assert(!out.isNullAt(3))
  }

  test("malformed timestamp → null ts (CORRECTED parser, not an exception)") {
    val df = Seq("not-a-time").toDF("fetched_at_utc")
    assert(EventTime.derive(df).select("ts").head().isNullAt(0))
  }

  test("partitionPredicate builds the advertised dt/hour pruning filter") {
    val df = Seq(("2025-08-29", "14", 1), ("2025-08-29", "15", 2), ("2025-08-30", "14", 3))
      .toDF("dt", "hour", "v")
    assert(df.filter(EventTime.partitionPredicate(Some("2025-08-29"), Some("14"))).count() == 1)
    assert(df.filter(EventTime.partitionPredicate(Some("2025-08-29"), None)).count() == 2)
    assert(df.filter(EventTime.partitionPredicate(None, None)).count() == 3)
  }
}

class LakeRoundTripSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-lake").toString

  private def bronzeDf = Seq(
    ("austin", "2025-08-29T14:05:09Z"),
    ("boston", "2025-08-29T15:10:00Z"),
    ("chicago", "2025-08-30T03:00:00Z")
  ).toDF("city", "fetched_at_utc")

  test("bronze write → partition-aware read round-trips and prunes directories") {
    val path = tmp()
    LakeWriter.writeBronze(EventTime.derive(bronzeDf).drop("ts", "loaded_at"), path)
    val schema = StructType(Seq(
      StructField("city", StringType), StructField("fetched_at_utc", StringType)))

    val all = BronzeReader.readPartitioned(spark, path, schema)
    assert(all.count() == 3)
    assert(all.columns.contains("dt") && all.columns.contains("hour"))

    val pruned = BronzeReader.readPartitioned(spark, path, schema,
      dtFilter = Some("2025-08-29"), hourFilter = Some("14"))
    assert(pruned.select("city").as[String].collect().toSeq == Seq("austin"))
    // pruning happened at file-listing time, not as a post-filter
    assert(pruned.inputFiles.forall(_.contains("dt=2025-08-29/hour=14")))
  }

  test("idempotent gold load: re-running the same batch does not duplicate") {
    val path = tmp()
    val gold = EventTime.derive(bronzeDf)
    LakeWriter.writeGoldIdempotent(gold, path)
    LakeWriter.writeGoldIdempotent(gold, path) // re-run, same batch
    val readBack = spark.read.parquet(path)
    assert(readBack.count() == 3)
    assert(Dedup.duplicates(readBack, Seq("city", "fetched_at_utc")).isEmpty)
  }

  test("plain append DOES duplicate (the reference bug the idempotent path fixes)") {
    val path = tmp()
    val gold = EventTime.derive(bronzeDf)
    LakeWriter.writeGold(gold, path)
    LakeWriter.writeGold(gold, path)
    assert(spark.read.parquet(path).count() == 6)
  }

  test("storage formats round-trip: parquet, orc, json, csv with contract schema") {
    val df = Seq(("austin", 35.5, 44), ("boston", 21.0, 60))
      .toDF("city", "temp_c", "humidity")
    val schema = df.schema
    Seq("parquet", "orc", "json", "csv").foreach { fmt =>
      val path = tmp() + s"/t_$fmt"
      LakeWriter.writeFormat(df, path, fmt)
      val back = LakeWriter.readFormat(spark, path, fmt,
        schema = if (fmt == "parquet" || fmt == "orc") None else Some(schema))
      assert(back.schema.map(f => (f.name, f.dataType)) ==
        schema.map(f => (f.name, f.dataType)), s"$fmt schema")
      assert(back.orderBy("city").collect().map(_.toSeq).toSeq ==
        df.orderBy("city").collect().map(_.toSeq).toSeq, s"$fmt values")
    }
  }
}

class BronzeReaderSpec extends SparkSpec {
  import spark.implicits._

  test("explicit contract schema skips inference and types match") {
    val dir = Files.createTempDirectory("graft-bronze").toString
    Seq("""{"city":"austin","temp_c":35.5}""").toDF("value")
      .write.mode("overwrite").text(dir)
    val schema = StructType(Seq(
      StructField("city", StringType), StructField("temp_c", DoubleType)))
    val df = BronzeReader.readContract(spark, dir, schema)
    assert(df.schema == schema)
    assert(df.head() == Row("austin", 35.5))
  }

  test("quarantine read routes malformed lines without failing the scan (T8)") {
    val dir = Files.createTempDirectory("graft-quarantine").toString
    Seq(
      """{"city":"austin","temp_c":35.5}""",
      """{"city":"boston","temp_c":""",      // truncated JSON
      """not json at all""",
      """{"city":"chicago","temp_c":18.2}"""
    ).toDF("value").coalesce(1).write.mode("overwrite").text(dir)
    val schema = StructType(Seq(
      StructField("city", StringType), StructField("temp_c", DoubleType)))
    val (good, bad) = BronzeReader.readWithQuarantine(spark, dir, schema)
    assert(good.schema == schema)
    assert(good.select("city").as[String].collect().toSet == Set("austin", "chicago"))
    val quarantined = bad.as[String].collect()
    assert(quarantined.length == 2)
    assert(quarantined.exists(_.contains("not json at all"))) // raw line preserved
  }
}
