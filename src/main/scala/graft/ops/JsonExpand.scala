package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions.{col, from_json}
import org.apache.spark.sql.types.StructType

/** Embedded JSON-string column expansion — the conditional
  * `glue/bronze_to_silver_openweather.py:42-61` path: a bronze row may carry
  * its real payload as a JSON string in a `payload`/`data` column; expand it
  * to top-level columns.
  *
  * Two paths, scale-ordered:
  *  - explicit schema (preferred): a single `from_json` projection; zero extra
  *    jobs, fully codegen'd, schema drift surfaces as typed nulls;
  *  - sampled inference (parity with the reference): `limit(n)` sample →
  *    `spark.read.json(Dataset[String])` (the Spark-4 replacement for the
  *    deprecated RDD overload, `glue:51-53`) → one extra tiny job. The sample
  *    never exceeds `sampleN` rows regardless of table size, so the inference
  *    job is O(1) even on a 100 TB table.
  */
object JsonExpand {

  /** Expand `jsonCol` into top-level fields with an explicit schema. */
  def withSchema(df: DataFrame, jsonCol: String, schema: StructType): DataFrame = {
    val others = df.columns.filterNot(_ == jsonCol).map(col).toSeq
    df.withColumn("_j", from_json(col(jsonCol), schema))
      .select(others :+ col("_j.*"): _*)
  }

  /** Reference-parity path: infer the embedded schema from a bounded sample.
    * Returns `df` unchanged when the sample has no non-null values
    * (the `glue:58-61` fallback branch). */
  def withInference(df: DataFrame, jsonCol: String, sampleN: Int = 200): DataFrame = {
    val sample = df.filter(col(jsonCol).isNotNull)
      .select(col(jsonCol).cast("string"))
      .limit(sampleN)
      .as(Encoders.STRING)
    if (sample.isEmpty) df
    else {
      val schema = df.sparkSession.read.json(sample).schema
      if (schema.isEmpty) df else withSchema(df, jsonCol, schema)
    }
  }

  /** Pick the embedded-payload column the way the reference does
    * (`glue:43-48`): first string-typed column named `payload` or `data`. */
  def findJsonColumn(df: DataFrame): Option[String] = {
    val stringCols = df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType)
      .map(_.name).toSet
    Seq("payload", "data").find(stringCols.contains)
  }
}
