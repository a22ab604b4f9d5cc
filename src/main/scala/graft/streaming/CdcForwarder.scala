package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.ops.DdbUnwrap
import graft.sinks.LakeWriter

/** The reference's change-stream leg (SURVEY.md §2.9, E3) as Structured
  * Streaming: DDB-Streams-shaped CDC events → INSERT filter (T2) → type-tag
  * unwrap (F18) → keyed (T3), arrival-time-partitioned (T4), gzip-NDJSON
  * bronze sink with a micro-batch trigger (T1) — the Spark re-expression of
  * `lambda/ddb_stream_forwarder/handler.py:33-73` + the Firehose config
  * (`README.md:145-154`).
  *
  * Scale design: the stream is stateless (filter + per-row projection), so
  * executors scale horizontally with source partitions; the only data
  * movement is the per-batch `repartition(city)` mirroring the Kinesis
  * partition key, and the sink appends hive-partitioned files so downstream
  * reads prune on dt/hour. Exactly-once file output comes from the
  * checkpointed file-sink-style foreachBatch (idempotent per-partition
  * overwrite would upgrade at-least-once to effectively-once; the reference
  * itself is explicitly at-least-once via Lambda retry, `fwd:67-72`).
  */
object CdcForwarder {

  /** DDB Streams event envelope. `NewImage` is declared StringType so the
    * parser hands back the raw type-tagged JSON text for F18 to unwrap —
    * schema-free at this layer, exactly like the reference's handler. */
  val envelopeSchema: StructType = StructType(Seq(
    StructField("eventID", StringType),
    StructField("eventName", StringType),
    StructField("dynamodb", StructType(Seq(
      StructField("NewImage", StringType),
      StructField("SequenceNumber", StringType))))))

  /** INSERT-only filter + unwrap + partition-key extraction on a static or
    * streaming envelope frame; pure narrow transforms, shared by the batch
    * battery (q_cdc_insert_filter) and the stream below. */
  def unwrapInserts(events: DataFrame): DataFrame = {
    val plain = events
      .filter(col("eventName") === "INSERT")            // T2 (fwd:36-37)
      .filter(col("dynamodb.NewImage").isNotNull)       // P11 guard (fwd:39-40)
      .select(DdbUnwrap.ddb_unwrap(col("dynamodb.NewImage")).as("json"))
    plain.select(
      coalesce(get_json_object(col("json"), "$.city"), lit("unknown"))
        .as("partition_key"),                            // T3 (fwd:46-47)
      col("json"))
  }

  /** Arrival-time dt/hour stamping (T4): Firehose's `!{timestamp:...}`
    * prefix is PROCESSING time — kept faithfully (SURVEY.md §2.9 T5 notes the
    * resulting event/arrival-time skew; silver re-derives event time). */
  def stampArrivalTime(df: DataFrame): DataFrame =
    df.withColumn("dt", date_format(current_timestamp(), "yyyy-MM-dd"))
      .withColumn("hour", date_format(current_timestamp(), "HH"))

  /** End-to-end forwarder: stream CDC envelope NDJSON from `srcDir`,
    * land INSERT images as gzip NDJSON under `bronzeDir/dt=/hour=/`.
    * `trigger` defaults to the Firehose 60 s buffer analog; tests pass
    * `Trigger.AvailableNow` to drain and stop. */
  def forward(
      spark: SparkSession,
      srcDir: String,
      bronzeDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("60 seconds")): StreamingQuery = {
    val events = spark.readStream
      .schema(envelopeSchema)
      .json(srcDir)
    val out = stampArrivalTime(unwrapInserts(events))
    out.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // keyed write (T3): co-locate each partition key like the Kinesis
        // put_records partition key; then hive-partitioned gzip NDJSON (S6).
        LakeWriter.writeBronze(batch.repartition(col("partition_key")), bronzeDir)
      }
      .start()
  }
}
