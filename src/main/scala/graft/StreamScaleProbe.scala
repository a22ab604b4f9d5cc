package graft

import org.apache.spark.sql.functions._

/** Dev main for the STREAMING leg of the scaling curve (SURVEY §9.4): drive
  * one ingest gate with fixed-size micro-batches while its accumulated state
  * grows, and print per-batch wall + state size. The batch battery has 5×
  * and 10× points; this answers the question those can't — does PER-BATCH
  * cost stay bounded as the corpus behind the gate grows 10×? A gate whose
  * batch cost tracks corpus size re-reads its state per batch and becomes
  * the bottleneck long before 100 TB; a bounded gate's curve is flat.
  *
  * Usage: StreamScaleProbe <sfDir> <nBatches> <rowsPerBatch> [gate] [knob]
  *   gate = chunkstore (default) | semdedup | split | dupspan
  *   knob = compactEvery for chunkstore, split, and dupspan (default 0 =
  *          off); gridBits for semdedup (default 8), then [compactEvery]
  * Output: one `SBATCH` line per micro-batch on stderr —
  *   `SBATCH gate=… b=<i> wall=<s> state_rows=<n>` — plus a `STOTAL` line.
  * Fixed batch size by design: the x-axis is accumulated state, nothing
  * else moves.
  */
object StreamScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nBatches = args(1).toInt
    val rowsPerBatch = args(2).toInt
    val gate = if (args.length > 3) args(3) else "chunkstore"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = SessionFactory.builder("graft-stream-scale", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = sources.Tables.documents(spark, sfDir)
      .select($"doc_id".as[Long], $"text".as[String])
      .orderBy($"doc_id")
      .take(nBatches * rowsPerBatch)
    require(docs.length == nBatches * rowsPerBatch,
      s"need ${nBatches * rowsPerBatch} docs, ${sfDir} has ${docs.length}")

    val dir = java.nio.file.Files.createTempDirectory("graft-streamscale").toString
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0)

    val (q, stateRows: (() => Long)) = gate match {
      case "chunkstore" =>
        val (chunkT, manT) = (s"$dir/chunks", s"$dir/manifest")
        val compactEvery = if (args.length > 4) args(4).toInt else 0
        val query = streaming.StreamingOps.startChunkStoreIngest(
          mem.toDF().toDF("doc_id", "text"), chunkT, manT, s"$dir/ckpt",
          compactEvery = compactEvery, trigger = trigger)
        (query, () => sinks.Snapshots.read(spark, chunkT).count())
      case "semdedup" =>
        val outT = s"$dir/corpus"
        val gridBits = if (args.length > 4) args(4).toInt else 8
        val compactEvery = if (args.length > 5) args(5).toInt else 0
        val query = streaming.StreamingOps.startSemDedupIngest(
          embeddingsFor(mem.toDF().toDF("doc_id", "text")),
          outT, s"$dir/ckpt", minCos = 0.995, gridBits = gridBits, dim = 16,
          compactEvery = compactEvery, trigger = trigger)
        (query, () => if (sinks.Snapshots.versions(spark, outT).isEmpty) 0L
                      else sinks.Snapshots.read(spark, outT).count())
      case "dupspan" =>
        // exact-substring admission gate: per-batch cost is the batch's
        // grams probed against the bucket-pruned 8-gram index — the index
        // is the growing state axis
        val (docsT, gramT) = (s"$dir/docs", s"$dir/grams")
        val compactEvery = if (args.length > 4) args(4).toInt else 0
        val query = streaming.StreamingOps.startDupSpanIngest(
          mem.toDF().toDF("doc_id", "text"), docsT, gramT, s"$dir/ckpt",
          compactEvery = compactEvery, trigger = trigger)
        (query, () => if (sinks.Snapshots.versions(spark, gramT).isEmpty) 0L
                      else sinks.Snapshots.read(spark, gramT).count())
      case "split" =>
        // the leakage-safe split gate reads TWO state tables per batch
        // (token index probe + candidate doc fetch) — the §9.4 axis here
        // is the token index, whose row count grows fastest
        val (docsT, tokenT) = (s"$dir/docs", s"$dir/tokens")
        val compactEvery = if (args.length > 4) args(4).toInt else 0
        val query = streaming.StreamingOps.startSplitIngest(
          mem.toDF().toDF("doc_id", "text"), docsT, tokenT, s"$dir/ckpt",
          compactEvery = compactEvery, trigger = trigger)
        (query, () => if (sinks.Snapshots.versions(spark, tokenT).isEmpty) 0L
                      else sinks.Snapshots.read(spark, tokenT).count())
      case other => sys.error(s"unknown gate $other")
    }

    val t0 = System.nanoTime()
    try {
      (0 until nBatches).foreach { b =>
        mem.addData(docs.slice(b * rowsPerBatch, (b + 1) * rowsPerBatch).toSeq)
        val b0 = System.nanoTime()
        q.processAllAvailable()
        val wall = (System.nanoTime() - b0) / 1e9
        val st = stateRows()
        System.err.println(f"SBATCH gate=$gate b=$b%d wall=$wall%.2f state_rows=$st%d")
      }
    } finally q.stop()
    System.err.println(f"STOTAL gate=$gate batches=$nBatches%d rows_per_batch=$rowsPerBatch%d total=${(System.nanoTime() - t0) / 1e9}%.1f")
    spark.stop()
  }

  /** semdedup gate input: deterministic 16-dim embeddings derived from the
    * text (stable across scales) — the gate's cost shape is what's probed,
    * not embedding quality. */
  private def embeddingsFor(
      stream: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    stream.select(col("doc_id").as("id"),
      org.apache.spark.sql.functions.transform(
        sequence(lit(0), lit(15)),
        i => (pmod(xxhash64(col("text"), i), lit(1000)).cast("float") / lit(500f)) - lit(1f)
      ).as("v"))
}
