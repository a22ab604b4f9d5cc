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
  * Usage: StreamScaleProbe <sfDir> <nBatches> <rowsPerBatch> [gate] [knob] [oob]
  *   gate = chunkstore (default) | semdedup | split | dupspan | erase
  *   knob = compactEvery for chunkstore, split, and dupspan (default 0 =
  *          off); gridBits for semdedup (default 8), then [compactEvery];
  *          for erase: [eraseEvery] (default 5 — erase a doc slice every K
  *          ingest batches) then [compactEvery] (default 5: the erase
  *          curve measures a MAINTAINED store)
  *   oob  = literal "oob" anywhere after the gate name (any gate): run
  *          the compaction OUT-OF-BAND via
  *          StreamingOps.startMaintenanceLoop instead of in-band
  *          compactEvery — §9.6's in-band-vs-out-of-band column
  * Output: one `SBATCH` line per micro-batch on stderr —
  *   `SBATCH gate=… b=<i> wall=<s> state_rows=<n>` — plus a `STOTAL` line
  *   (with maintenance-loop compaction/race counters under oob); the erase
  *   gate adds one `EBATCH b=<i> wall=<s> state_rows=<n> erased=<k>` line
  *   per erase call, timing chunkStoreErase against the grown store.
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
    var loop: Option[streaming.StreamingOps.MaintenanceLoop] = None
    // erase-gate state: every `eraseEvery` ingest batches, erase a fixed
    // slice of previously-ingested docs and time chunkStoreErase — the
    // §9.6 erase curve (cost vs grown corpus)
    var eraseFn: Option[Int => Unit] = None
    var eraseEvery = 0

    // knobs after the gate name; "oob" may sit anywhere among them
    // (numeric knobs keep positional meaning per the usage doc)
    val oob = args.drop(4).contains("oob")
    val nums = args.drop(4).filterNot(_ == "oob").map(_.toInt)

    val (q, stateRows: (() => Long)) = gate match {
      case "chunkstore" | "erase" =>
        val (chunkT, manT) = (s"$dir/chunks", s"$dir/manifest")
        val compactEvery =
          if (gate == "erase") nums.lift(1).getOrElse(5) // maintained store
          else nums.headOption.getOrElse(0)
        val query = streaming.StreamingOps.startChunkStoreIngest(
          mem.toDF().toDF("doc_id", "text"), chunkT, manT, s"$dir/ckpt",
          compactEvery = if (oob) 0 else compactEvery, trigger = trigger)
        if (oob)
          loop = Some(streaming.StreamingOps.startMaintenanceLoop(
            spark, Seq(chunkT, manT), intervalMs = 1000,
            onCompact = streaming.StreamingOps
              .chunkStoreMaintenanceRestamp(spark, chunkT)))
        if (gate == "erase") {
          eraseEvery = nums.headOption.getOrElse(5)
          val stride = math.max(1, rowsPerBatch / 10) // erase 10% of one batch
          eraseFn = Some { b =>
            // erase a slice from the OLDEST still-live batch region so
            // every erase does real work against the grown store
            val base = docs(0)._1
            val lo = base + ((b / math.max(1, eraseEvery)) - 1).toLong * stride
            val ids = (lo until lo + stride).toSeq
            val e0 = System.nanoTime()
            streaming.StreamingOps.chunkStoreErase(spark, manT, chunkT, ids)
            val wall = (System.nanoTime() - e0) / 1e9
            val st = sinks.Snapshots.read(spark, chunkT).count()
            System.err.println(
              f"EBATCH b=$b%d wall=$wall%.2f state_rows=$st%d erased=${ids.size}%d")
          }
        }
        (query, () => sinks.Snapshots.read(spark, chunkT).count())
      case "semdedup" =>
        val outT = s"$dir/corpus"
        val gridBits = nums.headOption.getOrElse(8)
        val compactEvery = nums.lift(1).getOrElse(0)
        val query = streaming.StreamingOps.startSemDedupIngest(
          embeddingsFor(mem.toDF().toDF("doc_id", "text")),
          outT, s"$dir/ckpt", minCos = 0.995, gridBits = gridBits, dim = 16,
          compactEvery = if (oob) 0 else compactEvery, trigger = trigger)
        if (oob)
          loop = Some(streaming.StreamingOps.startMaintenanceLoop(
            spark, Seq(outT), intervalMs = 1000))
        (query, () => if (sinks.Snapshots.versions(spark, outT).isEmpty) 0L
                      else sinks.Snapshots.read(spark, outT).count())
      case "dupspan" =>
        // exact-substring admission gate: per-batch cost is the batch's
        // grams probed against the bucket-pruned 8-gram index — the index
        // is the growing state axis
        val (docsT, gramT) = (s"$dir/docs", s"$dir/grams")
        val compactEvery = nums.headOption.getOrElse(0)
        val query = streaming.StreamingOps.startDupSpanIngest(
          mem.toDF().toDF("doc_id", "text"), docsT, gramT, s"$dir/ckpt",
          compactEvery = if (oob) 0 else compactEvery, trigger = trigger)
        if (oob)
          loop = Some(streaming.StreamingOps.startMaintenanceLoop(
            spark, Seq(docsT, gramT), intervalMs = 1000))
        (query, () => if (sinks.Snapshots.versions(spark, gramT).isEmpty) 0L
                      else sinks.Snapshots.read(spark, gramT).count())
      case "split" =>
        // the leakage-safe split gate reads TWO state tables per batch
        // (token index probe + candidate doc fetch) — the §9.4 axis here
        // is the token index, whose row count grows fastest
        val (docsT, tokenT) = (s"$dir/docs", s"$dir/tokens")
        val compactEvery = nums.headOption.getOrElse(0)
        val query = streaming.StreamingOps.startSplitIngest(
          mem.toDF().toDF("doc_id", "text"), docsT, tokenT, s"$dir/ckpt",
          compactEvery = if (oob) 0 else compactEvery, trigger = trigger)
        if (oob)
          loop = Some(streaming.StreamingOps.startMaintenanceLoop(
            spark, Seq(docsT, tokenT), intervalMs = 1000))
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
        eraseFn.foreach(fn => if (eraseEvery > 0 && b > 0 && b % eraseEvery == 0) fn(b))
      }
    } finally {
      q.stop()
      loop.foreach(_.stop())
    }
    val loopStats = loop.map(l =>
      f" oob_compactions=${l.compactions.get()}%d oob_races=${l.races.get()}%d oob_errors=${l.errors.get()}%d").getOrElse("")
    System.err.println(f"STOTAL gate=$gate batches=$nBatches%d rows_per_batch=$rowsPerBatch%d total=${(System.nanoTime() - t0) / 1e9}%.1f$loopStats")
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
