package graft
import org.apache.spark.sql.SparkSession

/** Benchmark entry point. Prints `{"metric":"total",...}` JSON lines on
  * stdout; the driver tails the output and keeps the LAST parseable line.
  *
  * Failure-containment contract (round-7 lesson: a 3-pass design that
  * prints one line at the very end loses EVERYTHING when the driver's
  * timeout fires mid-run — BENCH_r07 was rc:124 with no parsed result):
  *   - a JSON line is emitted after every completed pass, AND periodically
  *     (every ~20 s) while a pass is still running, so the tail always
  *     holds the most recent complete measurement set;
  *   - a wall-clock budget (SPARK_GRAFT_BENCH_BUDGET_SEC, default 360 s of
  *     timed work) bounds the run: an in-flight pass aborts cleanly at the
  *     deadline — the running per-query minimum is still valid because a
  *     min over any subset of completed measurements is a measurement;
  *   - the process exits 0 as long as at least the partial pass ran.
  *
  * Per-query MINIMUM across however many passes fit the budget. Before any
  * measured pass, a SMALL-SF WARM-UP SWEEP runs every query once at the
  * smallest sibling scale factor (sf0.001), excluded from minima: the
  * one-time JIT/codegen/classloader costs it absorbs are data-size
  * independent, so the first MEASURED pass is already near steady state and
  * two measured passes yield warm minima where the old cold-pass-1 design
  * needed three (which stopped fitting the 360 s budget at 185 queries —
  * BENCH_r11 ran `complete: false` with cold-dominated minima). On a slow
  * host the sweep truncates at its own cap and the design degrades to the
  * old behavior, never to nothing.
  *
  * Measured order (round-13 lesson — the registry outgrew the budget and
  * BENCH_r13 recorded full_passes 0 with ~200 cold singles): a WARM
  * HEADLINE PHASE first (two measured passes over the frozen 32-entry
  * cross-round subset — the contract numbers are warm in any host window),
  * then full-battery passes with the remaining budget.
  *
  * KNOWN BOUND: the budget and the periodic emit are both checked BETWEEN
  * queries — a single query that hangs runs unbounded, and if the driver
  * then kills the process the stdout tail still holds the last complete
  * measurement set (that tail capture is the containment for this case;
  * per-query timeouts would need a watchdog thread killing Spark jobs
  * mid-flight, which risks wedging the session for every later query).
  */
object Bench {

  /** FROZEN headline subset (32 entries as of round 12). These are the
    * only per-query timings carried in the bench JSON line, so their sum
    * is the only cross-round-comparable aggregate (see SURVEY §8 — the
    * full-battery total moves with registry growth and host calib drift).
    * Membership is additions-only, each addition recorded in SURVEY §8;
    * removals/renames would silently break cross-round comparisons.
    * `BenchGateSpec` pins the exact membership. */
  val headline: Seq[String] = Seq(
    "q_pricing_summary", "q_shipping_priority", "q_join_multiway",
    "q_bucketed_join", "q_window_topk", "q_rollup", "q_sessionize", "q_asof_join",
    "q_range_join", "q_dedup_exact", "q_minhash_neardup",
    "q_minhash_neardup_fast", "q_simhash_neardup", "q_simhash_neardup_fast",
    "q_cosine_topk", "q_cosine_topk_ivf", "q_cosine_topk_ivf_indexed",
    "q_cosine_neardup_lsh", "q_cosine_neardup_lsh_fast", "q_semdedup",
    "q_lang_id", "q_token_count",
    "q_ddb_unwrap", "q_load_verification", "q_theta_overlap", "q_freq_topk",
    "q_edit_join",
    // round-12 flagships: fixed-point serving, incremental semantic
    // dedup, learned tokenization, the newly-oracled production PQ
    "q_ivf_search_exact", "q_pq_search_exact", "q_semdedup_delta",
    "q_bpe_tokens", "q_pq_topk")

  def main(args: Array[String]): Unit = {
    val t0 = System.nanoTime()
    def elapsed(): Double = (System.nanoTime() - t0) / 1e9
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "360").toDouble
    val spark = SessionFactory.builder("graft-bench", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Self-calibration (see SpinProbe): fixed-work CPU probes measured
    // before pass 1 and again after the last pass, carried in EVERY JSON
    // line so the judge can read a throttle multiple straight off the
    // bench file (quiet-host reference values live in SURVEY §8). Pre
    // runs before Spark warmup so it samples the host, not GC overlap.
    val calibStPre = SpinProbe.singleThread()
    val calibMtPre = SpinProbe.allCores()
    // post values patched in after the pass loop; 0.0 = not yet measured
    var calibStPost = 0.0
    var calibMtPost = 0.0
    // Warmup: one cheap scan per table primes parquet readers + classloading.
    // Budget-checked: this host shows multi-minute windows where the
    // hypervisor cuts the VM's CPU ~4-50x (verified: an independent
    // single-thread spin loop collapses concurrently with Spark stalls), so
    // even "cheap" warmup scans can eat minutes — never let them push total
    // wall past the driver's kill window.
    Seq("lineitem", "orders", "customer", "documents", "embeddings").foreach { t =>
      if (elapsed() < budgetSec * 0.2)
        try sources.Tables.table(spark, sfDir, t).count()
        catch { case _: Throwable => () }
    }
    if (elapsed() < budgetSec * 0.2)
      try sources.Tables.events(spark, sfDir).count() catch { case _: Throwable => () }
    // SPARK-WORK calibration (complements the raw spin probes): a fixed
    // CPU-only Spark job — 256M xxhash64+sum over 32 range tasks, codegen +
    // scheduling + two-phase agg, zero IO. The round-11 forensics found the
    // host can run Spark work ~1.5-2× slower ACROSS ROUNDS while the spin
    // probes read identical (host-vintage scheduler/memory effects raw ALU
    // loops miss); this constant makes that visible in the bench line
    // itself. Runs after warmup so one-time session init never contaminates
    // it. Quiet-host reference in SURVEY §8.
    val calibSpark = {
      val t0 = System.nanoTime()
      try spark.range(0L, 256000000L, 1L, 32).selectExpr("sum(xxhash64(id)) AS s").collect()
      catch { case _: Throwable => () }
      (System.nanoTime() - t0) / 1e9
    }

    // Locale.ROOT: a comma-decimal default locale would emit invalid JSON
    def r3(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    // Stable order so a truncated pass 1 covers a deterministic prefix —
    // HEADLINE queries first: when a host-throttle window truncates pass 1
    // (BENCH_r08 covered 63/159 alphabetically), the surviving partial now
    // contains the full cross-round-comparable subset instead of an
    // arbitrary alphabetic prefix; the rest follows alphabetically.
    val headlineRank = headline.zipWithIndex.toMap
    val queryList = SparkEntry.queries.toSeq.sortBy { case (name, _) =>
      (headlineRank.getOrElse(name, Int.MaxValue), name) }

    // SMALL-SF WARM-UP SWEEP (round-11 verdict item 1): run every registry
    // query once against the SMALLEST sibling scale factor before any
    // measured pass. The per-query one-time costs that used to inflate the
    // measured pass 1 ~2-3x — codegen, JIT, classloading, UDF/encoder init —
    // are data-size-independent, so paying them at sf0.001 buys warm-quality
    // minima from TWO measured passes where the old design needed three
    // (185 queries x ~120 s cold no longer fits 3x in a 360 s budget).
    // Excluded from minima (different data scale — its timings mean
    // nothing), budget-capped so a throttled host degrades to a partial
    // warm-up + the old cold-pass behavior, never past the kill window.
    // Artifact caches (bucketed tables, IVF/PQ index dirs) key on the
    // source dir + data fingerprint, so the sweep builds sf0.001-vintage
    // artifacts and never touches the measured dir's.
    val warmupDir = BenchGate.warmupDirFor(sfDir,
      sys.env.get("SPARK_GRAFT_BENCH_WARMUP_DIR"))
    // Sweep order maximizes absorbed one-time cost when the cap truncates
    // it: HEADLINE entries first (the warm headline phase below re-measures
    // them immediately, so their one-time costs must be paid here, not
    // there), then queries with NO baseline (new this round — unknown cold
    // inflation, and the regression gate can't contextualize them), then
    // descending baseline time (the shapes whose cold execution inflates
    // the measured total most, in absolute terms).
    val benchBaseline = BenchGate.loadBaseline()
    var warmupN = 0
    if (warmupDir != "none") {
      val warmupDeadline = math.min(budgetSec * 0.25, elapsed() + 90.0)
      val it = queryList.sortBy { case (name, _) =>
        (headlineRank.getOrElse(name, Int.MaxValue),
         -benchBaseline.mins.getOrElse(name, Double.MaxValue)) }.iterator
      while (it.hasNext && elapsed() < warmupDeadline) {
        val (_, fn) = it.next()
        try { fn(spark, warmupDir).count() } catch { case _: Throwable => () }
        warmupN += 1
      }
    }
    val warmupT = elapsed()

    // Running per-query minimum across all completed measurements so far.
    val best = scala.collection.mutable.Map.empty[String, Double]
    // measurements per query (passes + isolated retests): the gate only
    // flags WARM-measured queries (n >= 2) — a budget-truncated capture
    // leaves its tail with one COLD measurement each, and comparing a cold
    // reading against warm baselines manufactured eight false flags at
    // once in a degraded r13 window (2.7-3.4x "ratios" that were nothing
    // but first-run codegen/IO). A query measured only once simply has no
    // warm minimum to compare; a real regression still flags the moment a
    // second pass or a retest warm-measures it.
    val nMeasured = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    var fullPasses = 0
    var headlinePasses = 0
    var retestN = 0
    def emit(pass: Int, complete: Boolean): Unit = {
      // The driver captures only the tail, so each line stays well under
      // 2000 chars: full-battery total + a fixed headline subset.
      val qs = headline.flatMap(k => best.get(k).map(v => s"\"$k\":${r3(v)}"))
        .mkString("{", ",", "}")
      // Regression gate (round-11 verdict item 4): names whose current min
      // exceeds baseline x 1.5 x host factor, worst first, capped at 8 so
      // the line stays bounded; regressions_n carries the uncapped count.
      // worst observed all-cores reading: hypervisor steal can deepen
      // mid-run (r13 observed mt_pre 12.5k vs mt_post 8.9k), and the gate
      // should scale by the window the queries actually ran in
      val mtRun =
        if (calibMtPost > 0) math.min(calibMtPre, calibMtPost) else calibMtPre
      // warm-measured only: cold single readings have no warm minimum to
      // regress against (see nMeasured above)
      val allFlags = BenchGate
        .regressions(best.toMap, benchBaseline, calibSpark, mtRun)
      val regs = allFlags.filter(nMeasured(_) >= 2)
      val regsJson = regs.take(8).map(n => s"\"$n\"").mkString("[", ",", "]")
      // ADVISORY (not the gate): would-be flags with only ONE (cold)
      // measurement. The warm-only gate correctly says nothing about them,
      // but a truncated capture that repeatedly leaves the same tail cold
      // would otherwise hide a real regression indefinitely — these names
      // tell the reader exactly which entries need an isolated warm probe.
      val coldFlags = allFlags.filter(nMeasured(_) == 1)
      val coldJson = coldFlags.take(8).map(n => s"\"$n\"").mkString("[", ",", "]")
      val retests = s""""retests":$retestN"""
      val total = if (best.nonEmpty) best.values.sum else 0.0
      // calibration in Mops/s; *_post stay 0.0 until the post-run probes fire
      val calib = s""""calib_st_pre":${r3(calibStPre)},"calib_mt_pre":${r3(calibMtPre)},"calib_st_post":${r3(calibStPost)},"calib_mt_post":${r3(calibMtPost)},"calib_spark":${r3(calibSpark)}"""
      // "t" = wall seconds since process start: the periodic lines become a
      // coarse timeline, so a mid-run throttle window shows as a stretch of
      // wall time with little pass progress even when the endpoint probes
      // read quiet
      // full_passes disambiguates a truncated over-started pass: pass 3
      // aborting with full_passes=2 means the minima rest on two COMPLETE
      // sweeps (a valid measurement), not a partial signal — the r11 run-1
      // misread ("complete:false" despite two finished passes)
      println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","t":${r3(elapsed())},"n_queries":${best.size},"pass":$pass,"complete":$complete,"full_passes":$fullPasses,"headline_passes":$headlinePasses,"warmup_n":$warmupN,"warmup_t":${r3(warmupT)},"regressions":$regsJson,"regressions_n":${regs.size},"cold_flags":$coldJson,"cold_flags_n":${coldFlags.size},$retests,$calib,"queries":$qs,"sf":"$sfDir"}""")
      System.out.flush()
    }

    var lastEmit = 0.0
    var pass = 0
    var outOfTime = false
    var lastComplete = false
    // retest reserve: proportional for small budgets (a fixed 25 s reserve
    // aborted a 25-s-budget run after its first query), capped at 25 s so
    // big budgets don't idle
    val reserveSec = math.min(25.0, budgetSec * 0.1)

    // WARM HEADLINE PHASE (round-13 verdict item 2): the frozen 32-entry
    // headline subset is the ONLY cross-round-comparable aggregate, so it
    // gets warm (n >= 2) measured-scale minima FIRST — two measured passes
    // over just these entries, before the full battery spends the budget.
    // BENCH_r13 ran a throttled window at 228 entries and got full_passes 0
    // with the warm-up sweep covering 22 queries: every headline number was
    // a cold single. This phase costs ~2x the headline warm sum (well under
    // a minute quiet) and guarantees the contract subset survives ANY host
    // window that leaves the full battery truncated. Headline entries also
    // re-measure inside the full passes below — more minima, same key.
    val headlineList = queryList.filter { case (n, _) => headlineRank.contains(n) }
    while (headlinePasses < 2 && !outOfTime) {
      var aborted = false
      // phase pass 2 repairs slowest-first, same rationale as the main loop
      val order =
        if (headlinePasses == 0) headlineList
        else headlineList.sortBy { case (n, _) => -best.getOrElse(n, Double.MaxValue) }
      val it = order.iterator
      while (it.hasNext && !aborted) {
        val (name, fn) = it.next()
        val q0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
        val dt = (System.nanoTime() - q0) / 1e9
        best.updateWith(name)(prev => Some(prev.fold(dt)(math.min(_, dt))))
        nMeasured(name) += 1
        if (elapsed() > budgetSec - reserveSec) { aborted = true; outOfTime = true }
        else if (elapsed() - lastEmit > 20.0) { emit(0, complete = false); lastEmit = elapsed() }
      }
      if (!aborted) headlinePasses += 1
      emit(0, complete = false)
      lastEmit = elapsed()
    }
    // Always start the next pass if budget remains: pass 1 still carries
    // whatever one-time cost the warm-up sweep didn't absorb (sf0.1-sized
    // IO, AQE re-plans), so predicting pass 2 from it would skip warm
    // passes that easily fit. The per-query deadline check below aborts an
    // in-flight pass cleanly, and a min over the measurements completed so
    // far is still a valid measurement — so over-starting costs nothing.
    while (pass < 3 && !outOfTime) {
      pass += 1
      var aborted = false
      // Warm passes re-measure slowest-first: the reported total is a sum of
      // per-query minima, so when the budget truncates a warm pass the
      // queries whose cold measurement is most inflated (one-time codegen /
      // JIT / GC spikes) get repaired first. Pass 1 skips the headline
      // entries when the phase above fully warm-measured them (n >= 2
      // each): re-running them would spend ~10% of the budget on a third
      // measurement while ~200 entries still have none — "full pass 1" =
      // headline phase + the rest, i.e. the whole battery measured at
      // measured scale. Later passes include everything.
      val passOrder =
        if (pass == 1 && headlinePasses >= 2)
          queryList.filterNot { case (name, _) => headlineRank.contains(name) }
        else if (pass == 1) queryList
        else queryList.sortBy { case (name, _) => -best.getOrElse(name, Double.MaxValue) }
      val it = passOrder.iterator
      while (it.hasNext && !aborted) {
        val (name, fn) = it.next()
        val q0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
        val dt = (System.nanoTime() - q0) / 1e9
        best.updateWith(name)(prev => Some(prev.fold(dt)(math.min(_, dt))))
        nMeasured(name) += 1
        // measured passes stop `reserveSec` short of the budget: the
        // reserve pays for the flag-retest pass below (isolated re-measures
        // of any currently-flagged floor-adjacent entries) + the final emit
        if (elapsed() > budgetSec - reserveSec) { aborted = true; outOfTime = true }
        else if (elapsed() - lastEmit > 20.0) { emit(pass, complete = false); lastEmit = elapsed() }
      }
      lastComplete = !aborted
      if (!aborted) fullPasses += 1
      emit(pass, complete = lastComplete)
      lastEmit = elapsed()
    }
    // FLAG RETEST (self-triaging gate): re-measure any currently-flagged
    // query in isolation before reporting it — in-battery interference on
    // floor-adjacent entries does not survive an isolated warm re-measure,
    // a real regression does (see BenchGate.retestFlags). Spends the
    // 25 s reserve the pass loop held back, never past the kill window.
    locally {
      val (retested, n) = BenchGate.retestFlags(
        best.toMap, benchBaseline, calibSpark,
        name => SparkEntry.queries.get(name).map { fn =>
          val q0 = System.nanoTime()
          try fn(spark, sfDir).count() catch { case _: Throwable => () }
          nMeasured(name) += 1
          (System.nanoTime() - q0) / 1e9
        },
        () => elapsed() < budgetSec - 5.0,
        calibMtRun = calibMtPre)
      retestN = n
      retested.foreach { case (k, v) =>
        best.updateWith(k)(prev => Some(prev.fold(v)(math.min(_, v))))
      }
    }
    // Post-run probes, then re-emit the final line: the driver keeps the
    // LAST parseable line, so the line it records carries both ends of the
    // calibration window. A pre/post disagreement flags a throttle edge
    // moving mid-run (the r8 failure mode) rather than a uniform window.
    calibStPost = SpinProbe.singleThread()
    calibMtPost = SpinProbe.allCores()
    emit(pass, complete = lastComplete)
    // dev knob: dump EVERY query's timing (sorted slowest-first) for triage
    sys.env.get("SPARK_GRAFT_BENCH_DUMP").foreach { path =>
      val full = best.toSeq.sortBy(-_._2)
        .map { case (k, v) => s""""$k":${r3(v)}""" }.mkString("{", ",", "}")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(path), full)
    }
    spark.stop()
  }
}
