package graft

import org.scalatest.funsuite.AnyFunSuite

/** End-to-end driver contract for the bench main, in a REAL forked JVM:
  * the driver tails stdout, keeps the last parseable JSON line, and kills
  * the process on a wall-clock timeout — so the contract is "every emitted
  * line is complete, self-describing, parseable, and bounded, and the
  * process exits 0 even when the budget truncates a pass". Round 7 lost an
  * entire capture to exactly this class of failure (one line at the very
  * end, driver timeout mid-run → nothing parseable), which is why this is
  * pinned as a spec and not an assumption.
  *
  * The fork runs with a deliberately TINY budget at sf0.001 (warm-up
  * disabled), so the run is a truncated pass 1 — the worst case the
  * contract must survive.
  */
class BenchContractSpec extends AnyFunSuite {

  test("bench emits bounded, parseable, self-calibrating JSON and exits 0 under a truncating budget") {
    val script = new java.io.File("tools/run.sh")
    assume(script.canExecute, "tools/run.sh not present/executable")
    val pb = new ProcessBuilder(script.getAbsolutePath, "graft.Bench")
    pb.environment().put("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    // 30 s: small enough that no host finishes a COLD 230-query pass
    // (cold per-query floor is ~0.3 s — a full pass needs over a minute),
    // so the truncation assertions below can never flip on a fast machine,
    // yet large enough that the pace model always gets its 3 samples
    // before the hard budget abort — session init (spin probes + table
    // warmup + the REAL 256M-row calib job) plus 3 cold entries is
    // ~10-16 s, and a 20 s budget flaked on a slow-window full-suite run
    pb.environment().put("SPARK_GRAFT_BENCH_BUDGET_SEC", "30")
    pb.environment().put("SPARK_GRAFT_BENCH_WARMUP_DIR", "none")
    pb.environment().put("SPARK_GRAFT_CPUS", "4")
    // ISOLATE the smoke run's resume state: the default path is now
    // repo-local, and this fork must neither resume a real capture's
    // minima (resumed entries would defeat the truncation assertions) nor
    // write its throttled sf0.001 readings anywhere a real capture reads
    pb.environment().put("SPARK_GRAFT_BENCH_STATE", "none")
    pb.redirectErrorStream(false)
    // DRAIN (discard) the child's stderr: log4j writes Spark WARN/ERROR
    // lines there, and an undrained 64 KiB pipe buffer wedges the child's
    // executor threads mid-log — the child then never closes stdout and
    // the readLine loop below waits forever (observed live in round 15
    // when the probe timeline pushed stderr volume past the buffer)
    pb.redirectError(ProcessBuilder.Redirect.DISCARD)
    val proc = pb.start()
    val out = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    val lines = Iterator.continually(out.readLine()).takeWhile(_ != null).toVector
    val finished = proc.waitFor(420, java.util.concurrent.TimeUnit.SECONDS)
    if (!finished) proc.destroyForcibly() // don't leave a JVM running on failure
    assert(finished, "bench did not finish under the spec timeout")
    assert(proc.exitValue() == 0, s"bench exited nonzero; stdout:\n${lines.mkString("\n")}")

    val jsonLines = lines.filter(_.startsWith("{"))
    assert(jsonLines.nonEmpty, s"no JSON lines emitted:\n${lines.mkString("\n")}")
    // the driver's tail buffer bound — EVERY line must respect it
    jsonLines.foreach { l =>
      assert(l.length < 2000, s"line exceeds the driver tail bound (${l.length}):\n$l")
    }
    // the line the driver keeps: last parseable one
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val last = JsonMethods.parse(jsonLines.last).asInstanceOf[JObject].values
    assert(last("metric") == "total")
    assert(last("unit") == "sec")
    val requiredKeys = Seq("value", "t", "n_queries", "pass", "complete",
      "full_passes", "headline_passes", "headline_target", "degraded",
      "warmup_n", "warmup_t", "resumed_n",
      "n_sf", "downshift_n", "downshift_total", "downshift",
      "regressions", "regressions_n", "cold_flags", "cold_flags_n",
      "mcal_n", "mcal_min", "mcal_med", "mcal_max",
      "io_n", "io_min", "io_med", "io_max", "mcal_ref", "io_ref",
      "calib_st_pre", "calib_mt_pre", "calib_st_post", "calib_mt_post",
      "calib_spark", "queries", "sf")
    requiredKeys.foreach(k => assert(last.contains(k), s"missing field $k"))
    // measuring the SMALLEST scale: the downshift ladder is empty by
    // construction (no smaller sibling), so every measurement is at the
    // requested scale — n_queries and n_sf must agree and the downshift
    // fields must read zero
    assert(last("downshift_n") == BigInt(0), "downshift engaged at sf0.001")
    assert(last("n_sf") == last("n_queries"))
    assert(last("n_queries").asInstanceOf[BigInt] >= 1, "no measurements recorded")
    assert(last("calib_spark").asInstanceOf[Double] > 0.0, "calib_spark not measured")
    // post-run probes fire even on a truncated run (the final re-emit)
    assert(last("calib_st_post").asInstanceOf[Double] > 0.0, "post probe missing")
    assert(last("queries").isInstanceOf[Map[_, _]], "queries must be an object")
    // a 10 s budget cannot fit a full 190+-query pass: truncation must be
    // visible and honest
    assert(last("complete") == false && last("full_passes") == BigInt(0))
    // the calib timeline brackets the run: at least the start + end samples
    assert(last("mcal_n").asInstanceOf[BigInt] >= 2, "micro-calib timeline missing")
    assert(last("io_n").asInstanceOf[BigInt] >= 2, "io-probe timeline missing")
    // a 10 s budget can never fit 2 headline passes + a sweep at measured
    // pace — the pace-aware fallback MUST have engaged and said so
    assert(last("degraded") == true, "pace fallback did not engage on a 10 s budget")
    assert(last("headline_target").asInstanceOf[BigInt] < 2)
  }
}
