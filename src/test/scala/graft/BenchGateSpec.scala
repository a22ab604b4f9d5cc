package graft

import org.scalatest.funsuite.AnyFunSuite

/** The calib-normalized regression gate (round-11 verdict item 4): a
  * deliberately slowed query must be flagged; host-vintage slowdowns and
  * sub-floor noise must not. */
class BenchGateSpec extends AnyFunSuite {

  private val base = BenchGate.Baseline(
    Map("q_fast" -> 0.10, "q_mid" -> 0.60, "q_big" -> 2.00),
    calibSparkRef = 0.50)

  test("a deliberately slowed query is flagged") {
    // q_mid at 3x its baseline on a same-vintage host (calib ratio 1)
    val regs = BenchGate.regressions(
      Map("q_mid" -> 1.80, "q_big" -> 2.05), base, calibSparkRun = 0.50)
    assert(regs == Seq("q_mid"))
  }

  test("worst-ratio-first ordering when several regress") {
    val regs = BenchGate.regressions(
      Map("q_mid" -> 1.80, "q_big" -> 9.00), base, calibSparkRun = 0.50)
    assert(regs == Seq("q_big", "q_mid")) // 4.5x before 3.0x
  }

  test("a uniformly slower host (calib_spark ratio) widens the allowance") {
    // 2x-slower host: q_mid at 1.7s is within 0.6 * 1.5 * 2.0 = 1.8 —
    // the same timing that IS a regression on a quiet host is not one here
    val quiet = BenchGate.regressions(Map("q_mid" -> 1.70), base, 0.50)
    val slow = BenchGate.regressions(Map("q_mid" -> 1.70), base, 1.00)
    assert(quiet == Seq("q_mid") && slow.isEmpty)
  }

  test("a faster host never tightens the gate below the quiet baseline") {
    // calib ratio 0.5 (host twice as fast): bound stays 0.6 * 1.5, so a
    // 0.7s q_mid — fine on the baseline host — is not flagged
    assert(BenchGate.regressions(Map("q_mid" -> 0.70), base, 0.25).isEmpty)
  }

  test("sub-floor timings are exempt (scheduler noise, not regressions)") {
    // q_fast tripled but still under the 0.30s floor
    assert(BenchGate.regressions(Map("q_fast" -> 0.29), base, 0.50).isEmpty)
    assert(BenchGate.regressions(Map("q_fast" -> 0.31), base, 0.50) == Seq("q_fast"))
  }

  test("queries absent from the baseline are skipped, not flagged") {
    assert(BenchGate.regressions(Map("q_new" -> 99.0), base, 0.50).isEmpty)
  }

  test("missing calib reference disables normalization, not the gate") {
    val noCalib = base.copy(calibSparkRef = 0.0)
    assert(BenchGate.regressions(Map("q_mid" -> 1.00), noCalib, 0.50) == Seq("q_mid"))
  }

  test("warm-up dir: sibling sf0.001, never the measured dir itself") {
    val parent = java.nio.file.Files.createTempDirectory("graft-wu")
    val small = java.nio.file.Files.createDirectory(parent.resolve("sf0.001"))
    val big = java.nio.file.Files.createDirectory(parent.resolve("sf0.1"))
    assert(BenchGate.warmupDirFor(big.toString, None) == small.toString)
    // benching sf0.001 itself: no warm-up (it would be a hidden measured-scale pass)
    assert(BenchGate.warmupDirFor(small.toString, None) == "none")
    // no sibling: no warm-up
    val lone = java.nio.file.Files.createTempDirectory("graft-wu2").resolve("sf0.1")
    java.nio.file.Files.createDirectories(lone)
    assert(BenchGate.warmupDirFor(lone.toString, None) == "none")
    // explicit override wins, including the disable sentinel
    assert(BenchGate.warmupDirFor(big.toString, Some("/elsewhere")) == "/elsewhere")
    assert(BenchGate.warmupDirFor(big.toString, Some("none")) == "none")
  }

  test("shipped baseline resource loads and covers the headline queries") {
    val b = BenchGate.loadBaseline()
    // the resource ships with the repo; a parse failure would yield empty
    assert(b.mins.nonEmpty, "bench-baseline.properties missing or unparseable")
    assert(b.calibSparkRef > 0.0)
    Seq("q_pricing_summary", "q_dedup_exact", "q_cosine_topk").foreach { q =>
      assert(b.mins.contains(q), s"baseline missing headline query $q")
    }
  }
}
