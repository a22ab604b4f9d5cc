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

  test("multi-core steal (mt spin ratio) widens the allowance even when calib_spark reads quiet") {
    // the r13 throttled-window shape: single-thread-ish calib_spark at the
    // reference (ratio 1) but the all-cores spin at HALF speed — a
    // 32-thread query legitimately runs ~2x slow. With calib_mt_ref set,
    // the same timing that flags without it is absorbed by the mt leg.
    val mtBase = base.copy(calibMtRef = 14000.0)
    val without = BenchGate.regressions(Map("q_mid" -> 1.70), base, 0.50, 7000.0)
    val withMt = BenchGate.regressions(Map("q_mid" -> 1.70), mtBase, 0.50, 7000.0)
    assert(without == Seq("q_mid") && withMt.isEmpty)
    // the gate takes the WORST ratio: a genuine 4x slowdown still flags
    // under the same 2x mt throttle
    assert(BenchGate.regressions(Map("q_mid" -> 3.70), mtBase, 0.50, 7000.0) == Seq("q_mid"))
    // a FASTER mt reading never tightens below the quiet baseline
    assert(BenchGate.regressions(Map("q_mid" -> 0.85), mtBase, 0.50, 28000.0).isEmpty)
    // absent mt reading (0) disables the leg, not the gate
    assert(BenchGate.regressions(Map("q_mid" -> 1.70), mtBase, 0.50, 0.0) == Seq("q_mid"))
  }

  test("sub-floor timings are exempt (scheduler noise, not regressions)") {
    // q_fast far above its baseline but still under the 0.90s floor — the
    // exact class every live false positive to date fell in (q_percentiles
    // 0.31s vs a 0.149s fast-window baseline, q_asof_tolerance 0.44s vs
    // 0.267s in r12, then SEVEN 0.74-0.85s readings against 0.33-0.45s
    // baselines in one r13 capture): sub-second wobble on an untouched
    // path is host noise; real scale-killers move timings by integer
    // factors, not tenths
    assert(BenchGate.regressions(Map("q_fast" -> 0.89), base, 0.50).isEmpty)
    assert(BenchGate.regressions(Map("q_fast" -> 0.91), base, 0.50) == Seq("q_fast"))
  }

  test("multi-capture baseline: upper median, never a lone fast window") {
    // three captures of q_x: one anomalously fast window (0.15), two
    // normal (0.42, 0.45) — the policy must bless 0.42, not 0.15, so the
    // next normal run (0.44) is inside 0.42 * 1.5 instead of flagged
    val b = BenchGate.combineCaptures(Seq(
      Map("q_x" -> 0.15, "q_y" -> 1.00),
      Map("q_x" -> 0.42, "q_y" -> 1.10),
      Map("q_x" -> 0.45)))
    assert(b("q_x") == 0.42, "upper median of (0.15, 0.42, 0.45)")
    // q_y measured in only two captures: upper median = the SLOWER one —
    // with an even count the conservative (non-flagging) side wins
    assert(b("q_y") == 1.10)
    val regs = BenchGate.regressions(
      Map("q_x" -> 0.55), BenchGate.Baseline(b, 0.5), calibSparkRun = 0.5)
    assert(regs.isEmpty, "a normal re-run must not flag against the median baseline")
  }

  test("headline subset is FROZEN: additions only, recorded in SURVEY §8") {
    // cross-round headline sums are the only comparable aggregate; a
    // silent membership change would corrupt every comparison. If this
    // test fails you either removed/renamed an entry (don't) or added one
    // without extending this pin + SURVEY §8 (do both).
    val frozen = Seq(
      "q_pricing_summary", "q_shipping_priority", "q_join_multiway",
      "q_bucketed_join", "q_window_topk", "q_rollup", "q_sessionize", "q_asof_join",
      "q_range_join", "q_dedup_exact", "q_minhash_neardup",
      "q_minhash_neardup_fast", "q_simhash_neardup", "q_simhash_neardup_fast",
      "q_cosine_topk", "q_cosine_topk_ivf", "q_cosine_topk_ivf_indexed",
      "q_cosine_neardup_lsh", "q_cosine_neardup_lsh_fast", "q_semdedup",
      "q_lang_id", "q_token_count",
      "q_ddb_unwrap", "q_load_verification", "q_theta_overlap", "q_freq_topk",
      "q_edit_join",
      "q_ivf_search_exact", "q_pq_search_exact", "q_semdedup_delta",
      "q_bpe_tokens", "q_pq_topk")
    assert(Bench.headline.take(frozen.size) == frozen,
      "frozen prefix of the headline subset changed")
    assert(Bench.headline.size == frozen.size,
      s"headline grew to ${Bench.headline.size} — extend this pin AND note it in SURVEY §8")
    // every headline entry must exist in the registry (a rename would
    // silently drop its timing from the bench line)
    Bench.headline.foreach(q =>
      assert(SparkEntry.queries.contains(q), s"headline entry $q not in registry"))
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

  test("flag retest: interference noise clears, a real regression survives") {
    // q_mid flagged at 1.8 vs bound 0.9; the isolated re-measure reads 0.7
    // (in-battery interference) → the flag clears and the minimum updates
    val (cleared, n1) = BenchGate.retestFlags(
      Map("q_mid" -> 1.80, "q_big" -> 2.05), base, 0.50,
      measure = _ => Some(0.70), hasTime = () => true)
    assert(cleared("q_mid") == 0.70 && n1 == 1)
    assert(BenchGate.regressions(cleared, base, 0.50).isEmpty)
    // a REAL regression re-measures slow both rounds and stays flagged
    var calls = 0
    val (still, n2) = BenchGate.retestFlags(
      Map("q_mid" -> 1.80), base, 0.50,
      measure = { _ => calls += 1; Some(1.75) }, hasTime = () => true)
    assert(BenchGate.regressions(still, base, 0.50) == Seq("q_mid"))
    assert(n2 == 2 && calls == 2) // bounded at maxRounds, then reported
    // no time reserve left → untouched
    val (same, n3) = BenchGate.retestFlags(
      Map("q_mid" -> 1.80), base, 0.50,
      measure = _ => Some(0.1), hasTime = () => false)
    assert(same("q_mid") == 1.80 && n3 == 0)
  }

  // ---- pace-aware headline fallback (round-15: the BENCH_r14 failure) ----

  // a 32-entry headline at 0.75 s baseline each (24 s quiet) + a 198-entry
  // battery remainder at 0.5 s each (99 s quiet): the r14-era shape
  private val hl = (1 to 32).map(i => f"q_h$i%02d")
  private val rest = (1 to 198).map(i => f"q_r$i%03d")
  private val paceBase = (hl.map(_ -> 0.75) ++ rest.map(_ -> 0.5)).toMap

  private def paceAt(factor: Double, n: Int = 4): BenchGate.Pace = {
    val p = new BenchGate.Pace(paceBase)
    hl.take(n).foreach(q => p.observe(q, 0.75 * factor))
    p
  }

  test("pace: median of observed/expected, 1.0 under 3 samples, floored at 0.5") {
    val p = new BenchGate.Pace(paceBase)
    p.observe("q_h01", 7.5) // 10x — but a single sample decides nothing
    assert(p.factor == 1.0)
    p.observe("q_h02", 7.5); p.observe("q_h03", 7.5)
    assert(math.abs(p.factor - 10.0) < 1e-9)
    // median, not mean: one cold outlier cannot set the pace
    val p2 = new BenchGate.Pace(paceBase)
    Seq(1.0, 1.0, 40.0).zip(hl).foreach { case (f, q) => p2.observe(q, 0.75 * f) }
    assert(math.abs(p2.factor - 1.0) < 1e-9)
    // a fast host floors at 0.5x — projections never promise negative time
    val p3 = paceAt(0.1)
    assert(p3.factor == 0.5)
    // unblessed entries project at the median baseline
    assert(new BenchGate.Pace(paceBase).est("q_brand_new") == 0.5)
  }

  test("quiet window: the full 2-pass headline contract stands") {
    val t = BenchGate.headlineTarget(paceAt(1.0), remainingThisPass = hl.drop(4),
      headlineAll = hl, unmeasuredRest = rest,
      elapsed = 103.0, budget = 360.0, reserve = 25.0, phaseSpent = 3.0)
    assert(t == 2) // 45 s of headline + 99 s sweep fits a 360 s budget
  }

  test("an r14-grade window (20-50x) aborts the phase for breadth") {
    // at 20x, finishing even THIS pass costs 28 entries x 15 s = 420 s:
    // the only budget-respecting plan is the full-battery sweep, which
    // orders headline entries first anyway — coverage over warmth
    val t = BenchGate.headlineTarget(paceAt(20.0), remainingThisPass = hl.drop(4),
      headlineAll = hl, unmeasuredRest = rest,
      elapsed = 150.0, budget = 360.0, reserve = 25.0, phaseSpent = 50.0)
    assert(t == 0)
  }

  test("a mildly slow window drops to one warm pass when that still leaves the sweep") {
    // 4x pace late in the battery (only 10 entries left unmeasured):
    // finishing this pass costs 84 s, a second pass 96 s more — two passes
    // blow the 40% headline share, but one pass + the 20 s sweep fits
    val t = BenchGate.headlineTarget(paceAt(4.0), remainingThisPass = hl.drop(4),
      headlineAll = hl, unmeasuredRest = rest.take(10),
      elapsed = 60.0, budget = 360.0, reserve = 25.0, phaseSpent = 12.0)
    assert(t == 1)
  }

  test("no decision before evidence: under 3 samples the target stays 2") {
    val t = BenchGate.headlineTarget(paceAt(50.0, n = 2), remainingThisPass = hl.drop(2),
      headlineAll = hl, unmeasuredRest = rest,
      elapsed = 300.0, budget = 360.0, reserve = 25.0, phaseSpent = 100.0)
    assert(t == 2)
  }

  test("headline projection does not double-count entries the pass will measure") {
    // mid-pass-1 shape: the 28 remaining headline entries are BOTH the
    // pass remainder and part of the unmeasured set. At 4x pace with 10
    // non-headline entries left: rest1 = 84 s, sweep-after-pass = 20 s —
    // one pass + sweep fits 150 s of headroom, but the old double-counted
    // projection (84 + 104) would have degraded to 0 and sacrificed
    // warmth the budget could afford.
    val t = BenchGate.headlineTarget(paceAt(4.0), remainingThisPass = hl.drop(4),
      headlineAll = hl, unmeasuredRest = hl.drop(4) ++ rest.take(10),
      elapsed = 185.0, budget = 360.0, reserve = 25.0, phaseSpent = 12.0)
    assert(t == 1)
  }

  // ---- measured-scale downshift (round-16: the r15 breadth gap) ----

  test("downshift needs BOTH a failing pace projection AND host corroboration (or lateness)") {
    // 198 unmeasured at 0.5 s baseline (quiet cost 99 s), 4x pace = 396 s
    // projected against 235 s available: the pace gate fails...
    // ...but a QUIET host (ratio 1) says the 99 s battery fits — the 4x
    // factor is first-touch cold bias, not throttle: NO downshift (the
    // live failure: a quiet 360 s run downshifted 232 entries and kept
    // only 115 at measured scale)
    assert(!BenchGate.shouldDownshift(paceAt(4.0), rest,
      elapsed = 100.0, budget = 360.0, reserve = 25.0, hostRatio = 1.0))
    // a genuinely throttled host (3.5x): 99 * 3.5 = 347 > 235 — downshift
    assert(BenchGate.shouldDownshift(paceAt(4.0), rest,
      elapsed = 100.0, budget = 360.0, reserve = 25.0, hostRatio = 3.5))
    // LATE in the budget the warm-informed pace is believable on its own:
    // past 60% the projection alone decides, host ratio ignored
    assert(BenchGate.shouldDownshift(paceAt(4.0), rest,
      elapsed = 300.0, budget = 360.0, reserve = 25.0, hostRatio = 1.0))
    // quiet pace: projection fits — the host probe is never even consulted
    // (by-name: evaluating it here would throw)
    assert(!BenchGate.shouldDownshift(paceAt(1.0), rest,
      elapsed = 100.0, budget = 360.0, reserve = 25.0,
      hostRatio = sys.error("probe must not run when the pace fits")))
    // no evidence (under 3 samples): never downshift
    assert(!BenchGate.shouldDownshift(paceAt(50.0, n = 2), rest,
      elapsed = 300.0, budget = 360.0, reserve = 25.0, hostRatio = 50.0))
    // nothing unmeasured: nothing to shift
    assert(!BenchGate.shouldDownshift(paceAt(50.0), Seq.empty,
      elapsed = 300.0, budget = 360.0, reserve = 25.0, hostRatio = 50.0))
  }

  test("downshift ladder: smaller sf siblings only, largest first") {
    val parent = java.nio.file.Files.createTempDirectory("graft-ds")
    val s001 = java.nio.file.Files.createDirectory(parent.resolve("sf0.001"))
    val s01 = java.nio.file.Files.createDirectory(parent.resolve("sf0.01"))
    val s1 = java.nio.file.Files.createDirectory(parent.resolve("sf0.1"))
    java.nio.file.Files.createDirectory(parent.resolve("notasf"))
    assert(BenchGate.downshiftLadder(s1.toString, None) ==
      Seq(s01.toString, s001.toString))
    // measuring the middle scale: only the smaller sibling qualifies —
    // a LARGER sibling must never be a "downshift"
    assert(BenchGate.downshiftLadder(s01.toString, None) == Seq(s001.toString))
    // measuring the smallest: nothing to shift to
    assert(BenchGate.downshiftLadder(s001.toString, None).isEmpty)
    // a NON-sf-named measured dir has no scale to compare against — the
    // ladder must be empty, not "every sf sibling" (which could be LARGER)
    val prod = java.nio.file.Files.createDirectory(parent.resolve("prod"))
    assert(BenchGate.downshiftLadder(prod.toString, None).isEmpty)
    // override hooks: explicit single level, and the disable sentinel
    assert(BenchGate.downshiftLadder(s1.toString, Some("/elsewhere")) == Seq("/elsewhere"))
    assert(BenchGate.downshiftLadder(s1.toString, Some("none")).isEmpty)
  }

  test("resumable state: roundtrip, stale-tree/dir/disabled invalidation, torn files ignored") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bstate")
    val path = dir.resolve("state.properties").toString
    val entries = Map("q_a" -> (1.234, 2), "q_b" -> (0.05, 1))
    BenchGate.saveState(path, "tree-abc", "/data/sf0.1", 0.85, entries)
    // same tree + same dir: resumes exactly what was saved
    val back = BenchGate.loadState(path, "tree-abc", "/data/sf0.1")
    assert(back.keySet == Set("q_a", "q_b"))
    assert(math.abs(back("q_a")._1 - 1.234) < 1e-6 && back("q_a")._2 == 2)
    assert(back("q_b")._2 == 1)
    // a DIFFERENT tree key (code changed) invalidates — stale minima of an
    // edited tree must never seed a capture of the new one
    assert(BenchGate.loadState(path, "tree-xyz", "/data/sf0.1").isEmpty)
    // a different measured dir invalidates (sf0.01 state is not sf0.1 state)
    assert(BenchGate.loadState(path, "tree-abc", "/data/sf0.01").isEmpty)
    // disabled / unknown-tree modes never resume and never write
    assert(BenchGate.loadState("none", "tree-abc", "/data/sf0.1").isEmpty)
    assert(BenchGate.loadState(path, "", "/data/sf0.1").isEmpty)
    val nonePath = dir.resolve("never.properties")
    BenchGate.saveState("none", "tree-abc", "/data/sf0.1", 0.85, entries)
    BenchGate.saveState(nonePath.toString, "", "/data/sf0.1", 0.85, entries)
    assert(!java.nio.file.Files.exists(nonePath))
    // garbage on disk is ignored, not fatal (state is an accelerator)
    java.nio.file.Files.writeString(dir.resolve("torn.properties"), "_tree=tree-abc\n_sf=/data/sf0.1\nq_bad=not,numbers\nq_ok=2.5,3\n")
    val torn = BenchGate.loadState(dir.resolve("torn.properties").toString,
      "tree-abc", "/data/sf0.1")
    assert(torn == Map("q_ok" -> (2.5, 3)))
    // saving again OVERWRITES (the caller already folded old state in)
    BenchGate.saveState(path, "tree-abc", "/data/sf0.1", 0.9, Map("q_c" -> (9.0, 2)))
    assert(BenchGate.loadState(path, "tree-abc", "/data/sf0.1").keySet == Set("q_c"))
  }

  test("resumable state: treeKey is stable within a tree and empty only without git") {
    // run inside the repo: two consecutive reads of an unchanged tree must
    // agree (the whole point — consecutive bench invocations resume)
    val k1 = BenchGate.treeKey()
    val k2 = BenchGate.treeKey()
    assert(k1 == k2)
    assert(k1.nonEmpty, "treeKey empty inside a git repo")
    // shape: <head-hash>-<8-hex dirty digest>
    assert(k1.matches("[0-9a-f]{40}-[0-9a-f]{8}"), s"unexpected key shape: $k1")
  }

  test("resumable state: treeKey ignores non-source churn, invalidates on src edits") {
    // The r17 defect: the driver's capture always runs on a tree dirtied by
    // driver artifacts (modified LEAKCHECK.json, untracked BENCH/CORRECTNESS
    // files), so a full-tree dirty digest made resume impossible in the one
    // environment it was built for (BENCH_r17 resumed_n: 0). Pin the scoped
    // contract on a synthetic repo: non-source churn leaves the key
    // unchanged; any source-path edit still invalidates.
    val dir = java.nio.file.Files.createTempDirectory("gate-tree").toFile
    def git(args: String*): Unit = {
      val p = new ProcessBuilder((Seq("git") ++ args): _*).directory(dir)
        .redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      assert(p.waitFor() == 0, s"git ${args.mkString(" ")} failed: $out")
    }
    def write(rel: String, body: String): Unit = {
      val f = new java.io.File(dir, rel)
      f.getParentFile.mkdirs()
      java.nio.file.Files.writeString(f.toPath, body)
    }
    git("init", "-q")
    git("config", "user.email", "t@t")
    git("config", "user.name", "t")
    write("src/main/scala/X.scala", "object X\n")
    write("build.sbt", "name := \"t\"\n")
    git("add", "-A")
    git("commit", "-q", "-m", "base")
    val clean = BenchGate.treeKey(dir)
    assert(clean.matches("[0-9a-f]{40}-[0-9a-f]{8}"), s"unexpected key shape: $clean")
    // driver-artifact churn: modified tracked report + untracked outputs —
    // the exact git status the driver's capture always sees — must RESUME
    write("LEAKCHECK.json", "{}")
    git("add", "LEAKCHECK.json"); git("commit", "-q", "-m", "report")
    val clean2 = BenchGate.treeKey(dir)
    write("LEAKCHECK.json", "{\"hits\":0}")
    write("BENCH_r18.json", "{}")
    write("CORRECTNESS_r18.json", "{}")
    assert(BenchGate.treeKey(dir) == clean2,
      "non-source churn must not invalidate the capture key")
    // a src/ edit invalidates; so do build.sbt, project/, tools/ edits
    write("src/main/scala/X.scala", "object X { val y = 1 }\n")
    val srcDirty = BenchGate.treeKey(dir)
    assert(srcDirty != clean2, "src edit must invalidate")
    // CONTENT-hashed, not name-hashed (ADVICE r18): two DIFFERENT
    // uncommitted edits to the SAME file must produce DIFFERENT keys — the
    // porcelain digest gave them the same one, resuming stale minima
    // across a source change
    write("src/main/scala/X.scala", "object X { val y = 2 }\n")
    val srcDirty2 = BenchGate.treeKey(dir)
    assert(srcDirty2 != srcDirty && srcDirty2 != clean2,
      "a second distinct edit to the same file must re-key (content, not names)")
    // untracked-file CONTENT changes re-key too (same name, new bytes)
    git("checkout", "--", "src")
    write("tools/probe.py", "# v1\n")
    val untracked1 = BenchGate.treeKey(dir)
    write("tools/probe.py", "# v2\n")
    assert(BenchGate.treeKey(dir) != untracked1,
      "untracked source-file content change must re-key")
    new java.io.File(dir, "tools/probe.py").delete()
    git("checkout", "--", "src")
    assert(BenchGate.treeKey(dir) == clean2)
    write("build.sbt", "name := \"t2\"\n")
    assert(BenchGate.treeKey(dir) != clean2, "build.sbt edit must invalidate")
    git("checkout", "--", "build.sbt")
    write("tools/bless.py", "# new\n")
    assert(BenchGate.treeKey(dir) != clean2, "untracked tools/ file must invalidate")
    new java.io.File(dir, "tools/bless.py").delete()
    assert(BenchGate.treeKey(dir) == clean2)
    // CWD-INVARIANCE: git pathspecs are cwd-relative, so a naive
    // `git status -- src` from a subdirectory matches nothing and would
    // hash an edited tree to the clean empty digest — resuming stale
    // minima, the fail-unsafe direction. The key resolves the toplevel
    // first: a subdir launch must agree with the root AND see src edits.
    val sub = new java.io.File(dir, "src/main")
    assert(BenchGate.treeKey(sub) == clean2, "subdir key differs from root key")
    write("src/main/scala/X.scala", "object X { val z = 2 }\n")
    assert(BenchGate.treeKey(sub) != clean2,
      "subdir-launched key is blind to a src edit")
    git("checkout", "--", "src")
    assert(BenchGate.treeKey(sub) == clean2)
  }

  test("state path defaults REPO-LOCAL (.graft/) so the driver's capture resumes builder state; overrides pass through") {
    // VERDICT r18 item 3: the tmpdir default lived in the builder
    // session's private tmpdir, invisible to the driver's capture env —
    // resumed_n read 0 for the one consumer resume was built for. The
    // default now rides with the checkout.
    val p = BenchGate.statePathFor(None, "/data/sf0.1")
    assert(p.matches(".*/\\.graft/bench-state-[0-9a-f]{8}\\.properties"), p)
    // inside this repo: anchored at the git toplevel, parent dir created
    assert(new java.io.File(p).getParentFile.isDirectory,
      "statePathFor must create the .graft dir")
    // PER-SCALE files: a bench at another sf must not clobber this one's
    // accumulated coverage (observed live: the contract spec's forked
    // sf0.001 smoke run overwrote freshly-seeded sf0.1 state)
    assert(BenchGate.statePathFor(None, "/data/sf0.001") != p,
      "different measured dirs must map to different state files")
    assert(BenchGate.statePathFor(None, "/data/sf0.1") == p, "stable per sf")
    // overrides and the disable sentinel pass through untouched
    assert(BenchGate.statePathFor(Some("/tmp/x.properties"), "/data/sf0.1") ==
      "/tmp/x.properties")
    assert(BenchGate.statePathFor(Some("none"), "/data/sf0.1") == "none")
  }

  test("headline recovery fires the moment breadth is secured and headroom covers the projected cost") {
    // VERDICT r18 item 5's invariant, pinned: any window that finishes its
    // breadth sweep with >= reserve + projected-headline-cost headroom
    // ends with headline_passes >= 1 (the bench calls this between full
    // passes now, not only after the loop).
    // breadth secured + headroom → recover
    assert(BenchGate.recoverHeadlineNow(breadthSecured = true,
      headlinePasses = 0, projectedCost = 30.0,
      elapsed = 250.0, budget = 360.0, reserve = 25.0))
    // r18's shape: no breadth yet → never steal the sweep's budget
    assert(!BenchGate.recoverHeadlineNow(breadthSecured = false,
      headlinePasses = 0, projectedCost = 30.0,
      elapsed = 100.0, budget = 360.0, reserve = 25.0))
    // warm contract already met → stop at 2
    assert(!BenchGate.recoverHeadlineNow(breadthSecured = true,
      headlinePasses = 2, projectedCost = 30.0,
      elapsed = 100.0, budget = 360.0, reserve = 25.0))
    // headroom short of the projection → never overrun the reserve
    assert(!BenchGate.recoverHeadlineNow(breadthSecured = true,
      headlinePasses = 0, projectedCost = 30.0,
      elapsed = 310.0, budget = 360.0, reserve = 25.0))
    // one pass done, room for the second → recover again
    assert(BenchGate.recoverHeadlineNow(breadthSecured = true,
      headlinePasses = 1, projectedCost = 30.0,
      elapsed = 280.0, budget = 360.0, reserve = 25.0))
  }

  test("baseline resource carries the quiet probe references") {
    val b = BenchGate.loadBaseline()
    assert(b.mcalRef > 0.0, "mcal_ref missing from bench-baseline.properties")
    assert(b.ioRef > 0.0, "io_ref missing from bench-baseline.properties")
    // refs must never leak into the per-query minima map
    assert(!b.mins.contains("mcal_ref") && !b.mins.contains("io_ref"))
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
