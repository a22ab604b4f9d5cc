#!/usr/bin/env python3
"""Regenerate the BenchGate baseline resource from a bench capture.

Usage: tools/mk_baseline.py <dump.json> <calib_spark_of_that_run>

<dump.json> comes from running graft.Bench with SPARK_GRAFT_BENCH_DUMP=<path>
on a quiet host (check the capture's full_passes >= 2 and its spin probes
against SURVEY §8 before blessing it as the baseline); <calib_spark> is the
"calib_spark" field of the same run's final JSON line.
"""
import json, sys

dump_path, calib = sys.argv[1], float(sys.argv[2])
d = json.load(open(dump_path))
lines = [
    "# Per-query warm minima from a 2-full-pass local capture at sf0.1 (round 12),",
    "# plus the calib_spark reading of that same capture. Consumed by BenchGate:",
    "# a run flags q when min(q) > baseline * 1.5 * max(1, calib_spark/calib_spark_ref).",
    "# Refresh by running graft.Bench with SPARK_GRAFT_BENCH_DUMP and tools/mk_baseline.py.",
    f"calib_spark_ref={calib}",
]
lines += [f"{k}={d[k]}" for k in sorted(d)]
out = "src/main/resources/graft/bench-baseline.properties"
open(out, "w").write("\n".join(lines) + "\n")
print(f"wrote {out}: {len(d)} queries, calib_spark_ref={calib}")
