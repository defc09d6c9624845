"""Median-of-N bench artifact generator (VERDICT r14 #6: committed
artifacts must be the MEDIAN of all draws with every draw recorded, not
the cleanest-calibration run).

Runs bench.py N times back-to-back (fresh JVM each run, same env), keeps
every run's full parsed output under ``runs``, and promotes the
median-headline run's per-query data to the artifact top level so
existing readers (plan-fingerprint diffs, per-query tables) keep working.

Usage: SPARK_GRAFT_SF_DIR=... python tools/bench_median.py OUT.json [N]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys


def main() -> None:
    out_path = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    runs = []
    for i in range(n):
        proc = subprocess.run(
            [sys.executable, os.path.join(repo, "bench.py")],
            capture_output=True, text=True, cwd=repo)
        lines = [l for l in proc.stdout.splitlines() if l.strip()]
        if proc.returncode != 0 or not lines:
            raise SystemExit(
                f"run {i}: rc={proc.returncode}\n{proc.stderr[-2000:]}")
        full = json.loads(lines[0])
        runs.append(full)
        print(f"# run {i}: total {full['value']} calib "
              f"{full['calibration']['spark_fixed_job_sec']}",
              file=sys.stderr, flush=True)
    totals = [r["value"] for r in runs]
    med = statistics.median_low(totals)  # an ACTUAL run, not an average
    median_run = next(r for r in runs if r["value"] == med)
    artifact = {
        **median_run,
        "headline": "median",
        "runs": [{"value": r["value"],
                  "value_normalized_spark_jobs":
                      r.get("value_normalized_spark_jobs"),
                  "calibration": r["calibration"],
                  "ingest_sec": r.get("ingest_sec"),
                  "cold_total_sec": r.get("cold_total_sec")}
                 for r in runs],
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {out_path}: totals {totals} -> median {med}")


if __name__ == "__main__":
    main()
