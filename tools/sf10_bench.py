"""sf10 median bench (VERDICT r10 #8): promote the bespoke probe to a
standing ~20-query sf10 artifact, so the NEXT scale regression is
caught by diffing ``BENCH_sf10.json`` between rounds instead of by a
one-off investigation.

Subset policy (deterministic from committed artifacts): the 10 worst
sf0.1->sf1 scalers (``sf10_probe.TAIL_QUERIES`` — the queries most
likely to go super-linear first) UNION the 10 most expensive sf1
queries by committed median (``BENCH_sf1.json`` — the queries where a
regression costs the most wall-clock). Runs through the unchanged
bench harness (``SPARK_GRAFT_BENCH_ONLY``; median-of-3 for >1 s
queries, ingest untimed), and records the sf1 medians + ratios next to
each timing (10x data => <=10x is the linear ceiling).

Usage: python tools/sf10_bench.py [sf10_dir]   (default
<repo>/.benchdata/sf10; synthesized from sf1 via make_sf1.py if absent).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.sf10_probe import TAIL_QUERIES  # noqa: E402


def subset() -> list[str]:
    with open(os.path.join(REPO, "BENCH_sf1.json")) as f:
        sf1 = json.load(f)["queries"]
    expensive = [q for q, _ in sorted(sf1.items(), key=lambda kv: -kv[1])]
    # r13: the write-conflated registry entries left the timed set;
    # their read paths are the standing bench names (legacy artifacts
    # still carry the old names, so map them when the subset derives
    # from them)
    renames = {"bucketed_join_copartition": "bucketed_join_read",
               "zorder_layout_prune": "zorder_read",
               "dpp_partition_prune": "dpp_read"}
    expensive = [renames.get(q, q) for q in expensive]
    out = list(TAIL_QUERIES)
    for q in expensive:
        if len(out) >= len(TAIL_QUERIES) + 10:
            break
        if q not in out:
            out.append(q)
    return out


def main() -> int:
    sf10 = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".benchdata", "sf10")
    sf1 = os.path.join(REPO, ".benchdata", "sf1")
    if not (os.path.isdir(sf10) and os.listdir(sf10)):
        print(f"# synthesizing sf10 at {sf10} (untimed)", file=sys.stderr)
        subprocess.run([sys.executable,
                        os.path.join(REPO, "tools", "make_sf1.py"),
                        sf1, sf10, "10"], check=True)

    qs = subset()
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf10,
               SPARK_GRAFT_BENCH_ONLY=",".join(qs))
    proc = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                          env=env, capture_output=True, text=True,
                          check=True)
    bench = next(json.loads(ln) for ln in proc.stdout.splitlines()
                 if ln.startswith("{") and '"queries"' in ln)

    with open(os.path.join(REPO, "BENCH_sf1.json")) as f:
        sf1_bench = json.load(f)
    ratios = {}
    for q in qs:
        a, b = sf1_bench["queries"].get(q), bench["queries"].get(q)
        ratios[q] = {
            "sf1_sec": a, "sf10_sec": b,
            "ratio": round(b / a, 2) if a and b else None,
            "sublinear": bool(a and b and b / a <= 10.0),
        }

    out = {
        "metric": "sf10_subset_total_sec",
        "value": round(sum(bench["queries"].values()), 3),
        "unit": "sec",
        "sf": 10.0,
        "ingest_sec": bench.get("ingest_sec"),
        "subset_policy": ("tail 10 worst sf0.1->sf1 scalers + 10 most "
                          "expensive sf1 medians; median-of-3 draws"),
        "queries": bench["queries"],
        "queries_detail": bench.get("queries_detail"),
        "ratios_vs_sf1": ratios,
    }
    path = os.path.join(REPO, "BENCH_sf10.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in ("metric", "value", "sf")}))
    print(f"# wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
