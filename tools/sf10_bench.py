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

#: r14 family rotation (VERDICT r13 #6): the subset had never measured
#: the funnel / cohort / sessionization / interval-overlap / SCD2
#: families at sf10 — rotate ~5 per round on top of the standing
#: worst-ratio core so sf10 evidence accumulates the way driver
#: evidence does. Next rotation candidates: scd2_merge_rebuild,
#: vocab_overlap_sources, corpus_snapshot_diff, salted_join_agg,
#: window_moving_avg.
ROTATION_QUERIES = [
    "funnel_conversion",
    "cohort_retention",
    "events_sessionize",
    "interval_overlap_sessions",
    "scd2_temporal_revenue",
]

#: queries whose physical plan tier is size-dispatched by
#: ``similarity.near_pairs`` — the sf1/sf10 ratio for these is only
#: meaningful when both scales land on the SAME tier (VERDICT r13 #2:
#: ``embedding_components``' 12.84× was a blocked-matmul denominator
#: under a packed-LSH numerator). Each maps to the corpus table whose
#: row count drives the dispatch.
TIER_DISPATCHED = {
    "embedding_components": "embeddings",
    "semantic_dedup_keep": "embeddings",
}


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
    for q in ROTATION_QUERIES:
        if q not in out:
            out.append(q)
    # round-over-round comparability (r15): every row of the PREVIOUS
    # committed edition keeps a twin in the new one, even when the
    # expensive-at-sf1 derivation rotates it out (the sf1 medians move
    # with the host window; the sf10 diff must not lose its comparands)
    try:
        with open(os.path.join(REPO, "BENCH_sf10.json")) as f:
            for q in json.load(f)["queries"]:
                if q not in out:
                    out.append(q)
    except (OSError, KeyError, ValueError):
        pass
    return out


def _tier(sf_dir: str, table: str) -> str:
    """The near_pairs tier the registry call dispatches to at this
    scale (registry geometry: n_planes=4, n_tables=48, max_degree set)."""
    from data_cube_spark.operators.similarity import near_pairs_tier
    from data_cube_spark.sources.star import parquet_rows

    rows = parquet_rows(sf_dir, table)
    return near_pairs_tier(rows, n_planes=4, n_tables=48)


def main() -> int:
    sf10 = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".benchdata", "sf10")
    sf1_dir = os.path.join(REPO, ".benchdata", "sf1")
    if not (os.path.isdir(sf10) and os.listdir(sf10)):
        print(f"# synthesizing sf10 at {sf10} (untimed)", file=sys.stderr)
        subprocess.run([sys.executable,
                        os.path.join(REPO, "tools", "make_sf1.py"),
                        sf1_dir, sf10, "10"], check=True)

    qs = subset()
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf10,
               SPARK_GRAFT_BENCH_ONLY=",".join(qs))
    proc = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                          env=env, capture_output=True, text=True,
                          check=True)
    bench = next(json.loads(ln) for ln in proc.stdout.splitlines()
                 if ln.startswith("{") and '"queries"' in ln)
    # surface per-query failure lines (bench.py reports a failed query as
    # null and keeps going; silently summing would TypeError and hide WHICH
    # query broke at sf10 — the single most important fact of the run)
    failed = sorted(q for q, sec in bench["queries"].items() if sec is None)
    for ln in proc.stderr.splitlines():
        if "FAILED" in ln:
            print(ln, file=sys.stderr)
    if failed:
        print(f"# sf10 failed queries: {failed}", file=sys.stderr)

    with open(os.path.join(REPO, "BENCH_sf1.json")) as f:
        sf1_bench = json.load(f)

    # Tier consistency (VERDICT r13 #2): when the two scales dispatch
    # to different near_pairs tiers, the raw ratio compares different
    # physical operators. Stamp same_tier on every ratio; for the
    # mismatched ones, time an sf1 twin with the tier FORCED to the
    # approximate tier sf10 dispatches to (SPARK_GRAFT_PAIRS_EXACT=
    # false -> exact=False reroutes the blocked tier) and record the
    # like-for-like ratio alongside.
    tiers = {q: (_tier(sf1_dir, tb), _tier(sf10, tb))
             for q, tb in TIER_DISPATCHED.items() if q in qs}
    mismatched = [q for q, (a, b) in tiers.items() if a != b]
    twin_sf1 = {}
    if mismatched:
        print(f"# tier mismatch {mismatched}: timing sf1 twin on the "
              f"forced approximate tier", file=sys.stderr)
        tenv = dict(os.environ,
                    SPARK_GRAFT_SF_DIR=sf1_dir,
                    SPARK_GRAFT_PAIRS_EXACT="false",
                    SPARK_GRAFT_BENCH_ONLY=",".join(mismatched))
        tproc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=tenv, capture_output=True, text=True, check=True)
        twin_sf1 = next(json.loads(ln) for ln in tproc.stdout.splitlines()
                        if ln.startswith("{") and '"queries"' in ln
                        )["queries"]

    ratios = {}
    for q in qs:
        a, b = sf1_bench["queries"].get(q), bench["queries"].get(q)
        ratios[q] = {
            "sf1_sec": a, "sf10_sec": b,
            "ratio": round(b / a, 2) if a and b else None,
            "sublinear": bool(a and b and b / a <= 10.0),
            "same_tier": q not in tiers or tiers[q][0] == tiers[q][1],
        }
        if q in tiers:
            ratios[q]["tiers"] = {"sf1": tiers[q][0], "sf10": tiers[q][1]}
        if q in twin_sf1 and twin_sf1[q]:
            # numerator: the main sf10 timing (its natural dispatch IS
            # the forced tier); denominator: the forced-tier sf1 twin
            ratios[q]["sf1_same_tier_sec"] = twin_sf1[q]
            ratios[q]["ratio_same_tier"] = (
                round(b / twin_sf1[q], 2) if b else None)

    # ingest drift note (VERDICT r13 #4): compare per-build seconds to
    # the previous committed edition and flag >1.5x growth
    drift = []
    prev_path = os.path.join(REPO, "BENCH_sf10.json")
    if os.path.exists(prev_path):
        with open(prev_path) as f:
            prev_detail = json.load(f).get("ingest_detail") or {}
        for name, cur in (bench.get("ingest_detail") or {}).items():
            old = prev_detail.get(name, {}).get("sec")
            if old and cur["sec"] > 1.5 * old:
                drift.append(f"{name}: {old}s -> {cur['sec']}s "
                             f"({cur['sec'] / old:.1f}x)")

    out = {
        "metric": "sf10_subset_total_sec",
        "value": round(sum(v for v in bench["queries"].values()
                           if v is not None), 3),
        "failed_queries": failed or None,
        "unit": "sec",
        "sf": 10.0,
        "edition_note": ("r14 fourth edition: regenerated at HEAD (the "
                         "r13 artifact still carried the pre-split "
                         "zorder_layout_prune row — ADVICE r13); adds "
                         "the funnel/cohort/sessionize/interval/scd2 "
                         "rotation, same_tier-stamped ratios with "
                         "forced-tier twins, ingest_detail and the "
                         "normalized column"),
        "ingest_sec": bench.get("ingest_sec"),
        "ingest_detail": bench.get("ingest_detail"),
        "ingest_drift_vs_prev": drift or None,
        "calibration": bench.get("calibration"),
        "subset_policy": ("tail 10 worst sf0.1->sf1 scalers + 10 most "
                          "expensive sf1 medians + 5 rotated families "
                          "(ROTATION_QUERIES); median-of-3 draws"),
        "queries": bench["queries"],
        "queries_normalized": bench.get("queries_normalized"),
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
