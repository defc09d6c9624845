"""Dump `.explain("formatted")` for named bench queries to files, with
plan-construction timing — the r14 measurement harness (guide §1).

    python tools/explain_dump.py OUTDIR SUFFIX name1,name2,...
    python tools/explain_dump.py plans/r14 before indexed_prefix_read

Builds each query exactly the way bench.py does (same ingest phase, same
EXTRA_BENCH wiring), writes ``OUTDIR/<name>_<SUFFIX>.txt``, and prints a
per-query line: plan-construction seconds (Python DataFrame build +
analysis — a real component of per-query bench latency) vs first-count
seconds.
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


USAGE = "usage: python tools/explain_dump.py OUTDIR SUFFIX name1,name2,..."


def main() -> None:
    if len(sys.argv) < 4:
        raise SystemExit(USAGE)
    outdir, suffix, names_arg = sys.argv[1], sys.argv[2], sys.argv[3]
    names = [x.strip() for x in names_arg.split(",") if x.strip()]
    if not names:
        raise SystemExit(USAGE)
    os.makedirs(outdir, exist_ok=True)

    import bench
    from data_cube_spark.registry import QUERIES
    from data_cube_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("explain-dump")
    spark.sparkContext.setLogLevel("ERROR")

    # same untimed ingest phase as bench.main() so the indexed/bucketed
    # entries resolve their persisted tables
    from data_cube_spark.sources.star import load_tables, tpch_cube

    tpch_cube(spark, sf_dir).persist().fact.df.count()
    tbl = load_tables(spark, sf_dir)
    for name in ("documents", "events", "embeddings"):
        tbl[name].persist().count()
    from data_cube_spark.operators import dedup as _dedup

    bench._SIG_INDEX[sf_dir] = _dedup.minhash_signatures(
        tbl["documents"].where("doc_id % 2 = 0")).localCheckpoint()
    bench._build_disk_indexes(spark, sf_dir)
    bench._build_bucketed_tables(spark, sf_dir)
    bench._build_layouts(spark, sf_dir)

    fns = {n: QUERIES[n] for n in QUERIES}
    fns.update(bench.EXTRA_BENCH)
    unknown = [n for n in names if n not in fns]
    if unknown:
        raise SystemExit(
            f"unknown queries {unknown}; available:\n" + "\n".join(sorted(fns)))
    for name in names:
        fn = fns[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t_build = time.perf_counter() - t0
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        t0 = time.perf_counter()
        n = df.count()
        t_count = time.perf_counter() - t0
        print(f"{name}: build {t_build:.3f}s count {t_count:.3f}s "
              f"({n} rows) -> {path}", flush=True)


if __name__ == "__main__":
    main()
