"""Driver-contract gate, runnable standalone (the /verify recipe step 2):

    python tools/verify_gate.py [SF_DIR] [--cpus N] [--shuffle-partitions N]
                                [--only name1,name2]   # targeted re-check

Registers the parquet tables as DuckDB views, runs every registry query
with an oracle side-by-side, compares sorted-by-all-columns values with
rel_tol 1e-9 (the driver's comparison model), and runs the rows-only
queries for crash coverage. Exit code 0 iff zero mismatches.
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

#: quadratic-oracle queries: skip above this sf (exact variant is checked
#: at the smaller sf; the Spark side still runs in rows-only mode)
QUADRATIC = {"embedding_near_pairs": 0.01}


def compare(pdf, oracle) -> str | None:
    cols = sorted(pdf.columns)
    if cols != sorted(oracle.columns):
        return f"columns {cols} vs {sorted(oracle.columns)}"
    a = pdf[cols].sort_values(cols, na_position="last").reset_index(drop=True)
    b = oracle[cols].sort_values(cols, na_position="last").reset_index(drop=True)
    if len(a) != len(b):
        return f"rows {len(a)} vs {len(b)}"
    for c in cols:
        for x, y in zip(a[c].tolist(), b[c].tolist()):
            if x is None and y is None:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                if not math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9):
                    return f"{c}: {x} != {y}"
            elif str(x) != str(y):
                return f"{c}: {x!r} != {y!r}"
    return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--cpus", default="8")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--only", default=None,
                    help="comma-separated query names: run just these "
                         "(faster iteration; the FULL gate remains "
                         "mandatory before commit)")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as e
    from data_cube_spark.session import get_spark

    spark = get_spark(cpus=args.cpus, shuffle_partitions=args.shuffle_partitions)
    spark.sparkContext.setLogLevel("ERROR")

    rows = e.entry(spark).collect()
    assert len(rows) > 0, "entry() returned no rows"
    print(f"entry: {len(rows)} rows", flush=True)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'")

    qs, osql = e.queries(), e.oracle_sql()
    if args.only:
        only = {n.strip() for n in args.only.split(",") if n.strip()}
        unknown = only - set(qs)
        assert not unknown, f"unknown queries: {sorted(unknown)}"
        qs = {n: f for n, f in qs.items() if n in only}
        osql = {n: q for n, q in osql.items() if n in only}
    sf = float(args.sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    bad = []
    for name in sorted(osql):
        if sf > QUADRATIC.get(name, float("inf")):
            print(f"SKIP {name} (quadratic oracle beyond sf{QUADRATIC[name]})", flush=True)
            continue
        try:
            err = compare(qs[name](spark, args.sf_dir).toPandas(),
                          con.execute(osql[name]).fetchdf())
        except Exception as ex:
            err = f"{type(ex).__name__}: {str(ex)[:160]}"
        if err:
            bad.append(name)
            print(f"FAIL {name}: {err}", flush=True)
    for name in sorted(set(qs) - set(osql)):
        try:
            n = qs[name](spark, args.sf_dir).count()
            print(f"RUN-ONLY {name}: {n} rows", flush=True)
        except Exception as ex:
            bad.append(name)
            print(f"FAIL {name}: {type(ex).__name__}: {str(ex)[:160]}", flush=True)
    print(f"oracle queries: {len(osql)} of {len(qs)}; MISMATCHES: {bad}", flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
