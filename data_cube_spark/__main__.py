"""CLI runner: execute any registry query against a parquet star directory.

    python -m data_cube_spark list                      # query names
    python -m data_cube_spark run QUERY [SF_DIR] [-n N] # show N rows
    python -m data_cube_spark explain QUERY [SF_DIR]    # physical plan
    python -m data_cube_spark indexes [PREFIX]          # persisted-index fleet
    python -m data_cube_spark compact [PREFIX]          # nightly sweep

The same surface the driver contract exposes programmatically, for humans:
`run` prints the first rows (never collects the full result), `explain`
prints the formatted physical plan for plan-shape inspection, and
`indexes`/`compact` are the operational entry points over the
spark_graft.index.* catalog stamps (health flags and the rebuild/
retrain warnings included).

`indexes`/`compact` enumerate the CURRENT catalog: on a deployment
with a persistent metastore (Hive/Glue) that is the standing index
fleet; under the local in-memory catalog, pass ``--warehouse [DIR]``
to first re-attach every sidecar index found on disk (VERDICT r10 #6
— ``attach_indexes``), so a fresh process sweeps indexes other
sessions created.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="data_cube_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registry query names")
    for c in ("run", "explain", "oracle"):
        p = sub.add_parser(c)
        p.add_argument("query")
        p.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
        if c == "run":
            p.add_argument("-n", type=int, default=20, help="rows to show")
    for c in ("indexes", "compact"):
        p = sub.add_parser(c, help=f"{c} the persisted-index fleet")
        p.add_argument("prefix", nargs="?", default=None,
                       help="filter by index base-name prefix")
        p.add_argument("--warehouse", nargs="?", const=True, default=None,
                       metavar="DIR",
                       help="first re-attach sidecar indexes from DIR "
                            "(default: the session's warehouse dir), so "
                            "a fresh process sees other sessions' "
                            "indexes")
        p.add_argument("--refreeze", action="store_true",
                       help="act on prefix-index drift instead of "
                            "warning: re-freeze the shingle order from "
                            "the index's own _sets member")
    args = ap.parse_args(argv)

    from data_cube_spark.registry import ORACLE, QUERIES

    if args.cmd == "list":
        for name in QUERIES:
            kind = "oracle" if name in ORACLE else "rows-only"
            print(f"{name}  [{kind}]")
        return 0

    if args.cmd in ("indexes", "compact"):
        from data_cube_spark.operators.index_maintenance import (
            compact_all,
            list_indexes,
        )
        from data_cube_spark.session import get_spark

        spark = get_spark("data-cube-maint")
        spark.sparkContext.setLogLevel("ERROR")
        if args.cmd == "indexes":
            for idx in list_indexes(spark, args.prefix,
                                    warehouse=args.warehouse):
                flags = "".join(
                    f" {k}" for k in ("needs_rebuild", "needs_retrain")
                    if idx["health"].get(k))
                state = "" if idx["complete"] else " INCOMPLETE"
                print(f"{idx['name']}  [{idx['kind']}]{state}{flags}")
                for k, v in sorted(idx["health"].items()):
                    print(f"    {k}: {v}")
            return 0
        sweep = compact_all(spark, args.prefix, warehouse=args.warehouse,
                            refreeze_prefix=args.refreeze)
        for name, n in sorted(sweep["removed"].items()):
            print(f"compacted {name}: {n} duplicate rows removed")
        for name, ver in sorted(sweep["refrozen"].items()):
            print(f"refroze {name}: order {ver}")
        for w in sweep["warnings"]:
            print(f"WARNING: {w}")
        return 0

    if args.query not in QUERIES:
        print(f"unknown query {args.query!r} — see `list`", file=sys.stderr)
        return 2

    if args.cmd == "oracle":
        print(ORACLE.get(args.query, f"-- no oracle: {args.query} is rows-only"))
        return 0

    from data_cube_spark.session import get_spark

    spark = get_spark("data-cube-cli")
    spark.sparkContext.setLogLevel("ERROR")
    df = QUERIES[args.query](spark, args.sf_dir)
    if args.cmd == "explain":
        from data_cube_spark.plans import explain_str

        print(explain_str(df, "formatted"))
    else:
        df.show(args.n, truncate=False)
    return 0


def cli() -> int:
    """Console-script entry point (``data-cube-spark``, pyproject
    ``[project.scripts]``): :func:`main` plus Unix pipe manners — a
    downstream ``| head`` closing the pipe exits 0 instead of a
    BrokenPipeError traceback. Kept separate so in-process callers of
    ``main`` still see every exception."""
    try:
        return main()
    except BrokenPipeError:
        # stdout is gone; suppress the interpreter's close-time whinge
        import os

        os.dup2(os.open(os.devnull, os.O_WRONLY), sys.stdout.fileno())
        return 0


if __name__ == "__main__":
    # same surface as the console script (ADVICE r10): `python -m
    # data_cube_spark | head` gets the same pipe manners as
    # `data-cube-spark | head`
    sys.exit(cli())
