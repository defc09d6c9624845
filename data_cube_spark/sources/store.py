"""Cube persistence: save/load a materialized DataCube as parquet tables +
a JSON metadata sidecar.

The reference cube lives in R process memory; the Spark analog is a
warehouse layout — the fact at its declared grain (optionally bucketed by a
FK for co-located joins, see :func:`ingest.write_bucketed`), one parquet
table per dimension base and level, and ``cube.json`` describing grain,
measures (re-aggregation functions), levels, and hierarchies. A loaded cube
is immediately queryable: the fact is already at grain, so every query runs
against partials without touching raw history.

``path`` is a local/posix directory here (the metadata sidecar uses plain
file IO); on a cluster point it at a mounted DFS path.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

from data_cube_spark.model import DataCube, Dimension, Fact, Hierarchy, Level, Measure


def save_cube(
    dc: DataCube,
    path: str,
    mode: str = "overwrite",
    bucket_by: list[str] | None = None,
    n_buckets: int = 64,
) -> None:
    """Write fact + dimension/level tables + metadata. Callable aggregates
    are process-bound and refuse to serialize — use whitelist names.

    ``bucket_by`` persists the FACT bucketed (and bucket-sorted) on those
    grain keys — the 100 TB layout: Spark encodes the bucket id in each
    file name, and :func:`load_cube` re-registers the table with the same
    ``CLUSTERED BY`` spec, so every later join or aggregation on the
    bucket keys runs with ZERO exchanges on the fact side, in any
    session, forever — the fact shuffle is paid once here. The bucket
    spec rides in ``cube.json``.
    """
    measures = []
    for m in dc.measures.values():
        if not isinstance(m.reagg, str):
            raise ValueError(
                f"measure {m.name!r} has a callable (re)aggregate — not "
                "serializable; use a whitelist aggregate name"
            )
        measures.append({
            "name": m.name, "agg": m.agg if isinstance(m.agg, str) else m.reagg,
            "reagg": m.reagg, "dtype": m.dtype, "fill": m.fill,
            "label": m.label,
        })
    if bucket_by:
        missing = [k for k in bucket_by if k not in dc.fact.df.columns]
        if missing:
            raise ValueError(f"bucket_by columns not in fact: {missing}")
        import shutil as _shutil

        from data_cube_spark.sources.ingest import write_bucketed

        spark = dc.fact.df.sparkSession
        if mode == "overwrite":
            _shutil.rmtree(f"{path}/fact", ignore_errors=True)
        # external table: the catalog entry is scaffolding for the write,
        # the bucket layout lives in the file names; per-call name so
        # concurrent save_cube calls in one session cannot collide
        import uuid as _uuid

        tmp = f"save_cube_fact_tmp_{_uuid.uuid4().hex[:12]}"
        spark.sql(f"DROP TABLE IF EXISTS {tmp}")
        try:
            write_bucketed(dc.fact.df, tmp, list(bucket_by),
                           n_buckets=int(n_buckets), path=f"{path}/fact")
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {tmp}")
    else:
        dc.fact.df.write.mode(mode).parquet(f"{path}/fact")
    meta = {"id_vars": dc.fact.id_vars, "measures": measures, "dims": {}}
    if bucket_by:
        meta["fact_buckets"] = {"bucket_by": list(bucket_by),
                                "n_buckets": int(n_buckets)}
    for name, d in dc.dims.items():
        d.base.write.mode(mode).parquet(f"{path}/dims/{name}/base")
        levels = {}
        for lk, lvl in d.levels.items():
            lvl.df.write.mode(mode).parquet(f"{path}/dims/{name}/levels/{lk}")
            levels[lk] = list(lvl.attrs)
        meta["dims"][name] = {
            "key": d.key,
            "levels": levels,
            "hierarchies": {
                hn: {k: list(v) for k, v in h.levels.items()}
                for hn, h in d.hierarchies.items()
            },
        }
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/cube.json", "w") as f:
        json.dump(meta, f, indent=2)


def load_cube(
    spark: SparkSession, path: str, fact_table: str | None = None
) -> DataCube:
    """Reconstruct a saved cube. The fact loads at its declared grain
    (no re-aggregation); dimension tables load pre-deduped.

    If the cube was saved with ``bucket_by`` and ``fact_table`` names a
    catalog table, the fact is RE-REGISTERED with its ``CLUSTERED BY``
    spec (bucket ids are recovered from the file names), so fact-side
    joins/aggregations on the bucket keys are exchange-free in this
    session too. Without ``fact_table`` the fact falls back to a plain
    parquet read — correct, but the bucket layout goes unused.

    The bucketed fact comes back through
    :func:`~data_cube_spark.sources.ingest.read_bucketed`: Catalyst
    sizes parquet scans by COMPRESSED bytes, and a narrow fact that
    compresses under the broadcast threshold would otherwise be picked
    as a broadcast build side whose deserialized rows blow the driver
    (the r12 sf10 failure) — the guard pins ``merge`` on the fact when
    its decompressed estimate exceeds the threshold, which both
    prevents the OOM and keeps the zero-exchange plan the bucket
    layout was paid for. Dims broadcast with an explicit
    ``F.broadcast`` still broadcast — hint precedence favors the
    explicit side.
    """
    with open(f"{path}/cube.json") as f:
        meta = json.load(f)
    measures = {
        m["name"]: Measure(m["name"], agg=m["agg"], reagg=m["reagg"],
                           dtype=m.get("dtype", "double"),
                           fill=m.get("fill"), label=m.get("label"))
        for m in meta["measures"]
    }
    bucks = meta.get("fact_buckets")
    if bucks and fact_table:
        plain = spark.read.parquet(f"{path}/fact")
        cols = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in plain.schema.fields
        )
        keys = ", ".join(f"`{k}`" for k in bucks["bucket_by"])
        spark.sql(f"DROP TABLE IF EXISTS {fact_table}")
        spark.sql(
            f"CREATE TABLE {fact_table} ({cols}) USING parquet "
            f"CLUSTERED BY ({keys}) SORTED BY ({keys}) "
            f"INTO {int(bucks['n_buckets'])} BUCKETS "
            f"LOCATION '{path}/fact'"
        )
        from data_cube_spark.sources.ingest import read_bucketed

        fact_df = read_bucketed(spark, fact_table)
    else:
        fact_df = spark.read.parquet(f"{path}/fact")
    fact = Fact(fact_df, meta["id_vars"], measures)
    dims = {}
    for name, dmeta in meta["dims"].items():
        base = spark.read.parquet(f"{path}/dims/{name}/base")
        levels = {
            lk: Level(lk, spark.read.parquet(f"{path}/dims/{name}/levels/{lk}"),
                      attrs)
            for lk, attrs in dmeta["levels"].items()
        }
        hiers = {hn: Hierarchy(spec, hn)
                 for hn, spec in dmeta["hierarchies"].items()}
        dims[name] = Dimension(name, dmeta["key"], base, levels, hiers)
    return DataCube(fact, dims)
