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


def save_cube(dc: DataCube, path: str, mode: str = "overwrite") -> None:
    """Write fact + dimension/level tables + metadata. Callable aggregates
    are process-bound and refuse to serialize — use whitelist names."""
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
    dc.fact.df.write.mode(mode).parquet(f"{path}/fact")
    meta = {"id_vars": dc.fact.id_vars, "measures": measures, "dims": {}}
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


def load_cube(spark: SparkSession, path: str) -> DataCube:
    """Reconstruct a saved cube. The fact loads at its declared grain
    (no re-aggregation); dimension tables load pre-deduped."""
    with open(f"{path}/cube.json") as f:
        meta = json.load(f)
    measures = {
        m["name"]: Measure(m["name"], agg=m["agg"], reagg=m["reagg"],
                           dtype=m.get("dtype", "double"),
                           fill=m.get("fill"), label=m.get("label"))
        for m in meta["measures"]
    }
    fact = Fact(spark.read.parquet(f"{path}/fact"), meta["id_vars"], measures)
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
