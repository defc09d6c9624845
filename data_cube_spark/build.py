"""Cube constructors (reference ``as.cube.* / as.data.cube.*`` family,
R/as.cube.R + R/as.data.cube.R — SURVEY.md §2.1 S1-S7).

All constructors are lazy: dimensions are ``dropDuplicates`` projections,
the fact is a single ``groupBy().agg()`` to the declared grain.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_cube_spark.model import DataCube, Dimension, Fact, Hierarchy, Level, Measure


def from_table(
    df: DataFrame,
    dims: Mapping[str, Sequence[str] | str],
    measures: Sequence[Measure],
) -> DataCube:
    """One denormalized table -> cube (reference ``as.cube.data.table``,
    R/as.cube.R:49-57): each dim = ``unique`` over its columns (first column
    is the key), fact = group-by over the keys with each measure's own
    aggregate.

    ``dims`` maps dimension name -> column(s); the first column is the key,
    the rest become attributes of a flat single-level dimension.
    """
    dimensions: dict[str, Dimension] = {}
    keys: list[str] = []
    for name, cols in dims.items():
        cols = [cols] if isinstance(cols, str) else list(cols)
        key = cols[0]
        keys.append(key)
        base = df.select(*cols).dropDuplicates([key])
        dimensions[name] = Dimension(name, key, base)
    fact = Fact.build(df, keys, measures)
    return DataCube(fact, dimensions)


def from_parts(
    fact_df: DataFrame,
    id_vars: Sequence[str],
    measures: Sequence[Measure],
    dims: Mapping[str, Dimension],
    *,
    aggregate: bool = True,
) -> DataCube:
    """Fact table + prebuilt dimensions (reference ``as.cube.list``,
    R/as.cube.R:60-77): sub-aggregates the fact to its declared grain iff
    requested (the reference checks ``anyDuplicated`` — an action on Spark,
    so the caller decides; aggregating an already-unique fact is skipped by
    ``Fact.reaggregate`` downstream anyway)."""
    fact = (
        Fact.build(fact_df, id_vars, measures)
        if aggregate
        else Fact(fact_df, list(id_vars), {m.name: m for m in measures})
    )
    return DataCube(fact, dims)


def from_array(
    spark: SparkSession,
    array,
    dim_names: Mapping[str, Sequence],
    value_name: str = "value",
    na_rm: bool = True,
    agg: str = "sum",
) -> DataCube:
    """Dense numpy N-d array -> cube (reference ``as.cube.array``,
    R/as.cube.R:13-25; melt core R/data.table.R:12-32): cross-join of
    dimnames in row-major order, attach cell values, drop NaN cells
    (``na.rm``), build 1-level dims from the dimnames.

    Driver-side materialization — this is the test/interop bridge, not a
    distributed op (arrays that matter are already long-form at scale)."""
    import itertools

    import numpy as np

    arr = np.asarray(array, dtype=float)
    names = list(dim_names)
    shape = tuple(len(v) for v in dim_names.values())
    if arr.shape != shape:
        raise ValueError(f"array shape {arr.shape} != dimnames shape {shape}")
    rows = []
    flat = arr.ravel(order="C")
    for i, combo in enumerate(itertools.product(*dim_names.values())):
        v = float(flat[i])
        if na_rm and np.isnan(v):
            continue
        rows.append((*combo, None if np.isnan(v) else v))
    schema_cols = ", ".join([f"`{n}` string" for n in names] + [f"`{value_name}` double"])
    df = spark.createDataFrame(rows, schema=schema_cols)
    return from_table(df, {n: n for n in names}, [Measure(value_name, agg=agg)])


def snowflake_dimension(
    name: str,
    key: str,
    base: DataFrame,
    levels: Mapping[str, tuple[DataFrame, Sequence[str]]],
    hierarchies: Mapping[str, Mapping[str, Sequence[str]]] | None = None,
    dedup_levels: Sequence[str] = (),
    approx_rows: int | None = None,
    broadcast: bool | None = None,
) -> Dimension:
    """Assemble a snowflaked dimension (reference ``as.dimension``,
    R/as.dimension.R:33-64): ``base`` must carry the key + every level key;
    ``levels`` maps level_key -> (table, attrs).

    Level tables are assumed already unique by their key (warehouse dim
    tables are) — name a level in ``dedup_levels`` when it is derived from a
    non-unique source and genuinely needs the dedup shuffle."""
    lvls = {
        lk: Level.build(df, lk, attrs, unique=lk not in dedup_levels)
        for lk, (df, attrs) in levels.items()
    }
    hiers = {hn: Hierarchy(spec, hn) for hn, spec in (hierarchies or {}).items()}
    return Dimension(name, key, base, lvls, hiers,
                     approx_rows=approx_rows, broadcast=broadcast)


def scd2_dimension(
    name: str,
    key: str,
    changelog: DataFrame,
    ts_col: str,
    at=None,
    approx_rows: int | None = None,
) -> Dimension:
    """Build a cube dimension from an SCD Type-2 change log
    (``operators.scd``): by default the CURRENT snapshot (one row per
    key, latest attributes); pass ``at`` for the dimension as it stood
    at that instant — point-in-time cube queries over a versioned
    dimension without touching the fact side.

    The reference's dimensions are immutable snapshots (R/dimension.R);
    this is the bridge from the continuously-maintained version table to
    that model: rebuild the Dimension per reporting run (metadata-cheap
    — the snapshot is a filter over the version table), dice and
    aggregate as usual."""
    from data_cube_spark.operators.scd import (
        scd2_current,
        scd2_from_changelog,
        scd2_snapshot_at,
    )

    dim2 = scd2_from_changelog(changelog, key, ts_col)
    snap = scd2_current(dim2) if at is None else scd2_snapshot_at(dim2, at)
    return Dimension(name, key, snap, approx_rows=approx_rows)
