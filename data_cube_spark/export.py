"""Export / sink layer (reference SURVEY.md §2.2 E1-E5):

- :func:`denormalize`  — star-join fact to all dims (E1)
- :func:`pivot_format` — sorted + formatted + optional pivot (E4)
- :func:`to_array`     — long -> dense numpy array at the collect boundary (E3)
- :func:`schema_info`  — metadata report (E5)
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_cube_spark.model import DataCube

#: guard for na_fill densification (reference CJ cross product,
#: R/data.cube.R:103-105) — a cross product of dimension members explodes at
#: scale; refuse beyond this many cells unless the caller raises the cap.
NA_FILL_MAX_CELLS = 50_000_000


def denormalize(
    dc: DataCube,
    dims: Sequence[str] | None = None,
    na_fill: bool = False,
    max_cells: int = NA_FILL_MAX_CELLS,
) -> DataFrame:
    """Star-join the fact to all (or selected) dimensions, attaching every
    hierarchy attribute (reference E1, R/data.cube.R:98-110).

    Each broadcast-sized dimension side is hinted — the plan is a chain of
    BroadcastHashJoins over one fact scan. Dimensions beyond the size gate
    (``model.BROADCAST_MAX_ROWS``, e.g. an order-grain dimension at 100 TB)
    join unhinted and AQE picks the strategy.

    ``na_fill=True`` first left-joins the fact onto the full cross product
    of dimension members (dense-array semantics, reference ``CJ`` path).
    Guarded by ``max_cells`` because a cross product is quadratic+ at scale.
    """
    names = list(dims) if dims is not None else list(dc.dims)
    df = dc.fact.df
    if na_fill:
        sizes = [dc.dims[n].base.count() for n in names]
        cells = reduce(lambda a, b: a * b, sizes, 1)
        if cells > max_cells:
            raise ValueError(
                f"na_fill cross product would materialize {cells:,} cells "
                f"(> {max_cells:,}); raise max_cells explicitly to force"
            )
        grid = reduce(
            lambda acc, n: acc.crossJoin(dc.dims[n].members()),
            names[1:],
            dc.dims[names[0]].members(),
        )
        df = grid.join(df, [dc.dims[n].key for n in names], "left")
    for n in names:
        dim = dc.dims[n]
        wide = dim.denormalized()
        add = [c for c in wide.columns if c == dim.key or c not in df.columns]
        # beyond-broadcast dims (order-grain at 100 TB) join unhinted: a
        # shuffled hash join AQE may still re-plan, never a forced broadcast
        df = df.join(dim._hint(wide.select(*add)), dim.key, "left")
    return df


def pivot_format(
    dc_or_df,
    rows: Sequence[str],
    pivot_col: str | None = None,
    pivot_values: Sequence | None = None,
    measure: str | None = None,
    formatted: bool = False,
) -> DataFrame:
    """Reference ``format.data.cube`` (E4, R/data.cube.R:433-458): output
    sorted by keys with NA last, per-measure format functions, optional
    pivot (dcast) of one dimension into columns. Format and pivot COMPOSE,
    in the reference's order: measures are formatted first, then the
    (formatted) values are pivoted (R/data.cube.R:433-458 formats, then
    optionally dcasts).

    Passing ``pivot_values`` avoids the extra distinct-collect job Spark
    otherwise runs to discover the pivot domain (matters at scale).
    """
    if isinstance(dc_or_df, DataCube):
        df = denormalize(dc_or_df)
        measures = dc_or_df.measures
    else:
        df = dc_or_df
        measures = {}
    if formatted and measures:
        df = df.select(
            *[F.col(c) for c in df.columns if c not in measures],
            *[m.formatted() for m in measures.values()],
        )
    if pivot_col is not None:
        if measure is None:
            if len(measures) != 1:
                raise ValueError("pivot needs an explicit measure")
            measure = next(iter(measures))
        gp = df.groupBy(*rows)
        piv = gp.pivot(pivot_col, list(pivot_values) if pivot_values else None)
        df = piv.agg(F.first(measure))
    return df.orderBy(*[F.col(r).asc_nulls_last() for r in rows])


#: dense-cell gate for the array bridge: the DENSIFIED array can dwarf the
#: sparse fact (product of member counts), so both the fact rows and the
#: dense cell count are gated
DENSE_ARRAY_MAX_CELLS = 50_000_000


def to_array(dc: DataCube, measure: str | None = None, na_fill=None):
    """Collect to a dense numpy N-d array indexed by sorted dimension
    members (reference E3, R/data.table.R:44-83). Collect-side bridge for
    tests/interop — count-gated (:func:`...model.assert_driver_sized` on
    every dimension and the fact, plus a dense-cell product gate) so a
    large cube raises clearly instead of OOM-ing the driver."""
    import math

    import numpy as np

    from data_cube_spark.model import assert_driver_sized

    if measure is None:
        if len(dc.measures) != 1:
            raise ValueError("to_array needs an explicit measure")
        measure = next(iter(dc.measures))
    names = list(dc.dims)
    keys = [dc.dims[n].key for n in names]
    members = {
        n: [
            r[0]
            for r in assert_driver_sized(
                dc.dims[n].members(), f"to_array dimension {n!r}"
            ).collect()
        ]
        for n in names
    }
    idx = {n: {v: i for i, v in enumerate(members[n])} for n in names}
    shape = tuple(len(members[n]) for n in names) or (1,)
    if math.prod(shape) > DENSE_ARRAY_MAX_CELLS:
        raise ValueError(
            f"to_array would densify to {math.prod(shape):,} cells "
            f"(gate {DENSE_ARRAY_MAX_CELLS:,}); keep the result sparse "
            f"(DataFrame API) for cubes this large."
        )
    fill = np.nan if na_fill is None else na_fill
    arr = np.full(shape, fill, dtype=float)
    fact = assert_driver_sized(dc.fact.df, "to_array fact")
    for row in fact.select(*keys, measure).collect():
        pos = tuple(idx[n][row[i]] for i, n in enumerate(names))
        v = row[len(names)]
        arr[pos if names else 0] = fill if v is None else float(v)
    dimnames = {n: members[n] for n in names}
    return arr, dimnames


def schema_info(dc: DataCube, *, counts: bool = False) -> dict:
    """Metadata report (reference E5, R/schema.R:2-11): per-table column
    schema; row counts only on request (they are actions)."""
    def tbl(df: DataFrame) -> dict:
        info = {"columns": df.columns, "schema": df.schema.simpleString()}
        if counts:
            info["rows"] = df.count()
        return info

    return {
        "fact": {**tbl(dc.fact.df), "id_vars": dc.fact.id_vars,
                 "measures": list(dc.measures)},
        "dimensions": {
            n: {
                "key": d.key,
                "base": tbl(d.base),
                "levels": {lk: tbl(lvl.df) for lk, lvl in d.levels.items()},
                "hierarchies": {hn: dict(h.levels) for hn, h in d.hierarchies.items()},
            }
            for n, d in dc.dims.items()
        },
    }


def head(dc: DataCube, n: int = 6) -> dict:
    """head(6) of every table (reference R/data.cube.R:117-119)."""
    out = {"fact": dc.fact.df.limit(n).toPandas()}
    for name, d in dc.dims.items():
        out[name] = d.base.limit(n).toPandas()
    return out


def drill_across(
    left: DataCube,
    right: DataCube,
    attrs: Sequence[str],
    how: str = "full_outer",
    right_attrs: Sequence[str] | None = None,
) -> DataFrame:
    """OLAP drill-across: measures from two cubes side by side at a shared
    conformed grain (Kimball's cross-fact-table query; no reference analog
    — its roadmap stops at single-fact cubes).

    Each cube aggregates to its ``attrs`` independently (partial
    aggregation, one shuffle each), then the two small conformed-grain
    results join on the attribute columns — the join input is
    |distinct grain values|, never fact-sized, so at 100 TB this is two
    fact passes plus a broadcast-or-tiny join. ``right_attrs`` maps the
    same conformed attributes under different names in the right cube
    (joined positionally, surfaced under the left names). Measure names
    must be disjoint."""
    attrs = list(attrs)
    r_attrs = list(right_attrs) if right_attrs is not None else attrs
    if len(r_attrs) != len(attrs):
        raise ValueError("right_attrs must match attrs in length")
    a = left.aggregate(attrs)
    b = right.aggregate(r_attrs)
    out_names = [c.split(".")[-1] for c in attrs]
    r_names = [c.split(".")[-1] for c in r_attrs]
    for rn, on in zip(r_names, out_names):
        if rn != on:
            b = b.withColumnRenamed(rn, on)
    overlap = (set(a.columns) & set(b.columns)) - set(out_names)
    if overlap:
        raise ValueError(f"measure name collision across cubes: {sorted(overlap)}")
    return a.join(b, out_names, how)
