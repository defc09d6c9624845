"""Grouping sets: rollup / cube with reference-compatible level codes.

The reference implements grouping sets *by hand* — one group-by per prefix,
NA-pad the removed columns, tag an integer ``level`` (0 = leaf grain …
N = grand total), union the results (R/rollup.R:11-47). On Spark that whole
union is a single shuffle via the built-in ``rollup``/``cube`` operators
(SURVEY.md §4: "strictly better — single shuffle"), with
``grouping_id()`` encoding which columns were aggregated away.

Level-code translation: reference level ``k`` = number of trailing by-cols
NA'd; for a rollup the grouping_id values are exactly ``2^k - 1``
(0, 1, 3, 7, …), so ``level = bit_count(grouping_id)``. For a full cube the
bit-count is still "how many grouping columns were aggregated away", which
generalizes the reference's code (reference cube path was left unfinished,
R/fact.R:119-128 — we implement the intended semantics).
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_cube_spark.model import DataCube, Dimension, Fact, Measure, measure_exprs
from data_cube_spark.selectors import OP_COLLAPSE, OP_CUBE, OP_ROLLUP, Selector

LEVEL_COL = "grouping_level"


def rollup_table(
    df: DataFrame,
    by: Sequence[str],
    aggs: Sequence[Column],
    levels: Sequence[int] | None = None,
    level_col: str = LEVEL_COL,
) -> DataFrame:
    """Reference ``rollup.data.table`` (R/rollup.R:11-47) as one Spark
    rollup: ``level`` = number of by-cols aggregated away; ``levels``
    selects which prefixes to keep (reference ``INDEX`` arg)."""
    by = list(by)
    out = df.rollup(*by).agg(*aggs, F.grouping_id(*by).alias("_gid"))
    out = out.withColumn(level_col, F.bit_count(F.col("_gid")).cast("int")).drop("_gid")
    if levels is not None:
        out = out.where(F.col(level_col).isin([int(x) for x in levels]))
    return out


def cube_table(
    df: DataFrame,
    by: Sequence[str],
    aggs: Sequence[Column],
    grouping_sets: Sequence[int] | None = None,
    level_col: str = LEVEL_COL,
    id_col: str = "grouping_id",
) -> DataFrame:
    """Full cube grouping-sets (reference ``^`` op, intended semantics of
    R/fact.R:119-128). Emits both the bitmask ``grouping_id`` and the
    bit-count ``grouping_level``; ``grouping_sets`` filters by bitmask."""
    by = list(by)
    out = df.cube(*by).agg(*aggs, F.grouping_id(*by).alias(id_col))
    out = out.withColumn(level_col, F.bit_count(F.col(id_col)).cast("int"))
    if grouping_sets is not None:
        out = out.where(F.col(id_col).isin([int(x) for x in grouping_sets]))
    return out


def grouping_sets_table(
    df: DataFrame,
    sets: Sequence[Sequence[str]],
    by: Sequence[str],
    aggs: Sequence[Column],
    level_col: str = LEVEL_COL,
    id_col: str = "grouping_id",
) -> DataFrame:
    """Explicit GROUPING SETS (ANSI SQL; generalizes the reference's
    rollup/cube ops to arbitrary set lists). Uses the native
    ``DataFrame.groupingSets`` so the single-shuffle ``Expand`` generates
    ONLY the requested sets — for k sets over n columns that is k
    expansion rows per input row, not the 2^n of ``cube(...)`` + filter
    (the difference between 3x and 1024x scan amplification at n=10).

    ``grouping_id`` bitmask (first ``by`` column = most significant bit)
    and its bit-count level are emitted like the rollup/cube paths."""
    by = list(by)
    gd = df.groupingSets([[F.col(c) for c in s] for s in sets], *by)
    out = gd.agg(*aggs, F.grouping_id(*by).alias(id_col))
    return out.withColumn(level_col, F.bit_count(F.col(id_col)).cast("int"))


def rollup_cube(
    dc: DataCube,
    attrs: Sequence[str],
    fun: str | Callable | None = None,
    levels: Sequence[int] | None = None,
    op: str = "rollup",
    normalize: bool = True,
) -> DataCube:
    """Reference ``rollup.cube`` (R/rollup.R:57-104): grouping-sets over the
    cube at attribute grain, re-normalized with a bound ``grouping``
    dimension so the result stays a cube despite heterogeneous grain.

    Re-normalization (reference R/rollup.R:85-95): when a source dimension
    contributes >= 2 attributes, the fact keeps a generated surrogate key
    for that attribute combination and a proper normalized dimension table
    ``(surrogate key, *attrs)`` is bound — the cube's dimensional shape
    matches the reference's contract instead of one flat dimension per
    attribute. Surrogate keys are 64-bit hashes of the attr combo
    (:func:`data_cube_spark.functions.add_hash_key` semantics — O(1)/row,
    no global sort; the reference's sequential ``.GRP`` would be a global
    ranking at scale). ``normalize=False`` keeps every attribute as its own
    flat dimension on the fact (the denormalized form).

    The double-counting contract is intentional and preserved: a rollup cube
    contains every grain simultaneously, so summing across all levels
    multiplies the grand total (reference tests/tests-021-rollup.R:20-27).
    """
    joined, out_attrs = dc.joined(attrs)
    aggs = measure_exprs(dc.measures, agg_override=fun)
    fn = rollup_table if op == "rollup" else cube_table
    rolled = fn(joined, out_attrs, aggs, levels)
    measures = {n: (m.with_agg(fun) if fun is not None else m) for n, m in dc.measures.items()}

    dims: dict[str, Dimension] = {}
    id_vars: list[str] = []
    fact_df = rolled
    if normalize:
        routed = dc.resolve_attrs(attrs)
        for dname, fields in routed.items():
            if dname == "" or len(fields) < 2:
                for a in fields:
                    dims[a] = Dimension(a, a, rolled.select(a).dropDuplicates())
                    id_vars.append(a)
                continue
            sk = f"{dname}_sk"
            fact_df = fact_df.withColumn(sk, F.xxhash64(*fields))
            dims[dname] = Dimension(
                dname, sk, fact_df.select(sk, *fields).dropDuplicates([sk])
            )
            id_vars.append(sk)
            fact_df = fact_df.drop(*fields)
    else:
        for a in out_attrs:
            dims[a] = Dimension(a, a, rolled.select(a).dropDuplicates())
            id_vars.append(a)
    id_vars.append(LEVEL_COL)
    dims[DataCube.RESERVED] = Dimension(
        DataCube.RESERVED, LEVEL_COL, fact_df.select(LEVEL_COL).dropDuplicates()
    )
    return DataCube(Fact(fact_df, id_vars, measures), dims, strict=False)


def grouping_query(dc: DataCube, selectors: Mapping[str, Selector]) -> DataCube:
    """Execute a ``q()`` containing ``+`` (rollup) / ``^`` (cube) selectors
    (reference parse at R/data.cube.R:219-227,281-315; execution left
    unfinished there — this is the intended semantics).

    Grouping columns default to each selected dimension's hierarchy level
    keys, top-down (reference R/data.cube.R:285-299); plain-diced dims stay
    at key grain; collapsed dims are aggregated out first via ``q``.
    """
    plain: dict[str, Selector] = {}
    grouping: dict[str, Selector] = {}
    for name, sel in selectors.items():
        if sel.op in (OP_ROLLUP, OP_CUBE):
            grouping[name] = sel
            if sel.has_filter:  # pre-filter before grouping, like Collapse
                plain[name] = Selector(values=sel.values, filters=sel.filters)
        else:
            plain[name] = sel
    base = dc.q(**plain) if plain else dc

    by: list[str] = []
    any_cube = False
    for name, sel in grouping.items():
        dim = base.dims[name]
        any_cube = any_cube or sel.op == OP_CUBE
        if dim.hierarchies:
            if sel.hierarchy is not None:
                if sel.hierarchy not in dim.hierarchies:
                    raise KeyError(
                        f"dimension {name!r} has no hierarchy {sel.hierarchy!r}; "
                        f"have {list(dim.hierarchies)}")
                hier = dim.hierarchies[sel.hierarchy]
            else:
                hier = next(iter(dim.hierarchies.values()))
            keys = [k for k in hier.level_keys if k != dim.key]
            by.extend([*keys, dim.key])
        else:
            by.append(dim.key)
    # keep non-grouped dims in the group-by at key grain
    fixed = [base.dims[n].key for n in base.dims if n not in grouping]
    joined, out_attrs = base.joined([*fixed, *by])
    aggs = measure_exprs(base.measures)
    cols = [*fixed, *by]
    op_df = joined.cube(*cols) if any_cube else joined.rollup(*cols)
    out = op_df.agg(*aggs, F.grouping_id(*cols).alias("_gid"))
    if fixed:
        # fixed (non-grouped) dim keys occupy the leading grouping_id bits;
        # keeping them in every grouping set means those bits must be 0,
        # i.e. grouping_id < 2^len(by) — works for rollup and cube alike.
        out = out.where(F.col("_gid") < (1 << len(by)))
    out = out.withColumn(LEVEL_COL, F.bit_count(F.col("_gid")).cast("int")).drop("_gid")
    id_vars = [*out_attrs, LEVEL_COL]
    dims = {c: Dimension(c, c, out.select(c).dropDuplicates()) for c in out_attrs}
    dims[DataCube.RESERVED] = Dimension(
        DataCube.RESERVED, LEVEL_COL, out.select(LEVEL_COL).dropDuplicates()
    )
    return DataCube(Fact(out, id_vars, base.measures), dims, strict=False)
