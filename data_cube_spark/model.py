"""Core data model: Measure, Level, Hierarchy, Dimension, Fact, DataCube.

This is a brand-new PySpark implementation of the data model of the R
package ``data.cube`` (reference at /root/reference; see SURVEY.md §1):

- ``Measure``   ~ reference R/measure.R:6-34 (column + aggregate fn + format)
- ``Level``     ~ reference R/level.R:6-51 (snowflake level table)
- ``Hierarchy`` ~ reference R/hierarchy.R:6-39 (ordered level-key -> attrs)
- ``Dimension`` ~ reference R/dimension.R:6-110 (base table of keys + levels)
- ``Fact``      ~ reference R/fact.R:6-132 (fact at declared grain + measures)
- ``DataCube``  ~ reference R/data.cube.R:18-76 (fact + dimensions)

Everything is a **lazy DataFrame plus metadata** — no RDDs, no driver-side
row loops. Query execution is entirely declarative so Catalyst applies
predicate pushdown / column pruning / broadcast star joins; the only thing
this layer adds is the OLAP bookkeeping (hierarchies, grain, drop rules).

Scale design notes (100 TB fact, 1000 executors):
- broadcast-sized dimension tables are hinted (`F.broadcast`) in every
  semi-/star-join, so filtering a 100 TB fact by an attribute never
  shuffles the fact; dimensions beyond the size gate (`BROADCAST_MAX_ROWS`,
  e.g. order-grain dims) emit plain semi-joins and AQE picks the strategy;
- key-value dices are pushed down as `isin` literals => parquet row-group
  pruning on the fact scan;
- re-aggregation happens only when the grain actually changes (the
  reference re-aggregates unconditionally, R/fact.R:87-98 — on Spark an
  identity re-agg would be a full shuffle, so we skip it);
- drop decisions are made from the *selector* (scalar => drop), never from
  a `count()` action (reference computes cardinality; see SURVEY.md §7.4).
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence
from functools import reduce
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_cube_spark.selectors import (
    OP_COLLAPSE,
    OP_CUBE,
    OP_ROLLUP,
    Range,
    Selector,
    normalize,
)


def range_cond(col: Column, rng: Range) -> Column:
    """Column predicate for a :class:`Range` selector value — comparison
    filters that push to the parquet scan (GreaterThan/LessThan in
    PushedFilters), the structural alternative to post-hoc WHEREs."""
    conds = []
    if rng.lo is not None:
        conds.append(col >= rng.lo if rng.lo_incl else col > rng.lo)
    if rng.hi is not None:
        conds.append(col <= rng.hi if rng.hi_incl else col < rng.hi)
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out

# ---------------------------------------------------------------------------
# Measure
# ---------------------------------------------------------------------------

#: whitelist of aggregate names -> JVM-side Column functions (stay in
#: whole-stage codegen; a Python callable falls back to a pandas UDAF).
#: Mirrors the reference's `fun.aggregate` surface (R/measure.R:14-28).
_BUILTIN_AGGS: dict[str, Callable[[str], Column]] = {
    "sum": F.sum,
    "mean": F.avg,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "count_distinct": F.countDistinct,
    "approx_count_distinct": F.approx_count_distinct,
    "first": lambda c: F.first(c, ignorenulls=True),
    "last": lambda c: F.last(c, ignorenulls=True),
    "stddev": F.stddev,
    "variance": F.variance,
    "median": F.median,
    "product": F.product,
    "sum_distinct": F.sum_distinct,
    "skewness": F.skewness,
    "kurtosis": F.kurtosis,
    "any_value": lambda c: F.any_value(c, ignoreNulls=True),
}


class Measure:
    """A named measure: source column/expression + aggregate function.

    Reference semantics (R/measure.R:6-34 + R/fact.R:27-35): each measure
    owns its aggregate function; whenever the cube's grain changes the
    measure is re-aggregated with ``reagg`` over the already-aggregated
    column. As in the reference (R/fact.R:92-98) this means non-decomposable
    functions like ``mean`` regrain as mean-of-partials — the documented
    contract. ``count`` re-aggregates as ``sum`` (count-of-counts would be
    wrong; the reference never regrains a count).

    ``column`` may be a column name or an arbitrary ``pyspark.sql.Column``
    expression (e.g. revenue = extendedprice * (1 - discount)).
    ``agg`` is a whitelist name or a Python callable ``pd.Series -> scalar``
    (executed as an Arrow-batched pandas UDAF — the slow path, reference
    §2.9 parity for arbitrary ``fun.aggregate``).
    """

    def __init__(
        self,
        name: str,
        column: str | Column | None = None,
        agg: str | Callable = "sum",
        reagg: str | Callable | None = None,
        fmt: Callable[[Column], Column] | None = None,
        label: str | None = None,
        dtype: str = "double",
        fill=None,
    ) -> None:
        self.name = name
        self.column = column if column is not None else name
        self.agg = agg
        self._explicit_reagg = reagg is not None
        if reagg is None:
            reagg = "sum" if agg == "count" else agg
        self.reagg = reagg
        self.fmt = fmt
        self.label = label or name
        self.dtype = dtype  # return type for callable aggs
        # R-parity NA handling: ``sum(x, na.rm=TRUE)`` over an all-NA group
        # is 0 in R but null in Spark/SQL — ``fill=0`` coalesces the
        # aggregate output (SURVEY.md §7.4 NA/null parity).
        self.fill = fill

    # -- expression builders ------------------------------------------------
    def _apply(self, agg: str | Callable, col: str | Column) -> Column:
        if callable(agg):
            return self._pandas_udaf(agg)(col if isinstance(col, Column) else F.col(col))
        try:
            fn = _BUILTIN_AGGS[agg]
        except KeyError:
            raise ValueError(
                f"unknown aggregate {agg!r}; whitelist={sorted(_BUILTIN_AGGS)} or pass a callable"
            ) from None
        return fn(col)

    def _pandas_udaf(self, fn: Callable):
        # GROUPED_AGG via type-hint inference (SPARK-28264): annotations are
        # attached as real class objects (not strings) because the module's
        # ``from __future__ import annotations`` would otherwise leave
        # strings that get_type_hints can't resolve from a nested scope.
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        def _udaf(s):
            return fn(s)

        _udaf.__annotations__ = {"s": pd.Series, "return": float}
        return pandas_udf(_udaf, self.dtype)

    def _finish(self, expr: Column) -> Column:
        if self.fill is not None:
            expr = F.coalesce(expr, F.lit(self.fill))
        return expr.alias(self.name)

    def build_expr(self) -> Column:
        """Aggregate the raw source column to the declared grain (ingest-time
        partial aggregation, reference R/fact.R:40-44)."""
        return self._finish(self._apply(self.agg, self.column))

    #: aggregates whose per-grain outputs carry no information about the
    #: coarser grain — re-applying them to partials is meaningless (a
    #: count_distinct of partial distinct-counts counts distinct *values of
    #: counts*), unlike mean-of-partials which is a documented approximation.
    _NON_REGRAINABLE = frozenset({"count_distinct", "sum_distinct"})

    def reagg_expr(self, agg_override: str | Callable | None = None) -> Column:
        """Re-aggregate the measure's own output column on regrain."""
        agg = agg_override or self.reagg
        if (agg_override is None and not self._explicit_reagg
                and agg in self._NON_REGRAINABLE):
            raise ValueError(
                f"measure {self.name!r} uses {self.agg!r}, which cannot be "
                "re-aggregated from partials: distinct counts at one grain "
                "say nothing about a coarser grain. Pass an explicit "
                "reagg= (e.g. 'sum' if partial key sets are disjoint, or "
                "rebuild from raw keys / use approx_count_distinct), or "
                "query the cube at its built grain."
            )
        return self._finish(self._apply(agg, self.name))

    def formatted(self) -> Column:
        col = F.col(self.name)
        return (self.fmt(col) if self.fmt else col).alias(self.name)

    def with_agg(self, agg: str | Callable) -> "Measure":
        """Copy with a replaced aggregate fn (reference ``FUN`` override in
        apply/capply/rollup, R/data.cube.R:483-491)."""
        return Measure(self.name, self.column, agg, None, self.fmt, self.label,
                       self.dtype, self.fill)

    def __repr__(self) -> str:
        return f"Measure({self.name!r}, agg={self.agg!r})"


def measure_exprs(measures: Mapping[str, Measure], *, build: bool = False,
                  agg_override: str | Callable | None = None) -> list[Column]:
    if build:
        return [m.build_expr() for m in measures.values()]
    return [m.reagg_expr(agg_override) for m in measures.values()]


# ---------------------------------------------------------------------------
# Level / Hierarchy
# ---------------------------------------------------------------------------


class Level:
    """One snowflake level table: level key + functionally-dependent attrs.

    Reference R/level.R:6-51 — built by ``unique(x, by=key)`` + projection;
    here a lazy ``dropDuplicates([key])`` projection.
    """

    def __init__(self, key: str, df: DataFrame, attrs: Sequence[str],
                 pristine: DataFrame | None = None) -> None:
        self.key = key
        self.df = df
        self.attrs = tuple(attrs)
        self._pristine = pristine

    @property
    def pristine(self) -> DataFrame:
        """The level table BEFORE any base-derived semi-join restriction
        (the table itself when never restricted).

        Attribute resolution (``Dimension.attr_table``/``denormalized``/
        filter routing) joins levels onto the dimension base, and a join
        keyed on the level key picks exactly the rows whose key survives
        in the base — restricting the level first changes nothing about
        the result, it only embeds a copy of the (possibly multi-join)
        filtered-base plan inside EVERY level subtree. Resolving against
        the pristine table instead keeps each level subtree a single
        scan, identical across its uses (so ReuseExchange can collapse
        repeated broadcasts). Measured on tpch_q5 at sf0.1 (r14): 49
        parquet scans / 50 BroadcastExchange builds -> see
        OPTIMIZATION_r14.md. ``df`` keeps the restricted lineage for the
        surfaces where the restricted ROWS are the contract
        (``save_cube`` level tables, ``schema_info(counts=True)``)."""
        return self._pristine if self._pristine is not None else self.df

    @classmethod
    def build(cls, df: DataFrame, key: str, attrs: Sequence[str] | None = None,
              *, unique: bool = False) -> "Level":
        """``unique=True`` asserts the source is already at key grain and
        skips the dedup — at scale ``dropDuplicates`` is a full shuffle, and
        dimension tables loaded from a curated warehouse are already unique
        (the reference always dedups, R/level.R:16-17; we make it opt-out)."""
        attrs = tuple(a for a in (attrs if attrs is not None else df.columns) if a != key)
        proj = df.select(key, *attrs)
        return cls(key, proj if unique else proj.dropDuplicates([key]), attrs)

    @property
    def columns(self) -> tuple[str, ...]:
        return (self.key, *self.attrs)

    def subset(self, filters: Mapping[str, Sequence], *, broadcast: bool = True) -> DataFrame:
        """Conjunctive ``isin`` filter (reference level$subset mode (a),
        R/level.R:31-45 + build.each.i R/cube.R:42-45). A DataFrame value
        means semi-join (mode (b)). No dedup anywhere: left-semi join
        semantics are duplicate-insensitive."""
        # filter the PRISTINE table: the caller semi-joins the dimension
        # base on the surviving keys, which intersects away any rows a
        # prior restriction would have removed — same result, one scan
        df = self.pristine
        for fld, vals in filters.items():
            if isinstance(vals, DataFrame):
                keys = vals.select(fld)
                df = df.join(F.broadcast(keys) if broadcast else keys, fld, "left_semi")
            elif isinstance(vals, Range):
                df = df.where(range_cond(F.col(fld), vals))
            else:
                df = df.where(F.col(fld).isin(list(vals)))
        return df

    def semijoin(self, keys: DataFrame, *, broadcast: bool = True) -> "Level":
        keys = F.broadcast(keys) if broadcast else keys
        return Level(self.key, self.df.join(keys, self.key, "left_semi"),
                     self.attrs, pristine=self.pristine)

    def __repr__(self) -> str:
        return f"Level({self.key!r}, attrs={list(self.attrs)})"


class Hierarchy:
    """Ordered mapping ``level_key -> [attrs]`` (lowest level last, its attr
    list carrying the upper level keys) — reference R/hierarchy.R:6-39, shape
    example R/populate.R:96-109. Pure metadata."""

    def __init__(self, levels: Mapping[str, Sequence[str]], name: str | None = None) -> None:
        self.levels = {k: tuple(v) for k, v in levels.items()}
        self.name = name

    @property
    def level_keys(self) -> list[str]:
        return list(self.levels)

    def __repr__(self) -> str:
        return f"Hierarchy({self.name or ''}{dict(self.levels)})"


# ---------------------------------------------------------------------------
# Dimension
# ---------------------------------------------------------------------------

#: Broadcast size gate: dimensions whose declared ``approx_rows`` exceeds
#: this get NO ``F.broadcast`` hints anywhere in the engine — the semi-/star-
#: joins are emitted unhinted and AQE picks the physical strategy at runtime.
#: Rationale: a broadcast hint is an *order*, not a suggestion — hinting an
#: order-grain dimension (same cardinality as the fact) at 100 TB means
#: shipping hundreds of millions of keys to every executor (OOM, not a slow
#: plan). ~4M keys × ~16 B ≈ the 64 MB autoBroadcastJoinThreshold the
#: session sets, so the gate and the auto-threshold agree in spirit.
#:
#: Interaction with the guarded reads (ADVICE r13): a fact read through
#: ``sources.ingest.read_guarded``/``read_bucketed`` may carry a pinned
#: ``merge`` hint, which outranks AQE's AUTO broadcast of the other side
#: — so an un-hinted above-gate dimension joining a guarded fact plans
#: sort-merge even if AQE would have judged it runtime-small. That is
#: the intended precedence: the guard exists because Catalyst's
#: compressed-bytes sizing mis-judged "small" once (r12 driver OOM), and
#: a sort-merge on a bucketed fact is exchange-free anyway. Explicit
#: ``F.broadcast`` hints (every below-gate dim) still outrank the merge
#: pin, so star joins keep their broadcast plans.
BROADCAST_MAX_ROWS = 4_000_000

#: row gate for the reference-parity DRIVER-side export conveniences
#: (``DataCube.dimnames``, ``export.to_array``) — same convention as
#: ``similarity.DRIVER_PAIRS_MAX_ROWS``: these collect to the driver by
#: contract (array bridge / member listing), so refuse clearly above the
#: gate instead of OOM-ing the driver on a fact-grain dimension.
DRIVER_EXPORT_MAX_ROWS = 1_000_000


def assert_driver_sized(df: DataFrame, what: str,
                        gate: int | None = None) -> DataFrame:
    """Count-gate a frame that is about to be collect()ed to the driver;
    raises with a clear message instead of letting the collect OOM.
    ``gate`` defaults to :data:`DRIVER_EXPORT_MAX_ROWS` at call time (so
    tests can lower it)."""
    if gate is None:
        gate = DRIVER_EXPORT_MAX_ROWS
    n = df.count()
    if n > gate:
        raise ValueError(
            f"{what} would collect {n:,} rows to the driver "
            f"(gate {gate:,}). This is a driver-side export convenience; "
            f"for large data keep the result distributed (DataFrame API) "
            f"or raise the gate explicitly."
        )
    return df


class Dimension:
    """A dimension: base table (key + all level keys, the star/snowflake
    hybrid of reference R/dimension.R:44-46) + snowflake level tables +
    hierarchies.

    The base table is deliberately *narrow* (keys only): any hierarchy
    attribute resolves with at most one base->level hop, and for a
    catalog-sized dimension the base broadcasts, so attribute filters never
    shuffle the fact.

    Size class: ``approx_rows`` declares the dimension's rough cardinality
    (an upper bound is fine — filtered copies inherit it). Above
    :data:`BROADCAST_MAX_ROWS` the engine stops hinting broadcast for this
    dimension's joins (see the gate note above). ``broadcast`` forces the
    decision either way.
    """

    def __init__(
        self,
        name: str,
        key: str,
        base: DataFrame,
        levels: Mapping[str, Level] | None = None,
        hierarchies: Mapping[str, Hierarchy] | None = None,
        *,
        unique: bool = False,
        approx_rows: int | None = None,
        broadcast: bool | None = None,
    ) -> None:
        self.name = name
        self.key = key
        self.base = base
        self.approx_rows = approx_rows
        self.broadcast = broadcast
        if levels is None:
            # flat dimension: single level holding every attribute.
            # ``unique=True`` asserts the input is already at key grain and
            # skips the dedup shuffle.
            levels = {key: Level.build(base, key, unique=unique)}
        self.levels = dict(levels)
        if key not in self.levels:
            self.levels[key] = Level.build(base, key, [], unique=True)
        self.hierarchies = dict(hierarchies or {})

    @property
    def broadcastable(self) -> bool:
        if self.broadcast is not None:
            return self.broadcast
        return self.approx_rows is None or self.approx_rows <= BROADCAST_MAX_ROWS

    def _hint(self, df: DataFrame) -> DataFrame:
        """Apply the broadcast hint iff this dimension is broadcast-sized."""
        return F.broadcast(df) if self.broadcastable else df

    # -- metadata -----------------------------------------------------------
    @property
    def fields(self) -> dict[str, str]:
        """attr -> owning level key (reference `fields`, R/dimension.R:30-43).
        Level keys map to themselves; the dimension key always present."""
        out: dict[str, str] = {self.key: self.key}
        for lk, lvl in self.levels.items():
            out.setdefault(lk, lk)
            for a in lvl.attrs:
                out.setdefault(a, lk)
        for c in self.base.columns:
            out.setdefault(c, self.key)
        return out

    def has_field(self, field: str) -> bool:
        return field in self.fields

    # -- filtering (reference dimension$subset, R/dimension.R:64-93) --------
    def subset(self, filters: Mapping[str, Sequence]) -> "Dimension":
        """AND-combine attribute filters: route each field to its owning
        level, filter that level, semi-join the base on the level key; then
        re-derive all levels from the filtered base (snowflake semi-join
        down, reference R/dimension.R:85-93). All lazy; dims broadcast."""
        base = self.base
        fields = self.fields
        for field, vals in filters.items():
            if field not in fields:
                raise KeyError(f"dimension {self.name!r} has no field {field!r}")
            vals = list(vals) if not isinstance(vals, (DataFrame, Range)) else vals
            if field in base.columns and isinstance(vals, Range):
                base = base.where(range_cond(F.col(field), vals))
            elif field in base.columns and not isinstance(vals, DataFrame):
                base = base.where(F.col(field).isin(vals))
            else:
                lk = fields[field]
                keys = self.levels[lk].subset(
                    {field: vals}, broadcast=self.broadcastable
                ).select(lk)
                # the surviving-keys frame is a subset of a *level* table —
                # level cardinality <= dimension cardinality, so the gate is
                # conservative for it too
                base = base.join(self._hint(keys), lk, "left_semi")
        return self._with_base(base)

    def subset_any(self, alternatives: Sequence[Mapping[str, Sequence]]) -> "Dimension":
        """OR-combine filter alternatives: union of the per-alternative
        filtered bases, deduped by key (each alternative is AND-combined by
        :meth:`subset`). Extension beyond the reference, which documents OR
        as unsupported (R/dimension.R:81)."""
        bases = [self.subset(alt).base for alt in alternatives]
        base = reduce(lambda a, b: a.unionByName(b), bases)
        return self._with_base(base.dropDuplicates([self.key]))

    def _with_base(self, base: DataFrame) -> "Dimension":
        new_levels = {
            lk: lvl.semijoin(base.select(lk), broadcast=self.broadcastable)
            for lk, lvl in self.levels.items()
        }
        return Dimension(self.name, self.key, base, new_levels, self.hierarchies,
                         approx_rows=self.approx_rows, broadcast=self.broadcast)

    def semijoin_keys(self, keys: DataFrame) -> "Dimension":
        """Restrict to fact-surviving keys (used after fact-side filters)."""
        return self._with_base(
            self.base.join(self._hint(keys), self.key, "left_semi")
        )

    # -- attribute resolution (capply / aggregate path) ---------------------
    def attr_table(self, attrs: Sequence[str]) -> DataFrame:
        """``(key, *attrs)`` projection — base joined with just the levels
        that own the requested attrs (reference projects each needed dim to
        {key, by-attrs}, R/cube.R:186-196). Broadcast-sized."""
        needed: dict[str, list[str]] = {}
        fields = self.fields
        for a in attrs:
            if a == self.key or a in self.base.columns:
                continue
            lk = fields.get(a)
            if lk is None:
                raise KeyError(f"dimension {self.name!r} has no field {a!r}")
            needed.setdefault(lk, []).append(a)
        df = self.base
        for lk, cols in needed.items():
            lvl = self.levels[lk]
            # pristine: the base join keeps exactly the surviving keys'
            # rows (see Level.pristine) — one scan per level, reusable
            df = df.join(self._hint(lvl.pristine.select(lk, *[c for c in cols if c != lk])), lk, "left")
        return df.select(self.key, *[a for a in attrs if a != self.key])

    def denormalized(self) -> DataFrame:
        """Base joined with every level table — the full wide dimension
        (reference denormalize path R/data.cube.R:98-110)."""
        df = self.base
        for lk, lvl in self.levels.items():
            add = [a for a in lvl.attrs if a not in df.columns]
            if add:
                df = df.join(self._hint(lvl.pristine.select(lk, *add)), lk, "left")
        return df

    def members(self) -> DataFrame:
        """Sorted key members (the reference guarantees sorted dimnames,
        vignettes/sub-.data.cube.Rmd:33). The base is at key grain by
        construction, so no dedup is needed."""
        return self.base.select(self.key).orderBy(self.key)

    def __repr__(self) -> str:
        return f"Dimension({self.name!r}, key={self.key!r}, levels={list(self.levels)})"


# ---------------------------------------------------------------------------
# Fact
# ---------------------------------------------------------------------------


class Fact:
    """Fact table at its declared grain + measure registry.

    Invariant (reference R/fact.R:40-44): the DataFrame is aggregated to
    ``id_vars`` grain at construction; Spark's hash aggregate does the
    partial/final (map-side combine) split physically, so at 100 TB the
    shuffle carries pre-combined partials, not raw rows.
    """

    def __init__(self, df: DataFrame, id_vars: Sequence[str], measures: Mapping[str, Measure]) -> None:
        self.df = df
        self.id_vars = list(id_vars)
        self.measures = dict(measures)

    @classmethod
    def build(cls, df: DataFrame, id_vars: Sequence[str], measures: Sequence[Measure] | Mapping[str, Measure]) -> "Fact":
        if not isinstance(measures, Mapping):
            measures = {m.name: m for m in measures}
        agg = df.groupBy(*id_vars).agg(*measure_exprs(measures, build=True))
        return cls(agg, id_vars, measures)

    @property
    def measure_names(self) -> list[str]:
        return list(self.measures)

    def reaggregate(self, keep: Sequence[str], agg_override: str | Callable | None = None) -> "Fact":
        """Regrain to ``keep`` FKs (collapse/slice), re-applying each
        measure's own aggregate (reference build.j, R/fact.R:52-60,92-98).
        Skips the shuffle when the grain is unchanged and no override."""
        keep = list(keep)
        if keep == self.id_vars and agg_override is None:
            return self
        df = self.df.groupBy(*keep).agg(*measure_exprs(self.measures, agg_override=agg_override))
        return Fact(df, keep, self.measures)

    def merge(self, other: "Fact") -> "Fact":
        """Incremental maintenance: merge another fact at the same grain by
        unioning partials and re-aggregating once. Exact for decomposable
        aggregates (sum/min/max/count-as-sum); non-decomposable fns keep the
        documented mean-of-partials contract (reference R/fact.R:92-98).

        At 100 TB this is the batch-upsert path: the delta (small) shuffles
        with the existing partials instead of reprocessing the raw history.
        """
        if other.id_vars != self.id_vars:
            raise ValueError(
                f"grain mismatch: {other.id_vars} vs {self.id_vars}")
        if set(other.measures) != set(self.measures):
            raise ValueError(
                f"measure mismatch: {sorted(other.measures)} vs {sorted(self.measures)}")
        u = self.df.unionByName(other.df)
        df = u.groupBy(*self.id_vars).agg(*measure_exprs(self.measures))
        return Fact(df, self.id_vars, self.measures)

    def filter_keys(self, fk: str, keys: Sequence | DataFrame,
                    *, broadcast: bool = True) -> "Fact":
        """Dice the fact on one FK: literal ``isin`` pushdown for value lists
        (=> parquet row-group pruning), left-semi for key frames (reference
        semi-join J1, R/fact.R:82). ``broadcast=False`` (surviving keys of a
        beyond-broadcast dimension) emits the semi-join unhinted — a shuffle
        join the optimizer/AQE may still downgrade, never a forced OOM."""
        if isinstance(keys, DataFrame):
            # re-project to the original column order: a name-keyed join
            # moves the join key to the front, and the fact schema is part
            # of the public contract
            keys = keys.select(fk)
            df = self.df.join(F.broadcast(keys) if broadcast else keys,
                              fk, "left_semi").select(*self.df.columns)
        elif isinstance(keys, Range):
            # range dice on the FK itself: comparison filters push to the
            # fact scan, no dimension round-trip at all
            df = self.df.where(range_cond(F.col(fk), keys))
        else:
            df = self.df.where(F.col(fk).isin(list(keys)))
        return Fact(df, self.id_vars, self.measures)

    def __repr__(self) -> str:
        return f"Fact(id_vars={self.id_vars}, measures={list(self.measures)})"


# ---------------------------------------------------------------------------
# DataCube
# ---------------------------------------------------------------------------


class DataCube:
    """fact + named dimensions (reference R/data.cube.R:18-76).

    Construction rules mirrored from the reference (R/data.cube.R:44-74):
    - dimension keys must be single-column (enforced by the model),
    - dims are matched to fact ``id_vars`` by key name and reordered,
    - extra dimensions (no matching FK) are dropped,
    - extra fact keys (no matching dimension) are collapsed out with
      re-aggregation,
    - the name ``grouping`` is reserved for the rollup grouping dimension.
    """

    RESERVED = "grouping"

    def __init__(self, fact: Fact, dims: Mapping[str, Dimension] | Sequence[Dimension] | None = None,
                 *, strict: bool = True) -> None:
        if dims is None:
            dims = {}
        if not isinstance(dims, Mapping):
            dims = {d.name: d for d in dims}
        for name in dims:
            if name == self.RESERVED and strict:
                raise ValueError(f"dimension name {self.RESERVED!r} is reserved (rollup grouping)")
        keyed = {d.key: (name, d) for name, d in dims.items()}
        # keep dims whose key appears in the fact, ordered to match id_vars
        ordered: dict[str, Dimension] = {}
        for fk in fact.id_vars:
            if fk in keyed:
                name, d = keyed[fk]
                ordered[name] = d
        # extra fact keys (no dim): keep as degenerate keys — they stay in the
        # grain but have no dimension metadata. The reference collapses them
        # (R/data.cube.R:48-74); we keep them addressable as degenerate dims.
        self.fact = fact
        self.dims = ordered
        #: registered materialized summaries for the aggregate navigator
        #: (NOT inherited by derived cubes — any dice/collapse invalidates
        #: them); list of (attr_count, summary_cube)
        self._summaries: list[tuple[int, "DataCube"]] = []

    # -- array-API metadata (reference R/data.cube.R:422-426,462-464) -------
    def dim(self) -> list[int]:
        """Cardinality of each dimension (requires actions — use sparingly)."""
        return [d.base.count() for d in self.dims.values()]

    def dimnames(self) -> dict[str, list]:
        """Member list per dimension (reference R/data.cube.R:424-426).
        Driver-side by contract; each dimension is count-gated
        (:func:`assert_driver_sized`) so a fact-grain dimension raises
        clearly instead of OOM-ing the driver."""
        return {
            name: [
                r[0]
                for r in assert_driver_sized(
                    d.members(), f"dimnames[{name!r}]"
                ).collect()
            ]
            for name, d in self.dims.items()
        }

    def __len__(self) -> int:
        """``length(dc)`` — fact row count (reference R/data.cube.R:462;
        runs a count job, use sparingly)."""
        return self.fact.df.count()

    @property
    def names(self) -> list[str]:
        """``names(dc)`` — fact column names (reference R/data.cube.R:463);
        metadata-only, no job."""
        return list(self.fact.df.columns)

    def plan_report(self) -> dict:
        """Scale audit of this cube's current fact plan (see
        :func:`data_cube_spark.plans.plan_report`): shuffle count, join
        strategy mix, nested-loop count, scan pushdown — the pre-submit
        checklist, no job run."""
        from data_cube_spark.plans import plan_report

        return plan_report(self.fact.df)

    @property
    def measures(self) -> dict[str, Measure]:
        return self.fact.measures

    # -- query entry (reference "[.data.cube" R/data.cube.R:390-409) --------
    def __getitem__(self, spec) -> "DataCube":
        if spec is None or (isinstance(spec, tuple) and len(spec) == 0):
            return self  # dc[] no-op short-circuit
        if isinstance(spec, Mapping):
            return self.q(**spec)
        if isinstance(spec, tuple):
            return self.q(*spec)
        return self.q(spec)

    def q(self, *args: Any, **selectors: Any) -> "DataCube":
        """Slice/dice/collapse query. Each kwarg names a dimension; values
        are coerced through :func:`data_cube_spark.selectors.normalize`.

        Positional and named selectors MIX with the reference's positional-
        shift rule (parse.dots, R/data.cube.R:140-160; spec tests
        tests/tests-sub-.data.cube.R:141-150,290-297): named selectors claim
        their dimensions first, then positional selectors fill the remaining
        dimensions in declaration order. ``...`` (Ellipsis) skips a
        positional slot. ``dc.q("A", time=X)`` therefore dices the first
        non-``time`` dimension by "A".

        Execution order mirrors the reference lifecycle (SURVEY.md §3.1):
        filter dimensions first (broadcast-sized), then dice the fact by
        surviving keys (isin literal pushdown or broadcast semi-join), then
        re-aggregate once if any dimension was dropped/collapsed.
        """
        unknown = set(selectors) - set(self.dims)
        if unknown:
            raise KeyError(f"unknown dimensions {sorted(unknown)}; have {list(self.dims)}")
        if args:
            free = [n for n in self.dims if n not in selectors]
            if len(args) > len(free):
                raise ValueError(
                    f"{len(args)} positional selectors for {len(free)} unnamed "
                    f"dimensions (named: {sorted(selectors)})")
            for name, sel in zip(free, args):
                if sel is not ...:
                    selectors[name] = sel

        grouping_ops = {n: s for n, s in ((n, normalize(s)) for n, s in selectors.items())
                        if s.op in (OP_ROLLUP, OP_CUBE)}
        if grouping_ops:
            from data_cube_spark.groupingsets import grouping_query
            return grouping_query(self, {n: normalize(s) for n, s in selectors.items()})

        new_dims: dict[str, Dimension] = {}
        fact = self.fact
        removed: set[str] = set()

        for name, dim in self.dims.items():
            if name not in selectors:
                new_dims[name] = dim
                continue
            sel = normalize(selectors[name])  # explicit None => empty dice (dc[NULL])
            filters = sel.as_filters(dim.key)

            if sel.or_filters:
                fdim = dim.subset_any(sel.or_filters)
                if filters:  # AND-combine any direct filters on top
                    fdim = fdim.subset(filters)
                fact = fact.filter_keys(dim.key, fdim.base.select(dim.key),
                                        broadcast=dim.broadcastable)
            else:
                key_only = set(filters) == {dim.key} and not isinstance(filters.get(dim.key), DataFrame)
                fdim = dim.subset(filters) if filters else dim

                if filters:
                    if key_only:
                        # literal pushdown: parquet row-group pruning on the fact
                        fact = fact.filter_keys(dim.key, filters[dim.key])
                    else:
                        fact = fact.filter_keys(dim.key, fdim.base.select(dim.key),
                                                broadcast=dim.broadcastable)

            if sel.op == OP_COLLAPSE:
                removed.add(dim.key)  # aggregate the dimension out
                continue
            if sel.drop:
                removed.add(dim.key)  # scalar slice: drop (R/data.cube.R:264-272)
                continue
            new_dims[name] = fdim

        keep = [fk for fk in fact.id_vars if fk not in removed]
        fact = fact.reaggregate(keep)
        # strict=False: re-queries of rollup cubes legitimately carry the
        # reserved `grouping` dimension (reference slices rollup cubes by
        # level, tests-021-rollup.R:72-81)
        return DataCube(fact, new_dims, strict=False)

    # -- aggregate by arbitrary hierarchy attributes (capply, A3) -----------
    def resolve_attrs(self, attrs: Sequence[str]) -> dict[str, list[str]]:
        """attr -> owning dimension, erroring on ambiguity unless qualified
        as ``"dim.attr"`` (reference dimnames.attributes, R/cube.R:23-39)."""
        out: dict[str, list[str]] = {}
        for a in attrs:
            if "." in a:
                dname, fld = a.split(".", 1)
                if dname not in self.dims or not self.dims[dname].has_field(fld):
                    raise KeyError(f"no field {fld!r} in dimension {dname!r}")
                out.setdefault(dname, []).append(fld)
                continue
            owners = [n for n, d in self.dims.items() if d.has_field(a)]
            if not owners:
                if a in self.fact.df.columns:
                    out.setdefault("", []).append(a)  # degenerate fact column
                    continue
                raise KeyError(
                    f"attribute {a!r} not found in any dimension or fact column; "
                    f"dimensions: {list(self.dims)}"
                )
            if len(owners) > 1:
                raise KeyError(
                    f"attribute {a!r} is ambiguous across dimensions {owners} — "
                    f"qualify as 'dim.{a}'"
                )
            out.setdefault(owners[0], []).append(a)
        return out

    def joined(self, attrs: Sequence[str]) -> tuple[DataFrame, list[str]]:
        """Fact inner-joined with the attr tables of every referenced dim
        (broadcast star join, reference R/cube.R:200-205). Returns the
        joined frame and the unqualified output attr names."""
        routed = self.resolve_attrs(attrs)
        df = self.fact.df
        out_attrs: list[str] = []
        for dname, fields in routed.items():
            if dname == "":
                out_attrs.extend(fields)
                continue
            dim = self.dims[dname]
            fields_nokey = [f for f in fields if f != dim.key]
            out_attrs.extend(fields)
            if fields_nokey:
                df = df.join(dim._hint(dim.attr_table(fields_nokey)), dim.key, "inner")
        return df, out_attrs

    #: aggregates whose regrain over partials is EXACT (mean-of-partials
    #: style approximations disqualify a summary from answering for the
    #: base cube)
    _EXACT_REAGG = frozenset({"sum", "min", "max"})

    def _summaries_exact(self) -> bool:
        for m in self.measures.values():
            if callable(m.agg) or callable(m.reagg):
                return False
            if m.agg == "count" and m.reagg == "sum":
                continue
            if m.agg not in self._EXACT_REAGG or m.reagg != m.agg:
                return False
        return True

    def with_summary(self, attrs: Sequence[str], *, persist: bool = True) -> "DataCube":
        """Materialize an aggregate summary at the ``attrs`` grain and
        register it with the aggregate navigator: later :meth:`aggregate`
        calls whose attributes are derivable from this grain (same attrs,
        or coarser ones reachable through its dimensions) are answered
        from the summary instead of the fact — the classic OLAP
        aggregate-table optimization Spark has no automatic rewrite for.
        At 100 TB a dashboard's repeated month/region queries then read
        |summary| rows, not 10^11 fact rows.

        Only exact-regrain measures qualify (sum/min/max, count-as-sum);
        a cube with mean or UDAF measures registers nothing and
        :meth:`aggregate` silently keeps reading the fact. Summaries are
        deliberately NOT inherited by derived cubes — any dice/collapse
        changes the row population and would make them stale."""
        if not self._summaries_exact():
            return self
        out = self.aggregate(attrs)
        if persist:
            out = out.persist()
        # flat cube: every summary column is its own degenerate dimension,
        # so the full attr combination stays in the grain (a capply-style
        # regrained dim would key multi-attr dims by the lead attr and
        # break the key-determines-attrs contract, e.g. month is not a
        # function of year)
        names = [a.split(".")[-1] for a in attrs]
        dims = {n: Dimension(n, n, out.select(n).dropDuplicates()) for n in names}
        sc = DataCube(Fact(out, names, dict(self.measures)), dims, strict=False)
        self._summaries.append((len(names), frozenset(names), sc))
        self._summaries.sort(key=lambda t: t[0])
        return self

    def _navigate(self, attrs: Sequence[str]) -> "tuple[DataCube, list[str]] | None":
        """Smallest registered summary that can answer ``attrs``: resolve
        against the base cube's routing, then require every grouping
        column to be part of the summary grain."""
        try:
            routed = self.resolve_attrs(attrs)
        except (KeyError, ValueError):
            return None
        flat = [f for fields in routed.values() for f in fields]
        for _, names, sc in self._summaries:
            if set(flat) <= names:
                return sc, flat
        return None

    def aggregate(self, attrs: Sequence[str], fun: str | Callable | None = None) -> DataFrame:
        """Aggregate measures by arbitrary attributes from any hierarchy
        level of any dimension (reference capply/aggregate.cube,
        R/cube.R:340-345 + extract R/cube.R:158-228). Returns a DataFrame
        grouped by the attrs; one broadcast star join + one shuffle.

        Scale rewrite: when a dimension's own key is among the group attrs,
        its other attrs are functionally dependent on it — so the fact
        groups by the (already-present) key and the attr join runs on the
        post-aggregation output instead of on every fact row. At 100 TB
        that is the difference between widening 10^11 rows and widening
        the aggregate."""
        if fun is None and self._summaries:
            hit = self._navigate(attrs)
            if hit is not None:
                sc, flat = hit
                return sc.aggregate(flat)
        routed = self.resolve_attrs(attrs)
        df = self.fact.df
        group_cols: list[str] = []
        out_cols: list[str] = []
        deferred: list[tuple[Dimension, list[str]]] = []
        for dname, fields in routed.items():
            out_cols.extend(fields)
            if dname == "":
                group_cols.extend(fields)
                continue
            dim = self.dims[dname]
            fields_nokey = [f for f in fields if f != dim.key]
            if dim.key in fields:
                group_cols.append(dim.key)
                if fields_nokey:
                    deferred.append((dim, fields_nokey))
            elif fields_nokey:
                df = df.join(dim._hint(dim.attr_table(fields_nokey)), dim.key)
                group_cols.extend(fields_nokey)
        out = df.groupBy(*group_cols).agg(*measure_exprs(self.measures, agg_override=fun))
        for dim, fields_nokey in deferred:
            out = out.join(dim._hint(dim.attr_table(fields_nokey)), dim.key, "left")
        return out.select(*out_cols, *self.fact.measure_names)

    def capply(self, attrs: Sequence[str], fun: str | Callable | None = None) -> "DataCube":
        """Like :meth:`aggregate` but returns a cube whose dimensions are
        rolled up to the attribute grain (reference R/cube.R:210-217)."""
        routed = self.resolve_attrs(attrs)
        out = self.aggregate(attrs, fun)
        new_dims: dict[str, Dimension] = {}
        id_vars: list[str] = []
        for dname, fields in routed.items():
            if dname == "":
                id_vars.extend(fields)
                for f in fields:
                    new_dims[f] = Dimension(f, f, out.select(f).dropDuplicates())
                continue
            dim = self.dims[dname]
            lead = fields[0]
            id_vars.append(lead)
            regrained = dim.attr_table(fields) if fields != [dim.key] else dim.base
            regrained = regrained.select(*fields).dropDuplicates()
            new_dims[dname] = Dimension(dname, lead, regrained)
        measures = {
            n: (m.with_agg(fun) if fun is not None else m) for n, m in self.measures.items()
        }
        return DataCube(Fact(out, id_vars, measures), new_dims, strict=False)

    def extract(
        self,
        i: Mapping[str, Any] | None = None,
        j: Mapping[str, Column] | None = None,
        by: Sequence[str] | None = None,
    ) -> DataFrame:
        """Reference ``[[.cube`` (A4, R/cube.R:279-282 + extract
        R/cube.R:158-228): dice via ``i`` selectors, aggregate arbitrary
        ``j`` expressions (any pyspark Column aggregate, aliased by key)
        grouped ``by`` hierarchy attributes.

        ``j=None`` aggregates the cube's own measures. ``by=[]`` yields a
        single global row. The ``j`` expressions see the *fact-grain*
        columns (measures at the cube's declared grain) plus the joined
        attribute columns — same contract as the reference, where ``j``
        runs over the filtered, attribute-attached fact."""
        base = self.q(**i) if i else self
        df, out_attrs = base.joined(list(by or []))
        if j:
            aggs = [expr.alias(name) for name, expr in j.items()]
        else:
            aggs = measure_exprs(base.measures)
        if out_attrs:
            return df.groupBy(*out_attrs).agg(*aggs)
        return df.agg(*aggs)

    # -- base-R apply semantics (A5, R/data.cube.R:473-505) ------------------
    def apply(self, margin: Sequence[str], fun: str | Callable | None = None) -> "DataCube":
        """Keep MARGIN dimensions, collapse the rest; optional ``fun``
        replaces every measure's aggregate. ``margin=[]`` = grand total."""
        margin = list(margin)
        unknown = set(margin) - set(self.dims)
        if unknown:
            raise KeyError(f"unknown dimensions {sorted(unknown)}")
        keep_keys = [self.dims[n].key for n in self.dims if n in margin]
        fact = self.fact.reaggregate(keep_keys, agg_override=fun)
        if fun is not None:
            fact = Fact(fact.df, fact.id_vars, {n: m.with_agg(fun) for n, m in self.measures.items()})
        return DataCube(fact, {n: d for n, d in self.dims.items() if n in margin},
                        strict=False)

    def grand_total(self, fun: str | Callable | None = None) -> DataFrame:
        """All dims collapsed -> 1-row frame (reference A6)."""
        return self.apply([], fun).fact.df

    # -- export conveniences (full implementations in export.py) ------------
    def denormalize(self, dims: Sequence[str] | None = None, na_fill: bool = False) -> DataFrame:
        from data_cube_spark.export import denormalize
        return denormalize(self, dims=dims, na_fill=na_fill)

    def schema_info(self, *, counts: bool = False) -> dict:
        from data_cube_spark.export import schema_info
        return schema_info(self, counts=counts)

    def create_views(self, prefix: str = "cube") -> list[str]:
        """Expose the cube to ``spark.sql``: registers temp views for the
        fact at grain (``{prefix}_fact``), each denormalized dimension
        (``{prefix}_dim_{name}``), and the fully denormalized star
        (``{prefix}_wide``). The views are lazy plans — the star view costs
        nothing until queried, and Catalyst prunes unused dimension joins
        from queries that don't touch their columns."""
        from data_cube_spark.export import denormalize

        names = []
        self.fact.df.createOrReplaceTempView(f"{prefix}_fact")
        names.append(f"{prefix}_fact")
        for n, d in self.dims.items():
            d.denormalized().createOrReplaceTempView(f"{prefix}_dim_{n}")
            names.append(f"{prefix}_dim_{n}")
        denormalize(self).createOrReplaceTempView(f"{prefix}_wide")
        names.append(f"{prefix}_wide")
        return names

    def merge_delta(self, delta: DataFrame) -> "DataCube":
        """Incremental cube maintenance from raw delta rows: aggregate the
        delta to the fact grain, merge partials (:meth:`Fact.merge`), and
        extend each dimension's base with any new keys appearing in the
        delta. Metamorphic contract: ``cube(a ∪ b) == cube(a).merge_delta(b)``
        for decomposable measures."""
        delta_fact = Fact.build(delta, self.fact.id_vars, self.fact.measures)
        fact = self.fact.merge(delta_fact)
        dims: dict[str, Dimension] = {}
        for name, d in self.dims.items():
            cols = d.base.columns
            if all(c in delta.columns for c in cols):
                new_base = d.base.unionByName(
                    delta.select(*cols)).dropDuplicates([d.key])
                dims[name] = Dimension(name, d.key, new_base, None,
                                       d.hierarchies, unique=True)
            else:
                dims[name] = d
        return DataCube(fact, dims, strict=False)

    def remove_delta(self, delta: DataFrame) -> "DataCube":
        """Retraction — the inverse of :meth:`merge_delta`: subtract raw
        ``delta`` rows from the cube. Metamorphic contract:
        ``cube(a ∪ b).remove_delta(b) == cube(a)``.

        Exact only for subtractable aggregates — every measure must
        re-aggregate as ``sum`` (sum, or count whose partials subtract as
        counts); min/max/distinct/arbitrary callables cannot be retracted
        from partials (the retracted rows may have carried the extremum)
        and raise. The cube must also carry at least one ``count``
        measure: a grain whose count reaches zero has ALL its rows
        retracted and is dropped — without a count the emptied grain is
        indistinguishable from a legitimate zero-sum one.

        Same cost shape as merge: aggregate the (small) delta to the fact
        grain, union its negated partials, one re-aggregation shuffle.
        Dimension bases are left as-is (a retired key lingering in a
        dimension table is harmless — it simply matches no fact rows)."""
        counts = [n for n, m in self.fact.measures.items() if m.agg == "count"]
        if not counts:
            raise ValueError(
                "remove_delta needs a count measure to detect fully "
                "retracted grains; add Measure(..., agg='count')")
        bad = [n for n, m in self.fact.measures.items()
               if callable(m.reagg) or m.reagg != "sum"]
        if bad:
            raise ValueError(
                f"measures {bad} are not subtractable (reagg != 'sum'); "
                "retraction from partials is only exact for sum/count")
        delta_fact = Fact.build(delta, self.fact.id_vars, self.fact.measures)
        neg = delta_fact.df.select(
            *self.fact.id_vars,
            *[(-F.col(n)).alias(n) for n in self.fact.measures],
        )
        u = self.fact.df.unionByName(neg)
        df = (
            u.groupBy(*self.fact.id_vars)
            .agg(*[m.reagg_expr() for m in self.fact.measures.values()])
            .where(F.col(counts[0]) > 0)
        )
        fact = Fact(df, self.fact.id_vars, self.fact.measures)
        return DataCube(fact, dict(self.dims), strict=False)

    def persist(self) -> "DataCube":
        """Pin the cube's tables in memory — the honest Spark analog of the
        reference's secondary indices (R/fact.R:103-105, README roadmap)."""
        self.fact.df.persist()
        for d in self.dims.values():
            d.base.persist()
        return self

    def __repr__(self) -> str:
        return (
            f"DataCube(fact={self.fact.id_vars}, measures={list(self.measures)}, "
            f"dims={list(self.dims)})"
        )
