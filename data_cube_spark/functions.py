"""Scalar function layer (reference SURVEY.md §2.7) + helpers.

- calendar/date parts (reference R/populate.R:30-37, inst/cubes/cranlogs.R:62-64)
- currency formatting (reference R/measure.R:51-55)
- surrogate keys (reference ``add.surrogate.key`` R/populate.R:1-7, ``.GRP``)
- decimal-exact money aggregation helpers (sums independent of shuffle order)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# -- date parts -------------------------------------------------------------

def date_parts(col: str | Column, prefix: str = "d_") -> dict[str, Column]:
    """Full date-part breakdown used to build calendar dimensions:
    weekday/week/month/quarter/year + label columns, mirroring the
    reference's time dimension (R/populate.R:27-38)."""
    c = F.col(col) if isinstance(col, str) else col
    d = F.to_date(c)
    q = F.quarter(d)
    return {
        f"{prefix}date": d,
        f"{prefix}weekday": F.date_format(d, "EEEE"),
        f"{prefix}week": F.weekofyear(d).cast("int"),
        f"{prefix}month": F.month(d).cast("int"),
        f"{prefix}month_name": F.date_format(d, "MMMM"),
        f"{prefix}quarter": q.cast("int"),
        f"{prefix}quarter_name": F.concat(F.lit("Q"), q.cast("string")),
        f"{prefix}year": F.year(d).cast("int"),
    }


def calendar_table(df: DataFrame, date_col: str, prefix: str = "d_") -> DataFrame:
    """Distinct calendar dimension derived from a date/timestamp column —
    the driver-data analog of the reference's populated time dimension."""
    # dedup the bare date FIRST, then derive the parts over the distinct
    # dates: the dedup shuffle carries one date column instead of the full
    # part breakdown, and needs no first() aggregates (every part is a
    # deterministic function of the date — same rows either way).
    date_key = date_parts(date_col, prefix)[f"{prefix}date"].alias(f"{prefix}date")
    out = df.select(date_key).dropDuplicates()
    parts = date_parts(f"{prefix}date", prefix)
    return out.select(*[expr.alias(name) for name, expr in parts.items()])


# -- formatting -------------------------------------------------------------

def currency_format(col: str | Column, symbol: str = "$", digits: int = 2) -> Column:
    """Reference ``currency.format`` (R/measure.R:51-55): thousands
    separator + symbol, built-in ``format_number`` (JVM-side, no UDF)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(F.lit(symbol), F.format_number(c, digits))


# -- surrogate keys ---------------------------------------------------------

def add_surrogate_key(df: DataFrame, cols: list[str], key_name: str) -> DataFrame:
    """Dense integer surrogate key per distinct combination of ``cols``
    (reference ``.GRP`` / add.surrogate.key, R/populate.R:1-7), equivalent
    to ``dense_rank() OVER (ORDER BY cols)``.

    Two-stage distributed ranking — no single-reducer global window (the
    r1 scale flaw): (1) distinct key combos are range-partitioned on the
    sort columns (global order holds *across* partitions), ranked per
    partition by a partition-local window; (2) per-partition combo counts
    (one tiny row per partition) are collected and turned into additive
    offsets, so ``key = offset[partition] + local_rank``. The only
    driver-side data is the per-partition count list. For key assignment
    where density/order doesn't matter, :func:`add_hash_key` is O(1)/row
    with no sort at all."""
    distinct = df.select(*cols).dropDuplicates()
    parts = (
        distinct.repartitionByRange(*cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    w = Window.partitionBy("_pid").orderBy(*cols)
    # eager localCheckpoint instead of persist(): the ranked combos are
    # read twice (count collect + key join) and a CacheManager entry
    # would outlive the call — checkpoint blocks are GC-cleaned with the
    # frame, so long-lived sessions don't accumulate cached partitions
    ranked = parts.withColumn("_lrank", F.row_number().over(w)).localCheckpoint()
    sizes = sorted(
        (r["_pid"], r["_n"])
        for r in ranked.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n")).collect()
    )
    offsets, acc = {}, 0
    for pid, n in sizes:
        offsets[pid] = acc
        acc += n
    off = F.element_at(
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]),
        F.col("_pid"),
    ) if offsets else F.lit(0)
    keyed = ranked.select(
        *cols, (off + F.col("_lrank")).cast("bigint").alias(key_name)
    )
    return df.join(keyed, cols, "left").select(*df.columns, key_name)


#: Pre-checkpoint physical plan of the most recent add_dense_positions
#: call (plan-test observability; the checkpoint hides it otherwise).
LAST_DENSE_POSITIONS_PLAN: str = ""


def add_dense_positions(
    df: DataFrame, order_cols: list[str], pos_col: str
) -> DataFrame:
    """Dense global positions 1..N ordered by ``order_cols``, for inputs
    UNIQUE on those columns (e.g. a collision-free shuffle draw).

    Leaner than :func:`add_surrogate_key` (which must dedupe combos and
    join the keys back): range-partition on the sort columns (global order
    holds across partitions), sort within partitions, read off the
    per-partition row index from ``monotonically_increasing_id``, and add
    collected per-partition (count, min-id) offsets. ONE shuffle (the
    range exchange), no distinct, no join-back, no single-reducer window.
    Driver-side data is two longs per partition."""
    # eager localCheckpoint, not persist(): read twice (stats collect +
    # the returned plan) and pins the _mid assignment against any
    # recompute; checkpoint blocks are dropped when the frame is GC'd,
    # where a persist() entry would leak in a long-lived session
    pre = (
        df.repartitionByRange(*order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_mid", F.monotonically_increasing_id())
    )
    # the checkpoint truncates lineage, so the range exchange this
    # operator promises (its ONE shuffle) disappears from the returned
    # frame's plan — record it here for the plan-regression tests
    global LAST_DENSE_POSITIONS_PLAN
    from data_cube_spark.plans import explain_str

    LAST_DENSE_POSITIONS_PLAN = explain_str(pre, "simple")
    parts = pre.localCheckpoint()
    stats = sorted(
        (r["_pid"], r["_n"], r["_min"])
        for r in parts.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_n"), F.min("_mid").alias("_min"))
        .collect()
    )
    # offset[pid] = rows in all earlier partitions; local index = _mid - min
    # (ids are assigned sequentially within a partition — min subtraction
    # avoids relying on the 33-bit layout)
    entries, acc = [], 0
    for pid, n, mn in stats:
        entries += [F.lit(pid), F.struct(F.lit(acc).alias("off"),
                                         F.lit(mn).alias("mn"))]
        acc += n
    m = F.element_at(F.create_map(*entries), F.col("_pid")) if entries else None
    if m is None:
        return df.withColumn(pos_col, F.lit(None).cast("bigint"))
    pos = (m["off"] + (F.col("_mid") - m["mn"]) + 1).cast("bigint")
    return parts.withColumn(pos_col, pos).drop("_pid", "_mid")


def add_hash_key(df: DataFrame, cols: list[str], key_name: str) -> DataFrame:
    """Distributed surrogate key: 64-bit hash of the natural key. O(1) per
    row, no global sort — the scale path for surrogate keys."""
    return df.withColumn(key_name, F.xxhash64(*cols))


# -- decimal-exact money math ----------------------------------------------

def dec(col: str | Column, precision: int = 18, scale: int = 2) -> Column:
    """Cast to decimal so sums are exact and independent of partitioning /
    shuffle order (double-precision sums differ run-to-run at the ulp level
    on a cluster; decimal aggregation is associative-exact)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def money_sum(col: str | Column, alias: str) -> Column:
    """Order-independent money sum, surfaced as double."""
    return F.sum(dec(col)).cast("double").alias(alias)


def as_double(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("double")


def epoch_seconds(col: str | Column) -> Column:
    """Epoch seconds for any timestamp flavor. Parquet files written with
    ``isAdjustedToUTC=false`` read back as TIMESTAMP_NTZ, which Spark 4
    refuses to cast straight to DOUBLE; routing through timestamp_ltz is a
    no-op for regular timestamps and interprets NTZ wall-clock in the
    session timezone (pinned to UTC in session.py), matching DuckDB's
    ``epoch()`` on naive timestamps."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp_ltz").cast("double")


# -- top-k per group --------------------------------------------------------

def topk_per_group(
    df: DataFrame, group: list[str], order: list[Column], k: int, rank_col: str = "rank"
) -> DataFrame:
    """Top-k rows per group via window ``row_number`` (reference cranlogs
    top-3 pattern, inst/cubes/cranlogs.R:17). Single shuffle on the group
    keys; at scale Spark applies partial top-k (TakeOrderedAndProject per
    partition) before the exchange when k is small."""
    w = Window.partitionBy(*group).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )
