"""Time-series regularization: calendar densification (gap filling).

Event tables record what HAPPENED; dashboards, anomaly baselines and
training-label joins need a row for every period, including the silent
ones. The reference engine has no analog (its time dimension only covers
observed keys); this is the standard Spark treatment.

Scale shape: the calendar is generated per key from that key's own
[first, last] span via ``sequence`` + ``explode`` — one row per (key,
period), never a cross join of keys × global calendar (a tenant active
for a week costs 7 rows even if the table spans a decade). One shuffle
for the per-key span, one for the daily aggregate, one left join keyed
(key, day) — all hash-partitioned on the key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_daily(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    aggs: dict[str, Column],
    fill: dict[str, object] | None = None,
    ffill_cols: list[str] | None = None,
) -> DataFrame:
    """One row per (keys, day) for every day in each key's observed
    [min, max] span. ``aggs`` are the per-day aggregates (name ->
    aggregate Column over that day's rows); days with no rows get
    ``fill[name]`` (default: left NULL); columns listed in
    ``ffill_cols`` instead carry the last observed value forward
    (piecewise-constant fill via a bounded window per key).

    Output columns: ``*keys, day, *aggs``.
    """
    day = F.to_date(F.col(ts_col))
    daily = df.groupBy(*keys, day.alias("day")).agg(
        *[c.alias(n) for n, c in aggs.items()]
    )
    span = df.groupBy(*keys).agg(
        F.min(day).alias("_d0"), F.max(day).alias("_d1")
    )
    cal = span.select(
        *keys,
        F.explode(
            F.sequence(F.col("_d0"), F.col("_d1"), F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    out = cal.join(daily, [*keys, "day"], "left")
    fill = dict(fill or {})
    ffill_cols = list(ffill_cols or [])
    for n in aggs:
        if n in ffill_cols:
            w = (
                Window.partitionBy(*keys)
                .orderBy(F.col("day").asc())
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            out = out.withColumn(n, F.last(F.col(n), ignorenulls=True).over(w))
        elif n in fill:
            out = out.withColumn(n, F.coalesce(F.col(n), F.lit(fill[n])))
    return out


def rolling_zscore(
    df: DataFrame,
    value_col: str,
    keys: list[str],
    order_col: str,
    window_size: int = 7,
    min_periods: int = 3,
) -> DataFrame:
    """Trailing-window anomaly score: for each row, the z-score of
    ``value_col`` against the mean/std of the PRECEDING ``window_size``
    rows in ``order_col`` order within each key (the current row is
    excluded — a spike must not mask itself). Rows with fewer than
    ``min_periods`` trailing observations or zero variance score NULL.

    Cross-engine determinism: the window sums of v and v² run as exact
    decimals; mean/variance/z are then a FIXED sequence of double ops
    (one division, one multiply-subtract, one sqrt-divide), identical
    IEEE arithmetic on any engine — asserted by the
    `events_anomaly_zscore` oracle. One shuffle on the key; the frame is
    row-bounded so state per key is ``window_size`` rows.

    Output: input columns + ``trail_mean``, ``trail_std``, ``zscore``.
    """
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(-window_size, -1)
    )
    # decimal(18,6): v*v stays within the 38-digit cap of every engine
    v = F.col(value_col).cast("decimal(18,6)")
    s1 = F.sum(v).over(w)
    s2 = F.sum(v * v).over(w)
    n = F.count(F.lit(1)).over(w)
    mean = s1.cast("double") / n
    var = s2.cast("double") / n - mean * mean
    std = F.sqrt(var)
    z = F.when(
        (n >= int(min_periods)) & (var > 0),
        (F.col(value_col) - mean) / std,
    )
    return df.select(
        "*",
        F.when(n >= int(min_periods), mean).alias("trail_mean"),
        F.when((n >= int(min_periods)) & (var > 0), std).alias("trail_std"),
        z.alias("zscore"),
    )
