"""Stream-stream event-time joins.

The reference engine is batch-only (SURVEY.md §2.8); this is the
Structured Streaming treatment of the classic attribution shape: pair
each left event with right events for the same key arriving within a
bounded interval after it. Spark's stateful stream-stream join keeps
both sides' state ONLY for the watermark + interval horizon — the time
bound in the join condition is what lets the state store evict, so an
unbounded-history join is structurally impossible to express here (by
design: at 100 TB/day, unbounded join state is an outage, not a
feature).

The identical expressions run on batch DataFrames (Spark's unified
API); the batch twin is what the DuckDB oracle checks, and the
streaming tests assert stream == batch — the same correctness argument
as the rest of the streaming module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_cube_spark.streaming.cube_stream import _ltz


def interval_attribution_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    within: str = "30 minutes",
    watermark: str = "2 hours",
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
) -> DataFrame:
    """Pairs (left, right) with the same ``key`` where ``right_ts`` lands
    in ``[left_ts, left_ts + within]`` — e.g. purchases attributed to the
    views they followed.

    Works unchanged on batch and streaming inputs. On streams, BOTH
    sides carry a watermark and the join condition carries the time
    bound, which is exactly what Spark's state cleanup requires: left
    rows are held only until ``watermark + within`` passes, right rows
    until ``watermark`` — bounded state, no unbounded buffering. On
    batch the same plan is a plain hash join on the key with the range
    residual.

    Output columns: ``key``, left's ``left_cols`` (default: all
    non-key/ts), ``left_ts``, right's ``right_cols``, ``right_ts``.
    Right-side names clashing with left's are prefixed ``r_``.
    """
    streaming = left.isStreaming or right.isStreaming
    l = _ltz(left, left_ts)
    r = _ltz(right, right_ts)
    if streaming:
        l = l.withWatermark(left_ts, watermark)
        r = r.withWatermark(right_ts, watermark)

    left_cols = (
        [c for c in l.columns if c not in (key, left_ts)]
        if left_cols is None else list(left_cols)
    )
    right_cols = (
        [c for c in r.columns if c not in (key, right_ts)]
        if right_cols is None else list(right_cols)
    )
    taken = {key, left_ts, *left_cols}
    # the ts column itself gets the clash prefix too — both sides naming
    # their timestamp 'ts' (the natural event-table case) must not emit
    # two identically named columns (AMBIGUOUS_REFERENCE downstream)
    out_right_ts = f"r_{right_ts}" if right_ts in taken else right_ts
    r_sel = [F.col(key).alias("_rk"),
             F.col(right_ts).alias(out_right_ts)] + [
        F.col(c).alias(f"r_{c}" if c in taken or c == right_ts else c)
        for c in right_cols
    ]
    r2 = r.select(*r_sel)
    cond = (
        (l[key] == r2["_rk"])
        & (r2[out_right_ts] >= l[left_ts])
        & (r2[out_right_ts] <= l[left_ts] + F.expr(f"INTERVAL {within}"))
    )
    out = l.select(key, left_ts, *left_cols).join(r2, cond, "inner")
    return out.drop("_rk")
