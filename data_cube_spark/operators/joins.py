"""Temporal join operators Spark lacks as built-ins: as-of join and
range (interval) join.

Both are implemented as *equi-join-shaped* plans — the naive formulations
(theta joins on inequalities) degrade to broadcast-nested-loop at scale,
which is exactly what a 100 TB event table cannot afford.

- :func:`asof_join` is join-free: union both sides, one window pass
  partitioned by the key — the classic piecewise-constant fill. One shuffle
  on the key, no join explosion, no skew beyond the key's own.
- :func:`range_join` bins time into fixed buckets and equi-joins on the
  bucket, then post-filters the exact range predicate. The right side
  explodes into one row per covered bucket — bounded by interval/bin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_cube_spark.functions import epoch_seconds


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str],
    value_cols: list[str],
    direction: str = "backward",
    allow_exact: bool = True,
) -> DataFrame:
    """For each left row, attach ``value_cols`` from the most recent right
    row with ``right.on <= left.on`` (backward; ``forward`` mirrors it),
    matched within ``by`` groups.

    Join-free implementation: tag + union + ``last(..., ignorenulls)`` over
    a window ordered by (time, side). Equal timestamps: the right row wins
    when ``allow_exact`` (sorted before the left row), else after.
    """
    by = [by] if isinstance(by, str) else list(by)
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(f"value_cols {sorted(clash)} already exist in left")
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    l = left.withColumn("_src", F.lit(1))
    r = right.select(*by, on, *value_cols).withColumn("_src", F.lit(0))
    u = l.unionByName(r, allowMissingColumns=True)

    right_first = allow_exact
    src_order = F.col("_src").asc() if right_first else F.col("_src").desc()
    if direction == "backward":
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).asc(), src_order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        pick = F.last
    else:
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).asc(), F.col("_src").desc() if right_first else F.col("_src").asc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
        pick = F.first

    filled = u.select(
        "*",
        *[
            pick(F.when(F.col("_src") == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"_f_{c}")
            for c in value_cols
        ],
    )
    out = filled.where(F.col("_src") == 1).select(
        *[c for c in left.columns],
        *[F.col(f"_f_{c}").alias(c) for c in value_cols],
    )
    return out


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    salt: int = 16,
    how: str = "inner",
    salt_col: str = "_salt",
) -> DataFrame:
    """Skew-safe equi-join: the (large, skewed) left side gets a
    deterministic salt in ``[0, salt)``; the (smaller) right side explodes
    ×``salt`` so every salted partition finds its match. One hot key's rows
    spread over ``salt`` reducers instead of one straggler.

    AQE's skew-join split handles most skew automatically; explicit salting
    is for the cases AQE can't re-plan (e.g. a skewed *aggregation* feeding
    the join, or deterministic layout requirements). The salt is derived
    from the whole left row's partition via ``spark_partition_id + a cheap
    per-row counter`` — deterministic under a fixed input layout, uniform
    regardless of key skew.

    Only ``inner``/``left`` joins are valid: the right side is replicated
    ×``salt``, so right/full-outer would emit duplicated unmatched right
    rows."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_join supports inner/left joins, not {how!r}")
    on = [on] if isinstance(on, str) else list(on)
    l = left.withColumn(
        salt_col,
        F.pmod(F.xxhash64(F.spark_partition_id(), F.monotonically_increasing_id()),
               F.lit(salt)).cast("int"),
    )
    r = right.withColumn(salt_col, F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    return l.join(r, [*on, salt_col], how).drop(salt_col)


def skew_aware_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    top_n: int = 50,
    min_share: float = 0.001,
    salt: int = 16,
    how: str = "inner",
    salt_col: str = "_salt",
) -> DataFrame:
    """Profile-driven PARTIAL salting: only measured hot keys are salted;
    everything else joins unsalted.

    :func:`salted_join` replicates the ENTIRE right side ×``salt`` — the
    right call when most keys are hot, but the usual 100 TB shape is a
    handful of hot keys over an otherwise uniform distribution, where
    whole-side replication multiplies shuffle volume ``salt``-fold for no
    benefit on the cold 99.9%. This variant runs
    :func:`..stats.key_skew_profile` on the left key first (one
    map-combined count + top-k; output bounded by ``top_n``), keeps keys
    with share >= ``min_share``, and:

    - LEFT: hot rows get a deterministic salt in ``[0, salt)``; cold rows
      keep salt 0 — the hot key's rows spread over ``salt`` reducers.
    - RIGHT: hot keys explode ×``salt``; cold keys stay single — extra
      rows <= ``top_n × salt``, independent of table size.

    The hot set is collected to the driver (bounded by ``top_n``) and
    compiled into an ``isin`` literal predicate, so membership is a
    codegen'd comparison, not another join. Join semantics are exactly the
    plain join's; only inner/left are valid (right rows are conditionally
    replicated, as in :func:`salted_join`).
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"skew_aware_join supports inner/left joins, not {how!r}")
    from data_cube_spark.operators.stats import key_skew_profile

    on = [on] if isinstance(on, str) else list(on)
    prof = key_skew_profile(left, on, top_n=int(top_n))
    hot = [tuple(row) for row in
           prof.where(F.col("share") >= float(min_share)).select(*on).collect()]
    if not hot:
        return left.join(right, on, how)
    if len(on) == 1:
        is_hot = F.col(on[0]).isin([t[0] for t in hot])
    else:
        # composite key: OR of per-tuple conjunctions — bounded by top_n
        # literals, stays a codegen'd predicate (no extra join)
        def _tuple_pred(t):
            p = F.col(on[0]).eqNullSafe(F.lit(t[0]))
            for c, v in zip(on[1:], t[1:]):
                p = p & F.col(c).eqNullSafe(F.lit(v))
            return p

        is_hot = _tuple_pred(hot[0])
        for t in hot[1:]:
            is_hot = is_hot | _tuple_pred(t)
    l = left.withColumn(
        salt_col,
        F.when(
            is_hot,
            F.pmod(
                F.xxhash64(F.spark_partition_id(), F.monotonically_increasing_id()),
                F.lit(int(salt)),
            ).cast("int"),
        ).otherwise(F.lit(0)),
    )
    r = right.withColumn(
        salt_col,
        F.explode(
            F.when(is_hot, F.array(*[F.lit(i) for i in range(int(salt))]))
            .otherwise(F.array(F.lit(0)))
        ),
    )
    return l.join(r, [*on, salt_col], how).drop(salt_col)


def range_join(
    left: DataFrame,
    right: DataFrame,
    ts: str,
    start: str,
    end: str,
    bin_seconds: int,
    by: str | list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Interval join: left rows whose ``ts`` falls in ``[right.start,
    right.end]`` (inclusive), optionally also matching equi-keys ``by``.

    The right side explodes to one row per ``bin_seconds`` bucket its
    interval covers; both sides equi-join on (bucket, *by) with the exact
    range predicate folded INTO the join condition (not a post-join WHERE,
    which would silently drop outer-join null-extended rows). Pick
    ``bin_seconds`` near the typical interval length: the explosion factor
    is ~interval/bin and the join stays a shuffled hash join on a
    well-distributed key (never nested-loop).

    ``how``: ``inner`` or ``left`` only. Each left row carries exactly ONE
    bin, so a left-outer join emits one null-extended row per unmatched
    left row — correct outer semantics. The right side is replicated across
    bins, so right/full outer would duplicate unmatched right rows; those
    are rejected."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"range_join supports inner/left joins, not {how!r}")
    by = [by] if isinstance(by, str) else list(by or [])
    lb = F.floor(epoch_seconds(ts) / bin_seconds).cast("long")
    sb = F.floor(epoch_seconds(start) / bin_seconds).cast("long")
    eb = F.floor(epoch_seconds(end) / bin_seconds).cast("long")
    l = left.withColumn("_bin", lb)
    r = right.withColumn("_bin", F.explode(F.sequence(sb, eb)))
    for c in by:
        r = r.withColumnRenamed(c, f"_r_{c}")
    cond = l["_bin"] == r["_bin"]
    for c in by:
        cond = cond & (l[c] == r[f"_r_{c}"])
    cond = cond & (l[ts] >= r[start]) & (l[ts] <= r[end])
    joined = l.join(r, cond, how)
    return joined.drop("_bin").drop(*[f"_r_{c}" for c in by])


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_seconds: int,
    by: str | list[str] | None = None,
) -> DataFrame:
    """Interval-x-interval overlap join: pairs where
    ``[left_start, left_end]`` and ``[right_start, right_end]`` intersect
    (inclusive), optionally within equi-keys ``by``.

    Generalizes :func:`range_join`: BOTH sides explode to one row per
    covered ``bin_seconds`` bucket and equi-join on (bucket, *by); a pair
    overlapping k shared buckets would emit k rows, so the bucket-equality
    condition keeps only the FIRST shared bucket (max of the two start
    bins) — exactly-once semantics without a distinct. The exact overlap
    predicate is folded into the join condition; the plan stays a shuffled
    hash join on well-distributed keys, never a nested loop."""
    by = [by] if isinstance(by, str) else list(by or [])
    def bins(start, end):
        sb = F.floor(epoch_seconds(start) / bin_seconds).cast("long")
        eb = F.floor(epoch_seconds(end) / bin_seconds).cast("long")
        return F.explode(F.sequence(sb, eb))
    l = left.withColumn("_bin", bins(left_start, left_end)).withColumn(
        "_lsb", F.floor(epoch_seconds(left_start) / bin_seconds).cast("long"))
    r = right.withColumn("_bin", bins(right_start, right_end)).withColumn(
        "_rsb", F.floor(epoch_seconds(right_start) / bin_seconds).cast("long"))
    for c in by:
        r = r.withColumnRenamed(c, f"_r_{c}")
    cond = l["_bin"] == r["_bin"]
    # dedup: keep the pair only in the LATER of the two start bins (the
    # first bucket both intervals cover)
    cond = cond & (l["_bin"] == F.greatest(l["_lsb"], r["_rsb"]))
    for c in by:
        cond = cond & (l[c] == r[f"_r_{c}"])
    cond = cond & (l[left_start] <= r[right_end]) & (r[right_start] <= l[left_end])
    out = l.join(r, cond, "inner")
    return out.drop("_bin", "_lsb", "_rsb").drop(*[f"_r_{c}" for c in by])
