"""Event-sequence analytics: ordered funnels and cohort retention.

Greenfield (no reference analog): the two workhorse product-analytics
queries over an event stream, expressed as plain aggregates and
user-grain joins so every result is engine-exact (no session state, no
approximation) and every shuffle is on the user key.

Scale: each funnel step and the retention pass shuffle on ``user_col``
only — the natural high-cardinality, well-distributed key. Step joins are
user-grain x user's-events (sort-merge; AQE handles skewed power users).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user ordered-funnel timestamps: ``t_i`` is the user's first
    ``steps[i]`` event occurring strictly AFTER their ``t_{i-1}`` — the
    sequential-conversion definition (a purchase before the signup does
    not count).

    Single-shuffle formulation: every ``t_i`` is a conditional ``min``
    window over the SAME ``partitionBy(user_col)`` — chained window
    expressions over one partitioning plan ONE Exchange (stacked Window
    operators share the sort), and the closing user-grain group-by reuses
    that partitioning, so k steps cost one shuffle total instead of the
    naive k join+aggregate rounds. Returns one row per user who completed
    step 1, with nullable ``t_1..t_k``."""
    from pyspark.sql import Window

    if not steps:
        raise ValueError("steps must be non-empty")
    # same literal values in the pre-filter and the per-step window
    # conditions — a str() coercion here could disagree with the == below
    # for non-string step types and silently drop rows from the t_i mins
    ev = df.select(user_col, type_col, ts_col).where(
        F.col(type_col).isin(list(steps))
    )
    w = Window.partitionBy(user_col)
    out = ev.withColumn(
        "t_1", F.min(F.when(F.col(type_col) == steps[0], F.col(ts_col))).over(w)
    )
    for i, step in enumerate(steps[1:], start=2):
        out = out.withColumn(
            f"t_{i}",
            F.min(
                F.when(
                    (F.col(type_col) == step)
                    & (F.col(ts_col) > F.col(f"t_{i-1}")),
                    F.col(ts_col),
                )
            ).over(w),
        )
    tcols = [f"t_{i}" for i in range(1, len(steps) + 1)]
    return (
        out.where(F.col("t_1").isNotNull())
        .groupBy(user_col)
        .agg(*[F.first(c).alias(c) for c in tcols])
    )


def funnel_conversion(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Funnel conversion counts: one row per step with the number of users
    who reached it in order (monotonically non-increasing) and the
    conversion rate vs step 1."""
    per_user = funnel_steps(df, steps, user_col, ts_col, type_col)
    counts = per_user.agg(
        *[
            F.count(F.col(f"t_{i}")).alias(f"_n{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    # one row per step via inline(array<struct>) — a single pass over the
    # 1-row counts frame instead of a k-way union
    return counts.select(
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("int").alias("step_index"),
                        F.lit(step).alias("step"),
                        F.col(f"_n{i}").cast("bigint").alias("n_users"),
                        (F.col(f"_n{i}") / F.col("_n1"))
                        .cast("double")
                        .alias("conversion"),
                    )
                    for i, step in enumerate(steps, start=1)
                ]
            )
        )
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Daily cohort retention: cohort = the user's first-ever event date;
    a user is retained at offset d if they have any event d days after
    their cohort date. Output: (cohort_date as ISO string — the portable
    cross-engine date representation, offset_days, n_users).

    Two shuffles on ``user_col`` (first-event aggregate + the join back),
    one on (cohort, offset) for the final distinct count."""
    firsts = df.groupBy(user_col).agg(
        F.to_date(F.min(ts_col)).alias("_cohort")
    )
    return (
        df.select(user_col, ts_col)
        .join(firsts, user_col)
        .select(
            user_col,
            "_cohort",
            F.datediff(F.to_date(ts_col), F.col("_cohort"))
            .cast("int").alias("offset_days"),
        )
        .groupBy("_cohort", "offset_days")
        .agg(F.countDistinct(user_col).alias("n_users"))
        .select(
            F.col("_cohort").cast("string").alias("cohort_date"),
            "offset_days",
            "n_users",
        )
    )
