"""Data-quality validation: expectations-style constraint checking.

The ingestion guardrail for a continuously-fed warehouse: before a batch
merges into the cube (or a corpus snapshot ships to training), assert
the structural contracts — keys non-null and unique, foreign keys
resolving, measures in range — and get back a machine-readable report of
violation counts per rule.

Scale shape: every rule is a counting aggregate, and all same-table
rules FUSE into one scan (a single ``agg`` of conditional sums — no
per-rule pass, no collect of violating rows). Referential-integrity
rules are one anti-join each against the (broadcastable) dimension key
set. The report is one row per rule — bytes, not data.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class NotNull:
    """``col`` must be non-null."""

    col: str


@dataclass(frozen=True)
class Unique:
    """``cols`` must be unique together (0 violations == no key appears
    twice; the count reported is the number of SURPLUS rows)."""

    cols: tuple

    def __init__(self, *cols: str):
        object.__setattr__(self, "cols", tuple(cols))


@dataclass(frozen=True)
class InRange:
    """``col`` must lie in [lo, hi] (nulls don't violate — add NotNull)."""

    col: str
    lo: float | None = None
    hi: float | None = None


@dataclass(frozen=True)
class Predicate:
    """Arbitrary boolean expression that must hold (SQL string or Column);
    nulls count as violations."""

    name: str
    expr: object  # str | Column


@dataclass(frozen=True)
class ForeignKey:
    """Every non-null ``col`` value must exist in ``ref[ref_col]``."""

    col: str
    ref: DataFrame
    ref_col: str


def check_constraints(df: DataFrame, rules: list) -> DataFrame:
    """Evaluate ``rules`` against ``df``; returns one row per rule:
    ``(rule, n_violations, passed)``.

    Row-local rules (NotNull/InRange/Predicate) fuse into ONE scan of
    ``df``; Unique adds one aggregate on its key; each ForeignKey adds
    one anti-join (hint the dimension side broadcast-sized by keeping
    reference key sets small). The result is rule-count rows only —
    suitable for a gate like ``assert all(r.passed)``.
    """
    spark = df.sparkSession
    row_local: list[tuple[str, Column]] = []
    extras: list[DataFrame] = []
    for r in rules:
        if isinstance(r, NotNull):
            row_local.append((f"not_null({r.col})", F.col(r.col).isNull()))
        elif isinstance(r, InRange):
            cond = F.lit(False)
            if r.lo is not None:
                cond = cond | (F.col(r.col) < F.lit(r.lo))
            if r.hi is not None:
                cond = cond | (F.col(r.col) > F.lit(r.hi))
            row_local.append((f"in_range({r.col})", cond))
        elif isinstance(r, Predicate):
            expr = F.expr(r.expr) if isinstance(r.expr, str) else r.expr
            row_local.append(
                (f"predicate({r.name})", ~F.coalesce(expr, F.lit(False)))
            )
        elif isinstance(r, Unique):
            name = f"unique({','.join(r.cols)})"
            surplus = (
                df.groupBy(*r.cols)
                .agg((F.count(F.lit(1)) - 1).alias("_extra"))
                .agg(F.coalesce(F.sum("_extra"), F.lit(0)).alias("n_violations"))
                .select(F.lit(name).alias("rule"), "n_violations")
            )
            extras.append(surplus)
        elif isinstance(r, ForeignKey):
            name = f"foreign_key({r.col})"
            orphans = (
                df.select(F.col(r.col)).where(F.col(r.col).isNotNull())
                .join(F.broadcast(r.ref.select(
                    F.col(r.ref_col).alias(r.col)).distinct()),
                    r.col, "left_anti")
                .agg(F.count(F.lit(1)).alias("n_violations"))
                .select(F.lit(name).alias("rule"), "n_violations")
            )
            extras.append(orphans)
        else:
            raise TypeError(f"unknown rule type: {type(r).__name__}")

    parts = []
    if row_local:
        fused = df.agg(*[
            F.coalesce(F.sum(cond.cast("long")), F.lit(0)).alias(f"_r{i}")
            for i, (_, cond) in enumerate(row_local)
        ])
        names = F.array(*[F.lit(n) for n, _ in row_local])
        vals = F.array(*[F.col(f"_r{i}") for i in range(len(row_local))])
        parts.append(
            fused.select(
                F.explode(F.arrays_zip(names.alias("rule"),
                                       vals.alias("n"))).alias("z")
            ).select(F.col("z.rule").alias("rule"),
                     F.col("z.n").alias("n_violations"))
        )
    parts.extend(extras)
    if not parts:
        return spark.createDataFrame([], "rule string, n_violations long, passed boolean")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("passed", F.col("n_violations") == 0)
