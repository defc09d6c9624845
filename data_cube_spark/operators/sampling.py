"""Deterministic sampling for training-data pipelines.

Beyond-reference operators (the reference has no sampling surface;
SURVEY.md §2.1 S8 only *generates* fixtures): corpus subsampling,
per-stratum quotas, and source-mixture weighting — the operations a
pretraining data pipeline runs right before sharding.

Design for 100 TB:

- Selection is keyed on a DETERMINISTIC uniform draw — ``md5`` of the row
  key — not ``rand()``. Reruns, retries, and speculative tasks all pick
  the same rows (critical when a sample must be reproducible across
  cluster runs), and the same draw is computable in any engine with md5
  (the DuckDB oracles run the identical expression).
- The draw is compared as a hex STRING: lowercase hex digits sort
  lexicographically in numeric order, so ``md5(key) < '28f5c28f5c28f5c'``
  is a pure codegen string comparison — no bigint conversion (DuckDB has
  no ``conv``), no shuffle, fully pushdown-friendly, O(1) per row.
- Exact per-stratum quotas need a per-stratum rank (one shuffle on the
  stratum key). The md5 order makes the quota a uniform random subset,
  and ties are impossible (md5 of a unique key).
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def draw_hex(key: str | Column, salt: str = "") -> Column:
    """Deterministic uniform draw as a 32-hex-char string:
    ``md5(salt || key)``. Order-isomorphic to a uniform [0,1) value."""
    c = F.col(key) if isinstance(key, str) else key
    return F.md5(F.concat(F.lit(salt), c.cast("string")))


def hex_threshold(fraction: float, digits: int = 15) -> str:
    """Hex-string threshold such that
    ``P(md5 < threshold) == fraction`` (to 1/16^digits resolution).
    Fraction >= 1 saturates to ``"g"`` — lexicographically above every hex
    digit, so the comparison accepts every row."""
    f = min(max(float(fraction), 0.0), 1.0)
    if f >= 1.0:
        return "g"
    return format(int(f * (16 ** digits)), f"0{digits}x")


def sample_fraction(
    df: DataFrame,
    fraction: float,
    key: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Keep a deterministic ~``fraction`` uniform subset: pure filter on
    the md5 draw — no shuffle, survives pushdown into the scan."""
    return df.where(draw_hex(key, salt) < F.lit(hex_threshold(fraction)))


def sample_stratified_n(
    df: DataFrame,
    strata: list[str],
    n: int,
    key: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Exactly ``n`` rows per stratum (fewer if the stratum is smaller),
    chosen uniformly by md5 rank. One shuffle on the strata columns; the
    rank window is per-stratum (no global sort)."""
    w = Window.partitionBy(*strata).orderBy(draw_hex(key, salt).asc())
    return (
        df.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= n)
        .drop("_r")
    )


def mixture_sample(
    df: DataFrame,
    weights: Mapping[str, float],
    source_col: str = "source",
    key: str = "doc_id",
    salt: str = "",
    default: float = 0.0,
) -> DataFrame:
    """Source-mixture weighting: keep each row with its source's retention
    rate (e.g. ``{"wiki": 1.0, "crawl": 0.1}``) — the standard corpus
    re-weighting step before pretraining. Rates > 1 are clamped (this
    operator subsamples; epoch-style upsampling belongs to the training
    loader). Pure filter — the per-source threshold is a CASE expression
    over string literals, no join, no shuffle."""
    thr = F.lit(hex_threshold(default))
    for src, wgt in sorted(weights.items()):
        thr = F.when(F.col(source_col) == src,
                     F.lit(hex_threshold(wgt))).otherwise(thr)
    return df.where(draw_hex(key, salt) < thr)


def assign_split(
    df: DataFrame,
    splits: Mapping[str, float],
    key: str = "doc_id",
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: partition the md5 draw's
    [0,1) range into one interval per split (insertion order of
    ``splits``, fractions must sum to <= 1; any remainder falls into the
    LAST split). A pure per-row CASE over the draw — no shuffle, no
    join, stable under reruns and engine changes, and a document never
    migrates between splits when the corpus grows (the draw depends only
    on the row key)."""
    fracs = list(splits.items())
    if not fracs:
        raise ValueError("splits must be non-empty")
    expr = F.lit(fracs[-1][0])  # remainder → last split
    acc = 0.0
    draw = draw_hex(key, salt)
    conds = []
    for name, frac in fracs[:-1]:
        acc += float(frac)
        conds.append((name, hex_threshold(acc)))
    for name, thr in reversed(conds):
        expr = F.when(draw < F.lit(thr), F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def shuffle_positions(
    df: DataFrame,
    key: str = "doc_id",
    salt: str = "shuffle",
    pos_col: str = "position",
) -> DataFrame:
    """Global deterministic shuffle order for training: assign each row a
    dense position 1..N ordered by its md5 draw — a reproducible uniform
    permutation of the corpus.

    Distributed ranking (``functions.add_dense_positions`` over the
    draw): range-partition on the draw, sort within partitions, add
    collected per-partition offsets — one shuffle, no dedupe/join-back,
    never a single-reducer global window. The draw of a unique key is
    collision-free at corpus scale (128-bit), so positions are dense and
    unique."""
    from data_cube_spark.functions import add_dense_positions

    with_draw = df.withColumn("_draw", draw_hex(key, salt))
    out = add_dense_positions(with_draw, ["_draw"], pos_col)
    return out.drop("_draw")
