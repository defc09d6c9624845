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


def draw_uniform(key: str | Column, salt: str = "") -> Column:
    """Deterministic NUMERIC uniform draw in (0, 1]: the md5 draw's first
    15 hex digits as an integer, +1 (exact, in decimal before the double
    rounding so both engines agree bit-for-bit), over 16^15 (= 2^60,
    exactly representable). DuckDB mirror:
    ``CAST(('0x' || substr(md5(...),1,15))::UBIGINT + 1 AS DOUBLE)
    / CAST(power(16,15) AS DOUBLE)``."""
    h15 = F.substring(draw_hex(key, salt), 1, 15)
    num = (F.conv(h15, 16, 10).cast("decimal(20,0)") + 1).cast("double")
    return num / F.lit(float(16 ** 15))


def sample_weighted_n(
    df: DataFrame,
    weight_col: str,
    n: int,
    by: list[str] | None = None,
    key: str = "doc_id",
    salt: str = "w",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis A-ES): each row draws its deterministic uniform
    ``u`` and gets sampling key ``ln(u)/w`` (order-equivalent to
    ``u^(1/w)``); the ``n`` largest keys are an exact
    weighted-without-replacement sample — e.g. documents proportional to
    token count, the standard quality-weighted corpus draw.

    Scale shape: per-group top-n is a per-stratum rank window (one
    shuffle on the group key); ungrouped top-n is TakeOrdered, never a
    global sort. Reruns/retries/speculative tasks and ANY engine with
    md5 reproduce the identical sample: distinct md5 draws make key
    collisions practically impossible, but EXTREME weights can saturate
    ``ln(u)/w`` to the same ±inf (e.g. a denormal weight overflows to
    -inf — found by the hypothesis fuzz), so ties additionally break on
    the unique ``key`` to keep the draw deterministic for any input.
    Rows with weight <= 0 or NULL are excluded (zero weight = never
    sampled, matching the limit of u^(1/w))."""
    w = F.col(weight_col).cast("double")
    scored = (
        df.where(w > 0)
        .withColumn("_wkey", F.ln(draw_uniform(key, salt)) / w)
    )
    if by:
        win = Window.partitionBy(*by).orderBy(F.col("_wkey").desc(),
                                              F.col(key).asc())
        out = (scored.withColumn("_r", F.row_number().over(win))
               .where(F.col("_r") <= int(n)).drop("_r"))
    else:
        out = (scored.orderBy(F.col("_wkey").desc(), F.col(key).asc())
               .limit(int(n)))
    return out.drop("_wkey")


def sample_token_budget(
    df: DataFrame,
    token_col: str,
    budgets: Mapping[str, float],
    group_col: str = "source",
    key: str = "doc_id",
    salt: str = "budget",
    default: float = 0.0,
) -> DataFrame:
    """Deterministic TOKEN-BUDGET sampling — the "give me N tokens at
    this mixture" pipeline step: within each group, keep documents in
    the deterministic md5-draw order until the group's token budget is
    filled (kept rows are those whose inclusive running token sum stays
    <= budget, so the budget is never overshot). Groups not named in
    ``budgets`` get ``default`` (0 = dropped).

    One shuffle on the group key; the running sum is a per-group window
    over the draw order (groups are corpus sources/languages — bounded
    cardinality, each window partition is one group's rows). Reruns and
    any md5-capable engine reproduce the identical kept set: the order
    key is the raw hex string, compared lexicographically in both
    engines, and the running sum is exact integer arithmetic."""
    b = F.lit(float(default))
    for g, v in sorted(budgets.items()):
        b = F.when(F.col(group_col) == g, F.lit(float(v))).otherwise(b)
    w = (
        Window.partitionBy(group_col)
        .orderBy(draw_hex(key, salt).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        df.withColumn("_cum", F.sum(F.col(token_col)).over(w))
        .where(F.col("_cum") <= b)
        .drop("_cum")
    )


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


def sample_negatives(
    positives: DataFrame,
    corpus: DataFrame,
    k: int,
    anchor_col: str = "anchor_id",
    pos_col: str = "pos_id",
    id_col: str = "doc_id",
    margin: int = 8,
    salt: str = "neg",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training pairs:
    for each distinct anchor in ``positives``, draw up to ``k`` corpus
    documents that are neither the anchor itself nor any of its
    positives. Output: ``(anchor_col, neg_id, neg_rank)`` with
    ``neg_rank`` 1..k in draw order.

    Draws are md5-indexed positions into the corpus (one dense-position
    pass over the corpus ids, the same two-stage ranking as
    ``shuffle_order`` — no single-reducer window), so reruns and other
    engines produce the SAME negatives. ``k + margin`` slots are drawn
    per anchor and collisions (duplicate draws, the anchor, true
    positives) are discarded before ranking; with a corpus much larger
    than each anchor's positive set, ``margin`` of 8 makes a short
    return vanishingly rare (short = that anchor emits < k rows, never
    wrong rows). Shape: one corpus position pass, one slot explosion
    bounded by anchors x (k+margin), hash joins on position and the
    pair anti-join — no corpus x corpus product anywhere."""
    from data_cube_spark.functions import add_dense_positions

    if k < 1:
        raise ValueError("k must be >= 1")
    n = corpus.select(id_col).count()
    if n == 0:
        raise ValueError("corpus is empty")
    pool = add_dense_positions(corpus.select(id_col), [id_col], "_pos")
    anchors = positives.select(anchor_col).distinct()
    slots = anchors.withColumn(
        "_slot", F.explode(F.array(*[F.lit(j) for j in range(k + margin)]))
    )
    hx = F.substring(
        draw_hex(
            F.concat(F.col(anchor_col).cast("string"), F.lit("#"),
                     F.col("_slot").cast("string")),
            salt=salt,
        ),
        1, 8,
    )
    slots = slots.withColumn(
        "_pos", (F.conv(hx, 16, 10).cast("long") % F.lit(n) + 1)
    )
    cands = (
        slots.join(pool, "_pos")
        .where(F.col(id_col).cast("string") != F.col(anchor_col).cast("string"))
        .join(
            positives.select(anchor_col, F.col(pos_col).alias(id_col)),
            [anchor_col, id_col], "left_anti",
        )
    )
    w_first = Window.partitionBy(anchor_col, id_col).orderBy(F.col("_slot"))
    w_rank = Window.partitionBy(anchor_col).orderBy(F.col("_slot"))
    return (
        cands.withColumn("_dup", F.row_number().over(w_first))
        .where(F.col("_dup") == 1)
        .withColumn("neg_rank", F.row_number().over(w_rank))
        .where(F.col("neg_rank") <= int(k))
        .select(anchor_col, F.col(id_col).alias("neg_id"), "neg_rank")
    )
