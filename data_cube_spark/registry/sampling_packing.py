"""Deterministic sampling (fraction/stratified/mixture/weighted/
token-budget), splits, shuffles, sequence packing, negatives."""

from __future__ import annotations

from data_cube_spark.registry._shared import *  # noqa: F401,F403


def q_sample_fraction_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~25% corpus subsample (md5-draw filter — no shuffle,
    pushdown-friendly; operators/sampling.py)."""
    from data_cube_spark.operators.sampling import sample_fraction

    t = load_tables(spark, sf_dir)
    return sample_fraction(t["documents"], 0.25).select("doc_id", "lang", "source")


def q_sample_stratified_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-20-per-language uniform quota (md5-rank window within
    stratum; operators/sampling.py)."""
    from data_cube_spark.operators.sampling import sample_stratified_n

    t = load_tables(spark, sf_dir)
    return sample_stratified_n(t["documents"], ["lang"], 20).select("doc_id", "lang")


def q_mixture_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixture re-weighting: per-source retention rates as a pure
    CASE-threshold filter (operators/sampling.py)."""
    from data_cube_spark.operators.sampling import mixture_sample

    t = load_tables(spark, sf_dir)
    out = mixture_sample(t["documents"], MIXTURE_WEIGHTS, default=MIXTURE_DEFAULT)
    return out.select("doc_id", "source")


def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (keep a deterministic uniform 15 per
    source): window row_number over the md5 draw, one shuffle on source
    (operators/curation.py)."""
    from data_cube_spark.operators.curation import cap_per_group
    from data_cube_spark.operators.sampling import draw_hex

    t = load_tables(spark, sf_dir)
    out = cap_per_group(
        t["documents"], ["source"], 15, order=[draw_hex("doc_id", salt="cap")]
    )
    return out.select("doc_id", "source")


def q_quality_percentile_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the longest 60% of documents per language: percent_rank window
    over (n_chars DESC, doc_id) — the percentile-cut curation pass
    (operators/curation.py)."""
    from data_cube_spark.operators.curation import percentile_filter

    t = load_tables(spark, sf_dir)
    out = percentile_filter(
        t["documents"], "n_chars", ["lang"], 0.6, tiebreak="doc_id"
    )
    return out.select("doc_id", "lang", F.col("n_chars").cast("bigint").alias("n_chars"))


def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test assignment from the salted md5
    draw — pure per-row CASE, no shuffle; a document never migrates when
    the corpus grows (operators/sampling.py)."""
    from data_cube_spark.operators.sampling import assign_split

    t = load_tables(spark, sf_dir)
    out = assign_split(
        t["documents"], {"train": 0.9, "val": 0.05, "test": 0.05}
    )
    return out.select("doc_id", "split")


def q_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible global shuffle for training order: dense position by
    salted md5 draw via two-stage distributed ranking — no single-reducer
    window (operators/sampling.py)."""
    from data_cube_spark.operators.sampling import shuffle_positions

    t = load_tables(spark, sf_dir)
    out = shuffle_positions(t["documents"])
    return out.select("doc_id", F.col("position").cast("bigint").alias("position"))


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: shard by md5, cumulative token
    offsets per shard, sequence = offset // capacity
    (operators/packing.py)."""
    from data_cube_spark.operators.packing import pack_concat_chunk
    from data_cube_spark.operators.text import token_count

    t = load_tables(spark, sf_dir)
    d = t["documents"].select(
        "doc_id", token_count("text").alias("n_tokens")
    )
    out = pack_concat_chunk(d, capacity=PACK_CAPACITY, n_shards=PACK_SHARDS)
    return out.select("doc_id", F.col("shard").cast("int").alias("shard"),
                      "seq", "offset", "n_tokens")


def q_pack_greedy_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No-split greedy packing (applyInPandas state scan per shard),
    emitted as DRIVER-CHECKABLE conservation invariants (VERDICT r3 #2):
    per shard, the doc count, distinct-doc count and token total — which
    the oracle recomputes directly from ``documents`` with the same md5
    shard draw (every doc packed exactly once, tokens conserved) — plus
    ``n_over_capacity`` = packs holding >1 doc whose token sum exceeds
    the budget (must be 0; a single over-budget doc is allowed its own
    pack). The reset-on-overflow recurrence itself is not expressible in
    one SQL pass — pack boundaries are python-oracle-tested in
    tests/test_sampling_packing.py."""
    from data_cube_spark.operators.packing import pack_greedy
    from data_cube_spark.operators.text import token_count

    t = load_tables(spark, sf_dir)
    d = t["documents"].select(
        "doc_id", token_count("text").alias("n_tokens")
    )
    out = pack_greedy(d, capacity=PACK_CAPACITY, n_shards=PACK_SHARDS)
    packs = out.groupBy("shard", "seq").agg(
        F.count(F.lit(1)).alias("_n_in_pack"),
        F.sum("n_tokens").alias("_pack_tokens"),
    )
    viol = (
        packs.where((F.col("_pack_tokens") > PACK_CAPACITY)
                    & (F.col("_n_in_pack") > 1))
        .groupBy("shard").agg(F.count(F.lit(1)).alias("_n_viol"))
    )
    per_shard = out.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("doc_id").alias("n_docs_distinct"),
        F.sum("n_tokens").alias("total_tokens"),
    )
    return (
        per_shard.join(viol, "shard", "left")
        .select(F.col("shard").cast("int").alias("shard"),
                "n_docs", "n_docs_distinct", "total_tokens",
                F.coalesce("_n_viol", F.lit(0)).cast("bigint")
                .alias("n_over_capacity"))
    )


def q_weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (A-ES,
    operators/sampling.py::sample_weighted_n): 30 documents per language
    drawn with probability proportional to n_chars — the
    quality/length-weighted corpus draw. The oracle recomputes the
    identical ln(u)/w keys from the same md5 draw (numeric parity pinned
    by draw_uniform's decimal-before-double construction), so the
    sampled row SET hash-matches across engines."""
    from data_cube_spark.operators.sampling import sample_weighted_n

    t = load_tables(spark, sf_dir)
    out = sample_weighted_n(t["documents"], "n_chars", 30, by=["lang"])
    return out.select("doc_id", "lang", "n_chars")


def q_token_budget_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic token-budget mixture draw
    (operators/sampling.py::sample_token_budget): per language, keep
    documents in md5-draw order until the language's character budget
    fills (en 5000 / de 2000 / zh 1000; unbudgeted languages drop). The
    oracle replays the identical hex-ordered running sum, so the kept
    row SET hash-matches across engines."""
    from data_cube_spark.operators.sampling import sample_token_budget

    t = load_tables(spark, sf_dir)
    out = sample_token_budget(
        t["documents"], "n_chars",
        {"en": 5000, "de": 2000, "zh": 1000}, group_col="lang")
    return out.select("doc_id", "lang", "n_chars")


def q_contrastive_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive pairs
    (operators/sampling.py::sample_negatives): every 10th document is an
    anchor (its positive = the next id); each anchor draws 4 negatives
    as md5-indexed positions into the corpus, excluding itself and its
    positives. The draw arithmetic (hex-prefix mod corpus-size into the
    doc_id-ordered position table) is replayed exactly by the SQL
    oracle, so the negative SETS hash-match across engines — the
    reproducibility contract a training-data pipeline needs for
    negatives, same as `shuffle_order` for ordering."""
    from data_cube_spark.operators.sampling import sample_negatives

    docs = load_tables(spark, sf_dir)["documents"]
    pos = docs.where(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("anchor_id"),
        (F.col("doc_id") + 1).alias("pos_id"),
    )
    return sample_negatives(pos, docs, 4)
