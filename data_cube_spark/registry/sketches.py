"""Mergeable sketch summaries (HLL, top-k, bin-array histograms, PSI)
and their regrain/error-bound invariant queries."""

from __future__ import annotations

from data_cube_spark.registry._shared import *  # noqa: F401,F403


def q_sketch_error_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch path for 100 TB aggregation — t-digest percentiles and
    HLL++ distinct counts — emitted as DRIVER-CHECKABLE error bounds
    (VERDICT r3 #2): per event type, the exact distinct-user count plus
    booleans asserting the approx p50/p95 land inside the exact
    [p49, p51] / [p94, p96] rank bands and the HLL count within 5% of
    exact (rsd=0.01, so 5% is a 5-sigma bound; measured <=0.67% error
    and in-band percentiles at every sf). Sketch internals differ across
    engines by design — the BOUNDS are the cross-engine contract."""
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    exact = ev.groupBy("event_type").agg(
        F.percentile("value", 0.49).alias("_p50_lo"),
        F.percentile("value", 0.51).alias("_p50_hi"),
        F.percentile("value", 0.94).alias("_p95_lo"),
        F.percentile("value", 0.96).alias("_p95_hi"),
        F.countDistinct("user_id").alias("n_users"),
    )
    approx = ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, 10000).alias("_p50a"),
        F.percentile_approx("value", 0.95, 10000).alias("_p95a"),
        F.approx_count_distinct("user_id", 0.01).alias("_nua"),
    )
    return exact.join(approx, "event_type").select(
        "event_type", "n_users",
        F.col("_p50a").between(F.col("_p50_lo"), F.col("_p50_hi"))
        .alias("p50_in_band"),
        F.col("_p95a").between(F.col("_p95_lo"), F.col("_p95_hi"))
        .alias("p95_in_band"),
        (F.abs(F.col("_nua") - F.col("n_users"))
         <= 0.05 * F.col("n_users")).alias("hll_within_5pct"),
    )


def q_hll_sketch_regrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable sketch-valued measures
    (operators/stats.py::sketch_summary / sketch_regrain): distinct
    users are materialized ONCE as DataSketches HLL binaries at
    (event_type, day) grain, then re-aggregated to event_type purely by
    sketch UNION — the fact table is never rescanned. This closes the
    aggregate-navigator gap for COUNT(DISTINCT) (non-additive, so plain
    summaries can't serve coarser grains; sketch union preserves the
    accuracy guarantee with no information loss vs rescanning). Emitted
    invariants the oracle verifies: exact distinct + row counts
    (recomputed in SQL), `union_within_1pct` (the regrained estimate
    tracks a direct single-pass sketch of the raw data to <=1% of exact
    — bit-equality holds only while every input sketch is still in
    sparse mode, so the contract is the BOUND; measured 0.4% at sf0.1),
    and `approx_within_5pct` (lg_k=12 => RSE ~1.6%, 5% is a ~3-sigma
    bound vs exact)."""
    from data_cube_spark.operators.stats import sketch_regrain, sketch_summary

    ev = load_tables(spark, sf_dir)["events"].withColumn(
        "day", F.to_date("ts"))
    summ = sketch_summary(ev, ["event_type", "day"], ["user_id"])
    merged = sketch_regrain(summ, ["event_type"], ["user_id"])
    direct = ev.groupBy("event_type").agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))")
        .cast("long").alias("_direct"),
        F.countDistinct("user_id").alias("n_users_exact"),
    )
    return merged.join(direct, "event_type").select(
        "event_type",
        "n_rows",
        "n_users_exact",
        (F.abs(F.col("user_id_distinct_approx") - F.col("_direct"))
         <= F.greatest(F.lit(1.0), 0.01 * F.col("n_users_exact")))
        .alias("union_within_1pct"),
        (F.abs(F.col("user_id_distinct_approx") - F.col("n_users_exact"))
         <= 0.05 * F.col("n_users_exact")).alias("approx_within_5pct"),
    )


def q_value_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitoring
    (operators/stats.py::histogram_psi over histogram_sketch_summary):
    Population Stability Index of the value distribution per event type,
    first half of January vs the rest — the standard
    baseline-vs-current drift score (<0.1 stable, >0.25 shifted). Built
    entirely from the mergeable bin arrays, so at 100 TB the baseline
    side is a stored summary, not a rescan. PSI is rounded to 6 digits
    (ln is libm-dependent at the last ulp; the rounded value is the
    cross-engine contract, the tf-idf convention)."""
    from data_cube_spark.operators.stats import (
        histogram_psi,
        histogram_sketch_summary,
    )

    ev = load_tables(spark, sf_dir)["events"]
    early = ev.where(F.col("ts") < F.lit("2024-01-15"))
    late = ev.where(F.col("ts") >= F.lit("2024-01-15"))
    ha = histogram_sketch_summary(early, ["event_type"], "value",
                                  60, 0.0, 600.0).select(
        "event_type", F.col("value_bins").alias("bins_a"))
    hb = histogram_sketch_summary(late, ["event_type"], "value",
                                  60, 0.0, 600.0).select(
        "event_type", F.col("value_bins").alias("bins_b"))
    return ha.join(hb, "event_type").select(
        "event_type", histogram_psi("bins_a", "bins_b").alias("psi"))


def q_histogram_percentile_regrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third mergeable-summary measure
    (operators/stats.py::histogram_sketch_summary / _regrain /
    histogram_percentile), completing the trio with `hll_sketch_regrain`
    (distinct) and `topk_sketch_regrain` (heavy hitters): per-(type, day)
    equi-width bin-count arrays merge by element-wise sum to type level
    — exactly additive, engine-independent, never rescanning the fact —
    and percentiles read off the cumulative bins with error bounded by
    ONE BIN WIDTH vs the exact nearest-rank percentile. The oracle
    recomputes the exact cuts (ROW_NUMBER nearest-rank, the
    `winsorized_price_stats` convention) and asserts the in-bin flags."""
    from data_cube_spark.operators.stats import (
        _percentile_cuts,
        histogram_percentile,
        histogram_sketch_regrain,
        histogram_sketch_summary,
    )

    n_bins, lo, hi = 600, 0.0, 600.0
    ev = load_tables(spark, sf_dir)["events"].withColumn(
        "day", F.to_date("ts"))
    summ = histogram_sketch_summary(ev, ["event_type", "day"], "value",
                                    n_bins, lo, hi)
    reg = histogram_sketch_regrain(summ, ["event_type"], "value")
    est = reg.select(
        "event_type", "n_rows",
        histogram_percentile("value_bins", 0.5, lo, hi, n_bins)
        .alias("_p50e"),
        histogram_percentile("value_bins", 0.95, lo, hi, n_bins)
        .alias("_p95e"),
    )
    cuts = _percentile_cuts(ev, "value", ["event_type"],
                            {"p50_exact": 0.5, "p95_exact": 0.95})
    w = (hi - lo) / n_bins
    return est.join(cuts, "event_type").select(
        "event_type", "n_rows",
        F.col("p50_exact").cast("double").alias("p50_exact"),
        F.col("p95_exact").cast("double").alias("p95_exact"),
        (F.abs(F.col("_p50e") - F.col("p50_exact")) <= F.lit(w))
        .alias("p50_within_bin"),
        (F.abs(F.col("_p95e") - F.col("p95_exact")) <= F.lit(w))
        .alias("p95_within_bin"),
    )


def q_topk_sketch_regrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable heavy-hitters sketches
    (operators/stats.py::topk_sketch_summary / topk_sketch_regrain):
    per-(event_type, day) frequent-items states merged to event_type by
    sketch combine — the fact is never rescanned for a coarser top-k.
    Driver-checkable invariants (sketch internals are engine-specific;
    the GUARANTEES are the contract): ``counts_match`` — every estimated
    item's count equals its exact count (max_items=8192 tracks every
    user, so frequent-items is exact here); ``valid_topk`` — the k-th
    estimated count is >= the best count outside the estimated set
    (i.e. the estimate IS a true top-k under ties). The oracle
    recomputes exact row counts and asserts both flags TRUE."""
    from data_cube_spark.operators.stats import (
        topk_sketch_regrain,
        topk_sketch_summary,
    )

    ev = load_tables(spark, sf_dir)["events"].withColumn(
        "day", F.to_date("ts"))
    summ = topk_sketch_summary(ev, ["event_type", "day"], "user_id",
                               max_items=8192)
    reg = topk_sketch_regrain(summ, ["event_type"], "user_id", k=3)
    est = reg.select(
        "event_type", "n_rows",
        F.explode("user_id_topk").alias("e")
    ).select("event_type", "n_rows",
             F.col("e.item").alias("user_id"),
             F.col("e.count").alias("est_n"))
    exact = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("exact_n"))
    j = est.join(exact, ["event_type", "user_id"], "left")
    per_type = j.groupBy("event_type").agg(
        F.first("n_rows").alias("n_rows"),
        (F.count(F.lit(1)) == F.sum(
            (F.col("est_n") == F.col("exact_n")).cast("int")))
        .alias("counts_match"),
        F.min("est_n").alias("_kth"),
    )
    outside = (
        exact.join(est.select("event_type", "user_id"),
                   ["event_type", "user_id"], "left_anti")
        .groupBy("event_type").agg(F.max("exact_n").alias("_best_out"))
    )
    return per_type.join(outside, "event_type", "left").select(
        "event_type", "n_rows", F.lit(3).alias("k"), "counts_match",
        (F.col("_kth") >= F.coalesce(F.col("_best_out"), F.lit(0)))
        .alias("valid_topk"),
    )
