"""Plan-regression gate over the WHOLE registry (VERDICT r3 next-round #3).

Every registry query's physical plan is captured once at sf0.001 and
checked against the scale contract:

- no ``CartesianProduct`` and no ``BroadcastNestedLoopJoin`` anywhere,
  except the sanctioned 1-row scalar-subquery joins (a broadcast of a
  single aggregated row is the standard scalar pattern, not a quadratic
  join);
- no ``Exchange SinglePartition`` outside ops whose OUTPUT is a single
  (or per-key tiny) reduction — a single-partition exchange on a big
  intermediate is the classic 100 TB plan killer;
- the dice family must reach the parquet scan with non-empty
  ``PushedFilters`` (predicate pushdown is the point of those queries).

EXPLAIN.md documents ~40 plans narratively; this test makes the whole
registry regression-proof mechanically.
"""

from __future__ import annotations

import pytest

from data_cube_spark.plans import explain_str, pushed_filters
from data_cube_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"

#: Queries whose CONSTRUCTION executes a full job with side effects
#: (streaming runs, table writes) — their plan shape is pinned by the
#: dedicated streaming/store tests instead.
SKIP: dict[str, str] = {
    "events_stream_dedup": "runs a streaming job at build; covered by test_streaming",
    "documents_stream_ingest": "runs a streaming job at build; covered by test_streaming",
    "events_stream_cube": "runs a streaming job at build; covered by test_streaming",
    "cube_store_roundtrip": "writes+reloads the cube at build; covered by test_sources",
    "bucketed_join_copartition": (
        "writes bucketed tables at build; the exchange-free join plan is "
        "pinned by test_plans.py::test_bucketed_join_has_zero_exchanges"),
    "range_layout_prune": (
        "writes the range layout at build; file-level pruning is pinned "
        "by test_sources.py::"
        "test_write_range_layout_files_cover_disjoint_ranges"),
}

#: Queries whose final (or only) aggregate is a GLOBAL reduction to one
#: row / a handful of rows — the single-partition exchange there carries
#: bytes proportional to the OUTPUT, not the input, so it is the correct
#: plan at any scale. Everything else must justify itself.
SINGLE_PARTITION_OK = {
    # scalar totals / single-row aggregates
    "grand_total",
    "tpch_q6_forecast_revenue",
    "funnel_conversion",         # 1-row conditional-count reduce, then inline
    "range_join_error_window",   # single global error window total
    "decontaminate_overlap",     # broadcast 1-row benchmark shingle-set count
    # global orderBy on a FINAL small result (rangepartitioning would show
    # for big sorts; these end in a driver-facing ordered result)
    "tpch_q2_min_cost_supplier",
    # scalar subquery feeding the main plan (avg over the whole table)
    "tpch_q11_important_stock",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q17_small_qty_revenue",
    "tpch_q22_idle_balance",
    "quality_percentile_keep",   # global percentile cut broadcast back
    "winsorized_price_stats",    # per-flag cuts collected from 3-row agg
    "quantile_bins",             # nearest-rank cuts from per-flag agg
    "quantile_bins_approx_bound",
    "price_histogram",           # global min/max scalar for bin edges
    "embedding_components",      # pointer-jumping convergence check (1-row)
    "semantic_dedup_keep",
    "sketch_error_bounds",
    "ann_lsh_topk",              # 1-row mean-recall scalar broadcast
    "ann_ivf_topk",
    "simhash_pairs",             # 1-row global-invariant-flags aggregate
    "tpch_q19_disjunctive_revenue",  # single-row final aggregate
    "window_running_total",      # window over the ~dozens-row MONTHLY
                                 # aggregate (aggregate-first, window after
                                 # — the documented §2.6 design)
    "key_skew_users",            # rank window over <= top_n profile rows
    "tfidf_keywords",            # 1-row corpus-count scalar broadcast
    "data_quality_report",       # per-rule 1-row violation totals (map-side
                                 # partials; the merge reduces one row per
                                 # partition, the grand_total shape)
}

#: Bounded join shapes: BroadcastNestedLoopJoin / CartesianProduct whose
#: SMALL side is bytes-bounded by construction — a 1-row scalar
#: aggregate, a fixed tiny query batch, or a size-guarded verifier that
#: REFUSES oversized inputs. (See EXPLAIN.md "scalar joins".)
BOUNDED_JOIN_OK = {
    # 1-row scalar-aggregate broadcasts
    "tpch_q22_idle_balance",
    "tpch_q11_important_stock",  # global-sum threshold scalar subquery
    "decontaminate_overlap",
    "winsorized_price_stats",
    "quantile_bins",
    "quantile_bins_approx_bound",
    "price_histogram",
    "tfidf_keywords",
    "pipeline_clean_corpus",
    "pipeline_pretraining",
    "ann_lsh_topk",              # 1-row mean-recall scalar broadcast
    "ann_ivf_topk",
    "simhash_pairs",             # 1-row global-invariant-flags broadcast
    "key_skew_users",            # 1-row table-total scalar broadcast
    # fixed small query batch broadcast against the corpus (the exact
    # brute-force baseline — documented as the verifier tier)
    "ann_cosine_topk",
    # size-guarded all-pairs verifiers (raise beyond max_rows) / the
    # cell-count-guarded na.fill cross product of dimension combos
    "embedding_near_pairs",
    "embedding_near_pairs_lsh",  # its exact-truth side IS the verifier
    "denormalize_na_fill",
}

#: Dice-family queries: the defining property is literal pushdown into the
#: parquet scan.
DICE_PUSHDOWN = [
    "dice_key_pushdown",
    "attr_dice_snowflake",
    "attr_dice_or",
    "slice_scalar_drop",
    "collapse_prefilter",
]

_CHECKED = sorted(n for n in QUERIES if n not in SKIP)


@pytest.fixture(scope="module")
def plans(spark):
    """Build every checked query once and capture its physical plan."""
    spark.catalog.clearCache()
    out: dict[str, str] = {}
    for name in _CHECKED:
        out[name] = explain_str(QUERIES[name](spark, SF), "simple")
    return out


@pytest.mark.parametrize("name", _CHECKED)
def test_no_unbounded_joins(plans, name):
    plan = plans[name]
    if name in BOUNDED_JOIN_OK:
        return
    assert "CartesianProduct" not in plan, f"{name}:\n{plan}"
    assert "BroadcastNestedLoopJoin" not in plan, f"{name}:\n{plan}"


@pytest.mark.parametrize("name", _CHECKED)
def test_no_unsanctioned_single_partition(plans, name):
    if name in SINGLE_PARTITION_OK:
        return
    plan = plans[name]
    assert "SinglePartition" not in plan, f"{name}:\n{plan}"


@pytest.mark.parametrize("name", DICE_PUSHDOWN)
def test_dice_family_pushes_filters(spark, name):
    spark.catalog.clearCache()
    df = QUERIES[name](spark, SF)
    pf = pushed_filters(df)
    assert pf.replace("PushedFilters: []", "").strip(), (
        f"{name}: expected non-empty PushedFilters, got:\n{pf}"
    )


def test_skip_list_stays_minimal():
    """Every skip carries a reason and refers to a real query."""
    assert set(SKIP) <= set(QUERIES)
    assert all(SKIP.values())
    assert len(SKIP) <= 6
