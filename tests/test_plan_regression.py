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

#: A scalar map-side partial aggregate — grouping keys EMPTY, partial
#: functions — emits <= 1 row per input partition, so the single-
#: partition exchange above it carries <= #partitions rows regardless
#: of input size: the canonical output-bounded reduction.
_SCALAR_REDUCE = (r"(HashAggregate|SortAggregate|ObjectHashAggregate)"
                  r"\((keys|key)=\[\], functions=\[partial_")

#: Queries whose final (or only) aggregate is a GLOBAL reduction to one
#: row / a handful of rows — the single-partition exchange there carries
#: bytes proportional to the OUTPUT, not the input, so it is the correct
#: plan at any scale. The VALUE pins what the exchange is allowed to sit
#: above (VERDICT r9 #7): every ``Exchange SinglePartition`` in the plan
#: must have an immediate child line matching the regex, and an
#: allowlisted plan with NO such exchange fails as a stale entry — so
#: the allowlist can neither bless a future unbounded exchange nor
#: outlive the plan shape it was written for. (Entries that lost their
#: exchange as implementations improved — quantile_bins, winsorize,
#: percentile-keep, component convergence and friends — were removed in
#: r10 and are now under the strict no-SinglePartition assertion.)
SINGLE_PARTITION_OK = {
    # scalar totals / single-row aggregates
    "grand_total": _SCALAR_REDUCE,
    "tpch_q6_forecast_revenue": _SCALAR_REDUCE,
    "funnel_conversion": _SCALAR_REDUCE,   # 1-row conditional-count reduce
    # scalar subquery feeding the main plan (sum/max/avg over the table)
    "tpch_q11_important_stock": _SCALAR_REDUCE,
    "tpch_q14_promo_revenue": _SCALAR_REDUCE,
    "tpch_q15_top_supplier": _SCALAR_REDUCE,
    "tpch_q17_small_qty_revenue": _SCALAR_REDUCE,
    "tpch_q19_disjunctive_revenue": _SCALAR_REDUCE,
    "tpch_q22_idle_balance": _SCALAR_REDUCE,
    "ann_lsh_topk": _SCALAR_REDUCE,        # 1-row mean-recall scalar
    "ann_ivf_topk": _SCALAR_REDUCE,
    "simhash_pairs": _SCALAR_REDUCE,       # 1-row invariant-flags agg
    "key_skew_users": _SCALAR_REDUCE,      # 1-row table-total scalar
    "tfidf_keywords": _SCALAR_REDUCE,      # 1-row corpus-count scalar
    "data_quality_report": _SCALAR_REDUCE,  # per-rule 1-row totals
    # window over the ~dozens-row MONTHLY aggregate (aggregate-first,
    # window after — the documented §2.6 design): the exchange sits on
    # the projected month totals, pinned by the output column name
    "window_running_total": r"Project \[.*month_total",
}

#: Bounded join shapes: BroadcastNestedLoopJoin / CartesianProduct whose
#: SMALL side is bytes-bounded by construction — a 1-row scalar
#: aggregate, a fixed tiny query batch, or a size-guarded verifier that
#: REFUSES oversized inputs. (See EXPLAIN.md "scalar joins".) An entry
#: whose plan no longer contains such a join fails as stale (same
#: rationale as SINGLE_PARTITION_OK; the r10 sweep removed seven that
#: had already lost theirs: decontaminate_overlap, both pipelines,
#: price_histogram, both quantile_bins variants, winsorized stats).
BOUNDED_JOIN_OK = {
    # 1-row scalar-aggregate broadcasts
    "tpch_q22_idle_balance",
    "tpch_q11_important_stock",  # global-sum threshold scalar subquery
    "tfidf_keywords",
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


def _single_partition_children(plan: str) -> list[str]:
    """The immediate child line of every ``Exchange SinglePartition`` —
    the node whose output the exchange actually moves. In simple-mode
    explain the child of a unary node is the next non-empty line."""
    lines = plan.splitlines()
    out = []
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        for nxt in lines[i + 1:]:
            if nxt.strip():
                out.append(nxt.strip())
                break
    return out


@pytest.mark.parametrize("name", _CHECKED)
def test_no_unbounded_joins(plans, name):
    plan = plans[name]
    present = ("CartesianProduct" in plan
               or "BroadcastNestedLoopJoin" in plan)
    if name in BOUNDED_JOIN_OK:
        # allowlist hygiene: an entry whose plan no longer contains the
        # join it sanctions is stale and would silently bless a future
        # regression — fail it so the list tracks reality
        assert present, (
            f"{name}: allowlisted in BOUNDED_JOIN_OK but its plan has no "
            f"CartesianProduct/BroadcastNestedLoopJoin — remove the stale "
            f"entry:\n{plan}")
        return
    assert "CartesianProduct" not in plan, f"{name}:\n{plan}"
    assert "BroadcastNestedLoopJoin" not in plan, f"{name}:\n{plan}"


@pytest.mark.parametrize("name", _CHECKED)
def test_no_unsanctioned_single_partition(plans, name):
    plan = plans[name]
    if name not in SINGLE_PARTITION_OK:
        assert "SinglePartition" not in plan, f"{name}:\n{plan}"
        return
    # VERDICT r9 #7: the allowlist entry must prove itself — every
    # single-partition exchange in the plan sits directly above the
    # output-bounded reduction its entry pins (a scalar partial
    # aggregate, or the named tiny-aggregate projection), and an entry
    # with no such exchange at all is stale and fails
    import re

    kids = _single_partition_children(plan)
    assert kids, (
        f"{name}: allowlisted in SINGLE_PARTITION_OK but its plan has no "
        f"Exchange SinglePartition — remove the stale entry:\n{plan}")
    pat = SINGLE_PARTITION_OK[name]
    for kid in kids:
        assert re.search(pat, kid), (
            f"{name}: Exchange SinglePartition sits above\n  {kid}\n"
            f"which does not match the pinned output-bounded shape "
            f"{pat!r} — the exchange is no longer (provably) "
            f"output-bounded:\n{plan}")


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


#: Exact plan fingerprints for the TOP-10 most expensive registry
#: queries by committed r13 sf0.1 median (VERDICT r13 #8): a plan
#: regression in the hot set — a broadcast silently degrading to
#: sort-merge, a new shuffle appearing in a pipeline stage — must fail
#: HERE, in the per-commit suite, not in a dedicated bench session.
#: Captured at sf0.001 / 8 shuffle partitions (the suite's fixture
#: config); counts are static-planner (pre-AQE), so they are
#: deterministic for fixed data + config. If a change to an operator
#: legitimately alters one of these plans, re-capture and update the
#: entry IN THE SAME COMMIT with a note on why the new plan is at
#: least as good. ``embedding_components`` pins all-zeros because its
#: registry entry returns a localCheckpoint (the iterative component
#: propagation runs at build) — the pin still catches a regression
#: that would surface recomputation into the returned plan.
HOT_SET_FINGERPRINTS = {
    # r15: lang/quality gate inlined (filter-only columns need no
    # join-back) + contamination scored over the undeduped %97 stream —
    # deletes the two embedded copies of the dedup+decontam chain
    # (formatted plan at sf0.1: 13 -> 4 shuffle exchanges, 16 -> 5
    # scans, 24 -> 6 hash aggregates; A/B 3.34 -> 1.94 s at sf1).
    # Results oracle-identical (157/157 gate in the same commit).
    "pipeline_pretraining": {"exchanges": 5, "broadcast_joins": 3,
                             "sort_merge_joins": 0, "nested_loop_joins": 0},
    "semantic_dedup_keep": {"exchanges": 2, "broadcast_joins": 0,
                            "sort_merge_joins": 1, "nested_loop_joins": 0},
    "incremental_dedup_keep": {"exchanges": 4, "broadcast_joins": 8,
                               "sort_merge_joins": 0, "nested_loop_joins": 0},
    "ngram_jaccard_pairs": {"exchanges": 9, "broadcast_joins": 4,
                            "sort_merge_joins": 3, "nested_loop_joins": 0},
    "embedding_components": {"exchanges": 0, "broadcast_joins": 0,
                             "sort_merge_joins": 0, "nested_loop_joins": 0},
    # r14 pristine-level attr resolution (model.Level.pristine): diced
    # dims resolve attributes against unrestricted level tables (the
    # base join restricts identically), dropping the per-level copies of
    # the filtered-base subtree — tpch_q5 27->18, tpch_q3 16->11
    # broadcasts, results oracle-identical (157/157 gate in the same
    # commit).
    "tpch_q5_local_supplier": {"exchanges": 3, "broadcast_joins": 18,
                               "sort_merge_joins": 0, "nested_loop_joins": 0},
    # r15: lang/quality branches rebased onto the raw table (pure
    # per-row functions of text; inner join on unique doc_id restricts
    # identically) — 3 content-hash aggregate towers -> 1 (A/B 2.65 ->
    # 1.89 s at sf1).
    "pipeline_clean_corpus": {"exchanges": 1, "broadcast_joins": 3,
                              "sort_merge_joins": 0, "nested_loop_joins": 0},
    "drill_across_month": {"exchanges": 6, "broadcast_joins": 5,
                           "sort_merge_joins": 1, "nested_loop_joins": 0},
    "quantile_bins": {"exchanges": 2, "broadcast_joins": 1,
                      "sort_merge_joins": 0, "nested_loop_joins": 0},
    "tpch_q3_shipping_priority": {"exchanges": 2, "broadcast_joins": 11,
                                  "sort_merge_joins": 0,
                                  "nested_loop_joins": 0},
}


@pytest.mark.parametrize("name", sorted(HOT_SET_FINGERPRINTS))
def test_hot_set_plan_fingerprint_pinned(spark, name):
    from data_cube_spark.plans import plan_report

    spark.catalog.clearCache()
    df = QUERIES[name](spark, SF)
    got = {k: v for k, v in plan_report(df).items()
           if k in HOT_SET_FINGERPRINTS[name]}
    assert got == HOT_SET_FINGERPRINTS[name], (
        f"{name}: hot-set plan fingerprint drifted — if the new plan is "
        f"intentional and at least as good, update HOT_SET_FINGERPRINTS "
        f"in this commit.\nexpected {HOT_SET_FINGERPRINTS[name]}\n"
        f"got      {got}")
