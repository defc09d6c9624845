"""Property-based differential testing (beyond the reference's fixed
fixtures, SURVEY.md §5): hypothesis generates random dice/collapse query
specs over a small dense cube; every query must match a pandas oracle.

The cube is built once per module (hypothesis examples must not rebuild
Spark state, so no function-scoped fixtures)."""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_cube_spark.build import from_table
from data_cube_spark.model import Measure
from data_cube_spark.selectors import AnyOf, C, Collapse, Range

DOMAIN = {"d1": [0, 1, 2], "d2": [0, 1, 2, 3], "d3": [0, 1, 2, 3, 4]}

_state: dict = {}


def _cube(spark):
    if "dc" not in _state:
        rows = [
            (a, b, c, float((a * 7 + b * 3 + c + r) % 11))
            for a in DOMAIN["d1"] for b in DOMAIN["d2"] for c in DOMAIN["d3"]
            for r in range(2)
        ]
        pdf = pd.DataFrame(rows, columns=["d1", "d2", "d3", "v"])
        sdf = spark.createDataFrame(pdf)
        _state["pdf"] = pdf
        _state["dc"] = from_table(
            sdf, {"d1": "d1", "d2": "d2", "d3": "d3"},
            [Measure("v", agg="sum"), Measure("n", "v", agg="count")],
        )
    return _state["dc"], _state["pdf"]


def _op_strategy(dim):
    vals = st.lists(st.sampled_from(DOMAIN[dim]), min_size=1, unique=True)
    bound = st.sampled_from(DOMAIN[dim])
    return st.one_of(
        st.none(),                                    # untouched
        st.tuples(st.just("dice"), vals),             # C(*values)
        st.tuples(st.just("collapse"), st.none()),    # Collapse()
        st.tuples(st.just("collapse_f"), vals),       # Collapse(dK=values)
        st.tuples(st.just("anyof"), st.tuples(vals, vals)),  # OR dice
        st.tuples(st.just("range"), st.tuples(bound, bound)),  # [lo, hi)
    )


@pytest.mark.usefixtures("spark")
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ops=st.fixed_dictionaries({d: _op_strategy(d) for d in DOMAIN}))
def test_random_query_matches_pandas_oracle(spark, ops):
    dc, pdf = _cube(spark)

    selectors = {}
    keep, mask = [], pd.Series(True, index=pdf.index)
    for dim, op in ops.items():
        if op is None:
            keep.append(dim)
            continue
        kind, vals = op
        if kind == "dice":
            selectors[dim] = C(*vals)
            mask &= pdf[dim].isin(vals)
            keep.append(dim)
        elif kind == "anyof":
            v1, v2 = vals
            selectors[dim] = AnyOf({dim: v1}, {dim: v2})
            mask &= pdf[dim].isin(sorted(set(v1) | set(v2)))
            keep.append(dim)
        elif kind == "range":
            lo, hi = vals  # lo > hi (empty) and lo == hi (empty) included
            selectors[dim] = C(**{dim: Range(lo, hi)})
            mask &= (pdf[dim] >= lo) & (pdf[dim] < hi)
            keep.append(dim)
        elif kind == "collapse":
            selectors[dim] = Collapse()
        else:
            selectors[dim] = Collapse(**{dim: vals})
            mask &= pdf[dim].isin(vals)

    got = dc.q(**selectors).fact.df
    rows = got.select(*keep, F.col("v").cast("double"), "n").collect()
    actual = sorted(tuple(r) for r in rows)

    sub = pdf[mask]
    if keep:
        oracle = sub.groupby(keep, as_index=False).agg(v=("v", "sum"), n=("v", "count"))
        expected = sorted(
            (*(int(t[c]) for c in keep), float(t["v"]), int(t["n"]))
            for t in oracle.to_dict("records")
        )
    else:
        # grand total over empty input = one all-null row (data.table
        # parity: x[0, .(sum(v))] is 1 row NA; Measure(fill=) opts out)
        expected = (
            [(float(sub["v"].sum()), int(sub["v"].count()))]
            if len(sub) else [(None, None)]
        )
    assert len(actual) == len(expected)
    for a, e in zip(actual, expected):
        assert a[:-2] == e[:-2]
        if e[-2] is None:
            assert a[-2] is None and a[-1] is None
        else:
            assert abs(a[-2] - e[-2]) < 1e-9 and a[-1] == e[-1]


# -- equi-depth binning invariants ------------------------------------------

@pytest.mark.usefixtures("spark")
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(st.integers(min_value=-50, max_value=50), min_size=4,
                     max_size=60),
       n_bins=st.integers(min_value=2, max_value=5))
def test_equi_depth_bins_invariants(spark, vals, n_bins):
    """For ANY input: bin counts sum to n; bin ids are a prefix of
    0..n_bins-1 in value order; value ranges of consecutive bins never
    overlap; equal values always land in the same bin."""
    from data_cube_spark.operators.stats import equi_depth_bins

    pdf = pd.DataFrame({"g": ["x"] * len(vals), "v": [float(v) for v in vals]})
    out = (equi_depth_bins(spark.createDataFrame(pdf), "v", n_bins, by=["g"])
           .orderBy("bin_id").collect())
    assert sum(r["n_rows"] for r in out) == len(vals)
    for a, b in zip(out, out[1:]):
        assert b["bin_id"] > a["bin_id"]
        assert b["bin_min"] > a["bin_max"]  # ties never split across bins


# -- incremental dedup partition invariant ----------------------------------

@pytest.mark.usefixtures("spark")
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=st.lists(
    st.sampled_from(["alpha beta gamma delta epsilon zeta",
                     "alpha beta gamma delta epsilon eta",
                     "one two three four five six seven",
                     "totally different content right here now"]),
    min_size=2, max_size=10))
def test_incremental_keep_partitions_batch(spark, texts):
    """kept ∪ dropped == batch, disjoint — and a batch doc is dropped iff
    it has an exact-Jaccard >= threshold match in the corpus."""
    from data_cube_spark.operators import dedup

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    batch = df.where(F.col("doc_id") % 2 == 1)
    corpus = df.where(F.col("doc_id") % 2 == 0)
    kept = {r["doc_id"] for r in dedup.incremental_dedup_keep(
        batch, corpus, threshold=0.5).collect()}
    dropped = {r["batch_id"] for r in dedup.incremental_ngram_pairs(
        batch, corpus, threshold=0.5).collect()}
    batch_ids = {r["doc_id"] for r in batch.collect()}
    assert kept | dropped == batch_ids
    assert kept & dropped == set()


# -- prefix-filtered exact similarity join -----------------------------------

_WORDS = ["the", "cat", "sat", "on", "a", "mat", "dog", "ran", "far", "near"]


@pytest.mark.usefixtures("spark")
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    texts=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=3, max_size=12)
        .map(" ".join),
        min_size=2, max_size=12),
    threshold=st.sampled_from([0.3, 0.5, 0.8]),
)
def test_jaccard_prefix_matches_exact_for_any_corpus(spark, texts, threshold):
    """For ANY corpus and threshold, prefix-filtered exact Jaccard equals
    the uncapped inverted-index join — pair set and values."""
    from data_cube_spark.operators import dedup

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    exact = {(r.id_a, r.id_b, round(r.jaccard, 9)) for r in
             dedup.ngram_jaccard_pairs(df, k=3, threshold=threshold,
                                       hash_shingles=True).collect()}
    pref = {(r.id_a, r.id_b, round(r.jaccard, 9)) for r in
            dedup.jaccard_pairs_prefix(df, k=3, threshold=threshold).collect()}
    assert pref == exact


# -- sampling invariants -----------------------------------------------------

@pytest.mark.usefixtures("spark")
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    weights=st.lists(st.floats(min_value=0.0, max_value=100.0,
                               allow_nan=False), min_size=1, max_size=25),
    n=st.integers(min_value=1, max_value=5),
)
def test_sample_weighted_n_invariants(spark, weights, n):
    """For ANY weight vector: the sample is a subset of positive-weight
    rows, has exactly min(n, #positive) rows, and is rerun-identical."""
    from data_cube_spark.operators.sampling import sample_weighted_n

    df = spark.createDataFrame(
        [(i, float(w)) for i, w in enumerate(weights)],
        "doc_id long, w double")
    out = {r.doc_id for r in sample_weighted_n(df, "w", n).collect()}
    positive = {i for i, w in enumerate(weights) if w > 0}
    assert out <= positive
    assert len(out) == min(n, len(positive))
    again = {r.doc_id for r in sample_weighted_n(df, "w", n).collect()}
    assert out == again


def test_sample_weighted_n_denormal_weight_ties(spark):
    """Regression (caught by the fuzz above in r6): denormal weights
    saturate ln(u)/w to -inf for EVERY such row — identical sort keys —
    so without the unique-key tie-break the selected set differed
    between reruns. With it, the draw must be rerun-identical and the
    tied rows must be chosen by ascending doc_id."""
    from data_cube_spark.operators.sampling import sample_weighted_n

    rows = [(i, 5e-324) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    runs = [
        {r.doc_id for r in sample_weighted_n(df, "w", 3).collect()}
        for _ in range(3)
    ]
    assert runs[0] == runs[1] == runs[2] == {0, 1, 2}


@pytest.mark.usefixtures("spark")
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    toks=st.lists(st.integers(min_value=1, max_value=50),
                  min_size=1, max_size=25),
    budget=st.integers(min_value=0, max_value=300),
)
def test_sample_token_budget_invariants(spark, toks, budget):
    """For ANY token-count vector and budget: kept sum <= budget, the
    draw is maximal in md5 order, and reruns are identical."""
    from data_cube_spark.operators.sampling import (draw_hex,
                                                    sample_token_budget)

    df = spark.createDataFrame(
        [(i, "g", int(t)) for i, t in enumerate(toks)],
        "doc_id long, grp string, toks long")
    out = sample_token_budget(df, "toks", {"g": float(budget)},
                              group_col="grp")
    kept = {r.doc_id for r in out.collect()}
    assert sum(toks[i] for i in kept) <= budget
    order = sorted((r["h"], r.doc_id, r.toks) for r in df.select(
        "doc_id", "toks", draw_hex("doc_id", "budget").alias("h")).collect())
    cum, expect = 0, set()
    for _, did, t in order:
        if cum + t > budget:
            break
        cum += t
        expect.add(did)
    assert kept == expect


# -- skew-aware join semantic invariant --------------------------------------

@pytest.mark.usefixtures("spark")
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    left_keys=st.lists(st.sampled_from(["a", "b", "c", "hot"]),
                       min_size=1, max_size=30),
    right_keys=st.lists(st.sampled_from(["a", "b", "hot", "x"]),
                        min_size=1, max_size=4, unique=True),
    min_share=st.sampled_from([0.0, 0.3, 0.9]),
    salt=st.sampled_from([1, 3, 5]),
)
def test_skew_aware_join_invariant(spark, left_keys, right_keys, min_share, salt):
    """For ANY key distribution, hot-share threshold, and salt factor:
    skew_aware_join(inner) is multiset-equal to the plain inner join —
    partial salting must never duplicate or drop a matched row."""
    from collections import Counter

    from data_cube_spark.operators.joins import skew_aware_join

    left = spark.createDataFrame(
        [(k, i) for i, k in enumerate(left_keys)], "k string, v int")
    right = spark.createDataFrame(
        [(k, hash(k) % 97) for k in right_keys], "k string, w int")
    plain = Counter((r.k, r.v, r.w) for r in left.join(right, "k").collect())
    out = Counter((r.k, r.v, r.w) for r in skew_aware_join(
        left, right, "k", top_n=3, min_share=min_share, salt=salt).collect())
    assert out == plain


# -- SCD2 merge == full rebuild for ANY changelog and ANY split -------------

@pytest.mark.usefixtures("spark")
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    changes=st.lists(
        st.tuples(st.integers(0, 5),          # key
                  st.integers(0, 9),          # day offset
                  st.sampled_from("abc")),    # attr value
        min_size=1, max_size=25),
    split_day=st.integers(0, 10),
)
def test_scd2_merge_equals_rebuild_any_changelog(spark, changes, split_day):
    """For ANY change log (duplicate (key, ts) rows included) and ANY
    early/late split — including empty sides — merging the late half
    into the early build equals building from the whole log."""
    from datetime import datetime

    from data_cube_spark.operators.scd import (
        scd2_from_changelog,
        scd2_merge_changes,
    )

    rows = [(k, datetime(2024, 1, 1 + d), s) for k, d, s in changes]
    log = spark.createDataFrame(rows, "k int, ts timestamp, seg string")
    cut = datetime(2024, 1, 1 + split_day)
    early = log.where(F.col("ts") < F.lit(cut))
    late = log.where(F.col("ts") >= F.lit(cut))
    full = scd2_from_changelog(log, "k", "ts")
    if early.count() == 0:
        merged = scd2_from_changelog(late, "k", "ts")
    else:
        merged = scd2_merge_changes(
            scd2_from_changelog(early, "k", "ts"), late, "k", "ts")
    assert sorted(map(tuple, merged.collect())) \
        == sorted(map(tuple, full.collect()))


# -- gap fill: coverage + conservation for ANY series -----------------------

@pytest.mark.usefixtures("spark")
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    points=st.lists(
        st.tuples(st.sampled_from("pq"),      # key
                  st.integers(0, 12),         # day offset
                  st.integers(-5, 5)),        # value
        min_size=1, max_size=30),
)
def test_gap_fill_invariants(spark, points):
    """For ANY series: every key covers exactly its [min, max] day span
    with no holes; zero-filled silent days; totals conserved."""
    from datetime import datetime, timedelta

    from data_cube_spark.operators.timeseries import gap_fill_daily

    rows = [(k, datetime(2024, 3, 1 + d, 12), float(v)) for k, d, v in points]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = gap_fill_daily(
        df, "ts", ["k"],
        aggs={"n": F.count(F.lit(1)), "s": F.sum("v")},
        fill={"n": 0, "s": 0.0},
    ).collect()
    by_key: dict = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r)
    truth_days: dict = {}
    truth_totals: dict = {}
    for k, d, v in points:
        truth_days.setdefault(k, set()).add(d)
        truth_totals[k] = truth_totals.get(k, 0.0) + v
    for k, rs in by_key.items():
        days = sorted(r.day for r in rs)
        lo, hi = min(truth_days[k]), max(truth_days[k])
        assert len(days) == hi - lo + 1 == len(set(days))  # no holes, no dups
        assert (days[-1] - days[0]).days == hi - lo
        assert sum(r.n for r in rs) == len([1 for kk, *_ in points if kk == k])
        assert abs(sum(r.s for r in rs) - truth_totals[k]) < 1e-9
        for r in rs:
            if r.n == 0:
                assert r.s == 0.0
    assert set(by_key) == set(truth_days)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    bins=st.lists(st.integers(min_value=0, max_value=50),
                  min_size=1, max_size=40),
    q=st.floats(min_value=0.01, max_value=0.99),
)
def test_histogram_percentile_fold_matches_naive(spark, bins, q):
    """The O(n_bins) cumulative fold in histogram_percentile must agree
    with the naive python prefix-sum definition (the upper edge of the
    first bin whose cumulative count reaches ceil(q * total)) for ANY
    bin-count array — including empty totals and all-mass-in-one-bin."""
    import math as _math

    from data_cube_spark.operators.stats import histogram_percentile

    n_bins = len(bins)
    lo, hi = 0.0, float(n_bins)  # bin width exactly 1.0
    df = spark.createDataFrame([(bins,)], "b array<bigint>")
    got = df.select(
        histogram_percentile("b", q, lo, hi, n_bins).alias("p")
    ).first()["p"]

    total = sum(bins)
    target = _math.ceil(q * total)
    cum, idx = 0, 0
    for b in bins:
        cum += b
        if cum < target:
            idx += 1
    want = lo + (idx + 1) * (hi - lo) / n_bins
    assert got == pytest.approx(want)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14),
                  st.floats(min_value=-1.0, max_value=1.0,
                            allow_nan=False)),
        min_size=1, max_size=60),
    k=st.integers(min_value=1, max_value=4),
)
def test_cap_pair_degree_matches_naive(spark, edges, k):
    """cap_pair_degree on ANY random graph equals the naive python
    reference: symmetrize, rank each node's edges by (score desc, other
    asc), keep an edge iff it is within EITHER endpoint's top-k."""
    from data_cube_spark.operators.similarity import cap_pair_degree

    seen = set()
    rows = []
    for a, b, s in edges:
        if a == b:
            continue
        a, b = min(a, b), max(a, b)
        if (a, b) in seen:
            continue
        seen.add((a, b))
        rows.append((a, b, round(s, 6)))
    if not rows:
        return
    df = spark.createDataFrame(rows, "id_a long, id_b long, cosine double")
    got = {(r["id_a"], r["id_b"])
           for r in cap_pair_degree(df, k).collect()}

    import collections
    adj = collections.defaultdict(list)
    for a, b, s in rows:
        adj[a].append((-s, b))
        adj[b].append((-s, a))
    top = {n: {o for _, o in sorted(es)[:k]} for n, es in adj.items()}
    want = {(a, b) for a, b, s in rows
            if b in top[a] or a in top[b]}
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    vecs=st.lists(st.lists(st.integers(min_value=-3, max_value=3),
                           min_size=4, max_size=4),
                  min_size=2, max_size=16),
    dups=st.integers(min_value=0, max_value=3),
    k=st.integers(min_value=1, max_value=3),
    thr=st.sampled_from([-0.5, 0.0, 0.3, 0.8]),
)
def test_blocked_pre_cap_matches_python_reference(spark, vecs, dups, k, thr):
    """The blocked tier's in-kernel per-row top-k (VERDICT r6 #1) on ANY
    random corpus equals the python reference for capping the FULL
    above-threshold graph: per node, rank edges by (score desc, other id
    asc), keep an edge iff it is within either endpoint's top-k.
    Duplicate vectors force exact cosine-1.0 boundary ties."""
    import numpy as np

    from data_cube_spark.operators.similarity import blocked_near_pairs

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    rows += [(1000 + j, rows[j % len(rows)][1]) for j in range(dups)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r["id_a"], r["id_b"])
           for r in blocked_near_pairs(df, thr, pre_cap=k).collect()}

    ids = np.array([r[0] for r in rows])
    order = np.argsort(ids)
    ids = ids[order]
    M = np.array([r[1] for r in rows], dtype="float64")[order]
    M /= np.maximum(np.sqrt((M * M).sum(axis=1)), 1e-300)[:, None]
    S = M @ M.T
    import collections
    adj = collections.defaultdict(list)
    n = len(ids)
    for i in range(n):
        for j in range(i + 1, n):
            if S[i, j] >= thr:
                adj[ids[i]].append((-S[i, j], ids[j]))
                adj[ids[j]].append((-S[i, j], ids[i]))
    top = {a: {o for _, o in sorted(es)[:k]} for a, es in adj.items()}
    want = set()
    for i in range(n):
        for j in range(i + 1, n):
            if S[i, j] >= thr and (ids[j] in top[ids[i]]
                                   or ids[i] in top[ids[j]]):
                want.add((int(ids[i]), int(ids[j])))
    if got != want:
        # Divergence is legitimate ONLY as fp-noise tie resolution: the
        # reference's driver BLAS (M @ M.T) may fuse multiply-adds where
        # the worker kernel's GEMM does not (or vice versa), perturbing
        # an exactly-tied score by ~1e-16 and flipping the
        # (score desc, id asc) tie-break — observed r15 with
        # vecs=[[0,0,0,0],[0,0,1,-1],[0,0,-1,-1]], k=1: S[1,2] is 0.0
        # exactly without FMA, +eps with, which swaps (0,2) for (1,2)
        # in a k=1 cap. Accept got iff it is a VALID capping under SOME
        # resolution of eps-ties: every edge that survives under EVERY
        # resolution must be kept (must), every kept edge must survive
        # under SOME resolution (allowed). For well-separated scores
        # must == allowed == want, so this degrades to exact equality.
        eps = 1e-9
        pair_s = {(int(ids[i]), int(ids[j])): S[i, j]
                  for i in range(n) for j in range(i + 1, n)
                  if S[i, j] >= thr - eps}
        node_scores = collections.defaultdict(list)
        for (a, b), s in pair_s.items():
            node_scores[a].append(s)
            node_scores[b].append(s)

        def n_at_least(a, s):
            return sum(1 for x in node_scores[a] if x >= s - eps)

        def n_strictly_better(a, s):
            return sum(1 for x in node_scores[a] if x > s + eps)

        must = {p for p, s in pair_s.items()
                if s >= thr + eps and (n_at_least(p[0], s) <= k
                                       or n_at_least(p[1], s) <= k)}
        allowed = {p for p, s in pair_s.items()
                   if n_strictly_better(p[0], s) < k
                   or n_strictly_better(p[1], s) < k}
        assert must <= got <= allowed, (got, want, must, allowed)


_APX_SEQ = [0]


@pytest.mark.usefixtures("spark")
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    corpus_texts=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=10)
        .map(" ".join),
        min_size=1, max_size=8),
    extra_texts=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=10)
        .map(" ".join),
        min_size=1, max_size=8),
    batch_texts=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=10)
        .map(" ".join),
        min_size=1, max_size=8),
    threshold=st.sampled_from([0.4, 0.6]),
)
def test_append_prefix_index_exact_for_any_corpus(
        spark, corpus_texts, extra_texts, batch_texts, threshold):
    """VERDICT r8 #1 property bar: for ANY corpus / appended batch /
    query batch (including docs too short to shingle), reading an
    APPENDED prefix index equals the inline exact R x S operator over
    the grown corpus — the frozen order never costs exactness."""
    from data_cube_spark.operators import dedup

    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus_texts)],
        "doc_id long, text string")
    extra = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(extra_texts)],
        "doc_id long, text string")
    batch = spark.createDataFrame(
        [(2000 + i, t) for i, t in enumerate(batch_texts)],
        "doc_id long, text string")
    _APX_SEQ[0] += 1
    tag = f"t_apxp_{_APX_SEQ[0]}"
    try:
        dedup.write_prefix_index(corpus, tag, n_buckets=2,
                                 threshold=threshold)
        dedup.append_prefix_index(extra, tag)
        got = sorted(map(tuple, dedup.incremental_prefix_pairs_indexed(
            batch, tag, threshold=threshold).collect()))
        want = sorted(map(tuple, dedup.jaccard_pairs_prefix_rs(
            batch, corpus.unionByName(extra),
            threshold=threshold).collect()))
        assert got == want
        # and the member tables stay structurally consistent
        dedup.check_prefix_consistency(spark, tag)
    finally:
        for s in ("_prefix", "_df", "_sets"):
            spark.sql(f"DROP TABLE IF EXISTS {tag}{s}")


# -- append == rebuild for the OTHER appendable index kinds (VERDICT r9 #2) --
#
# The prefix property above is the strongest correctness pattern in the
# suite (it caught the frozen-parameter drift class before any driver
# window could). These extend it to every other appendable index:
# minhash and embedding appends are exactly rebuild-equivalent (all
# hashing/geometry is deterministic and frozen in the stamp), so the
# indexed read after append must equal BOTH a full rebuild and the
# inline operator; IVF appends keep centroids frozen by design (a
# rebuild retrains), so its bar is stronger than rebuild-equality:
# probe-ALL serving over the appended index must equal exact
# brute-force cosine top-k over the grown corpus.

_MHX_SEQ = [0]


@pytest.mark.usefixtures("spark")
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    corpus_texts=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=10)
        .map(" ".join),
        min_size=1, max_size=8),
    extra_texts=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=10)
        .map(" ".join),
        min_size=1, max_size=8),
    batch_texts=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=10)
        .map(" ".join),
        min_size=1, max_size=8),
    threshold=st.sampled_from([0.3, 0.6]),
)
def test_append_minhash_index_exact_for_any_corpus(
        spark, corpus_texts, extra_texts, batch_texts, threshold):
    """For ANY corpus / appended batch / query batch (short docs with no
    shingles included), reading an APPENDED minhash index equals a full
    rebuild over the grown corpus AND the inline operator — signatures
    are deterministic affine hashes, so append==rebuild is bit-for-bit,
    and the member tables stay in sync."""
    from data_cube_spark.operators import dedup

    mh = dict(num_hashes=16, bands=4, k=3)
    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus_texts)],
        "doc_id long, text string")
    extra = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(extra_texts)],
        "doc_id long, text string")
    batch = spark.createDataFrame(
        [(2000 + i, t) for i, t in enumerate(batch_texts)],
        "doc_id long, text string")
    grown = corpus.unionByName(extra)
    _MHX_SEQ[0] += 1
    tag = f"t_mhp_{_MHX_SEQ[0]}"
    try:
        dedup.write_minhash_index(corpus, tag, n_buckets=2, **mh)
        dedup.append_to_minhash_index(extra, tag, **mh)
        got = sorted(map(tuple, dedup.incremental_minhash_pairs_indexed(
            batch, tag, threshold=threshold, **mh).collect()))
        dedup.write_minhash_index(grown, f"{tag}_rb", n_buckets=2, **mh)
        rebuilt = sorted(map(tuple, dedup.incremental_minhash_pairs_indexed(
            batch, f"{tag}_rb", threshold=threshold, **mh).collect()))
        inline = sorted(map(tuple, dedup.incremental_minhash_pairs(
            batch, dedup.minhash_signatures(
                grown, num_hashes=mh["num_hashes"], k=mh["k"]),
            threshold=threshold, num_hashes=mh["num_hashes"],
            bands=mh["bands"], k=mh["k"]).collect()))
        assert got == rebuilt == inline
        dedup.check_member_sync(spark, f"{tag}_sig", f"{tag}_bands")
        assert dedup.compact_minhash_index(spark, tag) == 0  # no dups
    finally:
        for t in (tag, f"{tag}_rb"):
            for s in ("_sig", "_bands"):
                spark.sql(f"DROP TABLE IF EXISTS {t}{s}")


def _vec_lists(min_size, max_size, id_base):
    """Distinct-id dim-4 integer vectors; all-zero vectors filtered (no
    zero-norm guard in with_norm — cosine is undefined there)."""
    return st.lists(
        st.lists(st.integers(min_value=-3, max_value=3),
                 min_size=4, max_size=4).filter(lambda v: any(v)),
        min_size=min_size, max_size=max_size,
    ).map(lambda vs: [(id_base + i, [float(x) for x in v])
                      for i, v in enumerate(vs)])


_EBX_SEQ = [0]


@pytest.mark.usefixtures("spark")
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    corpus_vecs=_vec_lists(1, 10, 0),
    extra_vecs=_vec_lists(1, 10, 1000),
    batch_vecs=_vec_lists(1, 6, 2000),
    threshold=st.sampled_from([0.0, 0.5]),
)
def test_append_embedding_index_equals_rebuild_any_corpus(
        spark, corpus_vecs, extra_vecs, batch_vecs, threshold):
    """For ANY vector corpus / appended batch / query batch, reading an
    APPENDED embedding index equals a full rebuild over the grown corpus
    at the same (frozen, stamped) geometry — the seeded hyperplanes make
    bucketing deterministic, so the pair set and cosines agree — and the
    member tables stay in sync (compaction removes nothing)."""
    from data_cube_spark.operators import similarity

    geo = dict(n_planes=3, n_tables=4, dim=4)
    schema = "vec_id long, embedding array<double>"
    corpus = spark.createDataFrame(corpus_vecs, schema)
    extra = spark.createDataFrame(extra_vecs, schema)
    batch = spark.createDataFrame(batch_vecs, schema)
    _EBX_SEQ[0] += 1
    tag = f"t_ebp_{_EBX_SEQ[0]}"
    try:
        similarity.write_embedding_index(corpus, tag, n_buckets=2,
                                         recall_floor=None, **geo)
        similarity.append_to_embedding_index(extra, tag)
        got = sorted(
            (r["batch_id"], r["corpus_id"], round(r["cosine"], 9))
            for r in similarity.incremental_embedding_pairs_indexed(
                batch, tag, threshold).collect())
        similarity.write_embedding_index(
            corpus.unionByName(extra), f"{tag}_rb", n_buckets=2,
            recall_floor=None, **geo)
        rebuilt = sorted(
            (r["batch_id"], r["corpus_id"], round(r["cosine"], 9))
            for r in similarity.incremental_embedding_pairs_indexed(
                batch, f"{tag}_rb", threshold).collect())
        assert got == rebuilt
        assert similarity.compact_embedding_index(spark, tag) == 0
    finally:
        for t in (tag, f"{tag}_rb"):
            for s in ("_buckets", "_vec"):
                spark.sql(f"DROP TABLE IF EXISTS {t}{s}")


_IVX_SEQ = [0]


@pytest.mark.usefixtures("spark")
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    corpus_vecs=_vec_lists(2, 8, 0),
    extra_vecs=_vec_lists(1, 8, 1000),
    query_vecs=_vec_lists(1, 3, 2000),
    k=st.integers(min_value=1, max_value=3),
)
def test_append_ivf_index_probe_all_is_exact(
        spark, corpus_vecs, extra_vecs, query_vecs, k):
    """IVF's append bar is STRONGER than rebuild-equality (a rebuild
    retrains centroids by design): after appending to frozen centroids,
    probe-ALL serving must equal exact brute-force cosine top-k over the
    grown corpus — cell assignment can drift recall at small n_probe,
    never coverage. Near-ties at the k boundary are assumed away (tier
    float paths differ in the last ulp, documented in
    ann_ivf_topk_indexed); a deterministic per-row jitter keeps them
    rare."""
    import numpy as np
    from hypothesis import assume

    from data_cube_spark.operators import similarity

    # index-dependent jitter breaks exact collinearity between rows
    # (duplicate directions would tie at cosine 1.0)
    def jitter(rows):
        return [(i, [v[0] + (i % 97) * 1e-3] + v[1:]) for i, v in rows]

    corpus_vecs, extra_vecs, query_vecs = (
        jitter(corpus_vecs), jitter(extra_vecs), jitter(query_vecs))
    schema = "vec_id long, embedding array<double>"
    corpus = spark.createDataFrame(corpus_vecs, schema)
    extra = spark.createDataFrame(extra_vecs, schema)
    queries = spark.createDataFrame(query_vecs, schema)

    grown = corpus_vecs + extra_vecs
    ids = np.array([i for i, _ in grown])
    M = np.array([v for _, v in grown], dtype="float64")
    M /= np.sqrt((M * M).sum(axis=1))[:, None]
    oracle = {}
    for qid, qv in query_vecs:
        qn = np.array(qv) / np.linalg.norm(qv)
        cos = M @ qn
        order = np.lexsort((ids, -cos))
        top = [(int(ids[j]), float(cos[j])) for j in order[: k + 1]]
        # tie-free at every boundary the assertion depends on
        assume(all(a[1] - b[1] > 1e-6 for a, b in zip(top, top[1:])))
        oracle[qid] = top[:k]

    _IVX_SEQ[0] += 1
    tag = f"t_ivp_{_IVX_SEQ[0]}"
    try:
        similarity.write_ivf_index(corpus, tag, n_cells=3, n_buckets=2)
        similarity.append_to_ivf_index(extra, tag)
        got: dict = {}
        for r in similarity.ann_ivf_topk_indexed(
                queries, tag, k=k, n_probe=64).collect():
            got.setdefault(r["query_id"], []).append(
                (r["rank"], r["match_id"], r["cosine"]))
        assert set(got) == set(oracle)
        for qid, want in oracle.items():
            have = sorted(got[qid])
            assert [(m, r) for r, m, _ in have] == \
                [(m, r + 1) for r, (m, _) in enumerate(want)]
            for (_, _, c), (_, wc) in zip(have, want):
                assert c == pytest.approx(wc, abs=1e-9)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tag}_cells")
        spark.sql(f"DROP TABLE IF EXISTS {tag}_centroids")
