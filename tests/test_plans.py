"""Physical-plan assertions: the scale contract. These tests pin the plans
we ship — broadcast star joins (no fact shuffle), literal pushdown reaching
the parquet scan, bounded exchange counts — so a regression that would hurt
at 100 TB fails CI at 6k rows."""

from pyspark.sql import functions as F

from data_cube_spark import C, Collapse
from data_cube_spark.export import denormalize
from data_cube_spark.plans import (
    count_exchanges,
    explain_str,
    has_broadcast_join,
    has_sort_merge_join,
    pushed_filters,
    read_schema_columns,
)


import pytest


@pytest.fixture(autouse=True)
def _no_cache(spark):
    """Spark's cache manager substitutes InMemoryRelation for any logical
    plan equal to a persisted one — which would hide the parquet scans these
    tests assert on. Run this module cache-free."""
    spark.catalog.clearCache()
    yield


def test_denormalize_uses_broadcast_joins_only(cube_cold):
    df = denormalize(cube_cold)
    assert has_broadcast_join(df)
    assert not has_sort_merge_join(df), (
        "star join must broadcast dimensions, never shuffle the fact:\n"
        + explain_str(df, "simple")
    )


def test_key_dice_pushes_literals_to_scan(cube_cold):
    q = cube_cold.q(supplier=C(0, 1, 2), part=Collapse(), orders=Collapse())
    pf = pushed_filters(q.fact.df)
    assert "l_suppkey" in pf, f"expected suppkey isin pushdown, got: {pf}"


def test_range_dice_pushes_comparison_to_scan(cube_cold):
    """A Range on the dimension key becomes comparison PushedFilters on the
    FACT scan — structural pushdown, not optimizer-dependent."""
    from data_cube_spark.selectors import Range

    q = cube_cold.q(supplier=Range(lo=0, hi=5), part=Collapse(), orders=Collapse())
    pf = pushed_filters(q.fact.df)
    assert "GreaterThanOrEqual(l_suppkey" in pf and "LessThan(l_suppkey" in pf, pf


def test_aggregate_prunes_fact_columns(cube_cold):
    out = cube_cold.aggregate(["supplier.r_name"]).select("r_name", "revenue")
    cols = read_schema_columns(out)
    # fact scan must not read unrelated measures' source columns
    assert "l_quantity" in cols or "l_extendedprice" in cols  # measures built at scan
    assert "l_shipdate" not in cols
    assert "l_returnflag" not in cols


def test_attr_dice_does_not_shuffle_fact(cube_cold):
    """Attribute filter = broadcast semi-join; the only exchange allowed is
    the final aggregation shuffle."""
    q = cube_cold.q(supplier=C(r_name=["EUROPE"]), part=Collapse(), orders=Collapse())
    df = q.fact.df
    n = count_exchanges(df)
    assert n <= 2, explain_str(df, "simple")


def test_collapse_single_aggregation(cube_cold):
    q = cube_cold.apply(["supplier"])
    assert count_exchanges(q.fact.df) <= 2


def test_broadcast_gate_suppresses_hint_on_large_dim(spark, tables):
    """The broadcast size gate (VERDICT r1 'What's wrong #1'): a dimension
    declared beyond BROADCAST_MAX_ROWS must produce NO broadcast hint in the
    q() plan (the semi-join is left to AQE); the same dimension without the
    size class keeps the hint. Checked on the logical plan so the assertion
    is independent of what the physical planner picks for tiny test data."""
    from data_cube_spark.model import DataCube, Dimension, Fact, Measure
    from data_cube_spark.plans import has_broadcast_hint

    orders = tables["orders"]
    fact = Fact.build(
        orders.select("o_orderkey", "o_totalprice"), ["o_orderkey"],
        [Measure("total", F.col("o_totalprice").cast("double"), agg="sum")],
    )

    def dice(dim):
        dc = DataCube(fact, {"orders": dim})
        return dc.q(orders=C(o_orderpriority=["1-URGENT"])).fact.df

    base = tables["orders"].select("o_orderkey", "o_orderpriority")
    big = dice(Dimension("orders", "o_orderkey", base, approx_rows=10_000_000))
    small = dice(Dimension("orders", "o_orderkey", base))
    assert not has_broadcast_hint(big), "size gate must suppress the broadcast hint"
    assert has_broadcast_hint(small), "broadcast-sized dims must keep the hint"
    # strategy never changes results — same rows either way
    assert sorted(map(tuple, big.collect())) == sorted(map(tuple, small.collect()))


def test_broadcast_gate_in_denormalize_and_attr_agg(spark):
    """denormalize() and aggregate() star joins obey the same gate; the
    driver star cube keeps its hints at bench scale (orders << gate)."""
    from data_cube_spark.model import BROADCAST_MAX_ROWS
    from data_cube_spark.plans import has_broadcast_hint
    from data_cube_spark.sources.star import tpch_cube

    dc = tpch_cube(spark, "/root/testdata/sf0.001")
    assert dc.dims["orders"].approx_rows is not None
    assert dc.dims["orders"].broadcastable  # tiny at test scale
    assert has_broadcast_hint(denormalize(dc))

    # re-class the orders dim as beyond-gate and check every join path
    big = dict(dc.dims)
    big_orders = big["orders"]
    big_orders = type(big_orders)(
        big_orders.name, big_orders.key, big_orders.base, big_orders.levels,
        big_orders.hierarchies, approx_rows=BROADCAST_MAX_ROWS + 1,
    )
    dc_big = type(dc)(dc.fact, {**big, "orders": big_orders})
    only_small = dc_big.denormalize(dims=["orders"])
    assert not has_broadcast_hint(only_small)
    agg = dc_big.aggregate(["orders.cr_name"])
    assert not has_broadcast_hint(agg)
    # ...while the small dims still hint
    assert has_broadcast_hint(dc_big.denormalize(dims=["part", "supplier"]))


def test_lsh_pair_source_never_cross_joins(tables):
    """The production pair source behind embedding_components /
    semantic_dedup_keep must be a bucketed equi-join — no CartesianProduct,
    no BroadcastNestedLoopJoin anywhere in the plan (VERDICT r1 #3)."""
    from data_cube_spark.operators import similarity

    pairs = similarity.lsh_near_pairs(tables["embeddings"], 0.35,
                                      n_planes=4, n_tables=48)
    plan = explain_str(pairs, "simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_near_pairs_dispatch_both_tiers(tables):
    """near_pairs below the gate plans a join-free mapInPandas block scan;
    above the gate it takes the LSH equi-join path. Neither tier ever
    cross-joins."""
    from data_cube_spark.model import BROADCAST_MAX_ROWS
    from data_cube_spark.operators import similarity

    emb = tables["embeddings"]
    small = similarity.near_pairs(emb, 0.35, corpus_rows=500)
    plan_small = explain_str(small, "simple")
    assert "Join" not in plan_small and "Exchange" not in plan_small, plan_small

    # uncapped=True: this declared corpus size is past the r9 Θ(n²)
    # guard gate, and the test pins tier dispatch, not the cap
    big = similarity.near_pairs(emb, 0.35, n_planes=4, n_tables=8,
                                corpus_rows=BROADCAST_MAX_ROWS + 1,
                                uncapped=True)
    plan_big = explain_str(big, "simple")
    assert "CartesianProduct" not in plan_big, plan_big
    assert "BroadcastNestedLoopJoin" not in plan_big, plan_big
    assert "Join" in plan_big  # the bucketed equi-join tier


def test_tpch_breadth_plans_never_cartesian(spark):
    """The ten TPC-H breadth queries: no unbounded nested-loop joins.
    The only BroadcastNestedLoopJoin allowed is the intended 1-row scalar
    subquery join (q22 avg-balance cross join); everything else must plan
    as hash/sort-merge equi-joins."""
    from data_cube_spark import registry

    one_row_scalar_ok = {"tpch_q22_idle_balance"}
    names = [
        "tpch_q4_priority_returns", "tpch_q7_volume_shipping",
        "tpch_q8_market_share", "tpch_q10_returned_items",
        "tpch_q13_order_distribution", "tpch_q15_top_supplier",
        "tpch_q17_small_qty_revenue", "tpch_q18_large_orders",
        "tpch_q19_disjunctive_revenue", "tpch_q22_idle_balance",
    ]
    for name in names:
        df = registry.QUERIES[name](spark, "/root/testdata/sf0.001")
        plan = explain_str(df, "simple")
        assert "CartesianProduct" not in plan, f"{name}:\n{plan}"
        if name not in one_row_scalar_ok:
            assert "BroadcastNestedLoopJoin" not in plan, f"{name}:\n{plan}"


def test_tpch_breadth_small_dims_broadcast(spark):
    """Star-shaped breadth queries broadcast their small dimension sides
    (part/nation/supplier) instead of shuffling the fact."""
    from data_cube_spark import registry

    for name in ("tpch_q7_volume_shipping", "tpch_q8_market_share",
                 "tpch_q10_returned_items", "tpch_q19_disjunctive_revenue"):
        df = registry.QUERIES[name](spark, "/root/testdata/sf0.001")
        assert has_broadcast_join(df), explain_str(df, "simple")


def test_bucketed_join_has_zero_exchanges(spark, tables, tmp_path):
    """Co-located storage: two tables bucketed on the join key produce an
    exchange-free join plan (the write-time shuffle replaces every
    query-time shuffle), a same-key aggregate after the join is ALSO
    exchange-free, and the writer emits exactly one file per bucket (the
    layout the sorted-scan optimization requires)."""
    import glob as _glob

    from data_cube_spark.sources.ingest import write_bucketed

    write_bucketed(tables["lineitem"].select("l_orderkey", "l_quantity"),
                   "t_li_bucketed", ["l_orderkey"], n_buckets=8,
                   path=str(tmp_path / "li"))
    write_bucketed(tables["orders"].select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"),
        "t_o_bucketed", ["l_orderkey"], n_buckets=8,
        path=str(tmp_path / "o"))
    assert len(_glob.glob(str(tmp_path / "li" / "*.parquet"))) == 8
    assert len(_glob.glob(str(tmp_path / "o" / "*.parquet"))) == 8
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("t_li_bucketed").join(spark.table("t_o_bucketed"), "l_orderkey")
        assert count_exchanges(j) == 0, explain_str(j, "simple")
        agg = j.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
        assert count_exchanges(agg) == 0, explain_str(agg, "simple")
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_li_bucketed")
        spark.sql("DROP TABLE IF EXISTS t_o_bucketed")


def test_chunk_documents_no_exchange(spark):
    """Chunking is a pure per-row explode: zero shuffles, and only the
    two needed columns are read from the scan."""
    from data_cube_spark import registry

    df = registry.QUERIES["chunk_documents"](spark, "/root/testdata/sf0.001")
    assert count_exchanges(df) == 0, explain_str(df, "simple")
    cols = read_schema_columns(df)
    assert set(cols) <= {"doc_id", "text"}, cols


def test_split_assign_no_exchange(spark):
    """Split assignment is a per-row CASE on the md5 draw — no shuffle."""
    from data_cube_spark import registry

    df = registry.QUERIES["split_assign"](spark, "/root/testdata/sf0.001")
    assert count_exchanges(df) == 0, explain_str(df, "simple")


def test_domain_cap_single_group_shuffle(spark):
    """The per-source cap shuffles once on the group key (hash exchange
    for the window), nothing else."""
    from data_cube_spark import registry

    df = registry.QUERIES["domain_cap"](spark, "/root/testdata/sf0.001")
    assert count_exchanges(df) == 1, explain_str(df, "simple")


def test_shuffle_order_uses_range_partitioning(spark):
    """Global shuffle positions come from two-stage ranking: the plan
    range-partitions on the draw — never a single-partition global
    window (which would appear as an Exchange SinglePartition)."""
    from data_cube_spark import registry

    from data_cube_spark import functions as fns

    df = registry.QUERIES["shuffle_order"](spark, "/root/testdata/sf0.001")
    # the positions frame is localCheckpoint'ed (lineage pinned so _mid
    # can't be reassigned on recompute), so the range exchange lives in
    # the recorded pre-checkpoint plan, not the returned frame's
    pre = fns.LAST_DENSE_POSITIONS_PLAN
    assert "rangepartitioning" in pre.lower(), pre
    assert "SinglePartition" not in pre, pre
    plan = explain_str(df, "simple")
    assert "SinglePartition" not in plan, plan


def test_grouping_sets_expand_only_requested(spark):
    """Native groupingSets: one Expand with exactly the 3 requested
    projections (cube(3 cols)+filter would expand 8), one shuffle."""
    from data_cube_spark import registry

    df = registry.QUERIES["grouping_sets_explicit"](spark, "/root/testdata/sf0.001")
    plan = explain_str(df, "extended")
    assert plan.count("Expand") >= 1, plan
    # the Expand operator lists its projections; count the set rows in
    # the optimized logical plan's Expand arg (3 sets requested)
    import re
    m = re.search(r"Expand \[\[(.*?)\]\], ", plan.replace("\n", " "))
    assert m, plan
    n_sets = m.group(1).count("], [") + 1
    assert n_sets == 3, f"expected 3 grouping sets, got {n_sets}"


def test_funnel_single_shuffle_no_joins(spark, tables):
    """k funnel steps must cost ONE user-key shuffle (stacked windows over
    the same partitioning), plus the final 1-row reduce — never the naive
    per-step join+aggregate rounds."""
    from data_cube_spark.operators.funnel import funnel_conversion

    df = funnel_conversion(tables["events"], ["view", "click", "purchase"])
    plan = explain_str(df, "simple")
    assert "Join" not in plan, plan
    assert count_exchanges(df) <= 2, plan


def test_shuffle_order_lean_plan(spark, tables):
    """Global shuffle positions: one range exchange (plus the persisted
    scan) — no dedupe shuffle, no join-back, no Exchange SinglePartition."""
    from data_cube_spark.operators.sampling import shuffle_positions

    df = shuffle_positions(tables["documents"])
    plan = explain_str(df, "simple")
    assert "Join" not in plan, plan
    assert "SinglePartition" not in plan, plan
    assert count_exchanges(df) <= 2, plan


def test_pipeline_pretraining_plan_bounded(spark, tables):
    """The composite pretraining plan must stay join-sane: no cartesian
    products or nested-loop joins anywhere, and the only window sort is
    the per-shard packing window."""
    from data_cube_spark.registry import QUERIES

    spark.catalog.clearCache()
    df = QUERIES["pipeline_pretraining"](spark, "/root/testdata/sf0.001")
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # column pruning: the documents scan must read only what the stages
    # consume (doc_id + text), not the whole table
    cols = read_schema_columns(df)
    assert "text" in cols and "doc_id" in cols
    assert "source" not in cols and "n_chars" not in cols, cols


def test_incremental_dedup_no_corpus_self_join(spark, tables):
    """Incremental pair sources must never self-join the corpus: plans
    contain only batch-x-corpus hash joins, no cartesian shapes."""
    from data_cube_spark.operators import dedup

    docs = tables["documents"]
    batch = docs.where(F.col("doc_id") % 2 == 1)
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    p1 = explain_str(dedup.incremental_ngram_pairs(batch, corpus), "simple")
    sigs = dedup.minhash_signatures(corpus)
    p2 = explain_str(dedup.incremental_minhash_pairs(batch, sigs), "simple")
    for plan in (p1, p2):
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_dpp_prunes_fact_partitions(spark, tables, tmp_path):
    """Joining a hive-partitioned fact to a runtime-only dim (aggregate-
    derived busy days) must trigger dynamic partition pruning: the fact
    scan's PartitionFilters carry a dynamicpruningexpression, and only
    the matching date directories are read."""
    path = str(tmp_path / "events_bydate")
    ev = tables["events"].withColumn("event_date", F.to_date(F.col("ts")))
    ev.write.partitionBy("event_date").parquet(path)
    fact = spark.read.parquet(path)
    cal = fact.groupBy("event_date").agg(F.count(F.lit(1)).alias("n_day"))
    mx = cal.agg(F.max("n_day")).collect()[0][0]
    busy = cal.where(F.col("n_day") >= 0.8 * float(mx))
    j = fact.join(F.broadcast(busy.select("event_date")), "event_date")
    out = j.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    scan_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert any("dynamicpruningexpression" in l for l in scan_lines), plan
    # and the pruned result equals the direct filter
    days = [r.event_date for r in busy.select("event_date").collect()]
    assert 0 < len(days)
    direct = (ev.where(F.col("event_date").isin(days))
              .groupBy("event_type").agg(F.count(F.lit(1)).alias("n")))
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, direct.collect()))


def test_bloom_runtime_filter_prunes_smj_probe_side(spark, tables):
    """Runtime bloom-filter join pruning: when BOTH sides are too big to
    broadcast (threshold forced off) and the build side is selectively
    filtered, Spark injects a bloom_filter_agg on the build side and a
    might_contain probe into the fact scan — rows drop BEFORE the
    shuffle. Negative case: with the default thresholds (creation side
    <= 10MB, application-side scan >= 10GB) the tiny test tables do NOT
    qualify and no filter is injected — the rule is explicitly
    size-gated, correct behavior at both scales."""
    li = tables["lineitem"]
    orders = tables["orders"]
    sel = orders.where(F.col("o_orderpriority") == "1-URGENT")
    j = li.join(sel, li["l_orderkey"] == sel["o_orderkey"])
    out = j.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))

    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in ("spark.sql.autoBroadcastJoinThreshold",
                  "spark.sql.optimizer.runtime.bloomFilter.enabled",
                  "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
                  "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    }
    try:
        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB")
        conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")

        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan_smj = out._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan_smj, plan_smj
        assert "might_contain" in plan_smj, plan_smj
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)

    # negative: default size thresholds gate the rule out on tiny tables
    # (rebuild the frame — a Dataset caches its analyzed plan)
    j2 = li.join(sel, li["l_orderkey"] == sel["o_orderkey"])
    out2 = j2.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
    plan_default = out2._jdf.queryExecution().executedPlan().toString()
    assert "bloom_filter_agg" not in plan_default


def test_plan_report_fields(spark, cube_cold, tables):
    """plan_report summarizes the scale-relevant plan facts: the star
    query shows broadcast joins + pushdown and no nested loops; a
    deliberately cross-joined frame is called out."""
    from data_cube_spark.plans import plan_report

    q = cube_cold.q(supplier=C(0, 1, 2), part=Collapse(), orders=Collapse())
    rep = plan_report(q.fact.df)
    assert rep["nested_loop_joins"] == 0
    assert rep["pushed_filters"] is True
    assert rep["scans"] >= 1
    assert rep["exchanges"] >= 0

    bad = tables["region"].crossJoin(tables["nation"])
    assert plan_report(bad)["nested_loop_joins"] >= 1


def test_minhash_index_corpus_side_exchange_free(spark, tables, tmp_path):
    """The persisted LSH index (write_minhash_index) makes the corpus
    side of the per-batch candidate join exchange-free: the bands table
    is bucketed on the (band_id, band_hash) join key, so only the batch
    side shuffles — and the indexed operator returns exactly the inline
    operator's pairs."""
    from data_cube_spark.operators import dedup

    docs = tables["documents"]
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    batch = docs.where(F.col("doc_id") % 2 == 1)
    try:
        dedup.write_minhash_index(corpus, "t_mh_idx", n_buckets=8,
                                  path=str(tmp_path / "idx"))
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            # candidate join in isolation: batch bands vs the index table
            sig_b = dedup.minhash_signatures(batch).localCheckpoint()
            bb = dedup.banded_buckets(sig_b).select(
                F.col("doc_id").alias("batch_id"), "band_id", "band_hash")
            j = bb.join(spark.table("t_mh_idx_bands"),
                        ["band_id", "band_hash"])
            # exactly ONE exchange: the batch side repartitioning to the
            # index's bucketing; the corpus scan itself is exchange-free
            assert count_exchanges(j) == 1, explain_str(j, "simple")
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

        got = dedup.incremental_minhash_pairs_indexed(
            batch, "t_mh_idx", threshold=0.3)
        sigs = dedup.minhash_signatures(corpus).localCheckpoint()
        want = dedup.incremental_minhash_pairs(batch, sigs, threshold=0.3)
        assert sorted(map(tuple, got.collect())) \
            == sorted(map(tuple, want.collect()))
        assert want.count() > 0  # non-vacuous
    finally:
        spark.sql("DROP TABLE IF EXISTS t_mh_idx_bands")
        spark.sql("DROP TABLE IF EXISTS t_mh_idx_sig")


def test_minhash_index_append_refresh(spark, tables, tmp_path):
    """append_to_minhash_index folds survivors into the persisted index
    (the compaction-cadence refresh): after the append, the indexed
    operator sees exactly the pairs the inline operator computes over
    the ENLARGED corpus, and the bands table stays bucketed (the
    candidate join still plans with a single batch-side exchange)."""
    from data_cube_spark.operators import dedup

    docs = tables["documents"]
    corpus = docs.where(F.col("doc_id") % 4 == 0)
    extra = docs.where(F.col("doc_id") % 4 == 2)
    batch = docs.where(F.col("doc_id") % 2 == 1)
    try:
        dedup.write_minhash_index(corpus, "t_mh_app", n_buckets=4,
                                  path=str(tmp_path / "idx"))
        dedup.append_to_minhash_index(extra, "t_mh_app")
        got = dedup.incremental_minhash_pairs_indexed(
            batch, "t_mh_app", threshold=0.3)
        sigs = dedup.minhash_signatures(
            corpus.unionByName(extra)).localCheckpoint()
        want = dedup.incremental_minhash_pairs(batch, sigs, threshold=0.3)
        assert sorted(map(tuple, got.collect())) \
            == sorted(map(tuple, want.collect()))
        assert want.count() > 0
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            sig_b = dedup.minhash_signatures(batch).localCheckpoint()
            bb = dedup.banded_buckets(sig_b).select(
                F.col("doc_id").alias("batch_id"), "band_id", "band_hash")
            j = bb.join(spark.table("t_mh_app_bands"),
                        ["band_id", "band_hash"])
            assert count_exchanges(j) == 1, explain_str(j, "simple")
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_mh_app_bands")
        spark.sql("DROP TABLE IF EXISTS t_mh_app_sig")


def test_fingerprint_index_exact_dedup(spark, tables, tmp_path):
    """The exact-dedup twin of the minhash index: per-ingest anti-join
    against the persisted fingerprint table keeps exactly the batch docs
    whose canonical content is absent from the corpus, appends fold in,
    and the anti-join plans with only the batch-side exchange."""
    from data_cube_spark.operators import dedup
    from data_cube_spark.operators.text import fingerprint

    docs = tables["documents"]
    corpus = docs.where(F.col("doc_id") % 4 == 0)
    extra = docs.where(F.col("doc_id") % 4 == 2)
    batch = docs.where(F.col("doc_id") % 2 == 1)
    try:
        dedup.write_fingerprint_index(corpus, "t_fp_idx", n_buckets=4,
                                      path=str(tmp_path / "fp"))
        dedup.append_to_fingerprint_index(extra, "t_fp_idx")
        got = {r["doc_id"] for r in
               dedup.dedup_exact_indexed(batch, "t_fp_idx").collect()}
        ref_hashes = {r[0] for r in corpus.unionByName(extra).select(
            fingerprint("text")).collect()}
        want = {r["doc_id"] for r in
                batch.withColumn("_h", fingerprint("text")).collect()
                if r["_h"] not in ref_hashes}
        assert got == want
        assert len(want) > 0

        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            j = dedup.dedup_exact_indexed(batch, "t_fp_idx")
            assert count_exchanges(j) == 1, explain_str(j, "simple")
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_fp_idx_fp")


def test_prefix_index_exact_and_corpus_exchange_free(spark, tables, tmp_path):
    """The persisted prefix index completes the incremental-dedup index
    trio: the indexed operator returns EXACTLY the inline exact-Jaccard
    R x S pairs (same output even at a higher query threshold than the
    stored one), and the candidate join reads the corpus postings
    pre-partitioned (single batch-side exchange)."""
    from data_cube_spark.operators import dedup

    docs = tables["documents"]
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    batch = docs.where(F.col("doc_id") % 2 == 1)
    try:
        dedup.write_prefix_index(corpus, "t_pfx_idx", n_buckets=4,
                                 threshold=0.4, path=str(tmp_path / "pfx"))
        for t in (0.4, 0.6):  # at and above the stored threshold
            got = sorted(map(tuple, dedup.incremental_prefix_pairs_indexed(
                batch, "t_pfx_idx", threshold=t).collect()))
            want = sorted(map(tuple, dedup.jaccard_pairs_prefix_rs(
                batch, corpus, threshold=t).collect()))
            assert got == want, f"threshold {t}"
        assert len(got) >= 0 and len(
            dedup.incremental_prefix_pairs_indexed(
                batch, "t_pfx_idx", threshold=0.4).collect()) > 0

        # ADVICE r5: a query threshold BELOW the stored one means the
        # persisted prefixes are too short — must refuse, not lose recall
        with pytest.raises(ValueError, match="below the index's stored"):
            dedup.incremental_prefix_pairs_indexed(
                batch, "t_pfx_idx", threshold=0.3)

        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            # candidate-join isolation: batch postings vs the index table
            pre_c = spark.table("t_pfx_idx_prefix")
            sh_b = dedup.shingle_table(batch, "text", "doc_id", 3,
                                       hashed=True)
            j = sh_b.join(pre_c, "shingle")
            plan = explain_str(j, "simple")
            # the corpus postings scan is bucketed — no exchange above it;
            # the only shuffles are batch-side (shingle spread + the join
            # repartition to the index's bucketing)
            assert "Bucketed: true" in plan, plan
            assert count_exchanges(j) <= 2, plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        for t in ("prefix", "df", "sets"):
            spark.sql(f"DROP TABLE IF EXISTS t_pfx_idx_{t}")


def test_index_metadata_validation(spark, tables, tmp_path):
    """ADVICE r5 (medium): every persisted index stamps its build
    parameters as table properties and the read/append paths REFUSE a
    mismatch — silent recall loss / index corruption becomes a raise."""
    from data_cube_spark.operators import dedup

    docs = tables["documents"].limit(30)
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    batch = docs.where(F.col("doc_id") % 2 == 1)
    try:
        dedup.write_minhash_index(corpus, "t_meta_mh", n_buckets=4,
                                  num_hashes=64, bands=16,
                                  path=str(tmp_path / "mh"))
        # read with different banding: recall characteristics differ
        with pytest.raises(ValueError, match="parameter mismatch"):
            dedup.incremental_minhash_pairs_indexed(
                batch, "t_meta_mh", bands=8)
        # append with different num_hashes: would corrupt signatures
        with pytest.raises(ValueError, match="parameter mismatch"):
            dedup.append_to_minhash_index(batch, "t_meta_mh",
                                          num_hashes=32, bands=16)
        # matching parameters pass
        assert dedup.incremental_minhash_pairs_indexed(
            batch, "t_meta_mh", threshold=0.3).count() >= 0

        dedup.write_fingerprint_index(corpus, "t_meta_fp", n_buckets=4,
                                      canonical=True,
                                      path=str(tmp_path / "fp"))
        with pytest.raises(ValueError, match="parameter mismatch"):
            dedup.dedup_exact_indexed(batch, "t_meta_fp", canonical=False)
        with pytest.raises(ValueError, match="parameter mismatch"):
            dedup.append_to_fingerprint_index(batch, "t_meta_fp",
                                              canonical=False)
        dedup.write_prefix_index(corpus, "t_meta_pfx", n_buckets=4,
                                 k=3, threshold=0.5,
                                 path=str(tmp_path / "pfx"))
        with pytest.raises(ValueError, match="parameter mismatch"):
            dedup.incremental_prefix_pairs_indexed(
                batch, "t_meta_pfx", k=4, threshold=0.5)
        with pytest.raises(ValueError, match="parameter mismatch"):
            dedup.incremental_prefix_pairs_indexed(
                batch, "t_meta_pfx", hash_shingles=False, threshold=0.5)
        # a metadata-less table (not written by write_*_index) refuses
        spark.range(1).selectExpr(
            "CAST(id AS STRING) AS content_hash").write.saveAsTable(
            "t_meta_bare_fp")
        with pytest.raises(ValueError, match="no spark_graft.index"):
            dedup.dedup_exact_indexed(batch, "t_meta_bare")
    finally:
        for t in ("t_meta_mh_bands", "t_meta_mh_sig", "t_meta_fp_fp",
                  "t_meta_pfx_prefix", "t_meta_pfx_df", "t_meta_pfx_sets",
                  "t_meta_bare_fp"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_index_compaction_re_distincts(spark, tables, tmp_path):
    """VERDICT r5 #6: the compaction half the append docstrings promise —
    duplicate-accumulated index tables re-distinct IN PLACE, the read
    path's results are unchanged, and the exchange-free candidate-join
    plan survives the rewrite."""
    from data_cube_spark.operators import dedup

    docs = tables["documents"].limit(40)
    corpus = docs.where(F.col("doc_id") % 4 == 0)
    extra = docs.where(F.col("doc_id") % 4 == 2)
    batch = docs.where(F.col("doc_id") % 2 == 1)
    try:
        dedup.write_fingerprint_index(corpus, "t_cmp_fp", n_buckets=4,
                                      path=str(tmp_path / "fp"))
        for _ in range(2):  # same slice twice -> duplicate hashes pile up
            dedup.append_to_fingerprint_index(extra, "t_cmp_fp")
        before = spark.table("t_cmp_fp_fp").count()
        want = {r["doc_id"] for r in
                dedup.dedup_exact_indexed(batch, "t_cmp_fp").collect()}
        removed = dedup.compact_fingerprint_index(spark, "t_cmp_fp")
        after = spark.table("t_cmp_fp_fp").count()
        assert removed > 0 and after == before - removed
        assert after == spark.table("t_cmp_fp_fp").dropDuplicates().count()
        got = {r["doc_id"] for r in
               dedup.dedup_exact_indexed(batch, "t_cmp_fp").collect()}
        assert got == want and len(want) > 0

        dedup.write_minhash_index(corpus, "t_cmp_mh", n_buckets=4,
                                  path=str(tmp_path / "mh"))
        for _ in range(2):
            dedup.append_to_minhash_index(extra, "t_cmp_mh")
        want_pairs = sorted(map(tuple, dedup.incremental_minhash_pairs_indexed(
            batch, "t_cmp_mh", threshold=0.3).collect()))
        assert dedup.compact_minhash_index(spark, "t_cmp_mh") > 0
        got_pairs = sorted(map(tuple, dedup.incremental_minhash_pairs_indexed(
            batch, "t_cmp_mh", threshold=0.3).collect()))
        assert got_pairs == want_pairs
        # compaction preserved bucketing: candidate join still plans with
        # only the batch-side exchange
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            sig_b = dedup.minhash_signatures(batch).localCheckpoint()
            bb = dedup.banded_buckets(sig_b).select(
                F.col("doc_id").alias("batch_id"), "band_id", "band_hash")
            j = bb.join(spark.table("t_cmp_mh_bands"),
                        ["band_id", "band_hash"])
            assert count_exchanges(j) == 1, explain_str(j, "simple")
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        for t in ("t_cmp_fp_fp", "t_cmp_mh_bands", "t_cmp_mh_sig"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_index_maintenance_surface(spark, tables, tmp_path):
    """VERDICT r6 #7: one fleet-management layer over the stamped
    spark_graft.index.* properties — list_indexes enumerates all five
    kinds with their cadence contract, compact_all dispatches each
    index's own in-place compaction (including prefix, since r9),
    and read results are unchanged afterwards."""
    from data_cube_spark.operators import dedup, similarity
    from data_cube_spark.operators.index_maintenance import (
        compact_all,
        list_indexes,
    )

    docs = tables["documents"].limit(40)
    emb = tables["embeddings"].limit(60)
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    vecs = emb.where(F.col("vec_id") % 2 == 0)
    batch = docs.where(F.col("doc_id") % 2 == 1)
    tags = ("t_mnt_fp", "t_mnt_mh", "t_mnt_pfx", "t_mnt_emb", "t_mnt_ivf")
    drops = ["t_mnt_fp_fp", "t_mnt_mh_sig", "t_mnt_mh_bands",
             "t_mnt_pfx_prefix", "t_mnt_pfx_df", "t_mnt_pfx_sets",
             "t_mnt_emb_buckets", "t_mnt_emb_vec",
             "t_mnt_ivf_cells", "t_mnt_ivf_centroids", "t_mnt_decoy_fp"]
    try:
        dedup.write_fingerprint_index(corpus, "t_mnt_fp", n_buckets=4,
                                      path=str(tmp_path / "fp"))
        dedup.write_minhash_index(corpus, "t_mnt_mh", n_buckets=4,
                                  path=str(tmp_path / "mh"))
        dedup.write_prefix_index(corpus, "t_mnt_pfx", n_buckets=4,
                                 threshold=0.5, path=str(tmp_path / "pfx"))
        similarity.write_embedding_index(vecs, "t_mnt_emb", n_buckets=4,
                                         path=str(tmp_path / "emb"))
        similarity.write_ivf_index(vecs, "t_mnt_ivf", n_cells=4,
                                   n_buckets=2, path=str(tmp_path / "ivf"))
        # a metadata-less table sharing a suffix is NOT an index
        spark.range(1).selectExpr(
            "CAST(id AS STRING) AS content_hash").write.saveAsTable(
            "t_mnt_decoy_fp")

        idx = {i["name"]: i for i in list_indexes(spark, prefix="t_mnt_")}
        assert set(idx) == set(tags)
        assert all(i["complete"] for i in idx.values()), idx
        assert idx["t_mnt_fp"]["kind"] == "fingerprint"
        assert idx["t_mnt_mh"]["kind"] == "minhash"
        assert idx["t_mnt_pfx"]["kind"] == "prefix"
        assert idx["t_mnt_emb"]["kind"] == "embedding"
        assert idx["t_mnt_ivf"]["kind"] == "ivf"
        # cadence contract: every kind appends + compacts since r9
        # (prefix appends under the frozen shingle order)
        assert all(idx[t]["compactable"] for t in tags)
        assert all(idx[t]["appendable"] for t in tags)
        # health flags surface (fresh indexes: no drift, no skew)
        assert idx["t_mnt_pfx"]["health"]["df_drift"] == 0.0
        assert not idx["t_mnt_pfx"]["health"]["needs_rebuild"]
        assert idx["t_mnt_ivf"]["health"]["cell_skew"] is not None
        assert not idx["t_mnt_ivf"]["health"]["needs_retrain"]
        # stamped params surface through the listing
        assert idx["t_mnt_mh"]["params"]["n_buckets"] == "4"
        assert float(idx["t_mnt_emb"]["params"]["predicted_recall"]) >= 0.9

        # pile duplicates on two kinds, then one sweep compacts both
        dedup.append_to_fingerprint_index(batch, "t_mnt_fp")
        dedup.append_to_fingerprint_index(batch, "t_mnt_fp")
        dedup.append_to_minhash_index(batch, "t_mnt_mh")
        dedup.append_to_minhash_index(batch, "t_mnt_mh")
        want = {r["doc_id"] for r in
                dedup.dedup_exact_indexed(batch, "t_mnt_fp").collect()}
        sweep = compact_all(spark, prefix="t_mnt_")
        removed = sweep["removed"]
        assert set(removed) == set(tags)
        assert removed["t_mnt_fp"] > 0 and removed["t_mnt_mh"] > 0
        assert removed["t_mnt_emb"] == 0 and removed["t_mnt_ivf"] == 0
        assert removed["t_mnt_pfx"] == 0  # nothing appended to it here
        assert sweep["warnings"] == []  # fresh indexes: nothing to flag
        got = {r["doc_id"] for r in
               dedup.dedup_exact_indexed(batch, "t_mnt_fp").collect()}
        assert got == want
        fp = spark.table("t_mnt_fp_fp")
        assert fp.count() == fp.dropDuplicates().count()
    finally:
        for t in drops:
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_near_pairs_plan_linear_stages(spark, tables):
    """Bucket-local verification (the large-tier production path of
    near_pairs): no cartesian anywhere, and a FIXED exchange count —
    one (t, b) group shuffle whose payload is n*tables banded rows
    (vectors cross the wire once each, never once per candidate), then
    id-pair-only stages (dedup + two exact-verify attach joins), each
    linear in the emitted stream. With pre_cap the emitted stream is
    itself <= 2*cap*tables*n, so every stage after the kernel is linear
    in the corpus."""
    from data_cube_spark.operators import similarity

    emb = tables["embeddings"]
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        for cap in (None, 4):
            df = similarity.bucketed_near_pairs(
                emb, threshold=0.35, n_tables=24, pre_cap=cap,
                corpus_rows=emb.count())
            plan = explain_str(df, "simple")
            assert "CartesianProduct" not in plan
            assert "BroadcastNestedLoopJoin" not in plan
            # group shuffle + dedup + (cand+va) + (re-key+vb) = 6; the
            # pre-cap changes kernel emission volume, not plan shape
            assert count_exchanges(df) == 6, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_embedding_index_exchange_free_and_exact(spark, tables, tmp_path):
    """The EMBEDDING member of the persisted incremental-dedup index
    family: the per-batch candidate join reads the corpus bucket table
    pre-partitioned on (_t, _b) (single batch-side exchange), every
    returned pair is an exact-cosine true pair (verified against a numpy
    ground truth), recall at the +0.05 margin band is 1.0 at the 48-table
    setting, appends fold in equivalently, parameter mismatches refuse,
    and compaction preserves results."""
    import numpy as np

    from data_cube_spark.operators import similarity

    emb = tables["embeddings"]
    corpus = emb.where(F.col("vec_id") % 2 == 0)
    batch = emb.where(F.col("vec_id") % 2 == 1)

    def truth(threshold):
        def mat(df):
            rows = sorted((r["vec_id"], r["embedding"]) for r in df.collect())
            ids = np.array([r[0] for r in rows])
            m = np.array([r[1] for r in rows], dtype="float64")
            return ids, m / np.linalg.norm(m, axis=1, keepdims=True)
        bi, bm = mat(batch)
        ci, cm = mat(corpus)
        s = bm @ cm.T
        r, c = np.nonzero(s >= threshold)
        return {(int(bi[i]), int(ci[j])) for i, j in zip(r, c)}

    try:
        similarity.write_embedding_index(
            corpus, "t_emb_idx", n_buckets=4, n_tables=48,
            path=str(tmp_path / "emb"))
        got = {(r["batch_id"], r["corpus_id"])
               for r in similarity.incremental_embedding_pairs_indexed(
                   batch, "t_emb_idx", threshold=0.4, n_tables=48).collect()}
        assert got <= truth(0.4)          # no false positives (exact verify)
        assert got >= truth(0.45)         # recall 1.0 above the margin band
        assert len(truth(0.45)) > 0       # non-vacuous

        # plan: candidate join in isolation — corpus scan bucketed, only
        # the batch side exchanges
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            from data_cube_spark.operators.similarity import (
                _lsh_buckets_udf,
                with_norm,
            )
            v_b = with_norm(batch, "embedding")
            bk = _lsh_buckets_udf(4, 48, 64, 42)
            bb = v_b.select(
                F.col("vec_id").alias("batch_id"),
                F.posexplode(bk(F.col("_vec"))).alias("_t", "_b"))
            j = bb.join(spark.table("t_emb_idx_buckets"), ["_t", "_b"])
            plan = explain_str(j, "simple")
            assert "Bucketed: true" in plan, plan
            assert count_exchanges(j) == 1, plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

        # append path == writing the whole corpus at once
        similarity.write_embedding_index(
            emb.where(F.col("vec_id") % 4 == 0), "t_emb_app", n_buckets=4,
            n_tables=48, path=str(tmp_path / "emb_app"))
        similarity.append_to_embedding_index(
            emb.where(F.col("vec_id") % 4 == 2), "t_emb_app", n_tables=48)
        got_app = {(r["batch_id"], r["corpus_id"])
                   for r in similarity.incremental_embedding_pairs_indexed(
                       batch, "t_emb_app", threshold=0.4,
                       n_tables=48).collect()}
        assert got_app == got

        # duplicate append -> compaction re-distincts, results unchanged
        similarity.append_to_embedding_index(
            emb.where(F.col("vec_id") % 4 == 2), "t_emb_app", n_tables=48)
        assert similarity.compact_embedding_index(spark, "t_emb_app") > 0
        vec = spark.table("t_emb_app_vec")
        assert vec.count() == vec.dropDuplicates(["corpus_id"]).count()
        got_cmp = {(r["batch_id"], r["corpus_id"])
                   for r in similarity.incremental_embedding_pairs_indexed(
                       batch, "t_emb_app", threshold=0.4,
                       n_tables=48).collect()}
        assert got_cmp == got

        # parameter mismatch refuses (different planes -> different buckets)
        with pytest.raises(ValueError, match="parameter mismatch"):
            similarity.incremental_embedding_pairs_indexed(
                batch, "t_emb_idx", threshold=0.4, n_planes=8, n_tables=48)

        # occupancy guard: a corpus bigger than max_bucket_rows raises the
        # stored plane count (log2 of the overflow), the read path derives
        # the geometry from metadata (no caller parameters), and results
        # stay exact-verified (a subset of the true pairs)
        from data_cube_spark.operators.dedup import _index_meta
        similarity.write_embedding_index(
            corpus, "t_emb_grd", n_buckets=4, n_tables=48,
            max_bucket_rows=8, path=str(tmp_path / "emb_grd"))
        n_corpus = corpus.count()
        import math
        want_planes = max(4, math.ceil(math.log2(n_corpus / 8)))
        assert int(_index_meta(spark, "t_emb_grd_buckets")["n_planes"]) \
            == want_planes
        got_grd = {(r["batch_id"], r["corpus_id"])
                   for r in similarity.incremental_embedding_pairs_indexed(
                       batch, "t_emb_grd", threshold=0.4).collect()}
        assert got_grd <= truth(0.4) and len(got_grd) > 0
    finally:
        for t in ("t_emb_idx_buckets", "t_emb_idx_vec",
                  "t_emb_app_buckets", "t_emb_app_vec",
                  "t_emb_grd_buckets", "t_emb_grd_vec"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_ivf_index_serving_matches_inline_and_exchange_free(
        spark, tables, tmp_path):
    """The persisted IVF index (ANN-serving member of the index family):
    ann_ivf_topk_indexed against write_ivf_index equals the inline
    ivf_topk at the same parameters (deterministic hash-seeded
    centroids), the cells scan is bucketed on cell_id with only the
    query side exchanging, appends assign to the STORED centroids,
    compaction preserves results, and a metadata-less table refuses."""
    from data_cube_spark.operators import similarity

    emb = tables["embeddings"]
    corpus = emb.where(F.col("vec_id") % 2 == 0)
    queries = emb.where(F.col("vec_id") % 2 == 1).limit(20)

    def key(rows):
        return {(r["query_id"], r["match_id"], r["rank"]) for r in rows}

    try:
        similarity.write_ivf_index(corpus, "t_ivf_idx", n_cells=8,
                                   n_buckets=4, path=str(tmp_path / "ivf"))
        got_df = similarity.ann_ivf_topk_indexed(
            queries, "t_ivf_idx", k=5, n_probe=4)
        got = key(got_df.collect())
        want = key(similarity.ivf_topk(
            queries, corpus, k=5, n_cells=8, n_probe=4).collect())
        assert got == want and len(got) == 20 * 5

        # plan, broadcast serving tier (long ids + gate-sized corpus):
        # the whole serve is one MapInPandas over the query batch —
        # zero joins, zero windows, zero exchanges
        bc_plan = explain_str(got_df, "simple")
        assert "MapInPandas" in bc_plan, bc_plan
        # the serve itself adds no shuffle: no hash-partitioned exchange
        # (the SinglePartition one belongs to the test's .limit(20)), no
        # join, no window
        assert "hashpartitioning" not in bc_plan, bc_plan
        assert "SortMergeJoin" not in bc_plan and "Window" not in bc_plan

        # join tier (non-long ids dispatch there): cells scan bucketed,
        # probe side is the only join exchange — and the serve matches
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            qi = queries.withColumn("vec_id", F.col("vec_id").cast("int"))
            jdf = similarity.ann_ivf_topk_indexed(
                qi, "t_ivf_idx", k=5, n_probe=4)
            plan = explain_str(jdf, "simple")
            assert "Bucketed: true" in plan, plan
            # probe-side cell_id shuffle + final top-k window; the cells
            # side and the broadcast centroids add none. The r11 query-
            # lineage pin (localCheckpoint before the probes/qv split,
            # ADVICE r10) materializes this test's limit(20) batch into
            # a single-partition RDD, so the probe window and the
            # query-vector join-back satisfy their clustering without
            # exchanging here (production multi-partition batches pay
            # those two as in r10 — still query-side-only, still
            # vector-free in the probe window).
            assert count_exchanges(jdf) == 2
            # the probe window's exchange must stay vector-free: no
            # _qvec in any exchange above the first window
            first_window = plan.index("Window")
            assert "_qvec" not in plan[:first_window], plan
            assert key(jdf.collect()) == want
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

        # append: new vectors land in their nearest STORED centroid's cell
        seed = emb.where(F.col("vec_id") % 4 == 0)
        extra = emb.where(F.col("vec_id") % 4 == 2)
        similarity.write_ivf_index(seed, "t_ivf_app", n_cells=8,
                                   n_buckets=4, path=str(tmp_path / "app"))
        similarity.append_to_ivf_index(extra, "t_ivf_app")
        stored_cents = spark.table("t_ivf_app_centroids")
        want_assign = {(r["vec_id"], r["cell_id"]) for r in
                       similarity.ivf_assign(extra, stored_cents).collect()}
        got_assign = {(r["corpus_id"], r["cell_id"]) for r in
                      spark.table("t_ivf_app_cells")
                      .join(extra.select(F.col("vec_id").alias("corpus_id")),
                            "corpus_id", "left_semi").collect()}
        assert got_assign == want_assign
        assert (spark.table("t_ivf_app_cells").count()
                == seed.count() + extra.count())
        r1 = key(similarity.ann_ivf_topk_indexed(
            queries, "t_ivf_app", k=5, n_probe=4).collect())

        # duplicate append -> compaction re-distincts, results unchanged
        similarity.append_to_ivf_index(extra, "t_ivf_app")
        assert similarity.compact_ivf_index(spark, "t_ivf_app") > 0
        cells = spark.table("t_ivf_app_cells")
        assert cells.count() == cells.dropDuplicates(["corpus_id"]).count()
        assert key(similarity.ann_ivf_topk_indexed(
            queries, "t_ivf_app", k=5, n_probe=4).collect()) == r1

        # a table not written by write_ivf_index refuses
        spark.range(1).select(
            F.lit(0).alias("cell_id"), F.col("id").alias("corpus_id")
        ).write.mode("overwrite").saveAsTable("t_plain_cells")
        with pytest.raises(ValueError, match="no spark_graft.index"):
            similarity.ann_ivf_topk_indexed(queries, "t_plain", k=5)
    finally:
        for t in ("t_ivf_idx_cells", "t_ivf_idx_centroids",
                  "t_ivf_app_cells", "t_ivf_app_centroids",
                  "t_plain_cells"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bench_extra_plan_fingerprints(spark):
    """Fingerprint-drift gate for the bench artifact's plan column
    (VERDICT r12 #8): BENCH_r*.json now carries per-query
    ``plan_report`` fingerprints so a join-strategy regression (e.g. the
    compressed-bytes broadcast flip that OOM'd the un-hinted sf10
    bucketed join) shows up in the artifact diff. This pins the
    EXTRA_BENCH read paths' fingerprints at sf0.001 — exchanges exactly,
    nested-loop joins at zero — so drift fails HERE first, with the
    plan in the message. Broadcast-vs-merge on bucketed_join_read is
    scale-dependent by design (read_bucketed guards by deserialized
    size); its cross-scale flip is pinned by
    test_sources.py::test_read_bucketed_guards_missized_broadcast."""
    import bench
    from data_cube_spark.plans import explain_str, plan_report

    sf = "/root/testdata/sf0.001"
    bench._build_disk_indexes(spark, sf)
    bench._build_bucketed_tables(spark, sf)
    bench._build_layouts(spark, sf)
    expected_exchanges = {
        "bucketed_join_read": 1,        # the tiny by-priority agg only
        "zorder_read": 1,               # footer-pruned scan + one agg
        "dpp_read": 3,                  # busy-day agg + broadcast + agg
        "minhash_dedup_pairs": 1,
        "incremental_minhash_pairs": 1,
        "indexed_minhash_read": 1,      # batch-side only; corpus bucketed
        "indexed_exact_read": 0,        # anti-join into bucketed postings
        "indexed_prefix_read": 1,       # batch prefix rank only (r14:
                                        # sizes/sets come off the shingle
                                        # ARRAY rows — two groupBy
                                        # exchanges removed)
        "indexed_embedding_read": 1,
        "indexed_embedding_read_mp": 1,
        "indexed_ivf_read": 1,
    }
    tag = bench._DISK_INDEX[sf]
    btag = bench._BUCKETED_TABLES[sf]
    try:
        assert set(expected_exchanges) == set(bench.EXTRA_BENCH), (
            "EXTRA_BENCH changed — re-pin the fingerprints")
        for name, fn in bench.EXTRA_BENCH.items():
            df = fn(spark, sf)
            rep = plan_report(df)
            assert rep["nested_loop_joins"] == 0, (
                name, rep, explain_str(df, "simple"))
            assert rep["exchanges"] == expected_exchanges[name], (
                name, rep, explain_str(df, "simple"))
        # the DPP read must actually plan dynamic pruning — the whole
        # point of the hive layout at 100 TB
        assert plan_report(
            bench.EXTRA_BENCH["dpp_read"](spark, sf))["dynamic_pruning"]
    finally:
        for t in spark.catalog.listTables():
            if t.name.startswith((tag, btag)):
                spark.sql(f"DROP TABLE IF EXISTS {t.name}")
        bench._DISK_INDEX.pop(sf, None)
        bench._BUCKETED_TABLES.pop(sf, None)
        bench._SIG_INDEX.pop(sf, None)
        base = bench._LAYOUTS.pop(sf, None)
        if base:
            import shutil

            shutil.rmtree(base, ignore_errors=True)
