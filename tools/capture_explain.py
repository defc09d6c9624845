"""Regenerate EXPLAIN.md: captured physical plans for a curated set of
registry queries, with a one-line audit note per query.

    python tools/capture_explain.py [SF_DIR]

Run against sf0.001 (plan shape is scale-invariant; the notes call out
what changes at 100×). Plans are captured UNCACHED so FileScan nodes are
visible, and truncated to the structurally interesting prefix.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: query -> what to look for in its plan (the audit note)
CURATED: dict[str, str] = {
    "flagship_revenue_by_region": (
        "Attribute aggregation (A3): one fact scan, broadcast snowflake "
        "resolution, two-phase hash aggregate. No fact shuffle before the "
        "aggregation."
    ),
    "attr_dice_snowflake": (
        "Attribute dice (F4): region filter resolves through nation->supplier "
        "broadcast semi-joins; the fact is filtered by key, then re-aggregated "
        "once."
    ),
    "attr_dice_or": (
        "OR-dice (AnyOf): the disjunction is one semi-join against the union "
        "of matching keys — not two scans unioned."
    ),
    "denormalize_star": (
        "Star join (J4): every dimension a BroadcastHashJoin around a single "
        "fact scan; zero shuffle exchanges. Size-gated: an over-threshold "
        "dimension would drop its hint and AQE plans the join."
    ),
    "rollup_hierarchy_q": (
        "Hierarchy rollup (A10): single-shuffle Expand-based rollup — one "
        "fact pass for all grouping sets, no per-level re-scan."
    ),
    "grouping_sets_explicit": (
        "ANSI GROUPING SETS: same single Expand contract as rollup/cube — "
        "arbitrary set lists still cost one shuffle."
    ),
    "tpch_q3_shipping_priority": (
        "Range selector: the date predicate is STRUCTURAL (dimension subset "
        "before the semi-join), so pushdown doesn't depend on the optimizer "
        "seeing through the aggregate."
    ),
    "tpch_q6_forecast_revenue": (
        "Pure scan query: all three predicates in PushedFilters, 2-column "
        "ReadSchema, single partial+final agg - the minimal plan."
    ),
    "tpch_q8_market_share": (
        "Conditional market share: part/nation/supplier broadcast; the only "
        "shuffles are the orders and customer equi-joins plus the final "
        "1-key aggregate. AQE handles the rest at scale."
    ),
    "tpch_q17_small_qty_revenue": (
        "Correlated threshold via window-over-join: one shuffle on partkey "
        "replaces the self-join subquery shape."
    ),
    "tpch_q18_large_orders": (
        "HAVING on grouped fact: orderkey aggregate shuffle, then the "
        "filtered (small) survivor set joins orders/customer — AQE broadcasts "
        "the survivors at runtime; TakeOrderedAndProject caps the sort."
    ),
    "asof_last_error": (
        "As-of join (join-free): union + one window pass partitioned by "
        "user_id. Exactly one shuffle, no BroadcastNestedLoopJoin."
    ),
    "range_join_error_window": (
        "Range join: bin-bucketed equi-join (SortMergeJoin/ShuffledHashJoin "
        "on _bin), range predicate folded into the join condition. Never a "
        "nested-loop."
    ),
    "interval_overlap_sessions": (
        "Interval-x-interval overlap: double bucket explode, equi-join on "
        "(bucket, day), first-shared-bucket dedup — exactly-once pairs, "
        "hash join only."
    ),
    "events_sessionize": (
        "Gaps-and-islands sessionize: one shuffle on user_id; lag + running "
        "sum + final per-session aggregate all within that partitioning."
    ),
    "funnel_conversion": (
        "Ordered funnel: stacked conditional-min windows over ONE "
        "partitionBy(user) exchange, user-grain group-by reuses it, inline() "
        "emits step rows. No joins between steps (was k join rounds)."
    ),
    "cohort_retention": (
        "Cohort retention: first-seen via window on user, then (cohort, day) "
        "aggregate — two shuffles total, both on well-distributed keys."
    ),
    "price_histogram": (
        "Equi-width histogram: bin id is a pure expression (no UDF); one "
        "shuffle on bin id. The bin-spec subquery is a scalar broadcast."
    ),
    "winsorized_price_stats": (
        "Winsorized stats: per-group percentile_approx (sketch-mergeable, "
        "one shuffle) feeds a clipped re-aggregate — no sort, no collect."
    ),
    "pack_sequences": (
        "Sequence packing: running token count per (split) partition via "
        "window; bin id = cumsum div budget — zero joins, one shuffle."
    ),
    "salted_join_agg": (
        "Salted join: explicit salt spreads the hot key across reducers; "
        "plan shows the ×salt explode on the small side, equi-join stays "
        "hash-based."
    ),
    "pipeline_clean_corpus": (
        "Fused curation pipeline: dedup shuffle + pure-expression langid/"
        "quality/token stages in ONE lazy plan — intermediate stages never "
        "materialize."
    ),
    "aggregate_from_summary": (
        "Aggregate navigator: the year aggregate reads the materialized "
        "year-month summary (InMemoryTableScan of 80 rows), never the "
        "fact scan."
    ),
    "drill_across_month": (
        "Drill-across: two independent fact aggregations conformed on "
        "(year, month), full-outer join at the 80-row grain — never a "
        "fact-sized join."
    ),
    "pipeline_pretraining": (
        "Full pretraining prep in ONE lazy plan: dedup -> decontaminate "
        "-> langid/quality -> split -> pack. Narrow stages fuse; shuffles "
        "are the dedup hash, contamination agg, and shard window only."
    ),
    "chunk_documents": (
        "Chunking: posexplode over pure expressions, zero shuffles, zero "
        "joins — scales embarrassingly."
    ),
    "token_vocab": (
        "Vocabulary: explode + two-phase count aggregate; the only shuffle "
        "is on the token key (partial_count map-side first)."
    ),
    "shuffle_order": (
        "Deterministic shuffle: md5 draw + ONE RangePartitioning exchange; "
        "positions from per-partition offsets (two longs per partition to "
        "the driver). No dedupe shuffle, no join-back, never "
        "Exchange SinglePartition."
    ),
    "incremental_dedup_keep": (
        "Incremental dedup: batch shingles equi-join the corpus postings "
        "only (no corpus self-join); max_df cap bounds the posting lists; "
        "survivors via left_anti."
    ),
    "quantile_bins": (
        "Equi-depth bins: per-group rank window -> one-row-per-group cuts "
        "broadcast back -> hash aggregate. No NTILE single-reducer sort."
    ),
    "multimodal_frames": (
        "Frame-sampling plan: sequence+explode over metadata, zero "
        "shuffles — the fan-out shape feeding a decode stage."
    ),
    "ngram_jaccard_pairs": (
        "N-gram Jaccard: inverted-index equi-join on hashed shingle with "
        "max_df stop-shingle cap; candidate count bounded, no cross join."
    ),
    "semantic_dedup_keep": (
        "Semantic dedup: LSH-bucketed near-pair source (size-dispatched), "
        "degree-capped by default (each node's 8 strongest edges via one "
        "rank-window shuffle — the Θ(n²)-edge-set bound), min-label "
        "components, anti-join survivors. No CartesianProduct at the "
        "registered (production) tier."
    ),
    "embedding_centroids": (
        "IVF centroids: deterministic seeded Lloyd step as groupBy-agg over "
        "zip_with sums — all JVM expressions, no MLlib, no driver data."
    ),
    "multimodal_decode": (
        "Multimodal decode: mapInPandas over binary column with explicit "
        "Arrow batches; upstream filter pushed to the scan, decode stage "
        "carries only (id, media) columns."
    ),
    "jaccard_prefix_pairs": (
        "Prefix-filtered EXACT similarity join: candidates only from the "
        "rarest-shingle prefixes (short posting lists by construction) + "
        "size filter; one array_intersect verification per candidate. "
        "Bounded where the plain inverted-index join explodes through "
        "stop-shingles — and exact where max_df is not."
    ),
    "corpus_snapshot_diff": (
        "Snapshot diff: each side reduces to (id, md5) BEFORE the single "
        "full-outer equi-join — the shuffle carries ~48 bytes/doc "
        "regardless of document size; status is a pure projection."
    ),
    "weighted_sample_docs": (
        "A-ES weighted sampling: ln(u)/w keys from the deterministic md5 "
        "draw, per-group rank window — one shuffle on the group key, no "
        "join, no global sort."
    ),
    "token_budget_sample_docs": (
        "Token-budget draw: per-group running sum over the hex draw "
        "order, one shuffle, a single window pass, pure filter after — "
        "no join, no collect."
    ),
    "skew_aware_user_join": (
        "Skew-aware partial salting: hot-key isin predicate (codegen'd "
        "literals, no extra join), conditional salt on the fact side, "
        "conditional explode on the dim side (x salt for hot keys only). "
        "Plain hash equi-join on (key, salt) — the hot key's rows spread "
        "over salt reducers."
    ),
    "bucketed_join_copartition": (
        "Bucketed co-located join: both scans come out hash-partitioned "
        "on the bucket key, so the join has NO Exchange on either side — "
        "the shuffle was paid once at write time; the only exchange left "
        "is the tiny by-priority aggregate. (The registry query returns "
        "a checkpointed result, so the plan is re-built here pre-"
        "checkpoint with broadcast disabled, matching "
        "test_bucketed_join_has_zero_exchanges.)"
    ),
    "scd2_segment_history": (
        "SCD2 build: one lead-window pass partitioned by the natural key "
        "over the deduped changelog — a single key shuffle, no join, no "
        "global sort; versions tile time per key by construction."
    ),
    "scd2_temporal_revenue": (
        "SCD2 temporal join: the validity-interval predicate rides INSIDE "
        "a broadcast hash equi-join on the customer key (intervals per "
        "key are disjoint, so no fan-out and no dedup pass); one fact-"
        "side aggregate after. Never a nested loop."
    ),
    "scd2_merge_rebuild": (
        "Incremental SCD2 merge: untouched keys pass through a broadcast "
        "anti-join with NO window; only the touched keys (bounded by the "
        "batch) rebuild through the lead window. Union of the two "
        "branches. Cost per merge is O(batch + touched history), not "
        "O(dimension)."
    ),
    "hll_sketch_regrain": (
        "Mergeable sketch regrain: hll_sketch_agg partial-aggregates "
        "map-side at (event_type, day), hll_union_agg merges at "
        "event_type — the fact is scanned once to BUILD the summary; "
        "the regrain itself touches only summary rows (sketch binaries, "
        "~4 KB each). COUNT(DISTINCT) becomes additive."
    ),
    "stream_attribution_join": (
        "Stream-stream interval join (batch twin shown — the unified "
        "expression): hash equi-join on user_id with the time-range "
        "residual folded into the join condition; on streams both sides "
        "are watermarked and the bound drives state eviction. Never a "
        "nested loop."
    ),
    "revenue_share_of_region": (
        "Share-of-parent: the window sum runs over the AGGREGATED frame "
        "(25 nation rows), not the fact — one fact scan, one aggregate "
        "shuffle, one tiny window partitioned by region."
    ),
    "events_gap_fill": (
        "Calendar densification: per-key span aggregate -> sequence "
        "explode -> left join keyed (key, day). The calendar is "
        "output-sized (each key's own span), never |keys| x global "
        "history; all three shuffles hash on the key."
    ),
    "vocab_overlap_sources": (
        "Vocabulary overlap: corpus-sized work is ONE (group, token) "
        "hash aggregate; the top-N window and the token self-join run "
        "on the vocabulary (bounded by top_n x groups), broadcast-sized."
    ),
    "topk_sketch_regrain": (
        "Mergeable top-k: approx_top_k_accumulate partials at the fine "
        "grain, approx_top_k_combine at the coarse grain — the "
        "verification joins against exact counts are the invariant "
        "harness, not the production path (summary-only regrain)."
    ),
    "data_quality_report": (
        "Constraint validation: the three row-local rules are ONE fused "
        "conditional-sum aggregate over one scan; uniqueness is one "
        "keyed aggregate; the FK check one broadcast anti-join. The "
        "SinglePartition merges reduce one partial row per task — the "
        "grand_total shape, sanctioned."
    ),
    "contrastive_negatives": (
        "Negative sampling: dense corpus positions (two-stage ranking, "
        "no single-reducer window), slot explosion bounded by anchors x "
        "(k+margin), hash join on position, anti-join on the positive "
        "pairs, per-anchor rank windows. No corpus self-join."
    ),
    "events_anomaly_zscore": (
        "Anomaly baseline: gap-filled daily series -> ONE key-partitioned "
        "window with a row-bounded trailing frame (state per key = "
        "window_size rows); decimal window sums, double math after."
    ),
    "value_drift_psi": (
        "Drift PSI: two bin-array summaries (one aggregate each) joined "
        "on the 5-row group key; the PSI fold runs over the arrays in a "
        "projection — no per-bin shuffle, baseline reusable as a stored "
        "summary."
    ),
    "histogram_percentile_regrain": (
        "Percentile summary: (grain, bin) hash aggregate -> densify to "
        "bin arrays -> element-wise zip_with merge at the coarse grain; "
        "the exact-cut verification windows are the invariant harness, "
        "not the production path."
    ),
    "simhash_pairs": (
        "SimHash invariant form: the banded candidate join is an "
        "equi-join on (band_id, band_val) — no cross product; the "
        "token-set-duplicate truth side is an equi-join on the sorted-"
        "distinct-token hash; the only nested-loop is the sanctioned "
        "1-row global-flags broadcast."
    ),
    "minhash_lsh_pairs": (
        "MinHash recall-invariant harness: the banded LSH candidate side "
        "is (band_id, band_hash) equi-joins over localCheckpoint-ed "
        "signatures; the exact-truth side (inverted-index shingle join) "
        "exists ONLY for evidence — bench times the production "
        "minhash_dedup_pairs operator instead."
    ),
    "incremental_minhash_pairs_indexed": (
        "Persisted-index read path: the corpus bands FileScan shows "
        "'Bucketed: true' with NO exchange above it — only the batch side "
        "shuffles to the index's (band_id, band_hash) bucketing. The "
        "per-ingest cost at 100 TB is batch-sized, never corpus-sized."
    ),
    "incremental_prefix_pairs_indexed": (
        "Persisted prefix-index read path: corpus postings scan bucketed "
        "on the shingle join key (exchange-free), batch shingles prefix-"
        "filtered per run; EXACT Jaccard after array_intersect verify."
    ),
    "dedup_exact_indexed_ingest": (
        "Persisted fingerprint-index read path: one left_anti hash join "
        "on content_hash; the index scan is bucketed on the join key so "
        "only the (hashed) batch side exchanges."
    ),
    "incremental_embedding_pairs_indexed": (
        "Persisted EMBEDDING-index read path (the semantic member of "
        "the index family), served like the IVF cell-sliced broadcast "
        "since r11: below the pack gate (corpus alone <= 256 MB — this "
        "capture) the normalized corpus matrix plus per-table "
        "bucket-sorted permutations broadcast once and each Arrow "
        "batch of ingest vectors scores ONLY its probed buckets' rows "
        "as per-bucket GEMMs inside one MapInPandas — candidate volume "
        "is paid as BLAS flops, never materialized as join rows (the "
        "r10 posting-join + pair-verify shape shuffled billions of "
        "candidate rows through a dropDuplicates at the sf10 bench "
        "shape: 271 s, now 8 s). The pack is CACHED per index epoch "
        "(r11: append/compaction move the maintenance_epoch "
        "fingerprint, rebuilds the build_nonce), so repeat serves skip "
        "the O(corpus) driver collect+broadcast; the only exchange is "
        "a round-robin of the BATCH when it arrives under-partitioned "
        "— serving parallelism comes entirely from the batch side. "
        "Above the gate the bucketed join tier serves: corpus buckets "
        "scanned bucketed on (_t, _b), candidates carry ids only, "
        "vectors attach via equi-joins (_vec bucketed on corpus_id), "
        "JVM array dot verifies."
    ),
    "ann_ivf_topk_indexed": (
        "Persisted IVF index (ANN serving), broadcast tier (this "
        "capture): the stored centroids + cell assignments + normalized "
        "corpus matrix broadcast once, each Arrow batch of queries does "
        "probe selection, cell masking and top-k in one numpy pass — "
        "no joins or windows; the pack is cached per index epoch (r11) "
        "and the only exchange is a round-robin of the query batch "
        "when it arrives under-partitioned (the gate counts the CORPUS "
        "alone — the batch streams, it is never broadcast). Above the "
        "gate (or non-long ids) the join tier serves: centroids "
        "broadcast, cells scan bucketed on cell_id, only the query "
        "batch shuffles."
    ),
    "indexed_embedding_read_multiprobe": (
        "Multi-probe embedding-index read (probe_radius=1, ~5x fewer "
        "stored tables at the same recall floor): in the broadcast "
        "serve (this capture) the probe expansion is a numpy XOR over "
        "the mask set inside the same MapInPandas — each query scores "
        "its <=1-bit-flip buckets' rows per table, the corpus pack "
        "stays exact-bucketed; plan shape is identical to the "
        "exact-bucket serve (the r10 46.9x sf10 outlier, now "
        "sub-linear). On the join tier the expansion is a JVM-side XOR "
        "explode before the (_t, _b) join, corpus side exchange-free."
    ),
}


def _build_bucketed_join(spark, sf_dir):
    """Re-create the bucketed join UN-checkpointed so the exchange-free
    plan is visible (the registry query cleans up its tables and returns
    a localCheckpoint)."""
    import tempfile

    from pyspark.sql import functions as F

    from data_cube_spark.sources.ingest import write_bucketed
    from data_cube_spark.sources.star import load_tables

    t = load_tables(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="explain_bucketed_")
    spark.sql("DROP TABLE IF EXISTS x_bkt_orders")
    spark.sql("DROP TABLE IF EXISTS x_bkt_lineitem")
    write_bucketed(t["orders"].select("o_orderkey", "o_orderpriority"),
                   "x_bkt_orders", ["o_orderkey"], n_buckets=8,
                   path=os.path.join(base, "o"))
    write_bucketed(
        t["lineitem"].select("l_orderkey", "l_extendedprice", "l_discount"),
        "x_bkt_lineitem", ["l_orderkey"], n_buckets=8,
        path=os.path.join(base, "li"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    j = spark.table("x_bkt_lineitem").join(
        spark.table("x_bkt_orders"),
        F.col("l_orderkey") == F.col("o_orderkey"))
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"))


#: queries whose registry form hides the interesting plan (checkpointed
#: result); re-built here for capture
def _build_attribution_batch(spark, sf_dir):
    """Batch twin of stream_attribution_join (the registry query returns
    a checkpointed memory-sink read; the unified expression's plan is
    what matters)."""
    from pyspark.sql import functions as F

    from data_cube_spark.sources.star import load_tables
    from data_cube_spark.streaming.stream_join import interval_attribution_join

    ev = load_tables(spark, sf_dir)["events"]
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"))
    buys = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("buy_ts"),
        F.col("event_id").alias("buy_id"), "value")
    return interval_attribution_join(
        views, buys, "user_id", "view_ts", "buy_ts", within="30 minutes")


def _build_indexed_reads(which):
    """The registry forms of the indexed-ingest queries drop their temp
    tables and return a localCheckpoint (plan hidden); rebuild the index
    here and return the UN-checkpointed read-path frame."""

    def build(spark, sf_dir):
        import tempfile

        from pyspark.sql import functions as F

        from data_cube_spark.operators import dedup
        from data_cube_spark.sources.star import load_tables

        docs = load_tables(spark, sf_dir)["documents"]
        corpus = docs.where(F.col("doc_id") % 2 == 0)
        batch = docs.where(F.col("doc_id") % 2 == 1)
        base = tempfile.mkdtemp(prefix=f"explain_idx_{which}_")
        tag = os.path.basename(base).lower()
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        if which == "mh":
            dedup.write_minhash_index(corpus, tag, n_buckets=8, path=base)
            return dedup.incremental_minhash_pairs_indexed(
                batch, tag, threshold=0.3)
        if which == "pfx":
            dedup.write_prefix_index(corpus, tag, n_buckets=8,
                                     threshold=0.5, path=base)
            return dedup.incremental_prefix_pairs_indexed(
                batch, tag, threshold=0.5)
        if which in ("emb", "embmp"):
            from data_cube_spark.operators import similarity

            emb = load_tables(spark, sf_dir)["embeddings"]
            similarity.write_embedding_index(
                emb.where(F.col("vec_id") % 2 == 0), tag, n_buckets=8,
                probe_radius=1 if which == "embmp" else 0, path=base)
            return similarity.incremental_embedding_pairs_indexed(
                emb.where(F.col("vec_id") % 2 == 1), tag, threshold=0.4)
        if which == "ivf":
            from data_cube_spark.operators import similarity

            emb = load_tables(spark, sf_dir)["embeddings"]
            similarity.write_ivf_index(
                emb.where(F.col("vec_id") % 2 == 0), tag, n_cells=8,
                n_buckets=4, path=base)
            return similarity.ann_ivf_topk_indexed(
                emb.where(F.col("vec_id") % 2 == 1), tag, k=5, n_probe=4)
        dedup.write_fingerprint_index(corpus, tag, n_buckets=8, path=base)
        return dedup.dedup_exact_indexed(batch, tag)

    return build


SPECIAL_BUILD = {
    "bucketed_join_copartition": _build_bucketed_join,
    "stream_attribution_join": _build_attribution_batch,
    "incremental_minhash_pairs_indexed": _build_indexed_reads("mh"),
    "incremental_prefix_pairs_indexed": _build_indexed_reads("pfx"),
    "dedup_exact_indexed_ingest": _build_indexed_reads("fp"),
    "incremental_embedding_pairs_indexed": _build_indexed_reads("emb"),
    "ann_ivf_topk_indexed": _build_indexed_reads("ivf"),
    "indexed_embedding_read_multiprobe": _build_indexed_reads("embmp"),
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from data_cube_spark.plans import count_exchanges, explain_str
    from data_cube_spark.registry import QUERIES
    from data_cube_spark.session import get_spark

    spark = get_spark("capture-explain", cpus="8", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    out = [
        "# EXPLAIN — captured physical plans (sf0.001, local[8])",
        "",
        "Generated by `python tools/capture_explain.py`. What to look for:",
        "`BroadcastHashJoin` (dims never shuffle the fact), `PushedFilters`",
        "reaching the parquet scan, bounded `Exchange` counts, one `Expand`",
        "per grouping-sets query, and the absence of",
        "`BroadcastNestedLoopJoin`/`CartesianProduct` anywhere.",
        "",
    ]
    for name, note in CURATED.items():
        if name not in QUERIES and name not in SPECIAL_BUILD:
            print(f"skip {name}: not in registry", flush=True)
            continue
        spark.catalog.clearCache()
        # SPECIAL_BUILD entries disable auto-broadcast to pin the
        # sort-merge/bucketed join shapes; restore the session value
        # AFTER the (lazy) plan capture so later CURATED queries record
        # their production plans (ADVICE r6)
        saved_abt = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            if name in SPECIAL_BUILD:
                df = SPECIAL_BUILD[name](spark, sf_dir)
            else:
                df = QUERIES[name](spark, sf_dir)
            plan = explain_str(df, "simple")
            n_ex = count_exchanges(df)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved_abt)
        lines = plan.splitlines()
        body = "\n".join(lines[:40]) + ("\n..." if len(lines) > 40 else "")
        out += [
            f"## {name}",
            "",
            note,
            f"Shuffle exchanges (static upper bound, pre-AQE): {n_ex}",
            "",
            "```",
            body,
            "```",
            "",
        ]
        print(f"captured {name} (exchanges={n_ex})", flush=True)

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "EXPLAIN.md"), "w") as f:
        f.write("\n".join(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
