"""Phase profile of the ``indexed_prefix_read`` CANDIDATES step
(VERDICT r13 #5): the r13 profile attributed ~15 s of the ~20 s query
to the candidate phase, whose input is the prefix-join output (well
above the 7.4M candidate rows it emits). This script attributes that
cost row-by-row and phase-by-phase so the fix — or the derivation of
why there isn't one — is measured, not guessed.

Replicates ``dedup.incremental_prefix_pairs_indexed`` (dedup.py:1150+)
with each lazy stage materialized behind a cache so the deltas are
attributable:

  1. batch shingle + prefix       (pre_b rows)
  2. prefix equi-join + size gate (join-output rows — the phase input)
  3. PPJoin ROW-level bound       (surviving rows — what the shuffle
                                   actually carries into the groupBy)
  4. pair aggregation + bounds    (candidate pairs out)
  5. set-verify join + Jaccard    (final pairs)

It also measures the two prescribed cut hypotheses:

  - duplication factor = surviving rows / distinct pairs: partial
    (map-side) aggregation can compress the groupBy shuffle at most by
    this factor, and only when a pair's rows co-reside in a map
    partition (they are spread across SHINGLE partitions, one per
    matched shingle — so observed compression is bounded by it and
    typically far below);
  - frozen-order freshness: the bench index is written fresh from the
    measured corpus (appended_docs = 0), so a refreeze cannot shorten
    the prefixes — drift-driven join-output inflation is zero by
    construction at this shape.

Usage: python tools/prefix_phase_profile.py [sf_dir] [threshold]
Defaults: <repo>/.benchdata/sf10, 0.5. Prints one JSON object; merge
into BENCH_sf10.json as ``indexed_prefix_read_profile_r14``.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".benchdata", "sf10")
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from data_cube_spark.operators import dedup
    from data_cube_spark.session import get_spark
    from data_cube_spark.sources.ingest import read_guarded
    from data_cube_spark.sources.star import load_tables

    spark = get_spark("prefix-phase-profile")
    docs = load_tables(spark, sf_dir)["documents"]
    corpus = docs.where("doc_id % 2 = 0")
    batch = docs.where("doc_id % 2 = 1")
    out: dict = {"sf_dir": sf_dir, "threshold": threshold}
    out["corpus_docs"] = corpus.count()
    out["batch_docs"] = batch.count()

    base = tempfile.mkdtemp(prefix="sg_pfxprof_")
    tag = os.path.basename(base).lower()
    t = time.perf_counter()
    dedup.write_prefix_index(corpus, f"{tag}_pfx", n_buckets=32,
                             threshold=0.5, path=os.path.join(base, "pfx"))
    out["index_write_sec"] = round(time.perf_counter() - t, 1)
    meta = spark.table(f"{tag}_pfx_prefix")
    out["frozen_order_drift"] = dedup.prefix_df_drift(
        dedup._index_meta(spark, f"{tag}_pfx_prefix")) or 0.0

    # ---- phase 1: batch shingle + prefix (mirrors dedup.py:1193-1211)
    k, hash_shingles, id_col = 3, True, "doc_id"
    t = time.perf_counter()
    sh_b = dedup.shingle_table(batch, "text", id_col, k,
                               hashed=hash_shingles).cache()
    n_sh_b = sh_b.count()
    freq = read_guarded(spark, f"{tag}_pfx_df")
    sizes = sh_b.groupBy(id_col).agg(F.count(F.lit(1)).alias("_sz"))
    w = Window.partitionBy(id_col).orderBy(F.col("_df").asc(),
                                           F.col("shingle").asc())
    pre_b = (
        sh_b.join(freq, "shingle", "left")
        .withColumn("_df", F.coalesce("_df", F.lit(0)))
        .withColumn("_pos", F.row_number().over(w))
        .join(sizes, id_col)
        .where(F.col("_pos")
               <= F.col("_sz") - F.ceil(F.lit(threshold) * F.col("_sz")) + 1)
        .select(F.col(id_col).alias("batch_id"), "shingle",
                F.col("_sz").alias("_pa"), F.col("_pos").alias("_i"))
    ).cache()
    n_pre_b = pre_b.count()
    out["phase_batch_prefix"] = {
        "sec": round(time.perf_counter() - t, 1),
        "batch_shingles": n_sh_b, "batch_prefix_rows": n_pre_b}

    # ---- phase 2: prefix equi-join + size gate
    t = time.perf_counter()
    pre_c = meta.select("corpus_id", "shingle",
                        F.col("_sz").alias("_pb"), F.col("_pos").alias("_j"))
    joined = (
        pre_b.join(pre_c, "shingle")
        .where((F.lit(threshold) * F.col("_pa") <= F.col("_pb"))
               & (F.lit(threshold) * F.col("_pb") <= F.col("_pa")))
    ).cache()
    n_join = joined.count()
    out["phase_prefix_join"] = {
        "sec": round(time.perf_counter() - t, 1),
        "join_output_rows": n_join}

    # ---- phase 3: PPJoin ROW-level positional bound (pre-shuffle)
    alpha = dedup._overlap_floor(threshold)
    t = time.perf_counter()
    rows = joined.where(
        F.lit(1) + F.least(F.col("_i") - 1, F.col("_j") - 1)
        + F.least(F.col("_pa") - F.col("_i"), F.col("_pb") - F.col("_j"))
        >= alpha).cache()
    n_rows = rows.count()
    out["phase_row_filter"] = {
        "sec": round(time.perf_counter() - t, 1),
        "surviving_rows": n_rows}

    # ---- phase 4: the pair aggregation (the 15 s suspect), measured
    # from the CACHED survivors so the timing is the aggregation alone
    t = time.perf_counter()
    cands = (
        rows.groupBy("batch_id", "corpus_id")
        .agg(F.min("_i").alias("_i0"), F.min("_j").alias("_j0"),
             F.max("_i").alias("_i1"), F.max("_j").alias("_j1"),
             F.count(F.lit(1)).alias("_c"),
             F.min("_pa").alias("_pa"), F.min("_pb").alias("_pb"))
        .where((F.lit(1) + F.least(F.col("_pa") - F.col("_i0"),
                                   F.col("_pb") - F.col("_j0"))
                >= alpha)
               & (F.col("_c") + F.least(F.col("_pa") - F.col("_i1"),
                                        F.col("_pb") - F.col("_j1"))
                  >= alpha))
        .select("batch_id", "corpus_id")
    ).cache()
    n_cands = cands.count()
    agg_sec = round(time.perf_counter() - t, 1)
    out["phase_candidates_agg"] = {
        "sec": agg_sec, "candidate_pairs": n_cands,
        "duplication_factor": round(n_rows / max(n_cands, 1), 2)}

    # ---- phase 5: verification join from cached candidates
    t = time.perf_counter()
    set_b = sh_b.groupBy(id_col).agg(
        F.array_sort(F.collect_set("shingle")).alias("_set_a")
    ).select(F.col(id_col).alias("batch_id"), "_set_a")
    set_c = read_guarded(spark, f"{tag}_pfx_sets").select(
        "corpus_id", F.col("_set").alias("_set_b"))
    verified = (cands.join(set_c, "corpus_id")
                .join(F.broadcast(set_b), "batch_id"))
    final = (
        verified.select(
            "batch_id", "corpus_id",
            F.size(F.array_intersect("_set_a", "_set_b")).alias("_inter"),
            F.size("_set_a").alias("_sa"), F.size("_set_b").alias("_sb"))
        .select((F.col("_inter")
                 / (F.col("_sa") + F.col("_sb") - F.col("_inter")))
                .alias("j"))
        .where(F.col("j") >= threshold))
    n_final = final.count()
    out["phase_verify"] = {
        "sec": round(time.perf_counter() - t, 1), "final_pairs": n_final}

    for d in (rows, joined, pre_b, sh_b, cands):
        d.unpersist()

    # ---- end-to-end (the number the bench artifact reports)
    draws = []
    for _ in range(2):
        t = time.perf_counter()
        dedup.incremental_prefix_pairs_indexed(
            batch, f"{tag}_pfx", threshold=threshold).count()
        draws.append(round(time.perf_counter() - t, 1))
    out["full_query_sec"] = draws

    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
