"""sf10 spot probe (VERDICT r9 #8): does the ratio-table tail stay
sub-linear one more decade up?

- Synthesizes sf10 (10x sf1 via the make_sf1 replication isomorphism —
  intra-replica structure exact, cross-replica disjoint) if absent.
- Runs ONLY the tail queries — the 10 worst sf0.1->sf1 scalers from the
  committed ratio table — through the unchanged bench harness
  (``SPARK_GRAFT_BENCH_ONLY``), ingest/warm-up untimed as always.
- Measures O(batch) append flatness at a 250k-doc corpus: appending the
  SAME 2.5k-doc batch to a 25k-doc vs a 250k-doc prefix index must cost
  ~the same (the corpus side never reshuffles).
- Writes BENCH_sf10_probe.json: per-query seconds, the sf1 medians they
  compare against, the ratio (10x data => <=10x time is the linear
  ceiling; the probe passes when the tail stays at or under it), and
  the append-flatness pair.

Usage: python tools/sf10_probe.py [sf1_dir] [sf10_dir]
Defaults: <repo>/.benchdata/sf1 -> <repo>/.benchdata/sf10.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: the sf0.1->sf1 ratio-table tail (BENCH_sf01_r9.json vs BENCH_sf1.json,
#: sorted by ratio descending) — the queries most likely to go
#: super-linear first
TAIL_QUERIES = [
    "semantic_dedup_keep",
    "quantile_bins",
    "embedding_components",
    "window_running_total",
    "pipeline_pretraining",
    "tpch_q10_returned_items",
    "incremental_dedup_keep",
    "indexed_exact_read",
    "indexed_ivf_read",
    "indexed_embedding_read_mp",
]


def _append_flatness(spark, sf10_dir: str) -> dict:
    """Time append_prefix_index of one fixed batch into a 25k-doc vs a
    250k-doc corpus index: O(batch) means the two times are ~equal."""
    import tempfile

    from pyspark.sql import functions as F

    from data_cube_spark.operators import dedup
    from data_cube_spark.sources.star import load_tables

    docs = load_tables(spark, sf10_dir)["documents"].select("doc_id", "text")
    n = docs.count()
    batch = docs.where(F.col("doc_id") % 100 == 1).limit(2500)
    batch = batch.withColumn("doc_id", F.col("doc_id") + 100_000_000)
    batch = batch.localCheckpoint()
    out: dict = {"batch_docs": batch.count(), "corpus_total_docs": n}
    base = tempfile.mkdtemp(prefix="sg_probe_idx_")
    for label, target in (("small_25k", 25_000), ("large_250k", 250_000)):
        corpus = docs.where(F.col("doc_id") % 2 == 0).limit(target)
        tag = f"probe_{label}"
        dedup.write_prefix_index(corpus, tag, n_buckets=32, threshold=0.5,
                                 path=os.path.join(base, label))
        t0 = time.perf_counter()
        stats = dedup.append_prefix_index(batch, tag)
        sec = round(time.perf_counter() - t0, 3)
        out[label] = {"corpus_docs": corpus.count(), "append_sec": sec,
                      "appended_docs": stats["appended_docs"]}
        for s in ("_prefix", "_df", "_sets"):
            spark.sql(f"DROP TABLE IF EXISTS {tag}{s}")
    out["flat_ratio"] = round(
        out["large_250k"]["append_sec"]
        / max(out["small_25k"]["append_sec"], 1e-9), 3)
    return out


def _fixed_batch_reads(spark, sf1_dir: str, sf10_dir: str) -> dict:
    """The production scaling question the bench shape can't answer: the
    bench's 'batch' is half the corpus, so it grows 10x WITH the corpus.
    Here the ingest/query batch is FIXED (15k vectors) while the corpus
    grows 10x — per-ingest read cost should grow ~sqrt(corpus) for IVF
    (n_probe * corpus/cells with cells ~ sqrt(corpus)) and stay bounded
    by tables x probes x occupancy for the LSH embedding index."""
    import time as _time

    from pyspark.sql import functions as F

    from data_cube_spark.operators import similarity
    from data_cube_spark.sources.star import load_tables

    from data_cube_spark.operators import dedup

    out: dict = {}
    for sf, d in (("sf1", sf1_dir), ("sf10", sf10_dir)):
        emb = load_tables(spark, d)["embeddings"]
        corpus = emb.where(F.col("vec_id") % 2 == 0)
        batch = (emb.where(F.col("vec_id") % 2 == 1)
                 .limit(15_000).localCheckpoint())
        tag = f"probe_fb_{sf}"
        similarity.write_ivf_index(corpus, f"{tag}_ivf", n_cells=16,
                                   n_buckets=16)
        similarity.write_embedding_index(corpus, f"{tag}_emb",
                                         n_buckets=32, n_tables=1,
                                         probe_radius=1)
        # document-index families (VERDICT r10 #4): same fixed-batch
        # question for exact-fingerprint, prefix and minhash reads —
        # the bench shape grows batch WITH corpus, production does not
        docs = load_tables(spark, d)["documents"].select("doc_id", "text")
        dcorpus = docs.where(F.col("doc_id") % 2 == 0)
        dbatch = (docs.where(F.col("doc_id") % 2 == 1)
                  .limit(2500).localCheckpoint())
        dedup.write_fingerprint_index(dcorpus, f"{tag}_fp", n_buckets=32)
        dedup.write_prefix_index(dcorpus, f"{tag}_pfx", n_buckets=32,
                                 threshold=0.5)
        dedup.write_minhash_index(dcorpus, f"{tag}_mh", n_buckets=32)
        runs = {
            "ivf_read": lambda: similarity.ann_ivf_topk_indexed(
                batch, f"{tag}_ivf", k=5, n_probe=4).count(),
            "emb_mp_read": lambda: similarity
            .incremental_embedding_pairs_indexed(
                batch, f"{tag}_emb", threshold=0.4).count(),
            "exact_read": lambda: dedup.dedup_exact_indexed(
                dbatch, f"{tag}_fp").count(),
            "prefix_read": lambda: dedup.incremental_prefix_pairs_indexed(
                dbatch, f"{tag}_pfx", threshold=0.5).count(),
            "minhash_read": lambda: dedup.incremental_minhash_pairs_indexed(
                dbatch, f"{tag}_mh", threshold=0.3).count(),
        }
        for name, fn in runs.items():
            fn()  # warm
            ts = sorted(_ln_time(fn) for _ in range(3))
            out[f"{sf}.{name}"] = ts[1]
        for t in (f"{tag}_ivf_cells", f"{tag}_ivf_centroids",
                  f"{tag}_emb_buckets", f"{tag}_emb_vec",
                  f"{tag}_fp_fp", f"{tag}_mh_sig", f"{tag}_mh_bands",
                  f"{tag}_pfx_prefix", f"{tag}_pfx_df", f"{tag}_pfx_sets"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
    for name in ("ivf_read", "emb_mp_read", "exact_read", "prefix_read",
                 "minhash_read"):
        out[f"ratio_{name}"] = round(
            out[f"sf10.{name}"] / out[f"sf1.{name}"], 2)
    return out


def _ln_time(fn) -> float:
    import time as _time

    t0 = _time.perf_counter()
    fn()
    return round(_time.perf_counter() - t0, 3)


def main() -> int:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".benchdata", "sf1")
    sf10 = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, ".benchdata", "sf10")

    if not (os.path.isdir(sf10) and os.listdir(sf10)):
        print(f"# synthesizing sf10 at {sf10} (untimed)", file=sys.stderr)
        subprocess.run([sys.executable,
                        os.path.join(REPO, "tools", "make_sf1.py"),
                        sf1, sf10, "10"], check=True)

    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf10,
               SPARK_GRAFT_BENCH_ONLY=",".join(TAIL_QUERIES))
    proc = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                          env=env, capture_output=True, text=True,
                          check=True)
    # bench prints the FULL json first and repeats a compact summary
    # (no "queries") as the last line for truncation tolerance — take
    # the line that actually carries the per-query timings
    bench = next(json.loads(ln) for ln in proc.stdout.splitlines()
                 if ln.startswith("{") and '"queries"' in ln)

    with open(os.path.join(REPO, "BENCH_sf1.json")) as f:
        sf1_bench = json.load(f)
    ratios = {}
    for q in TAIL_QUERIES:
        a, b = sf1_bench["queries"].get(q), bench["queries"].get(q)
        ratios[q] = {
            "sf1_sec": a, "sf10_sec": b,
            "ratio": round(b / a, 2) if a and b else None,
            "sublinear": bool(a and b and b / a <= 10.0),
        }

    # append flatness runs in its own session over the sf10 corpus
    from data_cube_spark.session import get_spark

    spark = get_spark("sf10-probe")
    spark.sparkContext.setLogLevel("ERROR")
    flat = _append_flatness(spark, sf10)
    fixed = _fixed_batch_reads(spark, sf1, sf10)

    out = {
        "metric": "sf10_probe",
        "sf": 10.0,
        "ingest_sec": bench.get("ingest_sec"),
        "queries": bench["queries"],
        "queries_detail": bench.get("queries_detail"),
        "ratios_vs_sf1": ratios,
        "append_flatness": flat,
        "fixed_batch_reads": fixed,
        "tail_policy": "10 worst sf0.1->sf1 ratios; linear ceiling = 10x",
    }
    path = os.path.join(REPO, "BENCH_sf10_probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("metric", "sf", "queries", "append_flatness")}))
    print(f"# wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
