"""r15 minhash Arrow-kernel experiment (VERDICT r14 #3).

The r14 negative result ruled out interpreted higher-order functions for
the shuffle-free signature form; the untested quadrant is a VECTORIZED
kernel: per-doc hashed-shingle arrays (r14's `shingle_arrays`) streamed
through `mapInArrow`, with the 64 affine permutations + segment-min done
in numpy over whole record batches (guide §4.2 — hand batches to native
vectorized code).

Bit-identity contract with the explode+hash-aggregate form:
  - same doc set (docs with >= 1 shingle; empty/NULL arrays dropped =
    the absent-row membership of the exploded form),
  - h = pmod(xxhash64, p), sig_i = min(pmod(h*a_i + b_i, p)) — identical
    int64 arithmetic (no overflow: h < 2^31, a < 2^30 -> products < 2^61;
    numpy % matches Spark pmod for a positive modulus),
  - duplicate hashes inside one array (the 2^-64 collision nit,
    ADVICE r14) cannot move a min.

Usage: python tools/r15_minhash_ab.py [check|ab] [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

P = 2147483647  # 2^31 - 1, prime (same as minhash_signatures)


def _perm_consts(num_hashes: int = 64, seed: int = 42):
    import numpy as np

    rng = np.random.RandomState(seed)
    ab = [(int(rng.randint(1, 2**29)) * 2 + 1, int(rng.randint(1, 2**31)))
          for _ in range(num_hashes)]
    a = np.array([x for x, _ in ab], dtype=np.int64)
    b = np.array([y for _, y in ab], dtype=np.int64)
    return a, b


def minhash_signatures_arrow(df, text_col="text", id_col="doc_id",
                             num_hashes=64, k=3, seed=42):
    from data_cube_spark.operators.dedup import shingle_arrays

    a_np, b_np = _perm_consts(num_hashes, seed)
    a_list, b_list = a_np.tolist(), b_np.tolist()

    def kernel(batches):
        import numpy as np
        import pyarrow as pa

        a = np.array(a_list, dtype=np.int64)
        b = np.array(b_list, dtype=np.int64)
        nh = len(a_list)
        for batch in batches:
            ids = batch.column(0)
            sh = batch.column(1)
            import pyarrow.compute as pc

            lens = pc.list_value_length(sh)
            lens_np = lens.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
            keep = lens_np > 0
            n_out = int(keep.sum())
            if n_out == 0:
                continue
            flat = sh.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
            # segment starts over the flattened values of the KEPT docs:
            # null/empty lists contribute zero width, so dropping them
            # keeps boundaries exact
            ends = np.cumsum(lens_np)
            starts_all = ends - lens_np
            starts = starts_all[keep]
            h = flat % P
            mins = np.empty((n_out, nh), dtype=np.int64)
            for i in range(nh):
                perm = (h * a[i] + b[i]) % P
                mins[:, i] = np.minimum.reduceat(perm, starts)
            offsets = pa.array(np.arange(n_out + 1, dtype=np.int32) * nh,
                               type=pa.int32())
            sig = pa.ListArray.from_arrays(
                offsets, pa.array(mins.reshape(-1), type=pa.int64()))
            yield pa.RecordBatch.from_arrays(
                [ids.filter(pa.array(keep)), sig],
                names=[id_col, "signature"])

    arrs = shingle_arrays(df, text_col, id_col, k, hashed=True)
    return arrs.mapInArrow(kernel, f"{id_col} long, signature array<bigint>")


def minhash_signatures_explode(df, text_col="text", id_col="doc_id",
                               num_hashes=64, k=3, seed=42):
    """The r14 explode + 64-aggregate formulation, pinned here verbatim
    after the product switched to the Arrow kernel (r15) — so check/ab
    keep comparing the two forms rather than the kernel against itself."""
    from pyspark.sql import functions as F

    from data_cube_spark.operators.dedup import shingle_table

    a_np, b_np = _perm_consts(num_hashes, seed)
    p = F.lit(P)
    sh = shingle_table(df, text_col, id_col, k, hashed=True).select(
        F.col(id_col), F.pmod(F.col("shingle"), p).alias("_h"))
    mins = [F.min(F.pmod(F.col("_h") * F.lit(int(a)) + F.lit(int(b)), p)
                  ).alias(f"_h{i}")
            for i, (a, b) in enumerate(zip(a_np, b_np))]
    sig = sh.groupBy(id_col).agg(*mins)
    return sig.select(
        F.col(id_col),
        F.array(*[f"_h{i}" for i in range(num_hashes)]).alias("signature"))


def _setup(sf_dir):
    from data_cube_spark.session import get_spark
    from data_cube_spark.sources.star import load_tables

    spark = get_spark("r15-minhash-ab")
    spark.sparkContext.setLogLevel("ERROR")
    tbl = load_tables(spark, sf_dir)
    tbl["documents"].persist().count()
    return spark, tbl


def cmd_check(sf_dir):
    spark, tbl = _setup(sf_dir)
    docs = tbl["documents"]
    old = {r[0]: list(r[1]) for r in
           minhash_signatures_explode(docs).collect()}
    new = {r[0]: list(r[1]) for r in minhash_signatures_arrow(docs).collect()}
    same_keys = set(old) == set(new)
    same_vals = same_keys and all(old[k] == new[k] for k in old)
    print(f"doc sets equal: {same_keys} ({len(old)} vs {len(new)}); "
          f"signatures bit-identical: {same_vals}")
    if not same_vals and same_keys:
        bad = [k for k in old if old[k] != new[k]][:3]
        for k in bad:
            print(f"  {k}: old {old[k][:4]}... new {new[k][:4]}...")


def cmd_ab(sf_dir):
    from data_cube_spark.operators import dedup

    spark, tbl = _setup(sf_dir)
    docs = tbl["documents"]

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(df):
        t0 = time.perf_counter()
        noop(df)
        return time.perf_counter() - t0

    variants = {
        "sigs:explode": lambda: minhash_signatures_explode(docs),
        "sigs:arrow": lambda: minhash_signatures_arrow(docs),
    }
    # full-pipeline twins: signatures feed banding + estimate via
    # localCheckpoint, so time the composed operator too
    def pairs_with(sig_fn):
        sigs = sig_fn().localCheckpoint()
        cands = dedup.lsh_candidate_pairs(sigs, "doc_id", 16, 4)
        est = dedup.minhash_estimate(sigs, cands, "doc_id", 64)
        return est.where(F.col("est_jaccard") >= 0.3)

    variants["pairs:explode"] = lambda: pairs_with(
        lambda: minhash_signatures_explode(docs))
    variants["pairs:arrow"] = lambda: pairs_with(
        lambda: minhash_signatures_arrow(docs))

    for name, fn in variants.items():
        spark.sparkContext.setJobDescription(f"warm {name}")
        noop(fn())
    draws = {k: [] for k in variants}
    for i in range(4):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"draw{i} {name}")
            draws[name].append(timed(fn()))
    for name, ds in draws.items():
        print(f"{name}: median {statistics.median(ds):.3f}s "
              f"draws {[round(x, 3) for x in ds]}")


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "ab"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    {"check": cmd_check, "ab": cmd_ab}[cmd](sf_dir)
