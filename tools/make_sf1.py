"""Synthesize an sf1-scale dataset (10x sf0.1) for the scale-trend bench
(VERDICT r4 #5): each table is replicated REPLICAS times under a
per-replica key-space isomorphism, so every intra-replica relationship
(joins, near-dup clusters, sessions, per-user event counts) is preserved
exactly while cross-replica overlap is zero — totals and pair counts must
therefore scale ~linearly with the replica count, which is the property
the bench measures.

- TPC-H keys shift by replica * (max_key rounded to even), so referential
  integrity holds within each replica and key spaces are disjoint.
- region/nation stay fixed (they are bounded dimension tables at every
  scale factor, exactly like real TPC-H).
- document TEXT is token-renamed per replica (token -> token + 'xN'):
  an isomorphism of the shingle/token universe — within-replica Jaccard
  structure is byte-for-byte preserved, cross-replica shingle vocabularies
  are disjoint (posting lists grow linearly, not quadratically).
- doc_id offsets are EVEN so the odd/even batch-vs-corpus split semantics
  carry over per replica.
- embeddings are cyclically rolled per replica (a permutation = orthogonal
  transform: norms and intra-replica cosines exact; cross-replica cosine
  decorrelates).

Usage: python tools/make_sf1.py [src_sf_dir] [out_dir] [replicas]
Defaults: /root/testdata/sf0.1 -> <repo>/.benchdata/sf1, 10 replicas.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from data_cube_spark.session import get_spark  # noqa: E402
from data_cube_spark.sources.star import load_tables  # noqa: E402


def _even_stride(df: DataFrame, col: str) -> int:
    m = df.agg(F.max(col)).first()[0] or 0
    return int(m) + 2 - (int(m) % 2)  # smallest even stride > max


def replicate(tables: dict[str, DataFrame], replicas: int) -> dict[str, DataFrame]:
    strides = {
        "c": _even_stride(tables["customer"], "c_custkey"),
        "s": _even_stride(tables["supplier"], "s_suppkey"),
        "p": _even_stride(tables["part"], "p_partkey"),
        "o": _even_stride(tables["orders"], "o_orderkey"),
        "e": _even_stride(tables["events"], "event_id"),
        "u": _even_stride(tables["events"], "user_id"),
        "d": _even_stride(tables["documents"], "doc_id"),
        "v": _even_stride(tables["embeddings"], "vec_id"),
    }

    def shifted(df: DataFrame, i: int, **offsets: tuple[str, str]) -> DataFrame:
        out = df
        for colname, skey in offsets.items():
            out = out.withColumn(
                colname, (F.col(colname) + F.lit(i * strides[skey])).cast("long"))
        return out

    def union_replicas(build):
        parts = [build(i) for i in range(replicas)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    t = tables
    out: dict[str, DataFrame] = {
        "region": t["region"],
        "nation": t["nation"],
        "customer": union_replicas(lambda i: shifted(t["customer"], i, c_custkey="c")),
        "supplier": union_replicas(lambda i: shifted(t["supplier"], i, s_suppkey="s")),
        "part": union_replicas(lambda i: shifted(t["part"], i, p_partkey="p")),
        "orders": union_replicas(
            lambda i: shifted(t["orders"], i, o_orderkey="o", o_custkey="c")),
        "lineitem": union_replicas(
            lambda i: shifted(t["lineitem"], i, l_orderkey="o", l_partkey="p",
                              l_suppkey="s")),
        "events": union_replicas(
            lambda i: shifted(t["events"], i, event_id="e", user_id="u")),
    }

    def docs_replica(i: int) -> DataFrame:
        d = shifted(t["documents"], i, doc_id="d")
        if i > 0:
            renamed = F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda tok: F.concat(tok, F.lit(f"x{i}")),
                ),
                " ",
            )
            d = d.withColumn("text", renamed)
        return d.withColumn("n_chars", F.length("text").cast("long"))

    out["documents"] = union_replicas(docs_replica)

    def emb_replica(i: int) -> DataFrame:
        e = shifted(t["embeddings"], i, vec_id="v")
        if i > 0:
            # per-replica orthogonal transform = roll + deterministic
            # random sign-flip. A permutation or diagonal +-1 matrix is
            # orthogonal, so INTRA-replica cosines are bit-preserved; a
            # roll ALONE is not enough cross-replica (circular
            # autocorrelation of smooth embeddings stays high — measured
            # quadratic near-pair growth), while the sign pattern drives
            # the cross-replica inner product to ~N(0, 1/sqrt(dim)).
            n = F.size("embedding")
            rolled = F.concat(
                F.slice("embedding", F.lit(i % 64 + 1), n),
                F.slice("embedding", F.lit(1), F.lit(i % 64)),
            )
            flipped = F.transform(
                rolled,
                lambda x, k: (
                    x * F.when(
                        F.pmod(F.xxhash64(F.lit(i), k), F.lit(2)) == 0,
                        F.lit(1.0)).otherwise(F.lit(-1.0))
                ).cast("float"),
            )
            e = e.withColumn("embedding", flipped)
        return e

    out["embeddings"] = union_replicas(emb_replica)
    return out


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(repo, ".benchdata", "sf1")
    replicas = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    spark = get_spark("make-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    tables = load_tables(spark, src)
    for name, df in replicate(tables, replicas).items():
        path = os.path.join(dst, f"{name}.parquet")
        df.write.mode("overwrite").parquet(path)
        print(f"{name}: wrote {path}", flush=True)


if __name__ == "__main__":
    main()
