"""The bench harness is driver-run evidence — a broken entry would only
surface as a null in BENCH_r{N}.json, so pin its contract here: every
BENCH_QUERIES name resolves in the registry, and the EXTRA_BENCH
production-operator callables run and return rows at sf0.001."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import SF_DIR


def test_bench_queries_resolve():
    import bench
    from data_cube_spark.registry import QUERIES

    missing = [n for n in bench.BENCH_QUERIES if n not in QUERIES]
    assert not missing, missing
    # the verifier recall queries are correctness evidence, not benched
    assert "minhash_lsh_pairs" not in bench.BENCH_QUERIES
    assert "incremental_minhash_recall" not in bench.BENCH_QUERIES


@pytest.mark.parametrize("name", ["minhash_dedup_pairs",
                                  "incremental_minhash_pairs"])
def test_extra_bench_production_operators_run(spark, name):
    import bench

    df = bench.EXTRA_BENCH[name](spark, SF_DIR)
    assert {"id_a", "id_b"} <= set(df.columns) or \
           {"batch_id", "corpus_id"} <= set(df.columns)
    assert df.count() >= 0


def test_extra_bench_indexed_read_paths_run(spark):
    """The r6 persisted-index bench entries: index build happens in the
    (untimed) ingest phase via _build_disk_indexes; the timed callables
    are the per-ingest read paths and must run against those tables."""
    import shutil
    import tempfile

    import bench

    sf = SF_DIR
    try:
        bench._build_disk_indexes(spark, sf)
        tag = bench._DISK_INDEX[sf]
        mh = bench.EXTRA_BENCH["indexed_minhash_read"](spark, sf)
        assert {"batch_id", "corpus_id", "est_jaccard"} <= set(mh.columns)
        assert mh.count() > 0
        ex = bench.EXTRA_BENCH["indexed_exact_read"](spark, sf)
        assert "doc_id" in ex.columns and ex.count() > 0
        pf = bench.EXTRA_BENCH["indexed_prefix_read"](spark, sf)
        assert {"batch_id", "corpus_id", "jaccard"} <= set(pf.columns)
        assert pf.count() > 0
        eb = bench.EXTRA_BENCH["indexed_embedding_read"](spark, sf)
        assert {"batch_id", "corpus_id", "cosine"} <= set(eb.columns)
        assert eb.count() > 0
        iv = bench.EXTRA_BENCH["indexed_ivf_read"](spark, sf)
        assert {"query_id", "match_id", "cosine", "rank"} <= set(iv.columns)
        assert iv.count() > 0
    finally:
        tag = bench._DISK_INDEX.pop(sf, None)
        if tag:
            for s in ("mh_bands", "mh_sig", "fp_fp",
                      "pfx_prefix", "pfx_df", "pfx_sets",
                      "emb_buckets", "emb_vec",
                      "embmp_buckets", "embmp_vec",
                      "ivf_cells", "ivf_centroids"):
                spark.sql(f"DROP TABLE IF EXISTS {tag}_{s}")
            shutil.rmtree(os.path.join(tempfile.gettempdir(), tag),
                          ignore_errors=True)
