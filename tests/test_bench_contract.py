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
