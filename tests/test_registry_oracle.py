"""The driver-contract gate, run locally: every registry query with an
oracle must hash-match DuckDB on the same parquet tables (sf0.001 here;
the driver runs sf0.01)."""

import pytest

from data_cube_spark.registry import ORACLE, QUERIES

from tests.conftest import SF_DIR, assert_df_matches_sql

ORACLE_QUERIES = sorted(ORACLE)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(name, spark, duck):
    df = QUERIES[name](spark, SF_DIR)
    assert_df_matches_sql(df, duck, ORACLE[name])


def test_every_query_runs(spark):
    """Queries without an oracle still must run and return a stable schema."""
    no_oracle = sorted(set(QUERIES) - set(ORACLE))
    for name in no_oracle:
        df = QUERIES[name](spark, SF_DIR)
        assert df.columns, name
        assert df.count() >= 0, name


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_registry_schema_stability(spark):
    """The driver smoke-checks a *stable schema*: two plan constructions of
    the same query must agree exactly (names, types, nullability)."""
    for name, fn in QUERIES.items():
        s1 = fn(spark, SF_DIR).schema
        s2 = fn(spark, SF_DIR).schema
        assert s1 == s2, name
