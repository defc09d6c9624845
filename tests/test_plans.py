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


def test_bucketed_join_has_zero_exchanges(spark, tables):
    """Co-located storage: two tables bucketed on the join key produce an
    exchange-free join plan (the write-time shuffle replaces every
    query-time shuffle)."""
    from data_cube_spark.sources.ingest import write_bucketed

    write_bucketed(tables["lineitem"].select("l_orderkey", "l_quantity"),
                   "t_li_bucketed", ["l_orderkey"], n_buckets=8)
    write_bucketed(tables["orders"].select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"),
        "t_o_bucketed", ["l_orderkey"], n_buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("t_li_bucketed").join(spark.table("t_o_bucketed"), "l_orderkey")
        assert count_exchanges(j) == 0, explain_str(j, "simple")
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_li_bucketed")
        spark.sql("DROP TABLE IF EXISTS t_o_bucketed")
