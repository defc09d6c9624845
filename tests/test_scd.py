"""SCD Type-2 dimension versioning: changelog -> version table, temporal
join, and incremental merge equivalence."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from data_cube_spark.operators.scd import (
    scd2_current,
    scd2_from_changelog,
    scd2_merge_changes,
    scd2_temporal_join,
)


def _changelog(spark):
    rows = [
        # key, ts, segment, tier
        (1, datetime(2020, 1, 1), "AUTO", "bronze"),
        (1, datetime(2021, 6, 1), "AUTO", "silver"),
        (1, datetime(2023, 1, 1), "MACH", "gold"),
        (2, datetime(2020, 3, 1), "FURN", "bronze"),
        # duplicate (key, ts): largest attr struct must win deterministically
        (3, datetime(2020, 1, 1), "HOUSE", "bronze"),
        (3, datetime(2020, 1, 1), "HOUSE", "silver"),
    ]
    return spark.createDataFrame(rows, "k int, ts timestamp, segment string, tier string")


def test_scd2_versions_tile_time(spark):
    dim = scd2_from_changelog(_changelog(spark), "k", "ts")
    got = {
        (r.k, r.valid_from, r.valid_to, r.tier, r.is_current)
        for r in dim.collect()
    }
    assert (1, datetime(2020, 1, 1), datetime(2021, 6, 1), "bronze", False) in got
    assert (1, datetime(2021, 6, 1), datetime(2023, 1, 1), "silver", False) in got
    assert (1, datetime(2023, 1, 1), None, "gold", True) in got
    assert (2, datetime(2020, 3, 1), None, "bronze", True) in got
    # dedupe: one version for key 3, the max-struct row (silver) wins
    k3 = [t for t in got if t[0] == 3]
    assert k3 == [(3, datetime(2020, 1, 1), None, "silver", True)]
    # exactly one current version per key
    cur = scd2_current(dim)
    assert cur.count() == 3
    assert set(cur.columns) == {"k", "segment", "tier"}


def test_scd2_temporal_join_picks_version_at_event_time(spark):
    dim = scd2_from_changelog(_changelog(spark), "k", "ts")
    facts = spark.createDataFrame(
        [
            (100, 1, datetime(2019, 12, 31)),  # before first version
            (101, 1, datetime(2020, 1, 1)),    # inclusive lower bound
            (102, 1, datetime(2021, 5, 31)),   # last day of v1
            (103, 1, datetime(2021, 6, 1)),    # exclusive upper bound -> v2
            (104, 1, datetime(2024, 1, 1)),    # open current version
            (105, 9, datetime(2024, 1, 1)),    # key with no versions
        ],
        "fid int, k int, ts timestamp",
    )
    out = scd2_temporal_join(facts, dim, "k", "k", "ts", how="left")
    tiers = {r.fid: r.tier for r in out.collect()}
    assert tiers == {100: None, 101: "bronze", 102: "bronze",
                     103: "silver", 104: "gold", 105: None}
    # inner join drops the unmatched rows, matches are identical
    inner = scd2_temporal_join(facts, dim, "k", "k", "ts", how="inner")
    assert {r.fid for r in inner.collect()} == {101, 102, 103, 104}
    # at most one version matches each fact row
    assert out.count() == facts.count()


def test_scd2_temporal_join_disambiguates_clashing_columns(spark):
    dim = scd2_from_changelog(
        spark.createDataFrame(
            [(1, datetime(2020, 1, 1), "A")], "k int, ts timestamp, name string"
        ),
        "k",
        "ts",
    )
    facts = spark.createDataFrame(
        [(7, 1, datetime(2021, 1, 1), "factname")],
        "fid int, k int, ts timestamp, name string",
    )
    out = scd2_temporal_join(facts, dim, "k", "k", "ts")
    row = out.collect()[0]
    assert row.name == "factname" and row.dim_name == "A"


@pytest.mark.parametrize("split_ts", [datetime(2020, 6, 1), datetime(2022, 1, 1)])
def test_scd2_merge_equals_full_rebuild(spark, split_ts):
    """Merging the late half of a changelog into the dim built from the
    early half must equal building from the whole log at once."""
    log = _changelog(spark)
    early = log.where(F.col("ts") < F.lit(split_ts))
    late = log.where(F.col("ts") >= F.lit(split_ts))
    merged = scd2_merge_changes(
        scd2_from_changelog(early, "k", "ts"), late, "k", "ts"
    )
    full = scd2_from_changelog(log, "k", "ts")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


def test_scd2_merge_late_arriving_change_retiles_intervals(spark):
    """A change landing BETWEEN two existing versions re-tiles the key's
    intervals (the new version closes against the later existing one)."""
    base = scd2_from_changelog(_changelog(spark), "k", "ts")
    late = spark.createDataFrame(
        [(1, datetime(2022, 1, 1), "AUTO", "platinum")],
        "k int, ts timestamp, segment string, tier string",
    )
    merged = scd2_merge_changes(base, late, "k", "ts")
    k1 = sorted(
        (r.valid_from, r.valid_to, r.tier)
        for r in merged.where(F.col("k") == 1).collect()
    )
    assert k1 == [
        (datetime(2020, 1, 1), datetime(2021, 6, 1), "bronze"),
        (datetime(2021, 6, 1), datetime(2022, 1, 1), "silver"),
        (datetime(2022, 1, 1), datetime(2023, 1, 1), "platinum"),
        (datetime(2023, 1, 1), None, "gold"),
    ]
    # untouched key rode through the anti-join unchanged
    assert merged.where(F.col("k") == 2).count() == 1


def test_scd2_merge_does_not_window_untouched_keys(spark):
    """The untouched side of the merge is an anti-join pass-through: no
    Window node may appear above the existing dim's scan on that branch."""
    dim = scd2_from_changelog(_changelog(spark), "k", "ts").localCheckpoint()
    late = spark.createDataFrame(
        [(2, datetime(2024, 1, 1), "FURN", "gold")],
        "k int, ts timestamp, segment string, tier string",
    )
    merged = scd2_merge_changes(dim, late, "k", "ts")
    plan = merged._jdf.queryExecution().optimizedPlan().toString()
    # exactly one Window (the rebuild of touched keys); the pass-through
    # branch is join-only
    assert plan.count("Window") == 1


def test_scd2_snapshot_at(spark):
    from data_cube_spark.operators.scd import scd2_snapshot_at

    dim = scd2_from_changelog(_changelog(spark), "k", "ts")
    snap = {r.k: r.tier
            for r in scd2_snapshot_at(dim, datetime(2022, 1, 1)).collect()}
    assert snap == {1: "silver", 2: "bronze", 3: "silver"}
    before = scd2_snapshot_at(dim, datetime(2019, 1, 1))
    assert before.count() == 0
    assert set(before.columns) == {"k", "segment", "tier"}


def test_scd2_dimension_point_in_time_cube(spark):
    """An SCD2-versioned dimension plugs into the cube API: the same
    fact diced through the 2022 snapshot vs the current snapshot
    attributes different tiers to the same keys."""
    from data_cube_spark.build import scd2_dimension
    from data_cube_spark.model import DataCube, Fact, Measure
    from data_cube_spark.selectors import C

    facts = spark.createDataFrame(
        [(1, 100.0), (1, 50.0), (2, 10.0), (3, 1.0)],
        "k int, amount double")
    fact = Fact.build(
        facts, ["k"],
        [Measure("total", F.col("amount").cast("decimal(18,2)"), agg="sum")])
    log = _changelog(spark)

    dc_2022 = DataCube(fact, {"cust": scd2_dimension(
        "cust", "k", log, "ts", at=datetime(2022, 6, 1))})
    dc_now = DataCube(fact, {"cust": scd2_dimension("cust", "k", log, "ts")})

    def totals(dc):
        return {r["tier"]: float(r["total"])
                for r in dc.aggregate(["cust.tier"]).collect()}

    # key 1 was silver in mid-2022 and is gold now; key 3 stays silver
    # (its duplicate-ts dedupe picked silver), key 2 stays bronze
    assert totals(dc_2022) == {"silver": 151.0, "bronze": 10.0}
    assert totals(dc_now) == {"gold": 150.0, "silver": 1.0, "bronze": 10.0}
    # silver-tier dice (fact is at key grain): keys {1, 3} at the 2022
    # snapshot, only key 3 now
    assert dc_2022.q(cust=C(tier=["silver"])).fact.df.count() == 2
    assert dc_now.q(cust=C(tier=["silver"])).fact.df.count() == 1
