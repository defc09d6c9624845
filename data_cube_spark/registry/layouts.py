"""Storage-layout queries: range/Z-order pruning, dynamic partition
pruning, bucketed co-located joins."""

from __future__ import annotations

from data_cube_spark.registry._shared import *  # noqa: F401,F403


def q_range_layout_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `write_range_layout` READ path as driver evidence: events are
    persisted range-partitioned + sorted on ts (each file covers a
    disjoint ts interval, so parquet footer min/max prunes whole
    files/row groups for the window predicate before any task runs —
    file-level pruning asserted in
    tests/test_sources.py::test_write_range_layout_files_cover_disjoint_ranges),
    then a two-day window is aggregated by event type. Layout cannot
    change results: the oracle is the same filter+aggregate on the raw
    table."""
    import os
    import shutil
    import tempfile

    from data_cube_spark.sources.ingest import write_range_layout

    t = load_tables(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="sg_rangelayout_")
    path = os.path.join(base, "events")
    try:
        write_range_layout(t["events"], path, ["ts"], n_files=8)
        ev = spark.read.parquet(path)
        out = (
            ev.where((F.col("ts") >= F.lit("2024-01-10"))
                     & (F.col("ts") < F.lit("2024-01-12")))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                 .alias("sum_value"))
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)


def q_zorder_layout_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `write_zorder_layout` READ path as driver evidence: events
    persisted Z-ordered on (user_id, value) — each file covers a
    contiguous stretch of the Morton curve, i.e. a region bounded in
    BOTH columns, so parquet footer min/max prunes files for the
    two-sided predicate below (a 1-D layout can prune only its leading
    column; fraction-of-files-pruned asserted in
    tests/test_sources.py::test_write_zorder_layout_prunes_both_columns).
    Layout cannot change results: the oracle is the same filter+aggregate
    on the raw table."""
    import os
    import shutil
    import tempfile

    from data_cube_spark.sources.ingest import write_zorder_layout

    t = load_tables(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="sg_zorder_")
    path = os.path.join(base, "events")
    try:
        write_zorder_layout(
            t["events"].select("user_id", "value", "event_type"),
            path, ["user_id", "value"], n_files=16)
        ev = spark.read.parquet(path)
        out = (
            ev.where((F.col("user_id") < 200) & (F.col("value") >= 50.0))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                 .alias("sum_value"))
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)


def q_dpp_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning as driver evidence: events persisted
    hive-partitioned by event_date, then joined to a dim the optimizer
    CANNOT statically push — the busiest days, an aggregate-derived
    attribute (a filter on a function of the join key would be pushed at
    plan time; a filter on an aggregate only exists at runtime). Spark's
    DPP inserts a dynamicpruningexpression into the fact scan's
    PartitionFilters, so only the matching date directories are read
    — at 100 TB this is the difference between scanning a decade and
    scanning a week. The busy-day rule (n_day >= 0.8 x the max day
    count; the max is one collected scalar) keeps the dim-side Filter
    selective, which the PartitionPruning rule requires — a bare LIMIT
    dim does NOT trigger DPP. Plan pinned by
    tests/test_plans.py::test_dpp_prunes_fact_partitions; results are
    layout-independent (oracle: IN-subquery on the raw table)."""
    import os
    import shutil
    import tempfile

    t = load_tables(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="sg_dpp_")
    path = os.path.join(base, "events_bydate")
    try:
        ev = t["events"].withColumn("event_date", F.to_date(F.col("ts")))
        ev.write.partitionBy("event_date").parquet(path)
        fact = spark.read.parquet(path)
        cal = fact.groupBy("event_date").agg(
            F.count(F.lit(1)).alias("n_day"))
        mx = cal.agg(F.max("n_day")).collect()[0][0]
        busy = cal.where(F.col("n_day") >= 0.8 * float(mx))
        j = fact.join(F.broadcast(busy.select("event_date")), "event_date")
        out = j.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            .alias("sum_value"),
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)


def q_bucketed_join_copartition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-layout co-located join (the `write_bucketed` READ path):
    orders and lineitem persisted bucketed (8 buckets, one file per
    bucket, bucket-sorted) on the order key, read back through the
    catalog, and joined — the bucketed scans come out hash-partitioned on
    the join key, so the join itself needs ZERO exchanges (pinned by
    tests/test_plans.py::test_bucketed_join_has_zero_exchanges; the only
    shuffle left is the tiny by-priority aggregate). The join shuffle was
    paid ONCE at write time — at 100 TB that is the difference between
    re-shuffling the fact table on every query and never. Layout cannot
    change join semantics: the oracle is the plain join."""
    import os
    import shutil
    import tempfile

    from data_cube_spark.sources.ingest import write_bucketed

    t = load_tables(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="sg_bucketed_")
    # per-call table names: safe under concurrent query runs in one session
    tag = os.path.basename(base).lower()
    tables = {
        f"{tag}_orders": (
            t["orders"].select("o_orderkey", "o_orderpriority"), "o_orderkey"),
        f"{tag}_lineitem": (
            t["lineitem"].select("l_orderkey", "l_extendedprice", "l_discount"),
            "l_orderkey"),
    }
    try:
        for name, (df, key) in tables.items():
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            write_bucketed(df, name, [key], n_buckets=8,
                           path=os.path.join(base, name))
        # read through the shared guard (r13, lifted from the r12
        # per-query hint): Catalyst sizes the 2-column orders scan by
        # its compressed parquet footprint and at sf10 flipped it to a
        # broadcast whose DESERIALIZED build side (millions of rows)
        # blew the driver. read_bucketed pins merge whenever the
        # DECOMPRESSED estimate exceeds the broadcast threshold, so the
        # join runs the zero-exchange sort-merge the layout paid for —
        # at sf0.01 both sides are genuinely broadcast-small and stay
        # un-hinted (plan pinned either way by
        # tests/test_plans.py::test_bucketed_join_has_zero_exchanges and
        # tests/test_sources.py::test_read_bucketed_guards_missized_broadcast).
        from data_cube_spark.sources.ingest import read_bucketed

        j = read_bucketed(spark, f"{tag}_lineitem").join(
            read_bucketed(spark, f"{tag}_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"))
        out = j.groupBy("o_orderpriority").agg(
            F.sum(_rev_expr()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
            F.countDistinct("o_orderkey").alias("n_orders"))
        return out.localCheckpoint()
    finally:
        for name in tables:
            spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(base, ignore_errors=True)
