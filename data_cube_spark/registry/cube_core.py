"""Cube-engine registry queries (SURVEY §2 parity): dice/slice,
rollup/cube/grouping sets, denormalize/pivot/export, windows, deltas,
cube persistence."""

from __future__ import annotations

from data_cube_spark.registry._shared import *  # noqa: F401,F403


def q_flagship_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 capply: aggregate measures at an arbitrary hierarchy attribute
    (supplier -> nation -> region)."""
    dc = tpch_cube(spark, sf_dir)
    return _m(dc.aggregate(["supplier.r_name"]))


def q_dice_key_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 key dice with literal isin pushdown + A2 collapse of other dims."""
    dc = tpch_cube(spark, sf_dir)
    q = dc.q(supplier=C(0, 1, 2, 3, 4), part=Collapse(), orders=Collapse())
    return _m(q.fact.df)


def q_slice_scalar_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F7 scalar slice: dimension dropped, fact regrained."""
    dc = tpch_cube(spark, sf_dir)
    q = dc.q(part=0)
    return _m(q.fact.df)


def q_attr_dice_snowflake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3/F4 attribute filter routed through the snowflake (region name ->
    nation keys -> supplier keys -> fact semi-join)."""
    dc = tpch_cube(spark, sf_dir)
    q = dc.q(supplier=C(r_name=["EUROPE", "ASIA"]), part=Collapse(), orders=Collapse())
    return _m(q.fact.df)


def q_attr_dice_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-combined attribute filters (AnyOf): suppliers in EUROPE OR in
    nation JAPAN — the OR semantics the reference documents as unsupported
    (R/dimension.R:81), executed as a union of broadcast-filtered bases."""
    dc = tpch_cube(spark, sf_dir)
    q = dc.q(supplier=AnyOf({"r_name": ["EUROPE"]}, {"n_name": ["JAPAN"]}),
             part=Collapse(), orders=Collapse())
    return _m(q.fact.df)


def q_collapse_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 collapse with pre-filter: the `-()` args filter BEFORE collapsing."""
    dc = tpch_cube(spark, sf_dir)
    q = dc.q(orders=Collapse(o_orderpriority=["1-URGENT"]), part=Collapse())
    return _m(q.fact.df)


def q_aggregate_two_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 capply across two dimensions' hierarchy attributes."""
    dc = tpch_cube(spark, sf_dir)
    return _m(dc.aggregate(["supplier.r_name", "part.p_brand"]))


def q_customer_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 via the orders -> customer -> nation -> region snowflake path."""
    dc = tpch_cube(spark, sf_dir)
    return _m(dc.aggregate(["orders.cr_name"]))


def q_calendar_month_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 over the derived calendar hierarchy (date -> month/year)."""
    dc = tpch_cube(spark, sf_dir)
    return _m(dc.aggregate(["orders.d_year", "orders.d_month"]))


def q_aggregate_from_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate navigator (model.py::DataCube.with_summary): a
    materialized year-month summary answers the year aggregate by exact
    regrain of sum/count partials — the classic OLAP aggregate-table
    rewrite; the oracle recomputes from the raw fact, so a hash match
    proves summary-path == fact-path."""
    dc = tpch_cube(spark, sf_dir)
    dc.with_summary(["orders.d_year", "orders.d_month"])
    return _m(dc.aggregate(["orders.d_year"]))


def q_drill_across_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drill-across (Kimball cross-fact query): the lineitem-grain revenue
    cube and an orders-grain count cube, conformed on (d_year, d_month),
    measures side by side via full-outer join at the month grain
    (export.py::drill_across). Two fact passes + a tiny conformed-grain
    join — never a fact-sized join."""
    from data_cube_spark.build import from_table
    from data_cube_spark.export import drill_across
    from data_cube_spark.functions import date_parts, dec
    from data_cube_spark.model import Measure

    dc = tpch_cube(spark, sf_dir)
    t = load_tables(spark, sf_dir)
    parts = date_parts("o_orderdate", prefix="d_")
    orders = t["orders"].select(
        "o_orderkey", "o_totalprice",
        parts["d_year"].alias("d_year"), parts["d_month"].alias("d_month"))
    # the dimension key must determine every attribute: use the composite
    # month key, with year/month as its dependent attributes
    orders = orders.withColumn(
        "d_ym", F.col("d_year") * 100 + F.col("d_month"))
    oc = from_table(
        orders, {"month": ["d_ym", "d_year", "d_month"]},
        [Measure("n_orders", "o_orderkey", agg="count"),
         Measure("total_price", dec("o_totalprice"), agg="sum")])
    out = drill_across(dc, oc, ["orders.d_year", "orders.d_month"],
                       right_attrs=["month.d_year", "month.d_month"])
    return out.select(
        "d_year", "d_month",
        F.col("revenue").cast("double").alias("revenue"), "n_lines",
        "n_orders", F.col("total_price").cast("double").alias("total_price"))


def q_apply_margin_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 apply(MARGIN, FUN): keep supplier, collapse the rest, override
    every measure's aggregate with max (max-of-partials contract)."""
    dc = tpch_cube(spark, sf_dir)
    out = dc.apply(["supplier"], fun="max").fact.df
    return out.select(
        "s_suppkey",
        F.col("sum_qty").cast("double").alias("max_qty"),
        F.col("revenue").cast("double").alias("max_revenue"),
    )


def q_grand_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 grand total: all dimensions collapsed -> one row."""
    dc = tpch_cube(spark, sf_dir)
    return _m(dc.grand_total())


def q_rollup_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7/A8 rollup cube over (region, nation) with grouping-level codes and
    the bound `grouping` dimension."""
    dc = tpch_cube(spark, sf_dir)
    rc = rollup_cube(dc, ["supplier.r_name", "supplier.n_name"])
    # the rollup cube is re-normalized (fact keyed by supplier_sk; attrs
    # live in the bound dimension) — denormalize to the flat oracle shape
    out = denormalize(rc)
    return out.select(
        "r_name", "n_name",
        F.col("revenue").cast("double").alias("revenue"),
        F.col("n_lines"),
        F.col("grouping_level").cast("int").alias("grouping_level"),
    )


def q_rollup_level_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 prefix selection (reference INDEX arg): only levels {1, 2}."""
    dc = tpch_cube(spark, sf_dir)
    rc = rollup_cube(dc, ["supplier.r_name", "supplier.n_name"], levels=[1, 2])
    return denormalize(rc).select(
        "r_name", "n_name",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("grouping_level").cast("int").alias("grouping_level"),
    )


def q_rollup_hierarchy_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 `+` rollup selector through the q() API: grouping sets over the
    supplier dimension's geo hierarchy keys (region -> nation -> supplier),
    other dims collapsed — the reference's parsed-but-unfinished semantics
    (R/data.cube.R:219-227,285-299) executed as one Spark rollup."""
    dc = tpch_cube(spark, sf_dir)
    q = dc.q(supplier=RollupOp(), part=Collapse(), orders=Collapse())
    return q.fact.df.select(
        "n_regionkey", "n_nationkey", "s_suppkey",
        F.col("revenue").cast("double").alias("revenue"),
        F.col("n_lines"),
        F.col("grouping_level").cast("int").alias("grouping_level"),
    )


def q_cube_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 `^` cube op through the query API over degenerate flag dims."""
    from data_cube_spark.build import from_table

    t = load_tables(spark, sf_dir)
    dc = from_table(
        t["lineitem"],
        {"returnflag": "l_returnflag", "linestatus": "l_linestatus"},
        [Measure("sum_qty", F.col("l_quantity").cast("decimal(18,2)"), agg="sum"),
         Measure("n_lines", "l_orderkey", agg="count")],
    )
    q = dc.q(returnflag=CubeOp(), linestatus=CubeOp())
    return q.fact.df.select(
        "l_returnflag", "l_linestatus",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("n_lines"),
        F.col("grouping_level").cast("int").alias("grouping_level"),
    )


def q_denormalize_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 denormalize: star-join every dimension's attributes onto the fact."""
    dc = tpch_cube(spark, sf_dir)
    df = denormalize(dc)
    return df.select(
        "o_orderkey", "p_partkey", "s_suppkey",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("revenue").cast("double").alias("revenue"),
        "n_lines", "p_brand", "s_name", "n_name", "r_name", "cn_name", "cr_name",
        "o_orderpriority", F.col("d_year").cast("int").alias("d_year"),
    )


def q_denormalize_na_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1/J2 dense-array semantics: left-join the fact onto the cross
    product of dimension members (reference CJ path, R/data.cube.R:103-105)
    — absent cells surface as nulls. Cell-count guarded at scale."""
    from data_cube_spark.build import from_table

    t = load_tables(spark, sf_dir)
    dc = from_table(
        t["events"],
        {"etype": "event_type", "user": "user_id"},
        [Measure("sum_value", F.col("value").cast("decimal(18,6)"), agg="sum"),
         Measure("n_events", "event_id", agg="count")],
    )
    df = denormalize(dc, na_fill=True)
    return df.select(
        "event_type", "user_id",
        F.col("sum_value").cast("double").alias("sum_value"), "n_events",
    )


def q_pivot_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 pivot: returnflag rows × linestatus columns, sum_qty cells."""
    t = load_tables(spark, sf_dir)
    base = t["lineitem"].groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("q")
    )
    return pivot_format(base, rows=["l_returnflag"], pivot_col="l_linestatus",
                        pivot_values=["F", "O"], measure="q")


def q_topk_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window top-k per group (cranlogs top-3 pattern)."""
    dc = tpch_cube(spark, sf_dir)
    agg = dc.aggregate(["part.p_brand", "p_partkey"])
    top = topk_per_group(
        agg, ["p_brand"], [F.col("revenue").desc(), F.col("p_partkey").asc()], k=3
    )
    return top.select(
        "p_brand", "p_partkey",
        F.col("revenue").cast("double").alias("revenue"),
        F.col("rank").cast("bigint").alias("rank"),
    )


def q_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surrogate-key assignment (reference .GRP / add.surrogate.key)."""
    t = load_tables(spark, sf_dir)
    segs = t["customer"].select("c_mktsegment").dropDuplicates()
    return add_surrogate_key(segs, ["c_mktsegment"], "seg_key").select(
        "c_mktsegment", F.col("seg_key").cast("bigint").alias("seg_key")
    )


def q_events_cube_from_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 from_table constructor + A2 collapse on the events table."""
    from data_cube_spark.build import from_table

    t = load_tables(spark, sf_dir)
    dc = from_table(
        t["events"],
        {"etype": "event_type", "user": "user_id"},
        [Measure("sum_value", F.col("value").cast("decimal(18,6)"), agg="sum"),
         Measure("n_events", "event_id", agg="count")],
    )
    q = dc.q(user=Collapse())
    return q.fact.df.select(
        "event_type", F.col("sum_value").cast("double").alias("sum_value"), "n_events"
    )


def q_extract_custom_j(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 ``[[.cube`` extract: i-dice + arbitrary j aggregate expressions +
    by-attributes in one call."""
    dc = tpch_cube(spark, sf_dir)
    return dc.extract(
        i={"supplier": C(r_name=["ASIA"])},
        j={
            "revenue": F.sum("revenue").cast("double"),
            "n_parts": F.countDistinct("p_partkey"),
            "avg_qty": F.sum("sum_qty").cast("double") / F.sum("n_lines"),
        },
        by=["part.p_brand"],
    )


def q_measures_heterogeneous(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: distinct aggregate fn per measure (min/max/sum/count) through
    construction + a regrain (count re-aggregates as sum-of-counts,
    reference R/measure.R:14-28, R/fact.R:27-35)."""
    from data_cube_spark.build import from_table

    t = load_tables(spark, sf_dir)
    dc = from_table(
        t["lineitem"],
        {"returnflag": "l_returnflag", "linestatus": "l_linestatus"},
        [Measure("min_qty", "l_quantity", agg="min"),
         Measure("max_price", "l_extendedprice", agg="max"),
         Measure("sum_disc", F.col("l_discount").cast("decimal(18,2)"), agg="sum"),
         Measure("n_lines", "l_orderkey", agg="count")],
    )
    q = dc.q(linestatus=Collapse())
    return q.fact.df.select(
        "l_returnflag",
        F.col("min_qty").cast("double").alias("min_qty"),
        F.col("max_price").cast("double").alias("max_price"),
        F.col("sum_disc").cast("double").alias("sum_disc"),
        "n_lines",
    )


def q_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 distinct counting as a Measure aggregate (count_distinct)."""
    from data_cube_spark.build import from_table

    t = load_tables(spark, sf_dir)
    dc = from_table(
        t["orders"],
        {"priority": "o_orderpriority"},
        [Measure("n_customers", "o_custkey", agg="count_distinct"),
         Measure("n_orders", "o_orderkey", agg="count")],
    )
    return dc.fact.df


def q_udaf_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 arbitrary Python aggregate via Arrow-batched pandas UDAF
    (reference user-supplied ``fun.aggregate`` beyond the whitelist)."""
    from data_cube_spark.build import from_table

    t = load_tables(spark, sf_dir)
    dc = from_table(
        t["lineitem"],
        {"returnflag": "l_returnflag"},
        [Measure("median_qty", "l_quantity",
                 agg=lambda s: float(s.median()), dtype="double")],
    )
    return dc.fact.df


def q_window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 window function: cumulative monthly order total. The window is
    unpartitioned but runs over the ~dozens-of-rows monthly aggregate, not
    the raw fact — aggregate first, window after."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    monthly = t["orders"].groupBy(
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("_m"))
    w = Window.orderBy("o_year", "o_month").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return monthly.select(
        "o_year", "o_month",
        F.col("_m").cast("double").alias("month_total"),
        F.sum("_m").over(w).cast("double").alias("cum_total"),
    )


def q_format_currency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 per-measure format functions: currency formatting (reference
    ``fun.format`` / currency.format, R/measure.R:51-55) through the
    Measure.fmt machinery + sorted formatted export."""
    from data_cube_spark.build import from_table
    from data_cube_spark.functions import currency_format

    t = load_tables(spark, sf_dir)
    m = Measure("total", F.col("o_totalprice").cast("decimal(18,2)"),
                agg="sum", fmt=currency_format)
    dc = from_table(t["orders"], {"priority": "o_orderpriority"}, [m])
    return pivot_format(dc, rows=["o_orderpriority"], formatted=True)


def q_pivot_formatted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 format+pivot composition (reference R/data.cube.R:433-458: format
    the measures, THEN dcast): currency-formatted order totals pivoted by
    order year into columns."""
    from data_cube_spark.build import from_table
    from data_cube_spark.functions import currency_format

    t = load_tables(spark, sf_dir)
    orders = t["orders"].withColumn("o_year", F.year("o_orderdate").cast("int"))
    m = Measure("total", F.col("o_totalprice").cast("decimal(18,2)"),
                agg="sum", fmt=currency_format)
    dc = from_table(orders, {"priority": "o_orderpriority", "oyear": "o_year"}, [m])
    return pivot_format(dc, rows=["o_orderpriority"], pivot_col="o_year",
                        pivot_values=[1995, 1996], formatted=True)


def q_anti_join_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 set-op coverage: left-anti join (customers with no orders),
    aggregated by segment."""
    t = load_tables(spark, sf_dir)
    idle = t["customer"].join(
        t["orders"].select(F.col("o_custkey").alias("c_custkey")),
        "c_custkey", "left_anti",
    )
    return idle.groupBy("c_mktsegment").agg(F.count("*").alias("n_idle"))


def q_grouping_sets_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI GROUPING SETS with an arbitrary (non-rollup, non-cube) set
    list: {(flag,status), (flag,year), ()} — the native groupingSets
    Expand generates exactly these three sets in one shuffle
    (groupingsets.py::grouping_sets_table)."""
    from data_cube_spark.groupingsets import grouping_sets_table

    t = load_tables(spark, sf_dir)
    li = t["lineitem"].select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_linestatus").alias("status"),
        F.year("l_shipdate").alias("ship_year"),
        F.col("l_quantity"),
    )
    out = grouping_sets_table(
        li,
        [["flag", "status"], ["flag", "ship_year"], []],
        ["flag", "status", "ship_year"],
        [
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
            .alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        ],
    )
    return out.select(
        "flag", "status", "ship_year", "sum_qty", "n_rows",
        F.col("grouping_id").cast("int").alias("grouping_id"),
        F.col("grouping_level").cast("int").alias("grouping_level"),
    )


def q_window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 window frames: 3-month moving average of monthly order totals,
    PARTITIONED by year (the frame resets at year boundaries, so the window
    parallelizes across years — no single-reducer funnel)."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    monthly = t["orders"].groupBy(
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("_m"))
    w = (Window.partitionBy("o_year").orderBy("o_month")
         .rowsBetween(-2, 0))
    return monthly.select(
        "o_year", "o_month",
        F.col("_m").cast("double").alias("month_total"),
        (F.sum("_m").over(w).cast("double")
         / F.count(F.lit(1)).over(w)).alias("moving_avg_3m"),
    )


def q_merge_delta_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental cube maintenance (S-family): build the cube on half the
    events (even event_id), merge_delta the other half, return the merged
    fact. Metamorphic contract cube(a ∪ b) == cube(a).merge_delta(b) —
    decimal partials merge exactly, so values hash-match the full-build
    oracle."""
    from data_cube_spark.build import from_table

    t = load_tables(spark, sf_dir)
    ev = t["events"]
    measures = [
        Measure("sum_value", F.col("value").cast("decimal(18,6)"), agg="sum"),
        Measure("n_events", "event_id", agg="count"),
    ]
    half = from_table(ev.where(F.col("event_id") % 2 == 0),
                      {"event_type": "event_type"}, measures)
    merged = half.merge_delta(ev.where(F.col("event_id") % 2 == 1))
    return merged.fact.df.select(
        "event_type", F.col("sum_value").cast("double").alias("sum_value"),
        "n_events")


def q_remove_delta_retraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retraction (inverse of merge_delta): build the cube on ALL events,
    remove_delta the odd-event_id half, return the fact — value-identical
    to building on the even half alone (the oracle). Fully-retracted
    grains are dropped via the count measure reaching zero
    (model.py::DataCube.remove_delta)."""
    from data_cube_spark.build import from_table

    t = load_tables(spark, sf_dir)
    ev = t["events"]
    measures = [
        Measure("sum_value", F.col("value").cast("decimal(18,6)"), agg="sum"),
        Measure("n_events", "event_id", agg="count"),
    ]
    full = from_table(ev, {"event_type": "event_type"}, measures)
    remaining = full.remove_delta(ev.where(F.col("event_id") % 2 == 1))
    return remaining.fact.df.select(
        "event_type", F.col("sum_value").cast("double").alias("sum_value"),
        "n_events")


def q_cube_store_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cube persistence (E-family): save the star cube (fact at grain +
    dimension tables + JSON metadata), load it back, and aggregate through
    the reloaded metadata — value-identical to aggregating the original."""
    import shutil
    import tempfile

    from data_cube_spark.sources.store import load_cube, save_cube

    dc = tpch_cube(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="cube_store_")
    try:
        save_cube(dc, path)
        dc2 = load_cube(spark, path)
        return _m(dc2.aggregate(["supplier.r_name"])).localCheckpoint()
    finally:
        shutil.rmtree(path, ignore_errors=True)


def q_revenue_share_of_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-parent (ratio-to-report) analytics: nation revenue as a
    fraction of its region's total — the cube aggregate at
    (nation, region) grain composed with a region-partitioned window
    sum. The window runs over the AGGREGATED frame (one row per nation),
    so the fact is scanned and shuffled exactly once; the share division
    is one double op over decimal-exact sums, hash-matching the SQL
    window."""
    dc = tpch_cube(spark, sf_dir)
    agg = dc.aggregate(["supplier.n_name", "supplier.r_name"])
    w = Window.partitionBy("r_name")
    return agg.select(
        "n_name", "r_name",
        F.col("revenue").cast("double").alias("revenue"),
        (F.col("revenue").cast("double")
         / F.sum(F.col("revenue")).over(w).cast("double"))
        .alias("share_of_region"),
    )
