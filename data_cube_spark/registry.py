"""Driver-contract query registry: every implemented operator from
SURVEY.md §2 (plus the north-star pipeline operators) exposed as a
``(spark, sf_dir) -> DataFrame`` callable with a matching DuckDB oracle SQL.

Determinism conventions (so order-insensitive value hashes match):
- money sums go through ``DECIMAL(18,2)`` on BOTH sides (exact, independent
  of shuffle order), surfaced as ``DOUBLE``;
- averages are expressed as decimal-sum-cast-double / count — one double
  division, bit-identical in both engines;
- every computed column is aliased identically in Spark and SQL;
- ranking ties are broken by an id column.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_cube_spark.export import denormalize, pivot_format
from data_cube_spark.functions import add_surrogate_key, topk_per_group
from data_cube_spark.groupingsets import rollup_cube
from data_cube_spark.model import Measure
from data_cube_spark.operators import dedup, multimodal, similarity, text
from data_cube_spark.operators.sampling import hex_threshold as _hex_threshold
from data_cube_spark.operators.text import LANG_STOPWORDS
from data_cube_spark.selectors import AnyOf, C, Collapse, CubeOp, Range, RollupOp
from data_cube_spark.sources.star import load_tables, parquet_rows, tpch_cube
from data_cube_spark.streaming import sessionize_batch, tumbling_agg

QueryFn = Callable[[SparkSession, str], DataFrame]

# -- SQL fragments shared with the oracles ----------------------------------

SQL_QTY = "SUM(CAST(l_quantity AS DECIMAL(18,2)))"
SQL_REV = (
    "SUM(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l_discount AS DECIMAL(18,2))))"
)
SQL_CHARGE = (
    "SUM(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l_discount AS DECIMAL(18,2)))"
    " * (1 + CAST(l_tax AS DECIMAL(18,2))))"
)
SQL_GRAIN = f"""
  SELECT l_orderkey AS o_orderkey, l_partkey AS p_partkey, l_suppkey AS s_suppkey,
         {SQL_QTY} AS sum_qty, {SQL_REV} AS revenue, {SQL_CHARGE} AS sum_charge,
         COUNT(*) AS n_lines
  FROM lineitem GROUP BY 1, 2, 3
"""


def _m(df: DataFrame, *extra: str) -> DataFrame:
    """Surface the cube's decimal measures as doubles (stable output schema)."""
    keep = [c for c in df.columns if c not in {"sum_qty", "revenue", "sum_charge", "n_lines"}]
    out = df.select(
        *keep,
        *[F.col(c).cast("double").alias(c) for c in ("sum_qty", "revenue", "sum_charge") if c in df.columns],
        *([F.col("n_lines")] if "n_lines" in df.columns else []),
    )
    return out


_MEASURE_SQL = (
    f"CAST({SQL_QTY} AS DOUBLE) AS sum_qty, CAST({SQL_REV} AS DOUBLE) AS revenue, "
    f"CAST({SQL_CHARGE} AS DOUBLE) AS sum_charge, COUNT(*) AS n_lines"
)

_NORM_SQL = (
    "TRIM(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),"
    " '\\s+', ' ', 'g'))"
)


def _lang_counts_sql() -> dict[str, str]:
    out = {}
    for lang, words in LANG_STOPWORDS.items():
        pat = r"(?i)\b(" + "|".join(words) + r")\b"
        out[lang] = f"len(regexp_extract_all(text, '{pat}'))"
    return out


# ===========================================================================
# Cube-engine queries (SURVEY §2 parity)
# ===========================================================================

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


# -- TPC-H-shaped headline queries ------------------------------------------

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


def q_tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape through from_table: degenerate flag dims, decimal
    sums, averages as sum/count."""
    from data_cube_spark.build import from_table

    t = load_tables(spark, sf_dir)
    li = t["lineitem"].where(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
    dc = from_table(
        li,
        {"returnflag": "l_returnflag", "linestatus": "l_linestatus"},
        [
            Measure("sum_qty", F.col("l_quantity").cast("decimal(18,2)"), agg="sum"),
            Measure("sum_base_price", F.col("l_extendedprice").cast("decimal(18,2)"), agg="sum"),
            Measure("sum_disc_price",
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)")), agg="sum"),
            Measure("sum_charge",
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
                    * (F.lit(1) + F.col("l_tax").cast("decimal(18,2)")), agg="sum"),
            Measure("count_order", "l_orderkey", agg="count"),
        ],
    )
    out = dc.fact.df
    return out.select(
        "l_returnflag", "l_linestatus",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("sum_base_price").cast("double").alias("sum_base_price"),
        F.col("sum_disc_price").cast("double").alias("sum_disc_price"),
        F.col("sum_charge").cast("double").alias("sum_charge"),
        (F.col("sum_qty").cast("double") / F.col("count_order")).alias("avg_qty"),
        (F.col("sum_base_price").cast("double") / F.col("count_order")).alias("avg_price"),
        "count_order",
    )


def q_tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment + date-range dice through the snowflake in
    ONE selector (the Range bound reaches the dimension scan structurally,
    not via optimizer pushdown of a post-aggregation WHERE), revenue per
    order, deterministic top-10."""
    from datetime import datetime

    dc = tpch_cube(spark, sf_dir)
    q = dc.q(orders=C(c_mktsegment=["BUILDING"],
                      o_orderdate=Range(hi=datetime(1998, 1, 1))))
    agg = q.aggregate(["o_orderkey", "orders.o_orderdate", "orders.o_orderpriority"])
    out = agg.orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc()).limit(10)
    return out.select(
        "o_orderkey", F.col("revenue").cast("double").alias("revenue"),
        "o_orderdate", "o_orderpriority",
    )


def q_tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by supplier nation where the customer's
    nation equals the supplier's nation, region-filtered, one year."""
    dc = tpch_cube(spark, sf_dir)
    q = dc.q(supplier=C(r_name=["EUROPE"]))
    df = denormalize(q)
    out = (
        df.where((F.col("c_nationkey") == F.col("n_nationkey"))
                 & (F.col("d_year") == 1996))
        .groupBy("n_name")
        .agg(F.sum("revenue").cast("double").alias("revenue"),
             F.sum("n_lines").alias("n_lines"))
    )
    return out


def q_stats_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates as Measures (stddev/variance from the
    whitelist) over a degenerate dimension."""
    from data_cube_spark.build import from_table

    t = load_tables(spark, sf_dir)
    dc = from_table(
        t["lineitem"],
        {"returnflag": "l_returnflag"},
        [Measure("sd_qty", "l_quantity", agg="stddev"),
         Measure("var_qty", "l_quantity", agg="variance")],
    )
    return dc.fact.df


def q_tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure predicate + aggregate — every filter reaches
    the parquet scan (PushedFilters), no joins."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"]
    out = li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")
              * F.col("l_discount").cast("decimal(18,2)"))
        .cast("double").alias("forecast_revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    return out


def q_tpch_q12_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional aggregation (CASE WHEN inside sums)
    after a fact-dim join, grouped by a degenerate dimension."""
    t = load_tables(spark, sf_dir)
    j = t["lineitem"].join(t["orders"],
                           F.col("l_orderkey") == F.col("o_orderkey"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    # driver lineitem has no l_shipmode column; group the same conditional
    # aggregation by returnflag instead
    return j.groupBy("l_returnflag").agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
    )


def q_tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional revenue ratio over a broadcast part
    join — one global row, one double division."""
    t = load_tables(spark, sf_dir)
    j = t["lineitem"].join(F.broadcast(t["part"]),
                           F.col("l_partkey") == F.col("p_partkey"))
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0))
    return j.agg(
        (F.lit(100.0) * F.sum(promo).cast("double")
         / F.sum(rev).cast("double")).alias("promo_revenue_pct")
    )


def _rev_expr():
    """Exact decimal line revenue (built lazily: F.col needs a live session)."""
    return (F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)")))


def q_tpch_q4_priority_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS correlated subquery as a left-semi join
    (orders with at least one returned line), counted by priority.

    Driver lineitem has no l_commitdate/l_receiptdate, so the EXISTS
    predicate is ``l_returnflag = 'R'`` instead of late-delivery — same
    semi-join + count-by-degenerate-dim plan shape. Shuffles once on
    orderkey (semi), once on priority (agg); neither side broadcast."""
    t = load_tables(spark, sf_dir)
    returned = t["lineitem"].where(F.col("l_returnflag") == "R").select("l_orderkey")
    sem = t["orders"].join(returned, F.col("o_orderkey") == F.col("l_orderkey"),
                           "left_semi")
    return sem.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


def q_tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair filter, revenue by
    (supp_nation, cust_nation, year). Supplier+nation broadcast (small
    dims); customer joined on custkey after orders — the two big joins
    shuffle on their keys and AQE coalesces."""
    t = load_tables(spark, sf_dir)
    sn = (t["supplier"]
          .join(t["nation"], F.col("s_nationkey") == F.col("n_nationkey"))
          .select("s_suppkey", F.col("n_name").alias("supp_nation")))
    cn = (t["nation"]
          .select(F.col("n_nationkey").alias("cn_nationkey"),
                  F.col("n_name").alias("cust_nation")))
    j = (t["lineitem"]
         .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
         .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
         .join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
         .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_nationkey")))
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (j.where(pair)
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").alias("l_year"))
            .agg(F.sum(_rev_expr()).cast("double").alias("revenue"),
                 F.count("*").alias("n_lines")))


def q_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of regional revenue per year —
    conditional sum over the full denormalized star, ECONOMY parts only,
    ASIA customers only. Part filter pushes to the broadcast side."""
    t = load_tables(spark, sf_dir)
    part = t["part"].where(F.col("p_type") == "ECONOMY").select("p_partkey")
    sn = (t["supplier"]
          .join(t["nation"], F.col("s_nationkey") == F.col("n_nationkey"))
          .select("s_suppkey", F.col("n_name").alias("supp_nation")))
    asia = (t["nation"]
            .join(t["region"], F.col("n_regionkey") == F.col("r_regionkey"))
            .where(F.col("r_name") == "ASIA")
            .select(F.col("n_nationkey").alias("cn_nationkey")))
    j = (t["lineitem"]
         .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
         .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
         .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
         .join(F.broadcast(asia), F.col("c_nationkey") == F.col("cn_nationkey"))
         .join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey")))
    target = F.when(F.col("supp_nation") == "NATION_3", _rev_expr()).otherwise(
        F.lit(0).cast("decimal(18,2)"))
    return (j.groupBy(F.year("o_orderdate").alias("o_year"))
            .agg((F.sum(target).cast("double")
                  / F.sum(_rev_expr()).cast("double")).alias("mkt_share"),
                 F.sum(_rev_expr()).cast("double").alias("total_revenue")))


def q_tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer in one
    quarter, top-20 with deterministic tie-break on custkey."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].where(
        (F.col("l_returnflag") == "R")
        & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp")))
    j = (li.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
         .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
         .join(F.broadcast(t["nation"]),
               F.col("c_nationkey") == F.col("n_nationkey")))
    agg = (j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
           .agg(F.sum(_rev_expr()).alias("rev")))
    return (agg.orderBy(F.col("rev").desc(), F.col("c_custkey").asc())
            .limit(20)
            .select("c_custkey", "c_name",
                    F.col("rev").cast("double").alias("revenue"),
                    "c_acctbal", "n_name"))


def q_tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: orders-per-customer histogram — left join so
    zero-order customers survive, two cheap aggregations."""
    t = load_tables(spark, sf_dir)
    per_cust = (t["customer"]
                .join(t["orders"].select("o_custkey", "o_orderkey"),
                      F.col("c_custkey") == F.col("o_custkey"), "left")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count("*").alias("custdist")))


def q_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: quarterly revenue view + global max — the max is
    a 1-row broadcast joined back on exact DECIMAL equality (no double
    drift), suppliers broadcast."""
    t = load_tables(spark, sf_dir)
    rev = (t["lineitem"]
           .where((F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                  & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp")))
           .groupBy("l_suppkey")
           .agg(F.sum(_rev_expr()).alias("total_rev")))
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    top = rev.join(F.broadcast(mx), F.col("total_rev") == F.col("max_rev"))
    return (top.join(F.broadcast(t["supplier"]),
                     F.col("l_suppkey") == F.col("s_suppkey"))
            .select("s_suppkey", "s_name",
                    F.col("total_rev").cast("double").alias("total_revenue"))
            .orderBy("s_suppkey"))


def q_tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part average threshold. The
    per-part avg is a window over the already-joined fact (one shuffle on
    partkey), expressed as exact decimal-sum / count so the threshold is
    bit-identical to the oracle. Driver part has no p_container; the
    scope filter is brand + size."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    part = (t["part"]
            .where((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 10))
            .select("p_partkey"))
    j = t["lineitem"].join(F.broadcast(part),
                           F.col("l_partkey") == F.col("p_partkey"))
    w = Window.partitionBy("l_partkey")
    thresh = (F.lit(0.2)
              * (F.sum(F.col("l_quantity").cast("decimal(18,2)")).over(w)
                 .cast("double") / F.count(F.lit(1)).over(w)))
    small = j.withColumn("qty_thresh", thresh).where(F.col("l_quantity") < F.col("qty_thresh"))
    return small.agg(
        (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
         / F.lit(7.0)).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_lines"))


def q_tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING on a grouped fact (orders with >200 total
    qty), re-joined to orders + customer; top-100 by totalprice with
    orderkey tie-break."""
    t = load_tables(spark, sf_dir)
    big = (t["lineitem"].groupBy("l_orderkey")
           .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty"))
           .where(F.col("sum_qty") > 200))
    j = (big.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
         .join(t["customer"], F.col("o_custkey") == F.col("c_custkey")))
    return (j.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
            .limit(100)
            .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                    "o_totalprice",
                    F.col("sum_qty").cast("double").alias("sum_qty")))


def q_tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of brand/size/quantity conjuncts —
    one broadcast part join, OR-of-ANDs predicate, single revenue row.
    Driver part has no p_container; size ranges stand in for container
    classes."""
    t = load_tables(spark, sf_dir)
    j = t["lineitem"].join(F.broadcast(t["part"]),
                           F.col("l_partkey") == F.col("p_partkey"))
    pred = (
        ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#4") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    return j.where(pred).agg(
        F.sum(_rev_expr()).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"))


def q_tpch_q22_idle_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery (avg positive balance) as a
    1-row broadcast cross join + anti join against orders, grouped by
    nation. Driver customer has no c_phone; nation plays the country-code
    role."""
    t = load_tables(spark, sf_dir)
    avg_bal = (t["customer"].where(F.col("c_acctbal") > 0)
               .agg((F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                     .cast("double")
                     / F.count(F.lit(1))).alias("avg_bal")))
    rich = (t["customer"]
            .crossJoin(F.broadcast(avg_bal))
            .where(F.col("c_acctbal") > F.col("avg_bal")))
    idle = rich.join(t["orders"].select("o_custkey"),
                     F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    return (idle.join(F.broadcast(t["nation"]),
                      F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy("n_name")
            .agg(F.count("*").alias("numcust"),
                 F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                 .cast("double").alias("totacctbal")))


def _ps_catalog(t: dict[str, DataFrame]) -> DataFrame:
    """partsupp surrogate: the driver star has no partsupp table, so the
    (part, supplier) catalog is derived from the fact — distinct
    (l_partkey, l_suppkey) with ``supply_cost = MIN(l_extendedprice /
    l_quantity)``. MIN over a group is order-independent, so the double
    matches the oracle bit-for-bit. One shuffle on the composite key;
    at 100 TB this is the same partial-agg shape as any fact rollup."""
    return (t["lineitem"]
            .groupBy("l_partkey", "l_suppkey")
            .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity"))
                 .alias("supply_cost")))


def q_tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for STANDARD size-15 parts, the EUROPE supplier
    with the minimum supply cost — correlated-min as a window over
    partkey (one shuffle), equality join back on the exact double.
    partsupp is the derived catalog (`_ps_catalog`); supplier/nation/
    region and the filtered part list broadcast."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    ps = _ps_catalog(t)
    parts = (t["part"]
             .where((F.col("p_size") == 15) & (F.col("p_type") == "STANDARD"))
             .select("p_partkey", "p_brand"))
    eu = (t["supplier"]
          .join(t["nation"], F.col("s_nationkey") == F.col("n_nationkey"))
          .join(t["region"], F.col("n_regionkey") == F.col("r_regionkey"))
          .where(F.col("r_name") == "EUROPE")
          .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
    j = (ps.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
         .join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey")))
    w = Window.partitionBy("p_partkey")
    j = j.withColumn("min_cost", F.min("supply_cost").over(w))
    return (j.where(F.col("supply_cost") == F.col("min_cost"))
            .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
                    "s_suppkey", "supply_cost")
            .orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey").asc(),
                     F.col("p_partkey").asc())
            .limit(100))


def q_tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit (revenue minus cost) by supplier nation and
    order year for 'red …' parts. Driver has no ps_supplycost; cost is
    ``p_retailprice * l_quantity`` (exact decimal, same multi-join
    dataflow: part broadcast, orders shuffled on orderkey, supplier+
    nation broadcast)."""
    t = load_tables(spark, sf_dir)
    red = (t["part"].where(F.col("p_name").startswith("red"))
           .select("p_partkey", "p_retailprice"))
    sn = (t["supplier"]
          .join(t["nation"], F.col("s_nationkey") == F.col("n_nationkey"))
          .select("s_suppkey", F.col("n_name").alias("nation")))
    cost = (F.col("p_retailprice").cast("decimal(18,2)")
            * F.col("l_quantity").cast("decimal(18,2)"))
    j = (t["lineitem"]
         .join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"))
         .join(t["orders"].select("o_orderkey", "o_orderdate"),
               F.col("l_orderkey") == F.col("o_orderkey"))
         .join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey")))
    return (j.groupBy("nation", F.year("o_orderdate").alias("o_year"))
            .agg(F.sum(_rev_expr() - cost).cast("double").alias("sum_profit"),
                 F.count(F.lit(1)).alias("n_lines")))


def q_tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part catalog value for one nation's suppliers,
    kept where it exceeds a fraction of the global total — the total is a
    1-row broadcast cross join (scalar subquery), never a second scan
    group-by-all. Value = supply_cost-weighted line count per part from
    the derived catalog."""
    t = load_tables(spark, sf_dir)
    supp_n = (t["supplier"]
              .join(t["nation"], F.col("s_nationkey") == F.col("n_nationkey"))
              .where(F.col("n_name") == "NATION_7")
              .select("s_suppkey"))
    val = (t["lineitem"]
           .join(F.broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
           .groupBy("l_partkey")
           .agg(F.sum(_rev_expr()).alias("value")))
    tot = val.agg(F.sum("value").alias("total"))
    return (val.crossJoin(F.broadcast(tot))
            .where(F.col("value").cast("double")
                   > F.lit(0.001) * F.col("total").cast("double"))
            .select(F.col("l_partkey").alias("p_partkey"),
                    F.col("value").cast("double").alias("part_value")))


def q_tpch_q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts by (brand, type, size)
    over the derived catalog, excluding parts of one brand and suppliers
    with negative balance (the complaints NOT-IN stand-in, expressed as a
    broadcast anti join)."""
    t = load_tables(spark, sf_dir)
    ps = t["lineitem"].select("l_partkey", "l_suppkey").distinct()
    bad = t["supplier"].where(F.col("s_acctbal") < 0).select("s_suppkey")
    parts = (t["part"]
             .where((F.col("p_brand") != "Brand#5")
                    & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
             .select("p_partkey", "p_brand", "p_type", "p_size"))
    j = (ps.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"),
                 "left_anti")
         .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey")))
    return (j.groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt")))


def q_tpch_q20_excess_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers of 'red …' parts whose all-time shipped
    quantity exceeds twice their 1996 quantity (availqty stand-in), for
    one nation — nested-IN subqueries expressed as two fact rollups
    joined on the composite key, then a semi join up to suppliers."""
    t = load_tables(spark, sf_dir)
    red = t["part"].where(F.col("p_name").startswith("red")).select("p_partkey")
    # one conditional aggregate instead of two fact rollups joined on the
    # composite key: the red-part broadcast filter runs BEFORE the shuffle
    # (1/|colors| of the rows reach it) and one scan produces both sums;
    # the q96 null check reproduces the inner join on 1996 shippers
    agg = (t["lineitem"]
           .join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"))
           .groupBy("l_partkey", "l_suppkey")
           .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qall"),
                F.sum(F.when(F.year("l_shipdate") == 1996,
                             F.col("l_quantity").cast("decimal(18,2)")))
                .alias("q96")))
    cand = (agg.where(F.col("q96").isNotNull()
                      & (F.col("qall") > F.lit(2) * F.col("q96")))
            .select("l_suppkey"))
    sn = (t["supplier"]
          .join(t["nation"], F.col("s_nationkey") == F.col("n_nationkey"))
          .where(F.col("n_name") == "NATION_4")
          .select("s_suppkey", "s_name"))
    return (sn.join(cand, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
            .orderBy("s_name"))


def q_tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers (one nation) with a returned line on a
    finalized multi-supplier order where no OTHER supplier's line was
    returned — EXISTS as a left-semi join with an inequality conjunct,
    NOT EXISTS as the matching left-anti join (both shuffled hash joins
    on orderkey, the non-equi suppkey predicate evaluated join-side).
    Driver lineitem has no receipt/commit dates; l_returnflag='R' is the
    lateness stand-in (as in Q4)."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].select("l_orderkey", "l_suppkey")
    late = t["lineitem"].where(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey")
    sn = (t["supplier"]
          .join(t["nation"], F.col("s_nationkey") == F.col("n_nationkey"))
          .where(F.col("n_name") == "NATION_2")
          .select("s_suppkey", "s_name"))
    fin = t["orders"].where(F.col("o_orderstatus") == "F").select("o_orderkey")
    l1 = (late
          .join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
          .join(fin, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi"))
    l2 = li.select(F.col("l_orderkey").alias("o2_orderkey"),
                   F.col("l_suppkey").alias("o2_suppkey"))
    l3 = late.select(F.col("l_orderkey").alias("o3_orderkey"),
                     F.col("l_suppkey").alias("o3_suppkey"))
    l1 = l1.join(
        l2, (F.col("l_orderkey") == F.col("o2_orderkey"))
        & (F.col("l_suppkey") != F.col("o2_suppkey")), "left_semi")
    l1 = l1.join(
        l3, (F.col("l_orderkey") == F.col("o3_orderkey"))
        & (F.col("l_suppkey") != F.col("o3_suppkey")), "left_anti")
    return (l1.groupBy("s_name").agg(F.count(F.lit(1)).alias("numwait"))
            .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
            .limit(100))


# ===========================================================================
# Pipeline operators (north-star)
# ===========================================================================

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return dedup.exact_groups(t["documents"])


def q_dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-normalization dedup groups (fingerprint = md5 of normalized
    text)."""
    t = load_tables(spark, sf_dir)
    return dedup.exact_groups(t["documents"], canonical=True)


def q_dedup_keep_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Representative-selection policy: canonical dedup groups keeping the
    LONGEST original variant (ties → smallest id) — the standard
    curation choice when near-identical normalization variants differ in
    completeness. One map-side-combined max_by aggregate, no window
    (operators/dedup.py::exact_groups keep='longest')."""
    t = load_tables(spark, sf_dir)
    return dedup.exact_groups(t["documents"], canonical=True, keep="longest")


def q_text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["documents"].select(
        "doc_id", text.token_count("text").alias("n_tokens"),
        text.subword_count("text").alias("n_subwords"),
    )


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return text.quality_features(t["documents"])


def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return text.language_id(t["documents"])


def q_text_subwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-flavored subword count (word/digit/punct split) next to the
    whitespace token count — both pure JVM expressions."""
    t = load_tables(spark, sf_dir)
    return t["documents"].select(
        "doc_id",
        text.token_count("text").alias("n_tokens_ws"),
        text.subword_count("text").alias("n_subwords"),
    )


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["documents"].select("doc_id", text.fingerprint("text").alias("fingerprint"))


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document (distinct-token ratio,
    top-token / top-bigram fractions) — pure array expressions, zero
    shuffles."""
    t = load_tables(spark, sf_dir)
    return text.repetition_stats(t["documents"])


#: document-frequency cap for the registered ngram query: shingles appearing
#: in more docs are dropped before the inverted-index self-join. Without the
#: cap one stop-shingle makes the join quadratic within a block at corpus
#: scale (VERDICT r1). The oracle SQL applies the identical cap.
NGRAM_MAX_DF = 100


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs, blocked by (lang, source), with
    the ``max_df`` stop-shingle cap bounding candidate generation."""
    t = load_tables(spark, sf_dir)
    return dedup.ngram_jaccard_pairs(
        t["documents"], k=3, threshold=0.05, block_cols=["lang", "source"],
        hash_shingles=True, max_df=NGRAM_MAX_DF,
    )


def q_incremental_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingest dedup: odd doc_ids are the NEW batch, even the
    standing corpus; keep the batch docs that are not near-duplicates
    (3-gram Jaccard >= 0.05) of any corpus doc. The inverted-index join is
    batch x corpus only — never a corpus self-join
    (operators/dedup.py::incremental_dedup_keep)."""
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    batch = docs.where(F.col("doc_id") % 2 == 1)
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    kept = dedup.incremental_dedup_keep(
        batch, corpus, k=3, threshold=0.05, max_df=NGRAM_MAX_DF,
        hash_shingles=True,
    )
    return kept.select("doc_id")


def q_incremental_minhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path for continuous-ingest dedup, emitted as a DRIVER-
    CHECKABLE recall invariant (VERDICT r3 #2): the batch (odd doc_ids) is
    banded against a PRECOMPUTED corpus signature table (even doc_ids) —
    only the batch is shingled per run; candidates come from the (band_id,
    band_hash) equi-join. The output rows are the exact batch×corpus
    3-gram-Jaccard pairs at J >= 0.5 (SQL-expressible truth), each
    carrying ``lsh_found`` = whether the MinHash path produced the pair;
    the oracle asserts TRUE for every truth pair. Theory: the data's
    near-dup band is J >= 0.8, where missing all 16 bands has probability
    (1-J^4)^16 <= 2.2e-4 and the 64-hash estimate clears the 0.3 filter by
    >7 sigma; measured 0 misses at sf0.001/0.01/0.1."""
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    batch = docs.where(F.col("doc_id") % 2 == 1)
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    truth = dedup.incremental_ngram_pairs(
        batch, corpus, k=3, threshold=0.5, hash_shingles=True
    ).select("batch_id", "corpus_id", "jaccard")
    # localCheckpoint: the signature table feeds both the banding
    # explosion and the estimate join (in production it is a stored
    # index, read twice); checkpoint blocks free on GC, a persist()
    # would accumulate across repeated registry runs in one session
    corpus_sigs = dedup.minhash_signatures(corpus).localCheckpoint()
    cands = dedup.incremental_minhash_pairs(
        batch, corpus_sigs, threshold=0.3
    ).select("batch_id", "corpus_id", F.lit(True).alias("_f"))
    return (
        truth.join(cands, ["batch_id", "corpus_id"], "left")
        .select("batch_id", "corpus_id", "jaccard",
                F.coalesce("_f", F.lit(False)).alias("lsh_found"))
    )


def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs, emitted as a DRIVER-CHECKABLE recall
    invariant (VERDICT r3 #2): the exact 3-gram-Jaccard pairs at J >= 0.5
    (SQL-expressible truth — no blocking, no frequency cap) each carry
    ``lsh_found`` = whether the banded MinHash candidate generator
    (signatures -> 16 banded buckets -> estimate filter >= 0.3) produced
    the pair; the oracle asserts TRUE for every truth pair. Theory: at
    the data's near-dup band (J >= 0.8) a pair misses all 16 bands with
    probability (1-J^4)^16 <= 2.2e-4; measured 0 misses at every sf."""
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    truth = dedup.ngram_jaccard_pairs(
        docs, k=3, threshold=0.5, hash_shingles=True
    ).select("id_a", "id_b", "jaccard")
    cands = dedup.minhash_dedup_pairs(docs, threshold=0.3).select(
        "id_a", "id_b", F.lit(True).alias("_f"))
    return (
        truth.join(cands, ["id_a", "id_b"], "left")
        .select("id_a", "id_b", "jaccard",
                F.coalesce("_f", F.lit(False)).alias("lsh_found"))
    )


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash Hamming-blocked near-dup pairs, emitted as a DRIVER-
    CHECKABLE invariant (VERDICT r4 #2 — the trick that converted the
    other rows-only queries): the 64-bit signature is engine-specific, so
    the oracle checks DETERMINISTIC consequences instead. SimHash hashes
    the DISTINCT normalized-token set, so two docs with the same token
    set have IDENTICAL signatures — hamming 0, guaranteed to share every
    band and survive the hamming <= 8 filter. The token-set-duplicate
    truth pairs ARE SQL-expressible (equi-join on the sorted-distinct-
    token hash); each truth pair carries ``simhash_found`` (pair emitted
    by the banded operator) and ``hamming_zero``, plus two global output
    invariants (ordering id_a < id_b, hamming bound) on a broadcast
    1-row join. All four are provably TRUE; the oracle asserts them."""
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    norm = text.normalized("text")
    tokset = F.array_sort(F.array_distinct(text.tokens(norm)))
    h = docs.where(norm != "").select(
        "doc_id", F.md5(F.encode(F.array_join(tokset, " "), "UTF-8")).alias("_th")
    )
    truth = (
        h.alias("a")
        .join(h.alias("b"), F.col("a._th") == F.col("b._th"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )
    # the operator under test; checkpointed because it feeds both the
    # membership join and the global-invariant aggregate
    pairs = dedup.simhash_near_pairs(
        docs, band_bits=16, max_hamming=8
    ).localCheckpoint()
    flags = pairs.agg(
        F.coalesce(F.bool_and(F.col("id_a") < F.col("id_b")), F.lit(True))
        .alias("pairs_ordered_ok"),
        F.coalesce(F.bool_and(F.col("hamming") <= 8), F.lit(True))
        .alias("hamming_bounded_ok"),
    )
    return (
        truth.join(pairs, ["id_a", "id_b"], "left")
        .crossJoin(F.broadcast(flags))
        .select(
            "id_a", "id_b",
            F.col("hamming").isNotNull().alias("simhash_found"),
            (F.coalesce(F.col("hamming"), F.lit(-1)) == 0).alias("hamming_zero"),
            "pairs_ordered_ok", "hamming_bounded_ok",
        )
    )


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-5 for query vectors vec_id < 10."""
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    queries = emb.where(F.col("vec_id") < 10)
    return similarity.cosine_topk(queries, emb, k=5)


def _ann_invariant(exact: DataFrame, approx: DataFrame,
                   mean_floor: float) -> DataFrame:
    """Driver-checkable ANN invariant rows: per query, the exact and
    approximate result counts (both k — catches an under-filled top-k)
    plus ``batch_recall_ok`` = mean recall@k over the query batch >= the
    floor. The scalar mean rides a broadcast 1-row join (sanctioned
    pattern — bytes bounded by the output, not the corpus)."""
    nex = exact.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_exact"))
    nap = approx.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_matches"))
    hits = (
        exact.select("query_id", "match_id")
        .join(approx.select("query_id", "match_id", F.lit(1).alias("_f")),
              ["query_id", "match_id"], "left")
        .groupBy("query_id")
        .agg(F.count("_f").alias("_n_hit"), F.count(F.lit(1)).alias("_n"))
    )
    mean = hits.agg(
        (F.sum("_n_hit") / F.sum("_n")).alias("_mean_recall"))
    return (
        nex.join(nap, "query_id")
        .crossJoin(F.broadcast(mean))
        .select("query_id",
                F.col("n_exact").cast("int").alias("n_exact"),
                F.col("n_matches").cast("int").alias("n_matches"),
                (F.col("_mean_recall") >= mean_floor).alias("batch_recall_ok"))
    )


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-5, emitted as a DRIVER-CHECKABLE
    invariant (VERDICT r3 #2): per query, result counts must equal k and
    mean recall@5 vs the exact ``cosine_topk`` must clear 0.25 (measured
    0.40-0.54 across sf0.001/0.01/0.1 with n_planes=4 — deterministic
    seeded hyperplanes, so the floor carries ~8 matches of margin over
    the 50 graded)."""
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    queries = emb.where(F.col("vec_id") < 10)
    exact = similarity.cosine_topk(queries, emb, k=5)
    approx = similarity.lsh_topk(queries, emb, k=5, n_planes=4)
    return _ann_invariant(exact, approx, mean_floor=0.25)


def q_embedding_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (>= 0.4) — the all-pairs
    verifier; the LSH-bucketed variant is the scale path."""
    t = load_tables(spark, sf_dir)
    return similarity.cosine_near_pairs(t["embeddings"], threshold=0.4,
                                        max_rows=None)


def q_embedding_near_pairs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed embedding near-dup pairs, emitted as a DRIVER-
    CHECKABLE recall invariant (VERDICT r3 #2): the exact cosine pairs at
    >= 0.45 (SQL truth) each carry ``lsh_found`` = whether the
    OR-amplified bucket join (n_planes=4, n_tables=48 — the recall-1.0
    configuration from test_plans) produced the pair at its 0.4
    operating threshold; the oracle asserts TRUE for every truth pair.
    Theory: per-pair miss probability at cosine 0.45 is
    (1-(1-θ/π)^4)^48 <= 9e-5; measured 0 misses at every sf."""
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    truth = similarity.cosine_near_pairs(emb, threshold=0.45, max_rows=None)
    cands = similarity.lsh_near_pairs(
        emb, threshold=0.4, n_planes=4, n_tables=48,
        corpus_rows=parquet_rows(sf_dir, "embeddings"),
    ).select("id_a", "id_b", F.lit(True).alias("_f"))
    return (
        truth.select("id_a", "id_b", "cosine")
        .join(cands, ["id_a", "id_b"], "left")
        .select("id_a", "id_b", F.col("cosine").cast("double").alias("cosine"),
                F.coalesce("_f", F.lit(False)).alias("lsh_found"))
    )


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantized approximate top-5, emitted as a DRIVER-
    CHECKABLE invariant (VERDICT r3 #2): per query, result counts must
    equal k and mean recall@5 vs exact must clear 0.5 (measured
    0.76-0.84 across the three sfs with n_cells=8/n_probe=4 —
    deterministic hash-seeded centroids)."""
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    queries = emb.where(F.col("vec_id") < 10)
    exact = similarity.cosine_topk(queries, emb, k=5)
    approx = similarity.ivf_topk(queries, emb, k=5, n_cells=8, n_probe=4)
    return _ann_invariant(exact, approx, mean_floor=0.5)


def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid vectors (IVF building block), long-form."""
    t = load_tables(spark, sf_dir)
    out = similarity.centroid_table(t["embeddings"], "label")
    return out.select("label", F.col("pos").cast("int").alias("pos"),
                      F.col("centroid_val").cast("double").alias("centroid_val"))


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column plumbing: payload byte length + content hash."""
    t = load_tables(spark, sf_dir)
    media = multimodal.fake_media_from_text(t["documents"])
    return media.select("asset_id", "media_type", "n_bytes", "content_hash")


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode loop: per-row PNG payloads are synthesized (real
    encoder; dimensions a pure function of the id), then parsed back by
    the pure-python PNG decoder inside mapInPandas. The SQL oracle
    computes the expected dimensions from the id — the only way Spark
    matches it is by actually decoding the bytes."""
    t = load_tables(spark, sf_dir)
    media = multimodal.synth_image_media(t["documents"], fmt="png")
    return multimodal.decode_image(media)


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode->resize loop: synthesized PNGs (dimensions a function
    of the id) are decoded, nearest-neighbor resampled to 32x24 and
    re-encoded inside mapInPandas; a row only reports (32, 24) if the
    whole codec round trip succeeded (failures yield null dims), which
    is what the oracle checks. Pixel-level correctness is pinned in
    tests/test_operators.py."""
    t = load_tables(spark, sf_dir)
    media = multimodal.synth_image_media(t["documents"], fmt="png")
    out = multimodal.resize_image(media, target=(32, 24))
    return out.select("asset_id", F.col("height").cast("int").alias("height"),
                      F.col("width").cast("int").alias("width"))


def q_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL WAV decode: synthesized PCM16 square waves (duration and
    amplitude pure functions of the id), decoded with stdlib wave + numpy
    RMS. Oracle computes duration_ms and RMS arithmetically."""
    t = load_tables(spark, sf_dir)
    media = multimodal.synth_wav_media(t["documents"])
    return multimodal.audio_features(media)


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan: the fake payload stands in for a video
    asset; one row per sampled frame index (metadata-derived frame count,
    stride 30) — the explode shape a real sampler feeds to a decode stage
    (operators/multimodal.py::frame_sample_plan)."""
    t = load_tables(spark, sf_dir)
    media = multimodal.as_media_table(
        t["documents"].select(
            "doc_id", F.encode(F.col("text"), "UTF-8").alias("_payload")),
        "doc_id", "_payload", media_type="video")
    return multimodal.frame_sample_plan(media, every_n=30)


def q_sketch_error_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch path for 100 TB aggregation — t-digest percentiles and
    HLL++ distinct counts — emitted as DRIVER-CHECKABLE error bounds
    (VERDICT r3 #2): per event type, the exact distinct-user count plus
    booleans asserting the approx p50/p95 land inside the exact
    [p49, p51] / [p94, p96] rank bands and the HLL count within 5% of
    exact (rsd=0.01, so 5% is a 5-sigma bound; measured <=0.67% error
    and in-band percentiles at every sf). Sketch internals differ across
    engines by design — the BOUNDS are the cross-engine contract."""
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    exact = ev.groupBy("event_type").agg(
        F.percentile("value", 0.49).alias("_p50_lo"),
        F.percentile("value", 0.51).alias("_p50_hi"),
        F.percentile("value", 0.94).alias("_p95_lo"),
        F.percentile("value", 0.96).alias("_p95_hi"),
        F.countDistinct("user_id").alias("n_users"),
    )
    approx = ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, 10000).alias("_p50a"),
        F.percentile_approx("value", 0.95, 10000).alias("_p95a"),
        F.approx_count_distinct("user_id", 0.01).alias("_nua"),
    )
    return exact.join(approx, "event_type").select(
        "event_type", "n_users",
        F.col("_p50a").between(F.col("_p50_lo"), F.col("_p50_hi"))
        .alias("p50_in_band"),
        F.col("_p95a").between(F.col("_p95_lo"), F.col("_p95_hi"))
        .alias("p95_in_band"),
        (F.abs(F.col("_nua") - F.col("n_users"))
         <= 0.05 * F.col("n_users")).alias("hll_within_5pct"),
    )


def q_hll_sketch_regrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable sketch-valued measures
    (operators/stats.py::sketch_summary / sketch_regrain): distinct
    users are materialized ONCE as DataSketches HLL binaries at
    (event_type, day) grain, then re-aggregated to event_type purely by
    sketch UNION — the fact table is never rescanned. This closes the
    aggregate-navigator gap for COUNT(DISTINCT) (non-additive, so plain
    summaries can't serve coarser grains; sketch union preserves the
    accuracy guarantee with no information loss vs rescanning). Emitted
    invariants the oracle verifies: exact distinct + row counts
    (recomputed in SQL), `union_within_1pct` (the regrained estimate
    tracks a direct single-pass sketch of the raw data to <=1% of exact
    — bit-equality holds only while every input sketch is still in
    sparse mode, so the contract is the BOUND; measured 0.4% at sf0.1),
    and `approx_within_5pct` (lg_k=12 => RSE ~1.6%, 5% is a ~3-sigma
    bound vs exact)."""
    from data_cube_spark.operators.stats import sketch_regrain, sketch_summary

    ev = load_tables(spark, sf_dir)["events"].withColumn(
        "day", F.to_date("ts"))
    summ = sketch_summary(ev, ["event_type", "day"], ["user_id"])
    merged = sketch_regrain(summ, ["event_type"], ["user_id"])
    direct = ev.groupBy("event_type").agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))")
        .cast("long").alias("_direct"),
        F.countDistinct("user_id").alias("n_users_exact"),
    )
    return merged.join(direct, "event_type").select(
        "event_type",
        "n_rows",
        "n_users_exact",
        (F.abs(F.col("user_id_distinct_approx") - F.col("_direct"))
         <= F.greatest(F.lit(1.0), 0.01 * F.col("n_users_exact")))
        .alias("union_within_1pct"),
        (F.abs(F.col("user_id_distinct_approx") - F.col("n_users_exact"))
         <= 0.05 * F.col("n_users_exact")).alias("approx_within_5pct"),
    )


def q_events_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column handling: extract a JSON property from the
    events ``props`` column (JVM-side get_json_object — no UDF) and
    aggregate by its value bucket."""
    t = load_tables(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        t["events"]
        .select(F.pmod(k, F.lit(10)).cast("int").alias("k_bucket"),
                F.col("value"))
        .groupBy("k_bucket")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
             .alias("sum_value"))
    )


def q_quantiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles per group (F.percentile — the exact
    path; percentile_approx is the sketch variant for 100 TB)."""
    t = load_tables(spark, sf_dir)
    return t["events"].groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("p50"),
        F.percentile("value", 0.95).alias("p95"),
    )


def q_heavy_hitters_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter detection (exact): top-3 sources per language by doc
    count, deterministic tie-break. The sketch path at corpus scale is
    count_min_sketch / approx_count_distinct."""
    t = load_tables(spark, sf_dir)
    counts = t["documents"].groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    top = topk_per_group(counts, ["lang"],
                         [F.col("n_docs").desc(), F.col("source").asc()], k=3)
    return top.select("lang", "source", "n_docs",
                      F.col("rank").cast("bigint").alias("rank"))


def q_asof_last_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (join-free union+window plan, operators/joins.py): for each
    click event attach the value of the user's most recent error at-or-before
    it. Beyond-reference temporal operator (reference has no as-of join,
    SURVEY.md §2.5)."""
    from data_cube_spark.operators.joins import asof_join

    ev = load_tables(spark, sf_dir)["events"]
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    errors = ev.where(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("value").alias("last_error_value")
    )
    return asof_join(clicks, errors, on="ts", by="user_id",
                     value_cols=["last_error_value"])


def q_range_join_error_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join via bin-bucketed equi-join (operators/joins.py): count
    clicks landing within 5 minutes after each error, per user."""
    from data_cube_spark.operators.joins import range_join

    ev = load_tables(spark, sf_dir)["events"]
    errors = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts").alias("t0"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("t1"),
    )
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts")
    joined = range_join(clicks, errors, ts="ts", start="t0", end="t1",
                        bin_seconds=300, by="user_id")
    return joined.groupBy("error_id").agg(F.count("*").alias("n_clicks"))


def q_embedding_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the embedding near-dup graph (cosine >=
    0.35): candidate pairs from the size-dispatched near_pairs source
    (blocked matmul below the broadcast gate — join-free, shuffle-free;
    bucketed LSH equi-join above it, recall 1.0 on this corpus asserted in
    tests — never a cross product either way), then iterative distributed
    min-label propagation, hash-matched against a recursive-CTE SQL oracle
    computing the exact all-pairs graph."""
    t = load_tables(spark, sf_dir)
    pairs = similarity.near_pairs(t["embeddings"], threshold=0.35,
                                  n_planes=4, n_tables=48,
                                  corpus_rows=parquet_rows(sf_dir, "embeddings"))
    comp = dedup.connected_components(pairs)
    return comp.select(F.col("id").alias("vec_id"),
                       F.col("component").cast("bigint").alias("component"))


def q_semantic_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-level semantic dedup end-to-end: size-dispatched near-dup
    pairs (blocked matmul under the gate / bucketed LSH above, never a
    cross product) -> connected components -> drop non-representatives
    (left-anti). The surviving corpus, oracle-checked via an exact
    all-pairs recursive CTE + NOT IN."""
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    pairs = similarity.near_pairs(emb, threshold=0.35,
                                  n_planes=4, n_tables=48,
                                  corpus_rows=parquet_rows(sf_dir, "embeddings"))
    kept = dedup.dedup_clusters(emb.select("vec_id", "label"), pairs,
                                id_col="vec_id")
    return kept.select("vec_id", F.col("label").cast("int").alias("label"))


def q_pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north-star composite: a training-data cleaning pipeline in one
    lazy plan — exact dedup (keep min-id) -> language filter (en) ->
    quality filter (score >= 0.5) -> token counting. One narrow scan +
    one dedup shuffle; every stage is JVM expressions."""
    t = load_tables(spark, sf_dir)
    d = t["documents"]
    kept = dedup.dedup_exact(d)
    lang = text.language_id(kept)
    qual = text.quality_score(kept)
    return (
        kept.join(lang, "doc_id").join(qual, "doc_id")
        .where((F.col("lang_pred") == "en") & (F.col("quality") >= 0.5))
        .select(
            "doc_id",
            text.token_count("text").alias("n_tokens"),
            "lang_pred",
            F.col("quality").cast("double").alias("quality"),
        )
    )


def q_pipeline_pretraining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full pretraining-prep pipeline as ONE lazy plan: exact dedup
    (keep min-id) -> drop the held-out eval docs (doc_id % 97 == 0) and
    everything 3-gram-contaminated against them -> language + quality
    gate -> deterministic train split (90%) -> concat-and-chunk packing
    into 512-token sequences across 8 shards. Every stage is the already-
    verified operator; composing them stays declarative, so Catalyst
    fuses the narrow stages and the only shuffles are the dedup hash, the
    contamination aggregate and the packing shard window."""
    from data_cube_spark.operators.decontam import contamination_overlap
    from data_cube_spark.operators.packing import pack_concat_chunk
    from data_cube_spark.operators.sampling import assign_split

    t = load_tables(spark, sf_dir)
    d = t["documents"]
    kept = dedup.dedup_exact(d)
    bench = d.where(F.col("doc_id") % 97 == 0)
    corpus = kept.where(F.col("doc_id") % 97 != 0)
    cont = contamination_overlap(corpus, bench, k=3, threshold=0.5)
    dirty = cont.where(F.col("contaminated") == 1).select("doc_id")
    clean = corpus.join(dirty, "doc_id", "left_anti")
    lang = text.language_id(clean)
    qual = text.quality_score(clean)
    good = (
        clean.join(lang, "doc_id").join(qual, "doc_id")
        .where((F.col("lang_pred") == "en") & (F.col("quality") >= 0.5))
    )
    split = assign_split(good, {"train": 0.9, "val": 0.05, "test": 0.05})
    train = split.where(F.col("split") == "train").select(
        "doc_id", text.token_count("text").alias("n_tokens"))
    out = pack_concat_chunk(train, capacity=PACK_CAPACITY,
                            n_shards=PACK_SHARDS)
    return out.select("doc_id", F.col("shard").cast("int").alias("shard"),
                      "seq", "offset", "n_tokens")


def q_decontaminate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination scores: docs with doc_id % 97 == 0 play
    the eval set; every other doc is scored by 3-gram shingle overlap
    against the broadcast benchmark shingle set (flag at >= 0.5).
    Corpus-side: one explode + per-doc count, no self-join."""
    from data_cube_spark.operators.decontam import contamination_overlap

    t = load_tables(spark, sf_dir)
    d = t["documents"]
    bench = d.where(F.col("doc_id") % 97 == 0)
    corpus = d.where(F.col("doc_id") % 97 != 0)
    return contamination_overlap(corpus, bench, k=3, threshold=0.5)


def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document (paragraph-level) exact dedup: every doc gets the same
    synthesized boilerplate footer paragraph appended; the operator must
    keep the footer only at its first global occurrence (min doc_id) and
    strip it everywhere else — the boilerplate-removal use case."""
    t = load_tables(spark, sf_dir)
    aug = t["documents"].select(
        "doc_id",
        F.concat_ws("\n", F.col("text"),
                    F.lit("subscribe to our newsletter for updates"))
        .alias("text"))
    return dedup.paragraph_dedup(aug)


def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over documents with deterministic synthesized contact
    info appended (the driver corpus is PII-free by construction, so the
    query plants one of each kind per doc — counts verify detection, the
    redacted-text md5 verifies the exact rewrite). Pure codegen
    expressions, zero shuffles."""
    from data_cube_spark.operators import pii

    t = load_tables(spark, sf_dir)
    aug = t["documents"].select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com ip 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 ssn 123-45-6789 call +1 555-123-4567"),
        ).alias("text"))
    s = pii.pii_stats(aug)
    return s.select(
        "doc_id", "n_email", "n_ipv4", "n_ssn", "n_phone",
        F.length("redacted").alias("redacted_len"),
        F.md5(F.encode(F.col("redacted"), "UTF-8")).alias("redacted_md5"))


def _pii_sql() -> str:
    """Oracle twin of q_pii_redaction, generated from the same
    PII_PATTERNS cascade (DuckDB regexp_replace needs the explicit 'g'
    flag; Spark's replaces all occurrences by default)."""
    from data_cube_spark.operators.pii import PII_PATTERNS

    sql = """
      WITH c0 AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com ip 10.0.'
                    || CAST(doc_id % 256 AS VARCHAR)
                    || '.7 ssn 123-45-6789 call +1 555-123-4567' AS t
        FROM documents)"""
    prev, acc = "c0", []
    for i, (kind, (pat, token)) in enumerate(PII_PATTERNS.items(), 1):
        carried = "".join(f"{c}, " for c in acc)
        sql += f""",
      c{i} AS (
        SELECT doc_id, {carried}
               len(regexp_extract_all(t, '{pat}')) AS n_{kind},
               regexp_replace(t, '{pat}', '{token}', 'g') AS t
        FROM {prev})"""
        prev = f"c{i}"
        acc.append(f"n_{kind}")
    kinds = ", ".join(f"n_{k}" for k in PII_PATTERNS)
    return sql + f"""
      SELECT doc_id, {kinds}, length(t) AS redacted_len,
             md5(t) AS redacted_md5
      FROM {prev}"""


#: source-mixture retention rates exercised by mixture_sample_docs (one
#: full-retention source, one half, one rare, plus a default for the rest)
MIXTURE_WEIGHTS = {"src0": 1.0, "src1": 0.5, "src2": 0.1}
MIXTURE_DEFAULT = 0.05
PACK_CAPACITY = 512
PACK_SHARDS = 8


def q_sample_fraction_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~25% corpus subsample (md5-draw filter — no shuffle,
    pushdown-friendly; operators/sampling.py)."""
    from data_cube_spark.operators.sampling import sample_fraction

    t = load_tables(spark, sf_dir)
    return sample_fraction(t["documents"], 0.25).select("doc_id", "lang", "source")


def q_sample_stratified_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-20-per-language uniform quota (md5-rank window within
    stratum; operators/sampling.py)."""
    from data_cube_spark.operators.sampling import sample_stratified_n

    t = load_tables(spark, sf_dir)
    return sample_stratified_n(t["documents"], ["lang"], 20).select("doc_id", "lang")


def q_mixture_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixture re-weighting: per-source retention rates as a pure
    CASE-threshold filter (operators/sampling.py)."""
    from data_cube_spark.operators.sampling import mixture_sample

    t = load_tables(spark, sf_dir)
    out = mixture_sample(t["documents"], MIXTURE_WEIGHTS, default=MIXTURE_DEFAULT)
    return out.select("doc_id", "source")


def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (keep a deterministic uniform 15 per
    source): window row_number over the md5 draw, one shuffle on source
    (operators/curation.py)."""
    from data_cube_spark.operators.curation import cap_per_group
    from data_cube_spark.operators.sampling import draw_hex

    t = load_tables(spark, sf_dir)
    out = cap_per_group(
        t["documents"], ["source"], 15, order=[draw_hex("doc_id", salt="cap")]
    )
    return out.select("doc_id", "source")


def q_quality_percentile_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the longest 60% of documents per language: percent_rank window
    over (n_chars DESC, doc_id) — the percentile-cut curation pass
    (operators/curation.py)."""
    from data_cube_spark.operators.curation import percentile_filter

    t = load_tables(spark, sf_dir)
    out = percentile_filter(
        t["documents"], "n_chars", ["lang"], 0.6, tiebreak="doc_id"
    )
    return out.select("doc_id", "lang", F.col("n_chars").cast("bigint").alias("n_chars"))


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size character chunking with overlap (200-char chunks,
    50-char overlap): per-row explode, no shuffle
    (operators/curation.py)."""
    from data_cube_spark.operators.curation import chunk_texts

    t = load_tables(spark, sf_dir)
    return chunk_texts(t["documents"], chunk_chars=200, overlap=50)


def q_token_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-20 whitespace tokens by occurrence with
    document frequency — explode + hash aggregate + TakeOrdered top-N
    (operators/curation.py)."""
    from data_cube_spark.operators.curation import token_vocab

    t = load_tables(spark, sf_dir)
    return token_vocab(t["documents"], 20)


def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test assignment from the salted md5
    draw — pure per-row CASE, no shuffle; a document never migrates when
    the corpus grows (operators/sampling.py)."""
    from data_cube_spark.operators.sampling import assign_split

    t = load_tables(spark, sf_dir)
    out = assign_split(
        t["documents"], {"train": 0.9, "val": 0.05, "test": 0.05}
    )
    return out.select("doc_id", "split")


def q_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible global shuffle for training order: dense position by
    salted md5 draw via two-stage distributed ranking — no single-reducer
    window (operators/sampling.py)."""
    from data_cube_spark.operators.sampling import shuffle_positions

    t = load_tables(spark, sf_dir)
    out = shuffle_positions(t["documents"])
    return out.select("doc_id", F.col("position").cast("bigint").alias("position"))


def q_quantile_bins_approx_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB path for equi-depth binning — t-digest percentile_approx
    cuts (mergeable sketch, no per-group sort reducer) — emitted as a
    DRIVER-CHECKABLE tolerance bound (VERDICT r3 #2): per (flag, bin),
    the EXACT nearest-rank bin count plus ``within_tol`` = the approx
    path's bin count deviates by at most max(0.1% of the group, 4 rows).
    The oracle recomputes the exact bins in SQL and asserts TRUE —
    t-digest cuts are engine-specific, so the TOLERANCE is the
    cross-engine contract (measured max delta 1e-4 of group size at
    every sf; the bound carries 10x margin). A spurious approx-only bin
    would surface as an extra row and fail the row-count match."""
    from data_cube_spark.operators.stats import equi_depth_bins

    t = load_tables(spark, sf_dir)
    li = t["lineitem"]
    exact = equi_depth_bins(li, "l_extendedprice", 4, by=["l_returnflag"]) \
        .select("l_returnflag", "bin_id", F.col("n_rows").alias("_n_exact"))
    approx = equi_depth_bins(li, "l_extendedprice", 4, by=["l_returnflag"],
                             approx=True) \
        .select("l_returnflag", "bin_id", F.col("n_rows").alias("_n_approx"))
    tot = exact.groupBy("l_returnflag").agg(F.sum("_n_exact").alias("_tot"))
    return (
        exact.join(approx, ["l_returnflag", "bin_id"], "full")
        .join(tot, "l_returnflag")
        .select(
            "l_returnflag", "bin_id",
            F.col("_n_exact").alias("n_rows"),
            (F.abs(F.col("_n_approx") - F.col("_n_exact"))
             <= F.greatest(F.ceil(F.lit(0.001) * F.col("_tot")), F.lit(4)))
            .alias("within_tol"),
        )
    )


def q_key_skew_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew profile of events.user_id: the 10 hottest users with
    row share — the decision input for salting / AQE skew handling
    (operators/stats.py::key_skew_profile)."""
    from data_cube_spark.operators.stats import key_skew_profile

    t = load_tables(spark, sf_dir)
    return key_skew_profile(t["events"], ["user_id"], top_n=10)


def q_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth quartile binning of l_extendedprice per return flag:
    nearest-rank cuts broadcast back, bin = #cuts strictly below the value
    (operators/stats.py::equi_depth_bins) — no NTILE single-reducer sort."""
    from data_cube_spark.operators.stats import equi_depth_bins

    t = load_tables(spark, sf_dir)
    out = equi_depth_bins(t["lineitem"], "l_extendedprice", 4,
                          by=["l_returnflag"])
    return out.select(
        "l_returnflag", "bin_id", "n_rows",
        F.col("bin_min").cast("double").alias("bin_min"),
        F.col("bin_max").cast("double").alias("bin_max"),
    )


def q_winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier-robust per-flag price stats: clip to nearest-rank 5th/95th
    percentile cuts, count clipped rows, decimal-exact winsorized mean.
    Nearest-rank (not interpolated) cuts are actual data values — engine-
    exact, no libm (operators/stats.py)."""
    from data_cube_spark.operators.stats import winsorize_stats

    t = load_tables(spark, sf_dir)
    return winsorize_stats(
        t["lineitem"], "l_extendedprice", ["l_returnflag"], 0.05, 0.95
    )


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


def q_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by smoothed tf-idf: tf and
    document-frequency hash aggregates, vocab-sized idf join, broadcast
    1-row corpus count, per-doc top-k window (operators/curation.py)."""
    from data_cube_spark.operators.curation import tfidf_top_terms

    t = load_tables(spark, sf_dir)
    return tfidf_top_terms(t["documents"], 3, round_digits=9).select(
        "doc_id", "token", F.col("tf").cast("bigint").alias("tf"),
        "tfidf", "term_rank",
    )


def q_documents_stream_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous corpus ingest, emitted as a DRIVER-CHECKABLE stream==
    batch invariant (VERDICT r4 #2): odd-doc_id documents stream in two
    micro-batches through foreachBatch, each banded against the even-doc
    signature index; near-dups of the corpus are suppressed and survivors
    append. The oracle-checkable form emits one row per streamed doc with
    its source content hash (SQL-recomputable), ``stream_eq_batch`` =
    the streamed keep/suppress decision equals the batch twin's
    (``incremental_minhash_pairs`` against the same fixed index — the
    equality tests/test_streaming.py proves), and ``target_text_ok`` =
    kept docs landed in the target byte-identical (TRUE for suppressed).
    All flags are TRUE by construction; the oracle asserts them
    (streaming/cube_stream.py::streaming_corpus_ingest)."""
    import os
    import shutil
    import tempfile

    from data_cube_spark.streaming.cube_stream import streaming_corpus_ingest

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    batch = docs.where(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    sigs = dedup.minhash_signatures(
        docs.where(F.col("doc_id") % 2 == 0)).localCheckpoint()
    work = tempfile.mkdtemp(prefix="stream_ingest_")
    try:
        src = os.path.join(work, "src")
        half = batch.approxQuantile("doc_id", [0.5], 0.01)[0]
        batch.where(F.col("doc_id") <= half).coalesce(1).write.mode("overwrite").parquet(src)
        batch.where(F.col("doc_id") > half).coalesce(1).write.mode("append").parquet(src)
        q = streaming_corpus_ingest(
            spark, src, batch.schema, os.path.join(work, "ckpt"),
            os.path.join(work, "target"), sigs,
            threshold=0.3, max_files_per_trigger=1).start()
        # fail loudly on a hung stream — proceeding would silently return
        # whatever partial output reached the target directory
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("documents_stream_ingest: stream did not "
                               "finish within 300 s")
        streamed = spark.read.parquet(os.path.join(work, "target")).select(
            "doc_id", F.md5(F.encode("text", "UTF-8")).alias("_tgt_hash"))
        # batch twin: the same fixed-index suppression in one batch —
        # micro-batching cannot change the decision because survivors do
        # not join the index mid-stream (see streaming_corpus_ingest)
        twin_drop = (
            dedup.incremental_minhash_pairs(batch, sigs, threshold=0.3)
            .select(F.col("batch_id").alias("doc_id")).dropDuplicates()
            .select("doc_id", F.lit(True).alias("_twin_dropped"))
        )
        out = (
            batch.select(
                "doc_id", F.md5(F.encode("text", "UTF-8")).alias("text_hash"))
            .join(streamed, "doc_id", "left")
            .join(twin_drop, "doc_id", "left")
            .select(
                "doc_id", "text_hash",
                (F.col("_tgt_hash").isNotNull()
                 == F.col("_twin_dropped").isNull()).alias("stream_eq_batch"),
                F.coalesce(F.col("_tgt_hash") == F.col("text_hash"),
                           F.lit(True)).alias("target_text_ok"),
            )
        )
        # materialize off the temp dir so it can be removed before return
        return out.localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_events_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exactly-once restoration: the events table is staged
    TWICE into a file-stream source (at-least-once redelivery), streaming
    ``dropDuplicates`` on event_id with watermark-bounded state removes
    the second delivery, and the appended parquet target aggregates back
    to the per-type totals of the ORIGINAL events — the oracle is plain
    batch GROUP BY over the single-copy table
    (streaming/cube_stream.py::streaming_dedup)."""
    import os
    import shutil
    import tempfile

    from data_cube_spark.streaming.cube_stream import streaming_dedup

    t = load_tables(spark, sf_dir)
    ev = t["events"]
    work = tempfile.mkdtemp(prefix="stream_dedup_")
    try:
        src = os.path.join(work, "src")
        ev.write.mode("overwrite").parquet(src)
        ev.write.mode("append").parquet(src)  # duplicate delivery
        q = streaming_dedup(spark, src, ev.schema, os.path.join(work, "ckpt"),
                            os.path.join(work, "target"),
                            id_cols=["event_id"]).start()
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("events_stream_dedup: stream did not finish "
                               "within 300 s")
        out = spark.read.parquet(os.path.join(work, "target"))
        return out.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            .alias("sum_value"),
        ).localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: shard by md5, cumulative token
    offsets per shard, sequence = offset // capacity
    (operators/packing.py)."""
    from data_cube_spark.operators.packing import pack_concat_chunk
    from data_cube_spark.operators.text import token_count

    t = load_tables(spark, sf_dir)
    d = t["documents"].select(
        "doc_id", token_count("text").alias("n_tokens")
    )
    out = pack_concat_chunk(d, capacity=PACK_CAPACITY, n_shards=PACK_SHARDS)
    return out.select("doc_id", F.col("shard").cast("int").alias("shard"),
                      "seq", "offset", "n_tokens")


def q_pack_greedy_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No-split greedy packing (applyInPandas state scan per shard),
    emitted as DRIVER-CHECKABLE conservation invariants (VERDICT r3 #2):
    per shard, the doc count, distinct-doc count and token total — which
    the oracle recomputes directly from ``documents`` with the same md5
    shard draw (every doc packed exactly once, tokens conserved) — plus
    ``n_over_capacity`` = packs holding >1 doc whose token sum exceeds
    the budget (must be 0; a single over-budget doc is allowed its own
    pack). The reset-on-overflow recurrence itself is not expressible in
    one SQL pass — pack boundaries are python-oracle-tested in
    tests/test_sampling_packing.py."""
    from data_cube_spark.operators.packing import pack_greedy
    from data_cube_spark.operators.text import token_count

    t = load_tables(spark, sf_dir)
    d = t["documents"].select(
        "doc_id", token_count("text").alias("n_tokens")
    )
    out = pack_greedy(d, capacity=PACK_CAPACITY, n_shards=PACK_SHARDS)
    packs = out.groupBy("shard", "seq").agg(
        F.count(F.lit(1)).alias("_n_in_pack"),
        F.sum("n_tokens").alias("_pack_tokens"),
    )
    viol = (
        packs.where((F.col("_pack_tokens") > PACK_CAPACITY)
                    & (F.col("_n_in_pack") > 1))
        .groupBy("shard").agg(F.count(F.lit(1)).alias("_n_viol"))
    )
    per_shard = out.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("doc_id").alias("n_docs_distinct"),
        F.sum("n_tokens").alias("total_tokens"),
    )
    return (
        per_shard.join(viol, "shard", "left")
        .select(F.col("shard").cast("int").alias("shard"),
                "n_docs", "n_docs_distinct", "total_tokens",
                F.coalesce("_n_viol", F.lit(0)).cast("bigint")
                .alias("n_over_capacity"))
    )


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (batch twin of the streaming op)."""
    t = load_tables(spark, sf_dir)
    return tumbling_agg(t["events"], keys=["event_type"])


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization (batch oracle twin of
    session_window)."""
    t = load_tables(spark, sf_dir)
    return sessionize_batch(t["events"])


def q_interval_overlap_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-x-interval overlap join: each user's daily activity span
    against each event type's daily span, same-day blocked — pairs whose
    spans intersect (operators/joins.py::interval_overlap_join; both
    sides explode to hour buckets, first-shared-bucket keeps each pair
    exactly once, never a nested loop)."""
    from data_cube_spark.operators.joins import interval_overlap_join

    t = load_tables(spark, sf_dir)
    ev = t["events"]
    l = (ev.groupBy("user_id", F.to_date("ts").alias("d"))
         .agg(F.min("ts").alias("ls"), F.max("ts").alias("le")))
    r = (ev.groupBy("event_type", F.to_date("ts").alias("d"))
         .agg(F.min("ts").alias("rs"), F.max("ts").alias("re")))
    out = interval_overlap_join(l, r, "ls", "le", "rs", "re",
                                bin_seconds=3600, by=["d"])
    return out.select("user_id", "event_type",
                      F.col("d").cast("string").alias("d"))


def q_salted_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe salted equi-join as driver evidence: lineitem (skewable
    fact side) salted against orders replicated x salt, then aggregated by
    priority. Salting never changes join semantics, so the oracle is the
    plain join."""
    from data_cube_spark.operators.joins import salted_join

    t = load_tables(spark, sf_dir)
    j = salted_join(
        t["lineitem"].select("l_orderkey", "l_extendedprice", "l_discount"),
        t["orders"].select(F.col("o_orderkey").alias("l_orderkey"),
                           "o_orderpriority"),
        on="l_orderkey", salt=8)
    return j.groupBy("o_orderpriority").agg(
        F.sum(_rev_expr()).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"))


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


def q_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width price histogram per return flag (20 bins over
    [0, 60000)); the bin id is a pure arithmetic projection, one
    (flag, bin) shuffle (operators/stats.py)."""
    from data_cube_spark.operators.stats import equi_width_histogram

    t = load_tables(spark, sf_dir)
    return equi_width_histogram(
        t["lineitem"], "l_extendedprice", 20, 0.0, 60000.0,
        by=["l_returnflag"],
    )


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view -> click -> purchase: per-step user counts with
    strictly-sequential timestamps (a purchase before the click doesn't
    count); k user-key shuffles for k steps (operators/funnel.py)."""
    from data_cube_spark.operators.funnel import funnel_conversion

    t = load_tables(spark, sf_dir)
    return funnel_conversion(t["events"], ["view", "click", "purchase"])


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cohort retention over events: cohort = first-event date,
    retained at offset d if any event lands d days later
    (operators/funnel.py)."""
    from data_cube_spark.operators.funnel import cohort_retention

    t = load_tables(spark, sf_dir)
    return cohort_retention(t["events"])


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


def q_events_stream_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full streaming loop as driver evidence (VERDICT r1 #10): events
    are staged into a file-stream source, the availableNow foreachBatch
    upsert maintains the materialized cube target, cube_from_materialized
    reopens it through the cube API, and the materialized
    (window_start, event_type) grain is returned. Oracle: plain batch
    GROUP BY over the same events — the stream==batch contract. Per-window
    sums are decimal-exact in the stream, so values hash-match."""
    import os
    import tempfile

    from data_cube_spark.streaming import cube_from_materialized, streaming_cube

    import shutil

    t = load_tables(spark, sf_dir)
    ev = t["events"]
    work = tempfile.mkdtemp(prefix="stream_cube_")
    try:
        src = os.path.join(work, "src")
        ev.write.mode("overwrite").parquet(src)
        q = streaming_cube(spark, src, ev.schema, os.path.join(work, "ckpt"),
                           os.path.join(work, "target"),
                           keys=["event_type"]).start()
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("events_stream_cube: stream did not finish "
                               "within 300 s")
        dc = cube_from_materialized(spark, os.path.join(work, "target"),
                                    keys=["event_type"])
        return dc.fact.df.select("window_start", "event_type", "n_events",
                                 "sum_value").localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_jaccard_prefix_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-Jaccard self-join via prefix filtering
    (operators/dedup.py::jaccard_pairs_prefix, AllPairs/PPJoin family):
    candidates come only from each document's rarest-shingle prefix plus
    a size filter, then one JVM array_intersect verification per
    candidate — no max_df approximation, no all-pairs blowup. The oracle
    is the UNCAPPED exact truth SQL, so a hash match proves the prefix
    filter loses nothing."""
    t = load_tables(spark, sf_dir)
    return dedup.jaccard_pairs_prefix(t["documents"], k=3, threshold=0.5)


def q_incremental_prefix_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R×S prefix-filtered EXACT Jaccard (batch = odd doc_ids, corpus =
    even): the continuous-ingest exact-truth path — no corpus self-join,
    prefix-bounded candidates, no max_df approximation
    (operators/dedup.py::jaccard_pairs_prefix_rs). Oracle: the uncapped
    batch×corpus exact SQL — a hash match proves zero loss."""
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    batch = docs.where(F.col("doc_id") % 2 == 1)
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    return dedup.jaccard_pairs_prefix_rs(batch, corpus, k=3, threshold=0.5)


def q_weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (A-ES,
    operators/sampling.py::sample_weighted_n): 30 documents per language
    drawn with probability proportional to n_chars — the
    quality/length-weighted corpus draw. The oracle recomputes the
    identical ln(u)/w keys from the same md5 draw (numeric parity pinned
    by draw_uniform's decimal-before-double construction), so the
    sampled row SET hash-matches across engines."""
    from data_cube_spark.operators.sampling import sample_weighted_n

    t = load_tables(spark, sf_dir)
    out = sample_weighted_n(t["documents"], "n_chars", 30, by=["lang"])
    return out.select("doc_id", "lang", "n_chars")


def q_token_budget_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic token-budget mixture draw
    (operators/sampling.py::sample_token_budget): per language, keep
    documents in md5-draw order until the language's character budget
    fills (en 5000 / de 2000 / zh 1000; unbudgeted languages drop). The
    oracle replays the identical hex-ordered running sum, so the kept
    row SET hash-matches across engines."""
    from data_cube_spark.operators.sampling import sample_token_budget

    t = load_tables(spark, sf_dir)
    out = sample_token_budget(
        t["documents"], "n_chars",
        {"en": 5000, "de": 2000, "zh": 1000}, group_col="lang")
    return out.select("doc_id", "lang", "n_chars")


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


def q_value_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitoring
    (operators/stats.py::histogram_psi over histogram_sketch_summary):
    Population Stability Index of the value distribution per event type,
    first half of January vs the rest — the standard
    baseline-vs-current drift score (<0.1 stable, >0.25 shifted). Built
    entirely from the mergeable bin arrays, so at 100 TB the baseline
    side is a stored summary, not a rescan. PSI is rounded to 6 digits
    (ln is libm-dependent at the last ulp; the rounded value is the
    cross-engine contract, the tf-idf convention)."""
    from data_cube_spark.operators.stats import (
        histogram_psi,
        histogram_sketch_summary,
    )

    ev = load_tables(spark, sf_dir)["events"]
    early = ev.where(F.col("ts") < F.lit("2024-01-15"))
    late = ev.where(F.col("ts") >= F.lit("2024-01-15"))
    ha = histogram_sketch_summary(early, ["event_type"], "value",
                                  60, 0.0, 600.0).select(
        "event_type", F.col("value_bins").alias("bins_a"))
    hb = histogram_sketch_summary(late, ["event_type"], "value",
                                  60, 0.0, 600.0).select(
        "event_type", F.col("value_bins").alias("bins_b"))
    return ha.join(hb, "event_type").select(
        "event_type", histogram_psi("bins_a", "bins_b").alias("psi"))


def q_events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly baseline
    (operators/timeseries.py::rolling_zscore over gap_fill_daily): daily
    per-type event counts (silent days zero-filled so gaps don't corrupt
    the baseline) scored against the preceding 7 days' mean/std, current
    day excluded. Decimal-exact window sums + a fixed double op sequence
    make the z-scores hash-identical across engines. One key shuffle
    end-to-end."""
    from data_cube_spark.operators.timeseries import (
        gap_fill_daily,
        rolling_zscore,
    )

    ev = load_tables(spark, sf_dir)["events"]
    daily = gap_fill_daily(
        ev, "ts", ["event_type"],
        aggs={"n_events": F.count(F.lit(1))}, fill={"n_events": 0})
    out = rolling_zscore(daily, "n_events", ["event_type"], "day")
    return out.withColumn("day", F.col("day").cast("timestamp"))


def q_histogram_percentile_regrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third mergeable-summary measure
    (operators/stats.py::histogram_sketch_summary / _regrain /
    histogram_percentile), completing the trio with `hll_sketch_regrain`
    (distinct) and `topk_sketch_regrain` (heavy hitters): per-(type, day)
    equi-width bin-count arrays merge by element-wise sum to type level
    — exactly additive, engine-independent, never rescanning the fact —
    and percentiles read off the cumulative bins with error bounded by
    ONE BIN WIDTH vs the exact nearest-rank percentile. The oracle
    recomputes the exact cuts (ROW_NUMBER nearest-rank, the
    `winsorized_price_stats` convention) and asserts the in-bin flags."""
    from data_cube_spark.operators.stats import (
        _percentile_cuts,
        histogram_percentile,
        histogram_sketch_regrain,
        histogram_sketch_summary,
    )

    n_bins, lo, hi = 600, 0.0, 600.0
    ev = load_tables(spark, sf_dir)["events"].withColumn(
        "day", F.to_date("ts"))
    summ = histogram_sketch_summary(ev, ["event_type", "day"], "value",
                                    n_bins, lo, hi)
    reg = histogram_sketch_regrain(summ, ["event_type"], "value")
    est = reg.select(
        "event_type", "n_rows",
        histogram_percentile("value_bins", 0.5, lo, hi, n_bins)
        .alias("_p50e"),
        histogram_percentile("value_bins", 0.95, lo, hi, n_bins)
        .alias("_p95e"),
    )
    cuts = _percentile_cuts(ev, "value", ["event_type"],
                            {"p50_exact": 0.5, "p95_exact": 0.95})
    w = (hi - lo) / n_bins
    return est.join(cuts, "event_type").select(
        "event_type", "n_rows",
        F.col("p50_exact").cast("double").alias("p50_exact"),
        F.col("p95_exact").cast("double").alias("p95_exact"),
        (F.abs(F.col("_p50e") - F.col("p50_exact")) <= F.lit(w))
        .alias("p50_within_bin"),
        (F.abs(F.col("_p95e") - F.col("p95_exact")) <= F.lit(w))
        .alias("p95_within_bin"),
    )


def q_contrastive_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive pairs
    (operators/sampling.py::sample_negatives): every 10th document is an
    anchor (its positive = the next id); each anchor draws 4 negatives
    as md5-indexed positions into the corpus, excluding itself and its
    positives. The draw arithmetic (hex-prefix mod corpus-size into the
    doc_id-ordered position table) is replayed exactly by the SQL
    oracle, so the negative SETS hash-match across engines — the
    reproducibility contract a training-data pipeline needs for
    negatives, same as `shuffle_order` for ordering."""
    from data_cube_spark.operators.sampling import sample_negatives

    docs = load_tables(spark, sf_dir)["documents"]
    pos = docs.where(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("anchor_id"),
        (F.col("doc_id") + 1).alias("pos_id"),
    )
    return sample_negatives(pos, docs, 4)


def q_data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectations-style constraint validation
    (operators/quality.py::check_constraints): the pre-merge ingestion
    gate. All row-local rules fuse into ONE scan (a single conditional-
    sum aggregate); uniqueness is one keyed aggregate; referential
    integrity is one broadcast anti-join. The report is one row per rule
    with REAL violation counts (the events fixture genuinely violates
    the range and FK rules), each recomputed exactly by the SQL oracle."""
    from data_cube_spark.operators.quality import (
        ForeignKey,
        InRange,
        NotNull,
        Predicate,
        Unique,
        check_constraints,
    )

    t = load_tables(spark, sf_dir)
    return check_constraints(t["events"], [
        NotNull("user_id"),
        InRange("value", 0.0, 100.0),
        Predicate("value_nonneg", "value >= 0"),
        Unique("event_id"),
        ForeignKey("user_id", t["customer"], "c_custkey"),
    ])


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


def q_events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification
    (operators/timeseries.py::gap_fill_daily): one row per
    (event_type, day) for every day in each type's observed span, silent
    days zero-filled — the regularization step before dashboards /
    anomaly baselines. The calendar explodes from each key's OWN
    [min, max] span (never keys x global calendar), so cost is output
    rows, not |keys| x |history|."""
    from data_cube_spark.operators.timeseries import gap_fill_daily

    ev = load_tables(spark, sf_dir)["events"]
    out = gap_fill_daily(
        ev, "ts", ["event_type"],
        aggs={
            "n_events": F.count(F.lit(1)),
            "sum_value": F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double"),
        },
        fill={"n_events": 0, "sum_value": 0.0},
    )
    # DATE round-trips differently through the two engines' pandas
    # bridges; timestamps are the repo-wide convention for day keys
    return out.withColumn("day", F.col("day").cast("timestamp"))


def q_topk_sketch_regrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable heavy-hitters sketches
    (operators/stats.py::topk_sketch_summary / topk_sketch_regrain):
    per-(event_type, day) frequent-items states merged to event_type by
    sketch combine — the fact is never rescanned for a coarser top-k.
    Driver-checkable invariants (sketch internals are engine-specific;
    the GUARANTEES are the contract): ``counts_match`` — every estimated
    item's count equals its exact count (max_items=8192 tracks every
    user, so frequent-items is exact here); ``valid_topk`` — the k-th
    estimated count is >= the best count outside the estimated set
    (i.e. the estimate IS a true top-k under ties). The oracle
    recomputes exact row counts and asserts both flags TRUE."""
    from data_cube_spark.operators.stats import (
        topk_sketch_regrain,
        topk_sketch_summary,
    )

    ev = load_tables(spark, sf_dir)["events"].withColumn(
        "day", F.to_date("ts"))
    summ = topk_sketch_summary(ev, ["event_type", "day"], "user_id",
                               max_items=8192)
    reg = topk_sketch_regrain(summ, ["event_type"], "user_id", k=3)
    est = reg.select(
        "event_type", "n_rows",
        F.explode("user_id_topk").alias("e")
    ).select("event_type", "n_rows",
             F.col("e.item").alias("user_id"),
             F.col("e.count").alias("est_n"))
    exact = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("exact_n"))
    j = est.join(exact, ["event_type", "user_id"], "left")
    per_type = j.groupBy("event_type").agg(
        F.first("n_rows").alias("n_rows"),
        (F.count(F.lit(1)) == F.sum(
            (F.col("est_n") == F.col("exact_n")).cast("int")))
        .alias("counts_match"),
        F.min("est_n").alias("_kth"),
    )
    outside = (
        exact.join(est.select("event_type", "user_id"),
                   ["event_type", "user_id"], "left_anti")
        .groupBy("event_type").agg(F.max("exact_n").alias("_best_out"))
    )
    return per_type.join(outside, "event_type", "left").select(
        "event_type", "n_rows", F.lit(3).alias("k"), "counts_match",
        (F.col("_kth") >= F.coalesce(F.col("_best_out"), F.lit(0)))
        .alias("valid_topk"),
    )


def q_vocab_overlap_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source vocabulary overlap
    (operators/curation.py::vocab_overlap): each source's top-10 token
    vocabulary, pairwise shared-token counts and vocabulary Jaccard —
    the domain-similarity screen for composing a training mixture. The
    join is vocabulary x vocabulary (bounded by top_n x groups^2), never
    corpus-sized; the division is one double op over exact ints, so the
    oracle hash-matches."""
    from data_cube_spark.operators.curation import vocab_overlap

    docs = load_tables(spark, sf_dir)["documents"]
    return vocab_overlap(docs, 10)


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


def q_corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-versioning diff (operators/curation.py::corpus_diff): two
    snapshots derived deterministically from the documents table (old =
    ids % 3 != 0; new = ids % 4 != 0 with ids % 5 == 0 rewritten),
    classified added/removed/changed/unchanged by content hash — the
    release-audit step. Hash-only shuffle: ~48 bytes per doc regardless
    of document size."""
    from data_cube_spark.operators.curation import corpus_diff

    docs = load_tables(spark, sf_dir)["documents"]
    old = docs.where(F.col("doc_id") % 3 != 0)
    new = docs.where(F.col("doc_id") % 4 != 0).withColumn(
        "text",
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.col("text"), F.lit(" v2")))
        .otherwise(F.col("text")))
    return corpus_diff(old, new)


def q_skew_aware_user_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile-driven PARTIAL salting as driver evidence: events (the
    skewable fact side — `key_skew_users` measures its user_id heat)
    joined to customer on user_id with ONLY the measured top-20 hottest
    users salted (operators/joins.py::skew_aware_join). Cold keys join
    unsalted, so the dim replication cost is top_n × salt rows — not
    |customer| × salt as in full salting (`salted_join_agg`). Salting
    never changes join semantics: the oracle is the plain join."""
    from data_cube_spark.operators.joins import skew_aware_join

    t = load_tables(spark, sf_dir)
    ev = t["events"].select("user_id", "value")
    dim = t["customer"].select(F.col("c_custkey").alias("user_id"),
                               "c_mktsegment")
    j = skew_aware_join(ev, dim, on="user_id", top_n=20, min_share=0.0,
                        salt=8)
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
        .alias("sum_value"))


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
        j = spark.table(f"{tag}_lineitem").join(
            spark.table(f"{tag}_orders"),
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


def _scd2_changelog_parts(spark: SparkSession, sf_dir: str):
    """Deterministic customer-segment change log (three waves), identical
    in both engines: every customer gets a v1 at 1994-01-01 (its raw
    segment); even custkeys change segment in 1998; custkeys divisible by
    3 change again in 2000."""
    cust = load_tables(spark, sf_dir)["customer"]
    v1 = cust.select(
        "c_custkey",
        F.lit("1994-01-01").cast("timestamp").alias("eff_ts"),
        F.col("c_mktsegment").alias("segment"),
    )
    v2 = cust.where(F.col("c_custkey") % 2 == 0).select(
        "c_custkey",
        F.lit("1998-01-01").cast("timestamp").alias("eff_ts"),
        F.concat(F.col("c_mktsegment"), F.lit("-R2")).alias("segment"),
    )
    v3 = cust.where(F.col("c_custkey") % 3 == 0).select(
        "c_custkey",
        F.lit("2000-01-01").cast("timestamp").alias("eff_ts"),
        F.concat(F.col("c_mktsegment"), F.lit("-R3")).alias("segment"),
    )
    return v1, v2, v3


def q_scd2_segment_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 version table from a change log
    (operators/scd.py::scd2_from_changelog): one lead-window pass
    partitioned by the natural key turns (key, ts, attrs) change rows
    into versions with half-open [valid_from, valid_to) intervals and an
    is_current flag. The reference's dimensions are static snapshots
    (R/dimension.R); this is the continuously-fed-warehouse treatment.
    Oracle: the same LEAD window in SQL."""
    from data_cube_spark.operators.scd import scd2_from_changelog

    v1, v2, v3 = _scd2_changelog_parts(spark, sf_dir)
    dim = scd2_from_changelog(v1.unionByName(v2).unionByName(v3),
                              "c_custkey", "eff_ts")
    return dim.select("c_custkey", "segment", "valid_from", "valid_to",
                      "is_current")


def q_scd2_temporal_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-SCD2 temporal join
    (operators/scd.py::scd2_temporal_join): each order joins the segment
    version valid AT ORDER TIME — the validity-interval predicate rides
    inside an equi-join on the customer key (hash join; intervals per key
    are disjoint, so no fan-out), revenue then aggregates by
    segment-as-of-then. Oracle: join with the interval predicate in SQL."""
    from data_cube_spark.operators.scd import (
        scd2_from_changelog,
        scd2_temporal_join,
    )

    v1, v2, v3 = _scd2_changelog_parts(spark, sf_dir)
    dim = scd2_from_changelog(v1.unionByName(v2).unionByName(v3),
                              "c_custkey", "eff_ts")
    orders = load_tables(spark, sf_dir)["orders"]
    j = scd2_temporal_join(orders, dim, "o_custkey", "c_custkey",
                           "o_orderdate", how="inner", broadcast_dim=True)
    return j.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
        .alias("sum_price"),
    )


def q_scd2_merge_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SCD2 maintenance as driver evidence
    (operators/scd.py::scd2_merge_changes): the dimension is built from
    the 1994 wave only, then the 1998+2000 change batch is MERGED in —
    touched keys (and only touched keys) rebuild through the lead window,
    untouched keys pass through an anti-join. The oracle is the full
    rebuild from the whole change log: a hash match proves
    merge(build(early), late) == build(early ∪ late)."""
    from data_cube_spark.operators.scd import (
        scd2_from_changelog,
        scd2_merge_changes,
    )

    v1, v2, v3 = _scd2_changelog_parts(spark, sf_dir)
    base = scd2_from_changelog(v1, "c_custkey", "eff_ts")
    merged = scd2_merge_changes(base, v2.unionByName(v3),
                                "c_custkey", "eff_ts")
    return merged.select("c_custkey", "segment", "valid_from", "valid_to",
                         "is_current")


def q_scd2_dim_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SCD2 dimension maintenance as driver evidence
    (streaming/cube_stream.py::streaming_scd2_dimension): the three
    change waves arrive as separate micro-batches (one file per trigger,
    availableNow); each
    batch merges into the standing version table via the verified batch
    operator, rewriting ONLY the hash buckets its keys touch (dynamic
    partition overwrite — O(touched buckets) per trigger, not
    O(dimension)). The oracle is the same LEAD-window SQL as the batch
    build: a hash match proves the streamed dimension is byte-equal to
    building from the full log at once."""
    import os
    import shutil
    import tempfile

    from data_cube_spark.streaming import streaming_scd2_dimension

    v1, v2, v3 = _scd2_changelog_parts(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="sg_scdstream_")
    src = os.path.join(base, "chg")
    target = os.path.join(base, "dim")
    try:
        for wave in (v1, v2, v3):
            wave.coalesce(1).write.mode("append").parquet(src)
        writer = streaming_scd2_dimension(
            spark, src, v1.schema, os.path.join(base, "ck"), target,
            key="c_custkey", ts_col="eff_ts", n_buckets=8,
            max_files_per_trigger=1)
        q = writer.start()
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("scd2 dimension stream did not finish in 300s")
        out = spark.read.parquet(target).select(
            "c_custkey", "segment", "valid_from", "valid_to", "is_current")
        return out.localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)


def q_stream_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful stream-stream interval join
    (streaming/stream_join.py::interval_attribution_join): purchases
    attributed to same-user views within 30 minutes, BOTH sides real
    file streams with watermarks — the time bound in the join condition
    is what lets Spark's state store evict (bounded state; an
    unbounded-history stream join is inexpressible here by design).
    Inner stream-stream joins emit eagerly, so the availableNow run
    produces every pair; the oracle is the batch inequality join in SQL
    — a hash match proves stream == batch. Stream==batch also pinned at
    the operator level by
    tests/test_streaming.py::test_stream_stream_attribution_join_equals_batch."""
    import os
    import shutil
    import tempfile
    import uuid

    from data_cube_spark.streaming.stream_join import (
        interval_attribution_join,
    )

    ev = load_tables(spark, sf_dir)["events"]
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"))
    buys = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("buy_ts"),
        F.col("event_id").alias("buy_id"), "value")
    base = tempfile.mkdtemp(prefix="sg_ssj_")
    vdir, bdir = os.path.join(base, "views"), os.path.join(base, "buys")
    qname = f"ssj_{uuid.uuid4().hex[:8]}"
    try:
        views.write.parquet(vdir)
        buys.write.parquet(bdir)
        vs = spark.readStream.schema(views.schema).parquet(vdir)
        bs = spark.readStream.schema(buys.schema).parquet(bdir)
        joined = interval_attribution_join(
            vs, bs, "user_id", "view_ts", "buy_ts", within="30 minutes")
        q = (joined.writeStream.format("memory").queryName(qname)
             .outputMode("append").trigger(availableNow=True)
             .option("checkpointLocation", os.path.join(base, "ck"))
             .start())
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("attribution stream did not finish in 300s")
        out = spark.table(qname).select("user_id", "view_id", "buy_id",
                                        "value")
        return out.localCheckpoint()
    finally:
        spark.catalog.dropTempView(qname)
        shutil.rmtree(base, ignore_errors=True)


_SCD2_CHG_SQL = """
      SELECT c_custkey, TIMESTAMP '1994-01-01' AS eff_ts,
             c_mktsegment AS segment FROM customer
      UNION ALL
      SELECT c_custkey, TIMESTAMP '1998-01-01',
             c_mktsegment || '-R2' FROM customer WHERE c_custkey % 2 = 0
      UNION ALL
      SELECT c_custkey, TIMESTAMP '2000-01-01',
             c_mktsegment || '-R3' FROM customer WHERE c_custkey % 3 = 0
"""

_SCD2_DIM_SQL = f"""
      SELECT c_custkey, segment, eff_ts AS valid_from,
             LEAD(eff_ts) OVER (PARTITION BY c_custkey ORDER BY eff_ts)
               AS valid_to
      FROM ({_SCD2_CHG_SQL})
"""

_SCD2_HISTORY_SQL = f"""
      SELECT c_custkey, segment, valid_from, valid_to,
             (valid_to IS NULL) AS is_current
      FROM ({_SCD2_DIM_SQL})
"""


# ===========================================================================
# Registry + oracles
# ===========================================================================

QUERIES: dict[str, QueryFn] = {
    "flagship_revenue_by_region": q_flagship_revenue_by_region,
    "dice_key_pushdown": q_dice_key_pushdown,
    "slice_scalar_drop": q_slice_scalar_drop,
    "attr_dice_snowflake": q_attr_dice_snowflake,
    "attr_dice_or": q_attr_dice_or,
    "collapse_prefilter": q_collapse_prefilter,
    "aggregate_two_dims": q_aggregate_two_dims,
    "customer_region_revenue": q_customer_region_revenue,
    "calendar_month_revenue": q_calendar_month_revenue,
    "drill_across_month": q_drill_across_month,
    "aggregate_from_summary": q_aggregate_from_summary,
    "apply_margin_max": q_apply_margin_max,
    "grand_total": q_grand_total,
    "rollup_geo": q_rollup_geo,
    "rollup_level_select": q_rollup_level_select,
    "rollup_hierarchy_q": q_rollup_hierarchy_q,
    "cube_grouping_sets": q_cube_grouping_sets,
    "denormalize_star": q_denormalize_star,
    "denormalize_na_fill": q_denormalize_na_fill,
    "pivot_flag_status": q_pivot_flag_status,
    "topk_parts_per_brand": q_topk_parts_per_brand,
    "surrogate_key": q_surrogate_key,
    "events_cube_from_table": q_events_cube_from_table,
    "extract_custom_j": q_extract_custom_j,
    "measures_heterogeneous": q_measures_heterogeneous,
    "distinct_counts": q_distinct_counts,
    "udaf_median": q_udaf_median,
    "window_running_total": q_window_running_total,
    "format_currency": q_format_currency,
    "pivot_formatted": q_pivot_formatted,
    "anti_join_idle_customers": q_anti_join_idle_customers,
    "tpch_q1_pricing_summary": q_tpch_q1_pricing_summary,
    "tpch_q3_shipping_priority": q_tpch_q3_shipping_priority,
    "tpch_q5_local_supplier": q_tpch_q5_local_supplier,
    "stats_by_flag": q_stats_by_flag,
    "tpch_q6_forecast_revenue": q_tpch_q6_forecast_revenue,
    "tpch_q12_priority_counts": q_tpch_q12_priority_counts,
    "tpch_q14_promo_revenue": q_tpch_q14_promo_revenue,
    "tpch_q4_priority_returns": q_tpch_q4_priority_returns,
    "tpch_q7_volume_shipping": q_tpch_q7_volume_shipping,
    "tpch_q8_market_share": q_tpch_q8_market_share,
    "tpch_q10_returned_items": q_tpch_q10_returned_items,
    "tpch_q13_order_distribution": q_tpch_q13_order_distribution,
    "tpch_q15_top_supplier": q_tpch_q15_top_supplier,
    "tpch_q17_small_qty_revenue": q_tpch_q17_small_qty_revenue,
    "tpch_q18_large_orders": q_tpch_q18_large_orders,
    "tpch_q19_disjunctive_revenue": q_tpch_q19_disjunctive_revenue,
    "tpch_q22_idle_balance": q_tpch_q22_idle_balance,
    "tpch_q2_min_cost_supplier": q_tpch_q2_min_cost_supplier,
    "tpch_q9_product_profit": q_tpch_q9_product_profit,
    "tpch_q11_important_stock": q_tpch_q11_important_stock,
    "tpch_q16_supplier_counts": q_tpch_q16_supplier_counts,
    "tpch_q20_excess_stock": q_tpch_q20_excess_stock,
    "tpch_q21_waiting_suppliers": q_tpch_q21_waiting_suppliers,
    "dedup_exact": q_dedup_exact,
    "dedup_fingerprint": q_dedup_fingerprint,
    "text_token_count": q_text_token_count,
    "text_quality": q_text_quality,
    "text_langid": q_text_langid,
    "text_subwords": q_text_subwords,
    "text_fingerprint": q_text_fingerprint,
    "text_repetition": q_text_repetition,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "incremental_dedup_keep": q_incremental_dedup_keep,
    "incremental_minhash_recall": q_incremental_minhash_recall,
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    "simhash_pairs": q_simhash_pairs,
    "ann_cosine_topk": q_ann_cosine_topk,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "embedding_near_pairs": q_embedding_near_pairs,
    "embedding_near_pairs_lsh": q_embedding_near_pairs_lsh,
    "embedding_centroids": q_embedding_centroids,
    "multimodal_meta": q_multimodal_meta,
    "multimodal_frames": q_multimodal_frames,
    "multimodal_resize": q_multimodal_resize,
    "multimodal_decode": q_multimodal_decode,
    "multimodal_audio": q_multimodal_audio,
    "sketch_error_bounds": q_sketch_error_bounds,
    "events_props_json": q_events_props_json,
    "quantiles_by_type": q_quantiles_by_type,
    "heavy_hitters_sources": q_heavy_hitters_sources,
    "asof_last_error": q_asof_last_error,
    "range_join_error_window": q_range_join_error_window,
    "embedding_components": q_embedding_components,
    "semantic_dedup_keep": q_semantic_dedup_keep,
    "pipeline_clean_corpus": q_pipeline_clean_corpus,
    "pipeline_pretraining": q_pipeline_pretraining,
    "decontaminate_overlap": q_decontaminate_overlap,
    "pii_redaction": q_pii_redaction,
    "paragraph_dedup": q_paragraph_dedup,
    "sample_fraction_docs": q_sample_fraction_docs,
    "sample_stratified_docs": q_sample_stratified_docs,
    "mixture_sample_docs": q_mixture_sample_docs,
    "domain_cap": q_domain_cap,
    "quality_percentile_keep": q_quality_percentile_keep,
    "chunk_documents": q_chunk_documents,
    "token_vocab": q_token_vocab,
    "split_assign": q_split_assign,
    "shuffle_order": q_shuffle_order,
    "tfidf_keywords": q_tfidf_keywords,
    "events_stream_dedup": q_events_stream_dedup,
    "documents_stream_ingest": q_documents_stream_ingest,
    "grouping_sets_explicit": q_grouping_sets_explicit,
    "winsorized_price_stats": q_winsorized_price_stats,
    "quantile_bins": q_quantile_bins,
    "quantile_bins_approx_bound": q_quantile_bins_approx_bound,
    "key_skew_users": q_key_skew_users,
    "pack_sequences": q_pack_sequences,
    "pack_greedy_check": q_pack_greedy_check,
    "events_hourly": q_events_hourly,
    "events_sessionize": q_events_sessionize,
    "events_stream_cube": q_events_stream_cube,
    "merge_delta_incremental": q_merge_delta_incremental,
    "remove_delta_retraction": q_remove_delta_retraction,
    "price_histogram": q_price_histogram,
    "funnel_conversion": q_funnel_conversion,
    "cohort_retention": q_cohort_retention,
    "cube_store_roundtrip": q_cube_store_roundtrip,
    "salted_join_agg": q_salted_join_agg,
    "interval_overlap_sessions": q_interval_overlap_sessions,
    "window_moving_avg": q_window_moving_avg,
    "skew_aware_user_join": q_skew_aware_user_join,
    "bucketed_join_copartition": q_bucketed_join_copartition,
    "jaccard_prefix_pairs": q_jaccard_prefix_pairs,
    "incremental_prefix_pairs": q_incremental_prefix_pairs,
    "weighted_sample_docs": q_weighted_sample_docs,
    "token_budget_sample_docs": q_token_budget_sample_docs,
    "range_layout_prune": q_range_layout_prune,
    "dedup_keep_longest": q_dedup_keep_longest,
    "corpus_snapshot_diff": q_corpus_snapshot_diff,
    "zorder_layout_prune": q_zorder_layout_prune,
    "dpp_partition_prune": q_dpp_partition_prune,
    "hll_sketch_regrain": q_hll_sketch_regrain,
    "vocab_overlap_sources": q_vocab_overlap_sources,
    "topk_sketch_regrain": q_topk_sketch_regrain,
    "revenue_share_of_region": q_revenue_share_of_region,
    "events_gap_fill": q_events_gap_fill,
    "data_quality_report": q_data_quality_report,
    "contrastive_negatives": q_contrastive_negatives,
    "histogram_percentile_regrain": q_histogram_percentile_regrain,
    "events_anomaly_zscore": q_events_anomaly_zscore,
    "value_drift_psi": q_value_drift_psi,
    "scd2_segment_history": q_scd2_segment_history,
    "scd2_temporal_revenue": q_scd2_temporal_revenue,
    "scd2_merge_rebuild": q_scd2_merge_rebuild,
    "scd2_dim_stream": q_scd2_dim_stream,
    "stream_attribution_join": q_stream_attribution_join,
}


def _langid_sql() -> str:
    counts = _lang_counts_sql()
    best = "greatest(" + ", ".join(f"c_{l}" for l in counts) + ")"
    case = "CASE WHEN best = 0 THEN 'und' " + " ".join(
        f"WHEN c_{l} = best THEN '{l}'" for l in counts
    ) + " END"
    inner = ", ".join(f"{expr} AS c_{l}" for l, expr in counts.items())
    return f"""
      WITH c AS (SELECT doc_id, {inner} FROM documents),
      b AS (SELECT doc_id, c_en, c_de, c_fr, c_es, {best} AS best FROM c)
      SELECT doc_id, {case} AS lang_pred, CAST(best AS BIGINT) AS stopword_hits FROM b
    """


def _quality_sql() -> str:
    en = LANG_STOPWORDS["en"]
    stop_pat = r"(?i)\b(" + "|".join(en) + r")\b"
    return f"""
      WITH f AS (
        SELECT doc_id,
          CAST(length(text) AS BIGINT) AS n_chars_calc,
          CAST(len(string_split_regex(TRIM(text), '\\s+')) AS BIGINT) AS n_tokens,
          CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS BIGINT) AS n_punct,
          CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS BIGINT) AS n_upper,
          CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digit,
          CAST(len(regexp_extract_all(text, '{stop_pat}')) AS BIGINT) AS n_stop,
          CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS BIGINT) AS nonspace
        FROM documents)
      SELECT doc_id, n_chars_calc, n_tokens,
             CAST(n_punct AS DOUBLE) / n_chars_calc AS punct_ratio,
             CAST(n_upper AS DOUBLE) / n_chars_calc AS upper_ratio,
             CAST(n_digit AS DOUBLE) / n_chars_calc AS digit_ratio,
             CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
             CAST(nonspace AS DOUBLE) / n_tokens AS mean_token_len
      FROM f
    """


def _ngram_jaccard_sql(threshold: float = 0.05, max_df: int | None = None) -> str:
    # mirror of the operator's max_df stop-shingle cap: drop high-document-
    # frequency shingles BEFORE sizes/intersections, exactly like
    # dedup.ngram_jaccard_pairs does
    cap = f"""
      freq AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING COUNT(*) <= {max_df}),
      sh AS (SELECT sh0.* FROM sh0 JOIN freq USING (shingle)),
    """ if max_df is not None else """
      sh AS (SELECT * FROM sh0),
    """
    return f"""
      WITH toks AS (
        SELECT doc_id, lang, source,
               string_split({_NORM_SQL}, ' ') AS t
        FROM documents),
      sh0 AS (
        SELECT DISTINCT doc_id, lang, source,
               array_to_string(t[i:i+2], ' ') AS shingle
        FROM (SELECT doc_id, lang, source, t,
                     unnest(generate_series(1, len(t) - 2)) AS i
              FROM toks WHERE len(t) >= 3)),
      {cap}
      sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n
        FROM sh a JOIN sh b
          ON a.shingle = b.shingle AND a.lang = b.lang AND a.source = b.source
         AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT id_a, id_b,
             CAST(i.n AS DOUBLE) / (sa.n + sb.n - i.n) AS jaccard
      FROM inter i JOIN sz sa ON sa.doc_id = i.id_a JOIN sz sb ON sb.doc_id = i.id_b
      WHERE CAST(i.n AS DOUBLE) / (sa.n + sb.n - i.n) >= {threshold}
    """



def _ngram_exact_sql(threshold: float) -> str:
    # uncapped, unblocked exact 3-gram set-Jaccard pairs — the ground
    # truth the prefix-filtered join must reproduce verbatim
    sql = _ngram_truth_sql(threshold).replace(
        ",\n             TRUE AS lsh_found", "")
    assert "lsh_found" not in sql, "truth SQL drifted; fix the strip"
    return sql


def _ngram_truth_sql(threshold: float) -> str:
    # all-pairs exact 3-gram Jaccard truth (NO blocking, NO frequency cap
    # — exactly the similarity MinHash estimates) for the LSH recall
    # invariant: every truth pair must have been found by the banded
    # candidate generator, so the oracle emits TRUE per pair
    return f"""
      WITH toks AS (
        SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t FROM documents),
      sh AS (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
              FROM toks WHERE len(t) >= 3)),
      sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n
        FROM sh a JOIN sh b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT id_a, id_b,
             CAST(i.n AS DOUBLE) / (sa.n + sb.n - i.n) AS jaccard,
             TRUE AS lsh_found
      FROM inter i JOIN sz sa ON sa.doc_id = i.id_a
                   JOIN sz sb ON sb.doc_id = i.id_b
      WHERE CAST(i.n AS DOUBLE) / (sa.n + sb.n - i.n) >= {threshold}
    """


def _incremental_truth_sql(threshold: float) -> str:
    # batch (odd) x corpus (even) exact-Jaccard truth for the incremental
    # MinHash recall invariant — no frequency cap, mirroring the
    # uncapped truth side of q_incremental_minhash_recall
    return f"""
      WITH toks AS (
        SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t FROM documents),
      sh AS (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
              FROM toks WHERE len(t) >= 3)),
      sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
      inter AS (
        SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id, COUNT(*) AS n
        FROM sh b JOIN sh c ON b.shingle = c.shingle
        WHERE b.doc_id % 2 = 1 AND c.doc_id % 2 = 0
        GROUP BY 1, 2)
      SELECT batch_id, corpus_id,
             CAST(i.n AS DOUBLE) / (sa.n + sb.n - i.n) AS jaccard,
             TRUE AS lsh_found
      FROM inter i JOIN sz sa ON sa.doc_id = i.batch_id
                   JOIN sz sb ON sb.doc_id = i.corpus_id
      WHERE CAST(i.n AS DOUBLE) / (sa.n + sb.n - i.n) >= {threshold}
    """


def _incremental_exact_sql(threshold: float) -> str:
    # uncapped batch x corpus exact-Jaccard pairs — the ground truth the
    # R x S prefix-filtered join must reproduce verbatim
    sql = _incremental_truth_sql(threshold).replace(
        ",\n             TRUE AS lsh_found", "")
    assert "lsh_found" not in sql, "truth SQL drifted; fix the strip"
    return sql


def _incremental_keep_sql(threshold: float, max_df: int) -> str:
    # mirror of operators/dedup.py::incremental_dedup_keep — odd doc_ids
    # are the batch, even the corpus; document frequency for the stop-
    # shingle cap is computed over BOTH sides (= all documents), sizes
    # after the cap, exactly like the operator
    return f"""
      WITH toks AS (
        SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t FROM documents),
      sh0 AS (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
              FROM toks WHERE len(t) >= 3)),
      freq AS (SELECT shingle FROM sh0 GROUP BY shingle
               HAVING COUNT(*) <= {max_df}),
      sh AS (SELECT sh0.* FROM sh0 JOIN freq USING (shingle)),
      sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
      inter AS (
        SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id, COUNT(*) AS n
        FROM sh b JOIN sh c ON b.shingle = c.shingle
        WHERE b.doc_id % 2 = 1 AND c.doc_id % 2 = 0
        GROUP BY 1, 2),
      dup AS (
        SELECT DISTINCT batch_id FROM inter i
        JOIN sz sa ON sa.doc_id = i.batch_id
        JOIN sz sb ON sb.doc_id = i.corpus_id
        WHERE CAST(i.n AS DOUBLE) / (sa.n + sb.n - i.n) >= {threshold})
      SELECT doc_id FROM documents
      WHERE doc_id % 2 = 1
        AND doc_id NOT IN (SELECT batch_id FROM dup)
    """


def _pipeline_pretraining_sql() -> str:
    # composition of the verified fragment oracles: dedup (min-id per
    # md5), decontamination (3-gram overlap vs the %97 eval set), langid
    # + quality (as _pipeline_sql), 90% train split, concat-and-chunk
    # packing (512 tokens, 8 shards)
    counts = _lang_counts_sql()
    best = "greatest(" + ", ".join(f"c_{l}" for l in counts) + ")"
    case = "CASE WHEN best = 0 THEN 'und' " + " ".join(
        f"WHEN c_{l} = best THEN '{l}'" for l in counts
    ) + " END"
    inner = ", ".join(f"{expr} AS c_{l}" for l, expr in counts.items())
    en = LANG_STOPWORDS["en"]
    stop_pat = r"(?i)\b(" + "|".join(en) + r")\b"
    return f"""
      WITH keep AS (
        SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
      d0 AS (SELECT doc.* FROM documents doc JOIN keep USING (doc_id)
             WHERE doc_id % 97 <> 0),
      toksA AS (
        SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t FROM documents),
      shA AS (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
              FROM toksA WHERE len(t) >= 3)),
      bench AS (SELECT DISTINCT shingle FROM shA WHERE doc_id % 97 = 0),
      szh AS (SELECT s.doc_id, COUNT(*) AS n_shingles
              FROM shA s JOIN d0 USING (doc_id) GROUP BY 1),
      hits AS (SELECT s.doc_id, COUNT(*) AS n_overlap
               FROM shA s JOIN d0 USING (doc_id) JOIN bench USING (shingle)
               GROUP BY 1),
      dirty AS (
        SELECT szh.doc_id FROM szh JOIN hits USING (doc_id)
        WHERE CAST(n_overlap AS DOUBLE) / n_shingles >= 0.5),
      d AS (SELECT * FROM d0
            WHERE doc_id NOT IN (SELECT doc_id FROM dirty)),
      lang AS (
        SELECT doc_id, {case.replace('best', '(' + best + ')')} AS lang_pred
        FROM (SELECT doc_id, {inner} FROM d)),
      feat AS (
        SELECT doc_id,
          CAST(len(string_split_regex(TRIM(text), '\\s+')) AS BIGINT) AS n_tokens,
          CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE)
            / length(text) AS punct_ratio,
          CAST(len(regexp_extract_all(text, '{stop_pat}')) AS DOUBLE)
            / len(string_split_regex(TRIM(text), '\\s+')) AS stopword_ratio,
          CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
            / len(string_split_regex(TRIM(text), '\\s+')) AS mean_token_len
        FROM d),
      scored AS (
        SELECT doc_id, n_tokens,
               least(stopword_ratio * 4, 1.0) * 0.5
               + CASE WHEN mean_token_len >= 3 AND mean_token_len <= 10
                      THEN 0.3 ELSE 0.0 END
               + CASE WHEN punct_ratio <= 0.1 THEN 0.2 ELSE 0.0 END AS quality
        FROM feat),
      good AS (
        SELECT s.doc_id, s.n_tokens
        FROM scored s JOIN lang l USING (doc_id)
        WHERE l.lang_pred = 'en' AND s.quality >= 0.5),
      train AS (
        SELECT * FROM good
        WHERE md5('split' || CAST(doc_id AS VARCHAR))
              < '{_hex_threshold(0.9)}'),
      sharded AS (
        SELECT doc_id, n_tokens,
               CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 8 AS INT) AS shard
        FROM train),
      c AS (
        SELECT doc_id, shard, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
                 - n_tokens AS "offset"
        FROM sharded)
      SELECT doc_id, shard, CAST("offset" // 512 AS BIGINT) AS seq,
             CAST("offset" AS BIGINT) AS "offset", n_tokens
      FROM c
    """


def _pipeline_sql() -> str:
    counts = _lang_counts_sql()
    best = "greatest(" + ", ".join(f"c_{l}" for l in counts) + ")"
    case = "CASE WHEN best = 0 THEN 'und' " + " ".join(
        f"WHEN c_{l} = best THEN '{l}'" for l in counts
    ) + " END"
    inner = ", ".join(f"{expr} AS c_{l}" for l, expr in counts.items())
    en = LANG_STOPWORDS["en"]
    stop_pat = r"(?i)\b(" + "|".join(en) + r")\b"
    return f"""
      WITH keep AS (
        SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
      d AS (SELECT doc.* FROM documents doc JOIN keep USING (doc_id)),
      lang AS (
        SELECT doc_id, {case.replace('best', '(' + best + ')')} AS lang_pred
        FROM (SELECT doc_id, {inner} FROM d)),
      feat AS (
        SELECT doc_id,
          CAST(len(string_split_regex(TRIM(text), '\\s+')) AS BIGINT) AS n_tokens,
          CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE)
            / length(text) AS punct_ratio,
          CAST(len(regexp_extract_all(text, '{stop_pat}')) AS DOUBLE)
            / len(string_split_regex(TRIM(text), '\\s+')) AS stopword_ratio,
          CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
            / len(string_split_regex(TRIM(text), '\\s+')) AS mean_token_len
        FROM d),
      scored AS (
        SELECT doc_id, n_tokens,
               least(stopword_ratio * 4, 1.0) * 0.5
               + CASE WHEN mean_token_len >= 3 AND mean_token_len <= 10
                      THEN 0.3 ELSE 0.0 END
               + CASE WHEN punct_ratio <= 0.1 THEN 0.2 ELSE 0.0 END AS quality
        FROM feat)
      SELECT s.doc_id, s.n_tokens, l.lang_pred,
             CAST(s.quality AS DOUBLE) AS quality
      FROM scored s JOIN lang l USING (doc_id)
      WHERE l.lang_pred = 'en' AND s.quality >= 0.5
    """


ORACLE: dict[str, str] = {
    "flagship_revenue_by_region": f"""
      SELECT r_name, {_MEASURE_SQL}
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY 1
    """,
    "dice_key_pushdown": f"""
      SELECT l_suppkey AS s_suppkey, {_MEASURE_SQL}
      FROM lineitem WHERE l_suppkey IN (0,1,2,3,4) GROUP BY 1
    """,
    "slice_scalar_drop": f"""
      SELECT l_orderkey AS o_orderkey, l_suppkey AS s_suppkey, {_MEASURE_SQL}
      FROM lineitem WHERE l_partkey = 0 GROUP BY 1, 2
    """,
    "attr_dice_snowflake": f"""
      SELECT l_suppkey AS s_suppkey, {_MEASURE_SQL}
      FROM lineitem
      WHERE l_suppkey IN (
        SELECT s_suppkey FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name IN ('EUROPE','ASIA'))
      GROUP BY 1
    """,
    "attr_dice_or": f"""
      SELECT l_suppkey AS s_suppkey, {_MEASURE_SQL}
      FROM lineitem
      WHERE l_suppkey IN (
        SELECT s_suppkey FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE' OR n_name = 'JAPAN')
      GROUP BY 1
    """,
    "collapse_prefilter": f"""
      SELECT l_suppkey AS s_suppkey, {_MEASURE_SQL}
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '1-URGENT' GROUP BY 1
    """,
    "aggregate_two_dims": f"""
      SELECT r_name, p_brand, {_MEASURE_SQL}
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      JOIN part ON l_partkey = p_partkey
      GROUP BY 1, 2
    """,
    "customer_region_revenue": f"""
      SELECT r_name AS cr_name, {_MEASURE_SQL}
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY 1
    """,
    "aggregate_from_summary": f"""
      SELECT CAST(year(o_orderdate) AS INT) AS d_year, {_MEASURE_SQL}
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1
    """,
    "drill_across_month": f"""
      WITH a AS (
        SELECT year(o_orderdate) AS d_year, month(o_orderdate) AS d_month,
               CAST({SQL_REV} AS DOUBLE) AS revenue, COUNT(*) AS n_lines
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2),
      b AS (
        SELECT year(o_orderdate) AS d_year, month(o_orderdate) AS d_month,
               COUNT(o_orderkey) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_price
        FROM orders GROUP BY 1, 2)
      SELECT CAST(d_year AS INT) AS d_year, CAST(d_month AS INT) AS d_month,
             revenue, n_lines, n_orders, total_price
      FROM a FULL OUTER JOIN b USING (d_year, d_month)
    """,
    "calendar_month_revenue": f"""
      SELECT CAST(year(o_orderdate) AS INT) AS d_year,
             CAST(month(o_orderdate) AS INT) AS d_month, {_MEASURE_SQL}
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2
    """,
    "apply_margin_max": f"""
      WITH grain AS ({SQL_GRAIN})
      SELECT s_suppkey, CAST(MAX(sum_qty) AS DOUBLE) AS max_qty,
             CAST(MAX(revenue) AS DOUBLE) AS max_revenue
      FROM grain GROUP BY 1
    """,
    "grand_total": f"SELECT {_MEASURE_SQL} FROM lineitem",
    "rollup_geo": f"""
      SELECT r_name, n_name, CAST({SQL_REV} AS DOUBLE) AS revenue,
             COUNT(*) AS n_lines,
             CAST(GROUPING(r_name) + GROUPING(n_name) AS INT) AS grouping_level
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP (r_name, n_name)
    """,
    "rollup_level_select": f"""
      SELECT r_name, n_name, CAST({SQL_QTY} AS DOUBLE) AS sum_qty,
             CAST(GROUPING(r_name) + GROUPING(n_name) AS INT) AS grouping_level
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP (r_name, n_name)
      HAVING GROUPING(r_name) + GROUPING(n_name) IN (1, 2)
    """,
    "rollup_hierarchy_q": f"""
      SELECT n_regionkey, n_nationkey, s_suppkey,
             CAST({SQL_REV} AS DOUBLE) AS revenue, COUNT(*) AS n_lines,
             CAST(GROUPING(n_regionkey) + GROUPING(n_nationkey)
                  + GROUPING(s_suppkey) AS INT) AS grouping_level
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      GROUP BY ROLLUP (n_regionkey, n_nationkey, s_suppkey)
    """,
    "cube_grouping_sets": f"""
      SELECT l_returnflag, l_linestatus, CAST({SQL_QTY} AS DOUBLE) AS sum_qty,
             COUNT(*) AS n_lines,
             CAST(GROUPING(l_returnflag) + GROUPING(l_linestatus) AS INT) AS grouping_level
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "denormalize_star": f"""
      WITH grain AS ({SQL_GRAIN})
      SELECT grain.o_orderkey, grain.p_partkey, grain.s_suppkey,
             CAST(sum_qty AS DOUBLE) AS sum_qty, CAST(revenue AS DOUBLE) AS revenue,
             n_lines, p_brand, s_name, n.n_name, r.r_name,
             cn.n_name AS cn_name, cr.r_name AS cr_name,
             o_orderpriority, CAST(year(o_orderdate) AS INT) AS d_year
      FROM grain
      JOIN part ON grain.p_partkey = part.p_partkey
      JOIN supplier ON grain.s_suppkey = supplier.s_suppkey
      JOIN nation n ON supplier.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      JOIN orders ON grain.o_orderkey = orders.o_orderkey
      JOIN customer ON orders.o_custkey = customer.c_custkey
      JOIN nation cn ON customer.c_nationkey = cn.n_nationkey
      JOIN region cr ON cn.n_regionkey = cr.r_regionkey
    """,
    "denormalize_na_fill": """
      WITH g AS (SELECT DISTINCT event_type FROM events),
      u AS (SELECT DISTINCT user_id FROM events),
      f AS (SELECT event_type, user_id,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
                   COUNT(*) AS n_events
            FROM events GROUP BY 1, 2)
      SELECT g.event_type, u.user_id, f.sum_value, f.n_events
      FROM g CROSS JOIN u
      LEFT JOIN f ON f.event_type = g.event_type AND f.user_id = u.user_id
    """,
    "pivot_flag_status": """
      SELECT l_returnflag,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (l_linestatus = 'F') AS DOUBLE) AS "F",
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (l_linestatus = 'O') AS DOUBLE) AS "O"
      FROM lineitem GROUP BY 1
    """,
    "topk_parts_per_brand": f"""
      WITH agg AS (
        SELECT p_brand, p_partkey, {SQL_REV} AS rev
        FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1, 2)
      SELECT p_brand, p_partkey, CAST(rev AS DOUBLE) AS revenue,
             CAST(row_number() OVER (PARTITION BY p_brand ORDER BY rev DESC, p_partkey) AS BIGINT) AS rank
      FROM agg QUALIFY rank <= 3
    """,
    "surrogate_key": """
      SELECT c_mktsegment,
             CAST(dense_rank() OVER (ORDER BY c_mktsegment) AS BIGINT) AS seg_key
      FROM (SELECT DISTINCT c_mktsegment FROM customer)
    """,
    "events_cube_from_table": """
      SELECT event_type,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
             COUNT(event_id) AS n_events
      FROM events GROUP BY 1
    """,
    "tpch_q1_pricing_summary": f"""
      SELECT l_returnflag, l_linestatus,
             CAST({SQL_QTY} AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             CAST({SQL_REV} AS DOUBLE) AS sum_disc_price,
             CAST({SQL_CHARGE} AS DOUBLE) AS sum_charge,
             CAST({SQL_QTY} AS DOUBLE) / COUNT(*) AS avg_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
             COUNT(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
      GROUP BY 1, 2
    """,
    "tpch_q3_shipping_priority": f"""
      SELECT l_orderkey AS o_orderkey, CAST({SQL_REV} AS DOUBLE) AS revenue,
             o_orderdate, o_orderpriority
      FROM lineitem
      JOIN orders ON l_orderkey = orders.o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY 1, 3, 4
      ORDER BY {SQL_REV} DESC, l_orderkey LIMIT 10
    """,
    "tpch_q5_local_supplier": f"""
      SELECT n.n_name, CAST({SQL_REV} AS DOUBLE) AS revenue, COUNT(*) AS n_lines
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n ON s_nationkey = n.n_nationkey
      JOIN region ON n.n_regionkey = r_regionkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE r_name = 'EUROPE' AND customer.c_nationkey = supplier.s_nationkey
        AND year(o_orderdate) = 1996
      GROUP BY 1
    """,
    "stats_by_flag": """
      SELECT l_returnflag,
             stddev_samp(l_quantity) AS sd_qty,
             var_samp(l_quantity) AS var_qty
      FROM lineitem GROUP BY 1
    """,
    "tpch_q6_forecast_revenue": """
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
             AS forecast_revenue,
             COUNT(*) AS n_lines
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07
        AND l_quantity < 24
    """,
    "tpch_q12_priority_counts": """
      SELECT l_returnflag,
             CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1
    """,
    "tpch_q14_promo_revenue": """
      SELECT 100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                   THEN CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))
                   ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS promo_revenue_pct
      FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
    "tpch_q4_priority_returns": """
      SELECT o_orderpriority, COUNT(*) AS order_count
      FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      GROUP BY 1
    """,
    "tpch_q7_volume_shipping": f"""
      SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             CAST({SQL_REV} AS DOUBLE) AS revenue, COUNT(*) AS n_lines
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
         OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
      GROUP BY 1, 2, 3
    """,
    "tpch_q8_market_share": """
      SELECT year(o_orderdate) AS o_year,
             CAST(SUM(CASE WHEN sn.n_name = 'NATION_3'
                      THEN CAST(l_extendedprice AS DECIMAL(18,2))
                           * (1 - CAST(l_discount AS DECIMAL(18,2)))
                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS mkt_share,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS total_revenue
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region ON cn.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
      GROUP BY 1
    """,
    "tpch_q10_returned_items": f"""
      SELECT c_custkey, c_name, CAST({SQL_REV} AS DOUBLE) AS revenue,
             c_acctbal, n_name
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY 1, 2, 4, 5
      ORDER BY {SQL_REV} DESC, c_custkey LIMIT 20
    """,
    "tpch_q13_order_distribution": """
      WITH per_cust AS (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY 1)
      SELECT c_count, COUNT(*) AS custdist FROM per_cust GROUP BY 1
    """,
    "tpch_q15_top_supplier": f"""
      WITH rev AS (
        SELECT l_suppkey, {SQL_REV} AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY 1)
      SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
      FROM rev JOIN supplier ON l_suppkey = s_suppkey
      WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
      ORDER BY s_suppkey
    """,
    "tpch_q17_small_qty_revenue": """
      WITH j AS (
        SELECT l_partkey, l_quantity, l_extendedprice
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#1' AND p_size <= 10),
      t AS (
        SELECT l_partkey,
               0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                      / COUNT(*)) AS qty_thresh
        FROM j GROUP BY 1)
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
               AS avg_yearly,
             COUNT(*) AS n_lines
      FROM j JOIN t USING (l_partkey)
      WHERE l_quantity < qty_thresh
    """,
    "tpch_q18_large_orders": """
      WITH big AS (
        SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
        FROM lineitem GROUP BY 1
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 200)
      SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
             CAST(sum_qty AS DOUBLE) AS sum_qty
      FROM big
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
    "tpch_q19_disjunctive_revenue": f"""
      SELECT CAST({SQL_REV} AS DOUBLE) AS revenue, COUNT(*) AS n_lines
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 5
             AND l_quantity BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 10
             AND l_quantity BETWEEN 10 AND 20)
         OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
             AND l_quantity BETWEEN 20 AND 30)
    """,
    "tpch_q22_idle_balance": """
      WITH avg_bal AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS avg_bal
        FROM customer WHERE c_acctbal > 0)
      SELECT n_name, COUNT(*) AS numcust,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      FROM customer, avg_bal
      JOIN nation ON c_nationkey = n_nationkey
      WHERE c_acctbal > avg_bal
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      GROUP BY 1
    """,
    "tpch_q2_min_cost_supplier": """
      WITH ps AS (
        SELECT l_partkey, l_suppkey,
               MIN(l_extendedprice / l_quantity) AS supply_cost
        FROM lineitem GROUP BY 1, 2)
      SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, s_suppkey,
             supply_cost
      FROM ps
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE' AND p_size = 15 AND p_type = 'STANDARD'
      QUALIFY supply_cost = MIN(supply_cost) OVER (PARTITION BY p_partkey)
      ORDER BY s_acctbal DESC, s_suppkey, p_partkey LIMIT 100
    """,
    "tpch_q9_product_profit": f"""
      SELECT n_name AS nation, year(o_orderdate) AS o_year,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))
                      - CAST(p_retailprice AS DECIMAL(18,2))
                        * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_profit,
             COUNT(*) AS n_lines
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE 'red%'
      GROUP BY 1, 2
    """,
    "tpch_q11_important_stock": f"""
      WITH val AS (
        SELECT l_partkey, {SQL_REV} AS value
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_7'
        GROUP BY 1)
      SELECT l_partkey AS p_partkey, CAST(value AS DOUBLE) AS part_value
      FROM val
      WHERE CAST(value AS DOUBLE) > 0.001 * (SELECT CAST(SUM(value) AS DOUBLE)
                                             FROM val)
    """,
    "tpch_q16_supplier_counts": """
      WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
      SELECT p_brand, p_type, p_size,
             COUNT(DISTINCT l_suppkey) AS supplier_cnt
      FROM ps JOIN part ON l_partkey = p_partkey
      WHERE p_brand <> 'Brand#5'
        AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
        AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0)
      GROUP BY 1, 2, 3
    """,
    "tpch_q20_excess_stock": """
      WITH q96 AS (
        SELECT l_partkey, l_suppkey,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q96
        FROM lineitem WHERE year(l_shipdate) = 1996 GROUP BY 1, 2),
      qall AS (
        SELECT l_partkey, l_suppkey,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qall
        FROM lineitem GROUP BY 1, 2)
      SELECT s_suppkey, s_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_4'
        AND s_suppkey IN (
          SELECT qall.l_suppkey
          FROM qall JOIN q96 USING (l_partkey, l_suppkey)
          WHERE qall.l_partkey IN (SELECT p_partkey FROM part
                                   WHERE p_name LIKE 'red%')
            AND qall > 2 * q96)
      ORDER BY s_name
    """,
    "tpch_q21_waiting_suppliers": """
      WITH sn AS (
        SELECT s_suppkey, s_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_2')
      SELECT s_name, COUNT(*) AS numwait
      FROM lineitem l1
      JOIN sn ON l1.l_suppkey = s_suppkey
      WHERE l1.l_returnflag = 'R'
        AND EXISTS (SELECT 1 FROM orders
                    WHERE o_orderkey = l1.l_orderkey AND o_orderstatus = 'F')
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_returnflag = 'R')
      GROUP BY 1
      ORDER BY numwait DESC, s_name LIMIT 100
    """,
    "dedup_exact": """
      SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
      FROM documents GROUP BY 1
    """,
    "dedup_fingerprint": f"""
      SELECT md5({_NORM_SQL}) AS content_hash, MIN(doc_id) AS keep_id,
             COUNT(*) AS n_dups
      FROM documents GROUP BY 1
    """,
    "dedup_keep_longest": f"""
      WITH g AS (
        SELECT md5({_NORM_SQL}) AS content_hash, doc_id, length(text) AS l,
               COUNT(*) OVER (PARTITION BY md5({_NORM_SQL})) AS n_dups,
               row_number() OVER (PARTITION BY md5({_NORM_SQL})
                                  ORDER BY length(text) DESC, doc_id ASC) AS rn
        FROM documents)
      SELECT content_hash, doc_id AS keep_id, n_dups FROM g WHERE rn = 1
    """,
    "text_token_count": r"""
      SELECT doc_id,
             CAST(len(string_split_regex(TRIM(text), '\s+')) AS BIGINT) AS n_tokens,
             CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT) AS n_subwords
      FROM documents
    """,
    "text_quality": _quality_sql(),
    "text_langid": _langid_sql(),
    "text_fingerprint": f"SELECT doc_id, md5({_NORM_SQL}) AS fingerprint FROM documents",
    "text_repetition": r"""
      WITH d AS (
        SELECT doc_id, string_split_regex(TRIM(text), '\s+') AS toks
        FROM documents),
      c AS (
        SELECT doc_id, toks, len(toks) AS n,
               list_max(list_transform(list_distinct(toks),
                 t -> len(list_filter(toks, x -> x = t)))) AS top_tok
        FROM d),
      bg AS (
        SELECT doc_id, toks, n, top_tok,
               CASE WHEN n > 1
                 THEN list_transform(range(1, n), i -> toks[i] || ' ' || toks[i+1])
                 ELSE CAST([] AS VARCHAR[]) END AS bigrams
        FROM c)
      SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(toks)) AS DOUBLE) / n AS distinct_ratio,
             CAST(top_tok AS DOUBLE) / n AS top_token_frac,
             CASE WHEN len(bigrams) > 0
               THEN CAST(list_max(list_transform(list_distinct(bigrams),
                      t -> len(list_filter(bigrams, x -> x = t)))) AS DOUBLE)
                    / len(bigrams) END AS top_bigram_frac
      FROM bg
    """,
    "text_subwords": r"""
      SELECT doc_id,
             CAST(len(string_split_regex(TRIM(text), '\s+')) AS BIGINT) AS n_tokens_ws,
             CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT) AS n_subwords
      FROM documents
    """,
    "ngram_jaccard_pairs": _ngram_jaccard_sql(max_df=NGRAM_MAX_DF),
    "jaccard_prefix_pairs": _ngram_exact_sql(0.5),
    "incremental_prefix_pairs": _incremental_exact_sql(0.5),
    "weighted_sample_docs": """
      WITH scored AS (
        SELECT doc_id, lang, n_chars,
               ln(CAST(('0x' || substr(md5('w' || CAST(doc_id AS VARCHAR)), 1, 15))::UBIGINT + 1 AS DOUBLE)
                  / CAST(power(16, 15) AS DOUBLE)) / CAST(n_chars AS DOUBLE) AS wkey
        FROM documents WHERE CAST(n_chars AS DOUBLE) > 0),
      r AS (
        SELECT doc_id, lang, n_chars,
               row_number() OVER (PARTITION BY lang ORDER BY wkey DESC) AS rn
        FROM scored)
      SELECT doc_id, lang, n_chars FROM r WHERE rn <= 30
    """,
    "token_budget_sample_docs": """
      WITH c AS (
        SELECT doc_id, lang, n_chars,
               SUM(n_chars) OVER (
                 PARTITION BY lang
                 ORDER BY md5('budget' || CAST(doc_id AS VARCHAR))
                 ROWS UNBOUNDED PRECEDING) AS cum
        FROM documents)
      SELECT doc_id, lang, n_chars FROM c
      WHERE cum <= CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 2000
                             WHEN 'zh' THEN 1000 ELSE 0 END
    """,
    "range_layout_prune": """
      SELECT event_type, COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-12'
      GROUP BY 1
    """,
    "zorder_layout_prune": """
      SELECT event_type, COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events
      WHERE user_id < 200 AND value >= 50.0
      GROUP BY 1
    """,
    "dpp_partition_prune": """
      WITH cal AS (
        SELECT CAST(ts AS DATE) AS event_date, COUNT(*) AS n_day
        FROM events GROUP BY 1),
      busy AS (
        SELECT event_date FROM cal
        WHERE n_day >= 0.8 * (SELECT MAX(n_day) FROM cal))
      SELECT event_type, COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events
      WHERE CAST(ts AS DATE) IN (SELECT event_date FROM busy)
      GROUP BY 1
    """,
    "corpus_snapshot_diff": """
      WITH old AS (
        SELECT doc_id, md5(text) AS old_hash FROM documents
        WHERE doc_id % 3 != 0),
      new AS (
        SELECT doc_id,
               md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2'
                        ELSE text END) AS new_hash
        FROM documents WHERE doc_id % 4 != 0)
      SELECT COALESCE(old.doc_id, new.doc_id) AS doc_id,
             CASE WHEN old_hash IS NULL THEN 'added'
                  WHEN new_hash IS NULL THEN 'removed'
                  WHEN old_hash = new_hash THEN 'unchanged'
                  ELSE 'changed' END AS status,
             old_hash, new_hash
      FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id
    """,
    "minhash_lsh_pairs": _ngram_truth_sql(0.5),
    "incremental_minhash_recall": _incremental_truth_sql(0.5),
    "simhash_pairs": r"""
      WITH n AS (
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')) AS norm
        FROM documents),
      h AS (
        SELECT doc_id,
               md5(array_to_string(list_sort(list_distinct(
                 string_split_regex(norm, '\s+'))), ' ')) AS th
        FROM n WHERE norm != '')
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             TRUE AS simhash_found, TRUE AS hamming_zero,
             TRUE AS pairs_ordered_ok, TRUE AS hamming_bounded_ok
      FROM h a JOIN h b ON a.th = b.th AND a.doc_id < b.doc_id
    """,
    "documents_stream_ingest": """
      SELECT doc_id, md5(text) AS text_hash,
             TRUE AS stream_eq_batch, TRUE AS target_text_ok
      FROM documents WHERE doc_id % 2 = 1
    """,
    "embedding_near_pairs_lsh": """
      WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings),
      n AS (
        SELECT vec_id, vec,
               sqrt(list_sum(list_transform(vec, x -> x * x))) AS nrm
        FROM v)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             CAST(list_dot_product(a.vec, b.vec) / (a.nrm * b.nrm) AS DOUBLE)
               AS cosine,
             TRUE AS lsh_found
      FROM n a JOIN n b ON a.vec_id < b.vec_id
      WHERE list_dot_product(a.vec, b.vec) / (a.nrm * b.nrm) >= 0.45
    """,
    "ann_lsh_topk": """
      SELECT vec_id AS query_id, CAST(5 AS INT) AS n_exact,
             CAST(5 AS INT) AS n_matches, TRUE AS batch_recall_ok
      FROM embeddings WHERE vec_id < 10
    """,
    "ann_ivf_topk": """
      SELECT vec_id AS query_id, CAST(5 AS INT) AS n_exact,
             CAST(5 AS INT) AS n_matches, TRUE AS batch_recall_ok
      FROM embeddings WHERE vec_id < 10
    """,
    "sketch_error_bounds": """
      SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
             TRUE AS p50_in_band, TRUE AS p95_in_band,
             TRUE AS hll_within_5pct
      FROM events GROUP BY event_type
    """,
    "quantile_bins_approx_bound": """
      WITH ranked AS (
        SELECT l_returnflag, l_extendedprice AS v,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                  ORDER BY l_extendedprice) AS rn,
               COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem),
      cuts AS (
        SELECT l_returnflag,
               MAX(CASE WHEN rn = GREATEST(CAST(CEIL(0.25 * n) AS BIGINT), 1)
                        THEN v END) AS c1,
               MAX(CASE WHEN rn = GREATEST(CAST(CEIL(0.5 * n) AS BIGINT), 1)
                        THEN v END) AS c2,
               MAX(CASE WHEN rn = GREATEST(CAST(CEIL(0.75 * n) AS BIGINT), 1)
                        THEN v END) AS c3
        FROM ranked GROUP BY l_returnflag)
      SELECT li.l_returnflag,
             CAST(CAST(li.l_extendedprice > c1 AS INT)
                  + CAST(li.l_extendedprice > c2 AS INT)
                  + CAST(li.l_extendedprice > c3 AS INT) AS INT) AS bin_id,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             TRUE AS within_tol
      FROM lineitem li JOIN cuts USING (l_returnflag)
      GROUP BY 1, 2
    """,
    "pack_greedy_check": r"""
      WITH d AS (
        SELECT doc_id,
               CAST(len(string_split_regex(TRIM(text), '\s+')) AS BIGINT)
                 AS n_tokens,
               CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 8 AS INT) AS shard
        FROM documents)
      SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs_distinct,
             CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
             CAST(0 AS BIGINT) AS n_over_capacity
      FROM d GROUP BY shard
    """,
    "incremental_dedup_keep": _incremental_keep_sql(0.05, NGRAM_MAX_DF),
    "embedding_centroids": """
      SELECT label, CAST(i - 1 AS INT) AS pos,
             CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(30,12))) AS DOUBLE) / COUNT(*) AS centroid_val
      FROM (SELECT label, unnest(embedding) AS v,
                   unnest(generate_series(1, len(embedding))) AS i
            FROM embeddings)
      GROUP BY 1, 2
    """,
    "multimodal_frames": """
      SELECT CAST(doc_id AS BIGINT) AS asset_id,
             CAST(unnest(generate_series(
                    0,
                    greatest(CAST(octet_length(encode(text)) // 1000 AS INT) - 1, 0),
                    30)) AS INT) AS frame_index
      FROM documents
    """,
    "multimodal_resize": """
      SELECT CAST(doc_id AS BIGINT) AS asset_id,
             CAST(32 AS INT) AS height, CAST(24 AS INT) AS width
      FROM documents
    """,
    "multimodal_meta": """
      SELECT CAST(doc_id AS BIGINT) AS asset_id, 'image' AS media_type,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             md5(text) AS content_hash
      FROM documents
    """,
    "multimodal_decode": """
      SELECT CAST(doc_id AS BIGINT) AS asset_id,
             CAST(8 + doc_id % 17 AS INT) AS height,
             CAST(8 + (doc_id * 7) % 23 AS INT) AS width,
             CAST(3 AS INT) AS channels,
             'png' AS decode_ok
      FROM documents
    """,
    "multimodal_audio": """
      SELECT CAST(doc_id AS BIGINT) AS asset_id,
             CAST(50 + (doc_id % 50) * 10 AS BIGINT) AS duration_ms,
             ROUND((1 + doc_id % 9) / 10.0 * 32768) / 32768.0 AS rms
      FROM documents
    """,
    "extract_custom_j": f"""
      SELECT p_brand,
             CAST({SQL_REV} AS DOUBLE) AS revenue,
             COUNT(DISTINCT l_partkey) AS n_parts,
             CAST({SQL_QTY} AS DOUBLE) / COUNT(*) AS avg_qty
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE l_suppkey IN (
        SELECT s_suppkey FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA')
      GROUP BY 1
    """,
    "measures_heterogeneous": """
      SELECT l_returnflag,
             CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
             CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price,
             CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc,
             COUNT(*) AS n_lines
      FROM lineitem GROUP BY 1
    """,
    "distinct_counts": """
      SELECT o_orderpriority,
             COUNT(DISTINCT o_custkey) AS n_customers,
             COUNT(*) AS n_orders
      FROM orders GROUP BY 1
    """,
    "udaf_median": """
      SELECT l_returnflag, CAST(median(l_quantity) AS DOUBLE) AS median_qty
      FROM lineitem GROUP BY 1
    """,
    "window_running_total": """
      WITH m AS (
        SELECT year(o_orderdate) AS o_year, month(o_orderdate) AS o_month,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS _m
        FROM orders GROUP BY 1, 2)
      SELECT o_year, o_month, CAST(_m AS DOUBLE) AS month_total,
             CAST(SUM(_m) OVER (ORDER BY o_year, o_month
                                ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_total
      FROM m
    """,
    "format_currency": """
      WITH s AS (
        SELECT o_orderpriority,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        FROM orders GROUP BY 1)
      SELECT o_orderpriority,
             '$' || format('{:,}', cents // 100) || '.' ||
             lpad(CAST(cents % 100 AS VARCHAR), 2, '0') AS total
      FROM s
    """,
    "pivot_formatted": """
      WITH s AS (
        SELECT o_orderpriority, year(o_orderdate) AS o_year,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        FROM orders GROUP BY 1, 2),
      f AS (
        SELECT o_orderpriority, o_year,
               '$' || format('{:,}', cents // 100) || '.' ||
               lpad(CAST(cents % 100 AS VARCHAR), 2, '0') AS total
        FROM s)
      SELECT o_orderpriority,
             MAX(CASE WHEN o_year = 1995 THEN total END) AS "1995",
             MAX(CASE WHEN o_year = 1996 THEN total END) AS "1996"
      FROM f GROUP BY 1
    """,
    "anti_join_idle_customers": """
      SELECT c_mktsegment, COUNT(*) AS n_idle
      FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      GROUP BY 1
    """,
    "events_props_json": """
      SELECT CAST(CAST(json_extract_string(props, '$.k') AS INT) % 10 AS INT)
               AS k_bucket,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1
    """,
    "quantiles_by_type": """
      SELECT event_type,
             quantile_cont(value, 0.5) AS p50,
             quantile_cont(value, 0.95) AS p95
      FROM events GROUP BY 1
    """,
    "heavy_hitters_sources": """
      SELECT lang, source, COUNT(*) AS n_docs,
             row_number() OVER (PARTITION BY lang
                                ORDER BY COUNT(*) DESC, source) AS rank
      FROM documents GROUP BY lang, source
      QUALIFY rank <= 3
    """,
    "asof_last_error": """
      SELECT l.event_id, l.user_id, l.ts, r.value AS last_error_value
      FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l
      ASOF LEFT JOIN
           (SELECT user_id, ts, value FROM events WHERE event_type = 'error') r
        ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    "range_join_error_window": """
      WITH e AS (
        SELECT event_id AS error_id, user_id, ts AS t0,
               ts + INTERVAL 5 MINUTE AS t1
        FROM events WHERE event_type = 'error'),
      c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
      SELECT error_id, COUNT(*) AS n_clicks
      FROM e JOIN c ON c.user_id = e.user_id AND c.ts >= e.t0 AND c.ts <= e.t1
      GROUP BY 1
    """,
    "embedding_components": """
      WITH RECURSIVE v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings),
      n AS (
        SELECT vec_id, vec,
               sqrt(list_sum(list_transform(vec, x -> x * x))) AS nrm
        FROM v),
      edges AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM n a JOIN n b ON a.vec_id < b.vec_id
        WHERE list_dot_product(a.vec, b.vec) / (a.nrm * b.nrm) >= 0.35),
      sym AS (
        SELECT id_a AS src, id_b AS dst FROM edges
        UNION SELECT id_b, id_a FROM edges),
      nodes AS (SELECT DISTINCT src AS id FROM sym),
      lbl(id, label) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT s.dst, l.label FROM sym s JOIN lbl l ON l.id = s.src)
      SELECT id AS vec_id, CAST(MIN(label) AS BIGINT) AS component
      FROM lbl GROUP BY 1
    """,
    "semantic_dedup_keep": """
      WITH RECURSIVE v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings),
      n AS (
        SELECT vec_id, vec,
               sqrt(list_sum(list_transform(vec, x -> x * x))) AS nrm
        FROM v),
      edges AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM n a JOIN n b ON a.vec_id < b.vec_id
        WHERE list_dot_product(a.vec, b.vec) / (a.nrm * b.nrm) >= 0.35),
      sym AS (
        SELECT id_a AS src, id_b AS dst FROM edges
        UNION SELECT id_b, id_a FROM edges),
      nodes AS (SELECT DISTINCT src AS id FROM sym),
      lbl(id, label) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT s.dst, l.label FROM sym s JOIN lbl l ON l.id = s.src),
      comp AS (SELECT id, MIN(label) AS component FROM lbl GROUP BY 1),
      dropped AS (SELECT id FROM comp WHERE id <> component)
      SELECT vec_id, CAST(label AS INT) AS label
      FROM embeddings WHERE vec_id NOT IN (SELECT id FROM dropped)
    """,
    "pipeline_clean_corpus": _pipeline_sql(),
    "pipeline_pretraining": _pipeline_pretraining_sql(),
    "pii_redaction": _pii_sql(),
    "paragraph_dedup": r"""
      WITH aug AS (
        SELECT doc_id,
               text || chr(10) || 'subscribe to our newsletter for updates'
                 AS text
        FROM documents),
      sp AS (SELECT doc_id, string_split_regex(text, '\n+') AS p FROM aug),
      paras AS (
        SELECT doc_id, i - 1 AS idx, p[i] AS para
        FROM (SELECT doc_id, p, unnest(generate_series(1, len(p))) AS i
              FROM sp)
        WHERE p[i] <> ''),
      ranked AS (
        SELECT doc_id, idx, para,
               ROW_NUMBER() OVER (PARTITION BY para
                                  ORDER BY doc_id, idx) AS rn
        FROM paras),
      sizes AS (SELECT doc_id, COUNT(*) AS n_paras FROM paras GROUP BY 1),
      kept AS (
        SELECT doc_id, COUNT(*) AS n_kept,
               string_agg(para, chr(10) ORDER BY idx) AS text
        FROM ranked WHERE rn = 1 GROUP BY doc_id)
      SELECT doc_id, n_paras, n_kept, text
      FROM sizes JOIN kept USING (doc_id)
    """,
    "decontaminate_overlap": f"""
      WITH toks AS (
        SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t FROM documents),
      sh AS (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
              FROM toks WHERE len(t) >= 3)),
      bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
      sz AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh
             WHERE doc_id % 97 <> 0 GROUP BY 1),
      hits AS (SELECT doc_id, COUNT(*) AS n_overlap
               FROM sh JOIN bench USING (shingle)
               WHERE doc_id % 97 <> 0 GROUP BY 1)
      SELECT sz.doc_id, n_shingles,
             COALESCE(n_overlap, 0) AS n_overlap,
             CAST(COALESCE(n_overlap, 0) AS DOUBLE) / n_shingles
               AS contamination_frac,
             CAST(CAST(COALESCE(n_overlap, 0) AS DOUBLE) / n_shingles >= 0.5
                  AS INT) AS contaminated
      FROM sz LEFT JOIN hits USING (doc_id)
    """,
    "sample_fraction_docs": f"""
      SELECT doc_id, lang, source FROM documents
      WHERE md5(CAST(doc_id AS VARCHAR)) < '{_hex_threshold(0.25)}'
    """,
    "sample_stratified_docs": """
      SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (
                 PARTITION BY lang
                 ORDER BY md5(CAST(doc_id AS VARCHAR))) AS r
        FROM documents) WHERE r <= 20
    """,
    "mixture_sample_docs": f"""
      SELECT doc_id, source FROM documents
      WHERE md5(CAST(doc_id AS VARCHAR)) <
        CASE source
          WHEN 'src0' THEN '{_hex_threshold(1.0)}'
          WHEN 'src1' THEN '{_hex_threshold(0.5)}'
          WHEN 'src2' THEN '{_hex_threshold(0.1)}'
          ELSE '{_hex_threshold(0.05)}'
        END
    """,
    "domain_cap": """
      SELECT doc_id, source FROM (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (
                 PARTITION BY source
                 ORDER BY md5('cap' || CAST(doc_id AS VARCHAR))) AS r
        FROM documents) WHERE r <= 15
    """,
    "quality_percentile_keep": """
      SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars FROM (
        SELECT doc_id, lang, n_chars,
               PERCENT_RANK() OVER (
                 PARTITION BY lang
                 ORDER BY n_chars DESC, doc_id) AS pr
        FROM documents) WHERE pr <= 0.6
    """,
    "chunk_documents": """
      WITH d AS (
        SELECT doc_id, text,
               CASE WHEN length(text) <= 200 THEN 1
                    ELSE CAST(CEIL((length(text) - 200) / 150.0) AS BIGINT) + 1
               END AS n_chunks
        FROM documents),
      u AS (
        SELECT doc_id, text,
               unnest(generate_series(0, n_chunks - 1)) AS chunk_id
        FROM d)
      SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
             substr(text, CAST(chunk_id * 150 + 1 AS INT), 200) AS chunk_text,
             CAST(length(substr(text, CAST(chunk_id * 150 + 1 AS INT), 200))
                  AS BIGINT) AS n_chunk_chars
      FROM u
    """,
    "token_vocab": r"""
      WITH tok AS (
        SELECT doc_id,
               unnest(string_split_regex(TRIM(text), '\s+')) AS token
        FROM documents)
      SELECT token, CAST(COUNT(*) AS BIGINT) AS n_total,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM tok WHERE token <> ''
      GROUP BY token ORDER BY n_total DESC, token LIMIT 20
    """,
    "split_assign": f"""
      SELECT doc_id,
             CASE WHEN md5('split' || CAST(doc_id AS VARCHAR))
                    < '{_hex_threshold(0.9)}' THEN 'train'
                  WHEN md5('split' || CAST(doc_id AS VARCHAR))
                    < '{_hex_threshold(0.95)}' THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    """,
    "shuffle_order": """
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (
               ORDER BY md5('shuffle' || CAST(doc_id AS VARCHAR)))
               AS BIGINT) AS position
      FROM documents
    """,
    "tfidf_keywords": r"""
      WITH tok AS (
        SELECT doc_id,
               unnest(string_split_regex(TRIM(text), '\s+')) AS token
        FROM documents),
      tok2 AS (SELECT * FROM tok WHERE token <> ''),
      tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok2 GROUP BY 1, 2),
      dfreq AS (SELECT token, COUNT(DISTINCT doc_id) AS df_t
                FROM tok2 GROUP BY 1),
      n AS (SELECT COUNT(DISTINCT doc_id) AS n_corpus FROM documents),
      scored AS (
        SELECT doc_id, token, tf,
               ROUND(tf * (ln((n_corpus + 1.0) / (df_t + 1.0)) + 1), 9)
                 AS tfidf
        FROM tf JOIN dfreq USING (token) CROSS JOIN n),
      r AS (
        SELECT doc_id, token, CAST(tf AS BIGINT) AS tf,
               CAST(tfidf AS DOUBLE) AS tfidf,
               CAST(ROW_NUMBER() OVER (
                 PARTITION BY doc_id ORDER BY tfidf DESC, token)
                 AS BIGINT) AS term_rank
        FROM scored)
      SELECT * FROM r WHERE term_rank <= 3
    """,
    "events_stream_dedup": """
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY event_type
    """,
    "key_skew_users": """
      WITH c AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1),
      t AS (SELECT SUM(n) AS total FROM c),
      r AS (SELECT user_id, n,
                   ROW_NUMBER() OVER (ORDER BY n DESC, user_id) AS rank
            FROM c)
      SELECT CAST(rank AS INT) AS rank, user_id,
             CAST(n AS BIGINT) AS n_rows,
             CAST(n AS DOUBLE) / total AS share
      FROM r, t WHERE rank <= 10
    """,
    "quantile_bins": """
      WITH ranked AS (
        SELECT l_returnflag, l_extendedprice AS v,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                  ORDER BY l_extendedprice) AS rn,
               COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem),
      cuts AS (
        SELECT l_returnflag,
               MAX(CASE WHEN rn = GREATEST(CAST(CEIL(0.25 * n) AS BIGINT), 1)
                        THEN v END) AS c1,
               MAX(CASE WHEN rn = GREATEST(CAST(CEIL(0.5 * n) AS BIGINT), 1)
                        THEN v END) AS c2,
               MAX(CASE WHEN rn = GREATEST(CAST(CEIL(0.75 * n) AS BIGINT), 1)
                        THEN v END) AS c3
        FROM ranked GROUP BY l_returnflag)
      SELECT li.l_returnflag,
             CAST(CAST(li.l_extendedprice > c1 AS INT)
                  + CAST(li.l_extendedprice > c2 AS INT)
                  + CAST(li.l_extendedprice > c3 AS INT) AS INT) AS bin_id,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(MIN(li.l_extendedprice) AS DOUBLE) AS bin_min,
             CAST(MAX(li.l_extendedprice) AS DOUBLE) AS bin_max
      FROM lineitem li JOIN cuts USING (l_returnflag)
      GROUP BY 1, 2
    """,
    "winsorized_price_stats": """
      WITH ranked AS (
        SELECT l_returnflag, l_extendedprice AS v,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                  ORDER BY l_extendedprice) AS rn,
               COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem),
      cuts AS (
        SELECT l_returnflag,
               MAX(CASE WHEN rn = GREATEST(CAST(CEIL(0.05 * n) AS BIGINT), 1)
                        THEN v END) AS lo_cut,
               MAX(CASE WHEN rn = GREATEST(CAST(CEIL(0.95 * n) AS BIGINT), 1)
                        THEN v END) AS hi_cut
        FROM ranked GROUP BY l_returnflag),
      clipped AS (
        SELECT li.l_returnflag, lo_cut, hi_cut,
               LEAST(GREATEST(li.l_extendedprice, lo_cut), hi_cut) AS cl,
               CAST(li.l_extendedprice < lo_cut AS INT) AS is_lo,
               CAST(li.l_extendedprice > hi_cut AS INT) AS is_hi
        FROM lineitem li JOIN cuts USING (l_returnflag))
      SELECT l_returnflag, lo_cut, hi_cut,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(is_lo) AS BIGINT) AS n_clipped_low,
             CAST(SUM(is_hi) AS BIGINT) AS n_clipped_high,
             CAST(SUM(CAST(cl AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
               AS winsorized_mean
      FROM clipped GROUP BY l_returnflag, lo_cut, hi_cut
    """,
    "grouping_sets_explicit": """
      SELECT l_returnflag AS flag, l_linestatus AS status,
             CAST(year(l_shipdate) AS INT) AS ship_year,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_qty,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(GROUPING(l_returnflag) * 4 + GROUPING(l_linestatus) * 2
                  + GROUPING(year(l_shipdate)) AS INT) AS grouping_id,
             CAST(GROUPING(l_returnflag) + GROUPING(l_linestatus)
                  + GROUPING(year(l_shipdate)) AS INT) AS grouping_level
      FROM lineitem
      GROUP BY GROUPING SETS (
        (l_returnflag, l_linestatus),
        (l_returnflag, year(l_shipdate)),
        ())
    """,
    "pack_sequences": r"""
      WITH d AS (
        SELECT doc_id,
               CAST(len(string_split_regex(TRIM(text), '\s+')) AS BIGINT)
                 AS n_tokens,
               CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 8 AS INT) AS shard
        FROM documents),
      c AS (
        SELECT doc_id, shard, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
                 - n_tokens AS "offset"
        FROM d)
      SELECT doc_id, shard, CAST("offset" // 512 AS BIGINT) AS seq,
             CAST("offset" AS BIGINT) AS "offset", n_tokens
      FROM c
    """,
    "events_hourly": """
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2
    """,
    "events_stream_cube": """
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2
    """,
    "merge_delta_incremental": """
      SELECT event_type,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
             COUNT(event_id) AS n_events
      FROM events GROUP BY 1
    """,
    "price_histogram": """
      WITH b AS (
        SELECT l_returnflag,
               CAST(LEAST(GREATEST(
                 FLOOR((l_extendedprice - 0.0) / 3000.0), 0), 19) AS INT)
                 AS bin_id
        FROM lineitem)
      SELECT l_returnflag, bin_id,
             CAST(0.0 + bin_id * 3000.0 AS DOUBLE) AS bin_lo,
             CAST(0.0 + (bin_id + 1) * 3000.0 AS DOUBLE) AS bin_hi,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM b GROUP BY 1, 2
    """,
    "funnel_conversion": """
      WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
                  WHERE event_type = 'view' GROUP BY 1),
      s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
             JOIN s1 USING (user_id)
             WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
      s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
             JOIN s2 USING (user_id)
             WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1),
      c AS (SELECT (SELECT COUNT(*) FROM s1) AS n1,
                   (SELECT COUNT(*) FROM s2) AS n2,
                   (SELECT COUNT(*) FROM s3) AS n3)
      SELECT CAST(1 AS INT) AS step_index, 'view' AS step,
             CAST(n1 AS BIGINT) AS n_users,
             CAST(n1 AS DOUBLE) / n1 AS conversion FROM c
      UNION ALL
      SELECT CAST(2 AS INT), 'click', CAST(n2 AS BIGINT),
             CAST(n2 AS DOUBLE) / n1 FROM c
      UNION ALL
      SELECT CAST(3 AS INT), 'purchase', CAST(n3 AS BIGINT),
             CAST(n3 AS DOUBLE) / n1 FROM c
    """,
    "cohort_retention": """
      WITH f AS (SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_date
                 FROM events GROUP BY 1)
      SELECT CAST(cohort_date AS VARCHAR) AS cohort_date,
             CAST(date_diff('day', cohort_date, CAST(e.ts AS DATE)) AS INT)
               AS offset_days,
             CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
      FROM events e JOIN f USING (user_id)
      GROUP BY f.cohort_date, 2
    """,
    "remove_delta_retraction": """
      SELECT event_type,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
             COUNT(event_id) AS n_events
      FROM events WHERE event_id % 2 = 0 GROUP BY 1
    """,
    "interval_overlap_sessions": """
      WITH l AS (
        SELECT user_id, CAST(ts AS DATE) AS d, MIN(ts) AS ls, MAX(ts) AS le
        FROM events GROUP BY 1, 2),
      r AS (
        SELECT event_type, CAST(ts AS DATE) AS d, MIN(ts) AS rs, MAX(ts) AS re
        FROM events GROUP BY 1, 2)
      SELECT l.user_id, r.event_type, CAST(l.d AS VARCHAR) AS d
      FROM l JOIN r ON l.d = r.d AND l.ls <= r.re AND r.rs <= l.le
    """,
    "salted_join_agg": f"""
      SELECT o_orderpriority, CAST({SQL_REV} AS DOUBLE) AS revenue,
             COUNT(*) AS n_lines
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1
    """,
    "skew_aware_user_join": """
      SELECT c_mktsegment, COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events JOIN customer ON user_id = c_custkey
      GROUP BY 1
    """,
    "bucketed_join_copartition": f"""
      SELECT o_orderpriority, CAST({SQL_REV} AS DOUBLE) AS revenue,
             COUNT(*) AS n_lines, COUNT(DISTINCT o_orderkey) AS n_orders
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1
    """,
    "window_moving_avg": """
      WITH monthly AS (
        SELECT year(o_orderdate) AS o_year, month(o_orderdate) AS o_month,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m
        FROM orders GROUP BY 1, 2)
      SELECT o_year, o_month, CAST(m AS DOUBLE) AS month_total,
             CAST(SUM(m) OVER w AS DOUBLE) / COUNT(*) OVER w AS moving_avg_3m
      FROM monthly
      WINDOW w AS (PARTITION BY o_year ORDER BY o_month
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    "cube_store_roundtrip": f"""
      SELECT r_name, {_MEASURE_SQL}
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY 1
    """,
    "events_sessionize": """
      WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL THEN 1
                    WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1
                    ELSE 0 END AS new_s
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      sess AS (
        SELECT user_id, ts,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged)
      SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
      FROM sess GROUP BY user_id, sid
    """,
    "embedding_near_pairs": """
      WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings),
      n AS (
        SELECT vec_id, vec,
               sqrt(list_sum(list_transform(vec, x -> x * x))) AS nrm
        FROM v)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             CAST(list_dot_product(a.vec, b.vec) / (a.nrm * b.nrm) AS DOUBLE) AS cosine
      FROM n a JOIN n b ON a.vec_id < b.vec_id
      WHERE list_dot_product(a.vec, b.vec) / (a.nrm * b.nrm) >= 0.4
    """,
    "ann_cosine_topk": """
      WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings),
      n AS (
        SELECT vec_id, vec,
               sqrt(list_sum(list_transform(vec, x -> x * x))) AS nrm
        FROM v),
      scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS match_id,
               list_dot_product(q.vec, c.vec) / (q.nrm * c.nrm) AS cosine
        FROM n q JOIN n c ON q.vec_id < 10 AND q.vec_id <> c.vec_id)
      SELECT query_id, match_id, CAST(cosine AS DOUBLE) AS cosine,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, match_id) AS INT) AS rank
      FROM scored QUALIFY rank <= 5
    """,
    "hll_sketch_regrain": """
      SELECT event_type, COUNT(*) AS n_rows,
             COUNT(DISTINCT user_id) AS n_users_exact,
             TRUE AS union_within_1pct,
             TRUE AS approx_within_5pct
      FROM events GROUP BY 1
    """,
    "vocab_overlap_sources": r"""
      WITH tok AS (
        SELECT source,
               unnest(string_split_regex(TRIM(text), '\s+')) AS token
        FROM documents),
      counts AS (
        SELECT source, token, COUNT(*) AS n
        FROM tok WHERE token <> '' GROUP BY 1, 2),
      vocab AS (
        SELECT source, token FROM counts
        QUALIFY row_number() OVER (PARTITION BY source
                                   ORDER BY n DESC, token ASC) <= 10),
      sizes AS (SELECT source, COUNT(*) AS sz FROM vocab GROUP BY 1),
      inter AS (
        SELECT a.source AS g_a, b.source AS g_b, COUNT(*) AS n_shared
        FROM vocab a JOIN vocab b
          ON a.token = b.token AND a.source < b.source
        GROUP BY 1, 2)
      SELECT g_a, g_b, n_shared,
             CAST(n_shared AS DOUBLE)
               / CAST(sa.sz + sb.sz - n_shared AS DOUBLE) AS jaccard
      FROM inter
      JOIN sizes sa ON sa.source = g_a
      JOIN sizes sb ON sb.source = g_b
    """,
    "topk_sketch_regrain": """
      SELECT event_type, COUNT(*) AS n_rows, 3 AS k,
             TRUE AS counts_match, TRUE AS valid_topk
      FROM events GROUP BY 1
    """,
    "value_drift_psi": """
      WITH e AS (
        SELECT event_type, ts,
               CAST(LEAST(GREATEST(FLOOR((value - 0.0) / 10.0), 0), 59)
                    AS INT) AS bin
        FROM events),
      a AS (SELECT event_type, bin, COUNT(*) AS n FROM e
            WHERE ts < TIMESTAMP '2024-01-15' GROUP BY 1, 2),
      b AS (SELECT event_type, bin, COUNT(*) AS n FROM e
            WHERE ts >= TIMESTAMP '2024-01-15' GROUP BY 1, 2),
      grid AS (
        SELECT t.event_type, s.bin
        FROM (SELECT DISTINCT event_type FROM events) t,
             (SELECT unnest(range(60)) AS bin) s),
      j AS (
        SELECT grid.event_type, grid.bin,
               COALESCE(a.n, 0) AS na, COALESCE(b.n, 0) AS nb
        FROM grid
        LEFT JOIN a ON a.event_type = grid.event_type AND a.bin = grid.bin
        LEFT JOIN b ON b.event_type = grid.event_type AND b.bin = grid.bin),
      tot AS (
        SELECT event_type, SUM(na) AS ta, SUM(nb) AS tb
        FROM j GROUP BY 1)
      SELECT j.event_type,
             ROUND(SUM((GREATEST(na / ta, 1e-6) - GREATEST(nb / tb, 1e-6))
                       * ln(GREATEST(na / ta, 1e-6)
                            / GREATEST(nb / tb, 1e-6))), 6) AS psi
      FROM j JOIN tot ON tot.event_type = j.event_type
      GROUP BY 1
    """,
    "events_anomaly_zscore": """
      WITH daily0 AS (
        SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
        FROM events GROUP BY 1, 2),
      span AS (
        SELECT event_type, MIN(day) AS d0, MAX(day) AS d1
        FROM daily0 GROUP BY 1),
      cal AS (
        SELECT event_type,
               unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                      CAST(d1 AS TIMESTAMP),
                                      INTERVAL 1 DAY)) AS day
        FROM span),
      daily AS (
        SELECT c.event_type, c.day, COALESCE(d.n, 0) AS n_events
        FROM cal c
        LEFT JOIN daily0 d
          ON d.event_type = c.event_type AND CAST(d.day AS TIMESTAMP) = c.day),
      win AS (
        SELECT event_type, day, n_events,
               SUM(CAST(n_events AS DECIMAL(18,6))) OVER w AS s1,
               SUM(CAST(n_events AS DECIMAL(18,6))
                   * CAST(n_events AS DECIMAL(18,6))) OVER w AS s2,
               COUNT(*) OVER w AS n
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
      SELECT event_type, day, n_events,
             CASE WHEN n >= 3 THEN CAST(s1 AS DOUBLE) / n END AS trail_mean,
             CASE WHEN n >= 3 AND (CAST(s2 AS DOUBLE) / n
                   - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) > 0
                  THEN sqrt(CAST(s2 AS DOUBLE) / n
                   - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
             END AS trail_std,
             CASE WHEN n >= 3 AND (CAST(s2 AS DOUBLE) / n
                   - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) > 0
                  THEN (n_events - CAST(s1 AS DOUBLE) / n)
                       / sqrt(CAST(s2 AS DOUBLE) / n
                   - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
             END AS zscore
      FROM win
    """,
    "histogram_percentile_regrain": """
      WITH ranked AS (
        SELECT event_type, value AS v,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY value) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events)
      SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_rows,
             CAST(MAX(CASE WHEN rn = GREATEST(CAST(CEIL(0.5 * n) AS BIGINT),
                                              1) THEN v END) AS DOUBLE)
               AS p50_exact,
             CAST(MAX(CASE WHEN rn = GREATEST(CAST(CEIL(0.95 * n) AS BIGINT),
                                              1) THEN v END) AS DOUBLE)
               AS p95_exact,
             TRUE AS p50_within_bin,
             TRUE AS p95_within_bin
      FROM ranked GROUP BY event_type
    """,
    "contrastive_negatives": """
      WITH pool AS (
        SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS pos
        FROM documents),
      cnt AS (SELECT COUNT(*) AS n FROM documents),
      anchors AS (
        SELECT doc_id AS anchor_id, doc_id + 1 AS pos_id
        FROM documents WHERE doc_id % 10 = 0),
      slots AS (
        SELECT DISTINCT anchor_id, s.slot
        FROM anchors, (SELECT unnest(range(12)) AS slot) s),
      cand AS (
        SELECT anchor_id, slot,
               (('0x' || substr(md5('neg' || CAST(anchor_id AS VARCHAR)
                                    || '#' || CAST(slot AS VARCHAR)), 1, 8)
                )::UBIGINT % (SELECT n FROM cnt)) + 1 AS pos
        FROM slots),
      withdoc AS (
        SELECT c.anchor_id, c.slot, p.doc_id
        FROM cand c JOIN pool p ON p.pos = c.pos
        WHERE CAST(p.doc_id AS VARCHAR) <> CAST(c.anchor_id AS VARCHAR)
          AND NOT EXISTS (SELECT 1 FROM anchors a
                          WHERE a.anchor_id = c.anchor_id
                            AND a.pos_id = p.doc_id)),
      first AS (
        SELECT anchor_id, doc_id, MIN(slot) AS slot
        FROM withdoc GROUP BY 1, 2)
      SELECT anchor_id, neg_id, neg_rank FROM (
        SELECT anchor_id, doc_id AS neg_id,
               CAST(row_number() OVER (PARTITION BY anchor_id
                                       ORDER BY slot) AS INT) AS neg_rank
        FROM first)
      WHERE neg_rank <= 4
    """,
    "data_quality_report": """
      WITH counts AS (
        SELECT 'not_null(user_id)' AS rule,
               CAST(COALESCE(SUM(CASE WHEN user_id IS NULL THEN 1 END), 0)
                    AS BIGINT) AS n_violations
        FROM events
        UNION ALL
        SELECT 'in_range(value)',
               CAST(COALESCE(SUM(CASE WHEN value < 0.0 OR value > 100.0
                                      THEN 1 END), 0) AS BIGINT)
        FROM events
        UNION ALL
        SELECT 'predicate(value_nonneg)',
               CAST(COALESCE(SUM(CASE WHEN NOT COALESCE(value >= 0, FALSE)
                                      THEN 1 END), 0) AS BIGINT)
        FROM events
        UNION ALL
        SELECT 'unique(event_id)',
               (SELECT CAST(COALESCE(SUM(c - 1), 0) AS BIGINT)
                FROM (SELECT COUNT(*) AS c FROM events GROUP BY event_id))
        UNION ALL
        SELECT 'foreign_key(user_id)',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM events e
                WHERE user_id IS NOT NULL
                  AND NOT EXISTS (SELECT 1 FROM customer
                                  WHERE c_custkey = e.user_id)))
      SELECT rule, n_violations, (n_violations = 0) AS passed FROM counts
    """,
    "revenue_share_of_region": f"""
      WITH agg AS (
        SELECT n_name, r_name, {SQL_REV} AS rev_dec
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY 1, 2)
      SELECT n_name, r_name, CAST(rev_dec AS DOUBLE) AS revenue,
             CAST(rev_dec AS DOUBLE)
               / CAST(SUM(rev_dec) OVER (PARTITION BY r_name) AS DOUBLE)
               AS share_of_region
      FROM agg
    """,
    "events_gap_fill": """
      WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s
        FROM events GROUP BY 1, 2),
      span AS (
        SELECT event_type, MIN(day) AS d0, MAX(day) AS d1
        FROM daily GROUP BY 1),
      cal AS (
        SELECT event_type,
               unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                      CAST(d1 AS TIMESTAMP),
                                      INTERVAL 1 DAY)) AS day
        FROM span)
      SELECT c.event_type, c.day,
             COALESCE(d.n, 0) AS n_events,
             COALESCE(d.s, 0.0) AS sum_value
      FROM cal c
      LEFT JOIN daily d
        ON d.event_type = c.event_type AND CAST(d.day AS TIMESTAMP) = c.day
    """,
    "scd2_segment_history": _SCD2_HISTORY_SQL,
    "scd2_merge_rebuild": _SCD2_HISTORY_SQL,
    "scd2_dim_stream": _SCD2_HISTORY_SQL,
    "stream_attribution_join": """
      SELECT v.user_id, v.event_id AS view_id, b.event_id AS buy_id,
             b.value
      FROM events v
      JOIN events b
        ON v.user_id = b.user_id
       AND b.ts >= v.ts
       AND b.ts <= v.ts + INTERVAL 30 MINUTE
      WHERE v.event_type = 'view' AND b.event_type = 'purchase'
    """,
    "scd2_temporal_revenue": f"""
      SELECT s.segment, COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_price
      FROM orders o
      JOIN ({_SCD2_DIM_SQL}) s
        ON o.o_custkey = s.c_custkey
       AND o.o_orderdate >= s.valid_from
       AND (s.valid_to IS NULL OR o.o_orderdate < s.valid_to)
      GROUP BY 1
    """,
}


def run_query(name: str, spark: SparkSession, sf_dir: str) -> DataFrame:
    return QUERIES[name](spark, sf_dir)
