"""Star-schema loader over the TPC-H-ish parquet test tables.

Plays the role of the reference's ``populate_star`` fixture
(R/populate.R:17-115) against the driver-generated data (TESTDATA.md):
fact = ``lineitem`` at (orderkey, partkey, suppkey) grain; dimensions =
``part`` (flat), ``supplier`` (snowflaked through nation -> region) and
``orders`` (snowflaked through customer -> nation -> region, plus a derived
calendar hierarchy on the order date).

Measures are decimal-aggregated (see functions.dec): money sums are exact
and shuffle-order-independent, so results hash-match the DuckDB oracle and
are reproducible on any cluster layout. The fact keeps decimals internally;
query/export surfaces cast to double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_cube_spark.build import snowflake_dimension
from data_cube_spark.functions import date_parts, dec
from data_cube_spark.model import DataCube, Dimension, Fact, Hierarchy, Measure

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


#: columns stored as parquet TIMESTAMP(NANOS) — Spark has no nanosecond
#: timestamp type, so we read them as long (legacy.parquet.nanosAsLong) and
#: convert to microsecond timestamps here.
_NANO_TS_COLS = {"orders": ["o_orderdate"], "lineitem": ["l_shipdate"], "events": ["ts"]}


#: per-(session, dir) memo — DataFrame handles are immutable lazy plans, and
#: re-reading parquet costs a file listing + footer/schema fetch per table,
#: which dominates small-query latency when every query rebuilds the cube.
_TABLE_CACHE: dict[tuple[int, str], dict[str, DataFrame]] = {}
_CUBE_CACHE: dict[tuple[int, str], "DataCube"] = {}


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    key = (id(spark), sf_dir)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # oracle determinism: timestamps must render identically to DuckDB's
        # naive reading regardless of the caller session's timezone
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass
    out: dict[str, DataFrame] = {}
    for t in TABLES:
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        for c in _NANO_TS_COLS.get(t, []):
            if dict(df.dtypes).get(c) == "bigint":
                # integer division: double math would lose precision on
                # ~1.7e18 nanosecond values (53-bit mantissa)
                df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        out[t] = df
    _TABLE_CACHE[key] = out
    return out


def parquet_rows(sf_dir: str, table: str) -> int | None:
    """Exact row count from parquet footer metadata — no Spark job. Used to
    feed size-class hints (e.g. :func:`...similarity.lsh_near_pairs`'s
    ``corpus_rows``) without an eager ``count()`` action; on a catalog-
    backed deployment the table statistics serve the same role."""
    import os

    try:
        import pyarrow.parquet as pq

        path = f"{sf_dir}/{table}.parquet"
        if os.path.isdir(path):
            return sum(
                pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
                for f in os.listdir(path) if f.endswith(".parquet")
            )
        return pq.ParquetFile(path).metadata.num_rows
    except Exception:
        return None


def supplier_dimension(t: dict[str, DataFrame]) -> Dimension:
    """supplier -> nation -> region snowflake. Base carries the key plus all
    level keys (the reference's star/snowflake hybrid, R/dimension.R:44-46);
    attributes live in the level tables."""
    base = (
        t["supplier"]
        .join(t["nation"], t["supplier"].s_nationkey == t["nation"].n_nationkey)
        .select("s_suppkey", "n_nationkey", "n_regionkey")
    )
    levels = {
        "s_suppkey": (t["supplier"].select("s_suppkey", "s_name", "s_acctbal"),
                      ["s_name", "s_acctbal"]),
        "n_nationkey": (t["nation"].select(F.col("n_nationkey"), F.col("n_name")),
                        ["n_name"]),
        "n_regionkey": (t["region"].select(F.col("r_regionkey").alias("n_regionkey"),
                                           F.col("r_name")),
                        ["r_name"]),
    }
    hier = {"geo": {"n_regionkey": ["r_name"], "n_nationkey": ["n_name"],
                    "s_suppkey": ["s_name", "s_acctbal"]}}
    return snowflake_dimension("supplier", "s_suppkey", base, levels, hier)


def part_dimension(t: dict[str, DataFrame]) -> Dimension:
    """Flat part dimension (brand/type/size attributes, one level).
    ``unique=True``: the part table is already at key grain — no dedup
    shuffle."""
    return Dimension("part", "p_partkey", t["part"], unique=True)


def orders_dimension(t: dict[str, DataFrame], approx_rows: int | None = None) -> Dimension:
    """orders -> customer -> nation -> region snowflake + derived calendar
    hierarchy on the order date. Customer-path attribute names are prefixed
    (``cn_``/``cr_``) so they never collide with the supplier path when both
    are denormalized onto the same fact row.

    This dimension is **order-grain** — same cardinality class as the fact.
    ``approx_rows`` (the orders table's row count, measured once per cube
    build) feeds the broadcast size gate (``model.BROADCAST_MAX_ROWS``): at
    bench scale it broadcasts; past ~4M orders the engine stops hinting and
    its joins fall back to AQE-planned shuffles instead of an executor OOM."""
    cust_nation = t["nation"].select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_name").alias("cn_name"),
        F.col("n_regionkey").alias("c_regionkey"),
    )
    cust_region = t["region"].select(
        F.col("r_regionkey").alias("c_regionkey"), F.col("r_name").alias("cr_name")
    )
    parts = date_parts("o_orderdate", prefix="d_")
    orders = t["orders"].withColumn("d_date", parts["d_date"])
    base = (
        orders
        .join(t["customer"], orders.o_custkey == t["customer"].c_custkey)
        .join(cust_nation, "c_nationkey")
        .select("o_orderkey", "c_custkey", "c_nationkey", "c_regionkey", "d_date")
    )
    # derive the calendar attributes AFTER the distinct: every part is a
    # deterministic function of d_date, so deduping the bare date first
    # shuffles one 4-byte date per order instead of nine derived columns
    # (two of them strings), and the dedup is a keys-only hash aggregate
    # instead of eight first() aggregates over predicates the optimizer
    # cannot drop (guide §2.3, shuffle fewer bytes). Equivalent because
    # first-row-per-date of rows that are all f(d_date) == f(distinct date).
    date_lvl = orders.select("d_date").dropDuplicates().select(
        "d_date",
        *[expr.alias(name) for name, expr in date_parts("d_date", "d_").items()
          if name != "d_date"],
    )
    levels = {
        "o_orderkey": (
            t["orders"].select("o_orderkey", "o_orderstatus", "o_totalprice",
                               "o_orderdate", "o_orderpriority"),
            ["o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"],
        ),
        "c_custkey": (
            t["customer"].select("c_custkey", "c_name", "c_acctbal", "c_mktsegment"),
            ["c_name", "c_acctbal", "c_mktsegment"],
        ),
        "c_nationkey": (cust_nation.select("c_nationkey", "cn_name"), ["cn_name"]),
        "c_regionkey": (cust_region, ["cr_name"]),
        "d_date": (date_lvl, [c for c in date_lvl.columns if c != "d_date"]),
    }
    hiers = {
        "customer_geo": {"c_regionkey": ["cr_name"], "c_nationkey": ["cn_name"],
                         "c_custkey": ["c_name", "c_acctbal", "c_mktsegment"],
                         "o_orderkey": ["o_orderstatus", "o_orderpriority"]},
        "monthly": {"d_year": [], "d_quarter": ["d_quarter_name"],
                    "d_month": ["d_month_name"], "d_date": ["d_month", "d_quarter", "d_year"]},
    }
    # every level table is unique by its key (date_lvl dedups above)
    return snowflake_dimension("orders", "o_orderkey", base, levels, hiers,
                               approx_rows=approx_rows)


def lineitem_measures() -> list[Measure]:
    """Decimal-exact measures over lineitem. ``revenue`` is the TPC-H
    ``extendedprice * (1 - discount)`` computed in decimal; sums stay
    decimal inside the fact (regrain chains remain exact)."""
    return [
        Measure("sum_qty", dec("l_quantity"), agg="sum"),
        Measure("revenue", dec("l_extendedprice", 18, 2) * (F.lit(1) - dec("l_discount", 18, 2)),
                agg="sum"),
        Measure("sum_charge",
                dec("l_extendedprice", 18, 2) * (F.lit(1) - dec("l_discount", 18, 2))
                * (F.lit(1) + dec("l_tax", 18, 2)),
                agg="sum"),
        Measure("n_lines", "l_orderkey", agg="count"),
    ]


def tpch_cube(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> DataCube:
    """The flagship star cube over the driver test data. Memoized per
    (session, dir): the cube is immutable metadata over lazy plans, and
    reusing it lets Spark reuse analyzed subtrees across queries."""
    key = (id(spark), sf_dir)
    cached = _CUBE_CACHE.get(key)
    if cached is not None:
        return cached
    t = load_tables(spark, sf_dir)
    fact = Fact.build(t["lineitem"], ["l_orderkey", "l_partkey", "l_suppkey"],
                      lineitem_measures())
    # FK names must match dimension keys: rename on the (narrow) fact side.
    fdf = (
        fact.df.withColumnRenamed("l_orderkey", "o_orderkey")
        .withColumnRenamed("l_partkey", "p_partkey")
        .withColumnRenamed("l_suppkey", "s_suppkey")
    )
    fact = Fact(fdf, ["o_orderkey", "p_partkey", "s_suppkey"], fact.measures)
    # size-class the order-grain dimension: parquet count() is a
    # metadata-cheap job, memoized with the cube
    n_orders = t["orders"].count()
    dims = {
        "orders": orders_dimension(t, approx_rows=n_orders),
        "part": part_dimension(t),
        "supplier": supplier_dimension(t),
    }
    dc = DataCube(fact, dims)
    _CUBE_CACHE[key] = dc
    return dc
