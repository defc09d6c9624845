"""TPC-H-shaped headline queries (analytics breadth / plan-shape suite)."""

from __future__ import annotations

from data_cube_spark.registry._shared import *  # noqa: F401,F403


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
