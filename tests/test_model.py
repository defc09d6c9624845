"""Core model tests: construction invariants, slice/dice/collapse semantics,
metamorphic identities — modeled on the reference's test strategy
(SURVEY.md §5: differential oracle + metamorphic equivalences + edge zoo).
"""

import pytest
from pyspark.sql import functions as F

from data_cube_spark import C, Collapse, DataCube, Dimension, Fact, Measure
from data_cube_spark.build import from_table

from tests.conftest import assert_df_matches_sql


def test_fact_build_aggregates_to_grain(spark):
    df = spark.createDataFrame(
        [(1, "a", 2.0), (1, "a", 3.0), (2, "b", 5.0)], "k int, g string, v double"
    )
    f = Fact.build(df, ["k"], [Measure("v", agg="sum"), Measure("n", "v", agg="count")])
    rows = {r["k"]: (r["v"], r["n"]) for r in f.df.collect()}
    assert rows == {1: (5.0, 2), 2: (5.0, 1)}


def test_from_table_dims_are_unique(spark):
    df = spark.createDataFrame(
        [("x", "r1", 1.0), ("x", "r1", 2.0), ("y", "r2", 3.0)],
        "k string, attr string, v double",
    )
    dc = from_table(df, {"d": ["k", "attr"]}, [Measure("v")])
    assert [r["k"] for r in dc.dims["d"].members().collect()] == ["x", "y"]
    assert dc.fact.df.count() == 2


def test_dice_keeps_dim_slice_drops(cube):
    # multi-value dice keeps the dimension (reference R/data.cube.R:264-272)
    q = cube.q(part=[1, 2, 3])
    assert "part" in q.dims and q.fact.id_vars == cube.fact.id_vars
    # scalar slice drops it and regrains the fact
    q2 = cube.q(part=1)
    assert "part" not in q2.dims
    assert q2.fact.id_vars == ["o_orderkey", "s_suppkey"]


def test_collapse_equals_apply_equals_aggregate(cube, duck):
    """Metamorphic: `-` collapse == apply(margin) == aggregate(keys)
    (reference tests/tests-data.cube.R:159-211)."""
    a = cube.q(orders=Collapse(), part=Collapse()).fact.df.select(
        "s_suppkey", F.col("revenue").cast("double").alias("revenue")
    )
    b = cube.apply(["supplier"]).fact.df.select(
        "s_suppkey", F.col("revenue").cast("double").alias("revenue")
    )
    sql = """
      SELECT l_suppkey AS s_suppkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      FROM lineitem GROUP BY 1
    """
    assert_df_matches_sql(a, duck, sql)
    assert_df_matches_sql(b, duck, sql)


def test_attr_filter_routes_through_snowflake(cube, duck):
    q = cube.q(supplier=C(r_name=["EUROPE", "ASIA"]), part=Collapse(), orders=Collapse())
    out = q.fact.df.select("s_suppkey", F.col("sum_qty").cast("double").alias("sum_qty"))
    sql = """
      SELECT l_suppkey AS s_suppkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem
      WHERE l_suppkey IN (
        SELECT s_suppkey FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name IN ('EUROPE','ASIA'))
      GROUP BY 1
    """
    assert_df_matches_sql(out, duck, sql)


def test_collapse_prefilter_filters_before_collapse(cube, duck):
    """Reference semantics: args of `-()` filter the dim BEFORE collapsing
    (tests/tests-sub-.data.cube.R:310-354)."""
    q = cube.q(orders=Collapse(o_orderpriority=["1-URGENT"]), part=Collapse())
    out = q.fact.df.select("s_suppkey", F.col("revenue").cast("double").alias("revenue"))
    sql = """
      SELECT l_suppkey AS s_suppkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '1-URGENT'
      GROUP BY 1
    """
    assert_df_matches_sql(out, duck, sql)


def test_aggregate_by_hierarchy_attrs(cube, duck):
    out = cube.aggregate(["supplier.r_name", "part.p_brand"]).select(
        "r_name", "p_brand", F.col("revenue").cast("double").alias("revenue")
    )
    sql = """
      SELECT r_name, p_brand,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      JOIN part ON l_partkey = p_partkey
      GROUP BY 1, 2
    """
    assert_df_matches_sql(out, duck, sql)


def test_grand_total(cube, duck):
    out = cube.grand_total().select(
        F.col("sum_qty").cast("double").alias("sum_qty"), "n_lines"
    )
    sql = """
      SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             COUNT(*) AS n_lines FROM lineitem
    """
    assert_df_matches_sql(out, duck, sql)


def test_empty_dice_yields_empty_cube(cube):
    q = cube.q(part=None)  # dc[NULL] semantics: matches nothing
    assert q.fact.df.count() == 0
    assert q.dims["part"].base.count() == 0


def test_nonexistent_key_drops_rows_silently(cube):
    q = cube.q(part=[999_999_999, 999_999_998])
    assert q.fact.df.count() == 0
    assert "part" in q.dims  # multi-value dice never drops the dim


def test_chainability(cube):
    q = cube.q(supplier=C(r_name=["EUROPE"]))[{"part": Collapse()}]
    assert "part" not in q.dims
    assert "supplier" in q.dims


def test_range_dice_on_attribute(cube, duck):
    """Range selector on a dimension attribute == SQL BETWEEN through the
    snowflake (structural pushdown, no post-hoc WHERE)."""
    from data_cube_spark.selectors import Range

    q = cube.q(part=C(p_size=Range(lo=10, hi=20, hi_incl=True)),
               supplier=Collapse(), orders=Collapse())
    out = q.fact.df.groupBy().agg(
        F.sum(F.col("sum_qty").cast("double")).alias("sum_qty"),
        F.sum("n_lines").alias("n_lines"))
    sql = """
      SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             COUNT(*) AS n_lines
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_size BETWEEN 10 AND 20
    """
    assert_df_matches_sql(out, duck, sql)


def test_range_dice_on_key_equals_membership(cube):
    """Metamorphic: a Range on the dimension KEY returns exactly the rows
    of the equivalent membership dice (and filters the fact scan directly,
    no dimension round-trip)."""
    from data_cube_spark.selectors import Range

    by_range = cube.q(supplier=Range(lo=0, hi=5)).fact.df
    by_members = cube.q(supplier=C(0, 1, 2, 3, 4)).fact.df
    assert sorted(map(tuple, by_range.collect())) == \
        sorted(map(tuple, by_members.collect()))


def test_range_one_sided_and_validation(cube):
    from data_cube_spark.selectors import Range

    import pytest as _pytest
    with _pytest.raises(ValueError):
        Range()
    n_all = cube.fact.df.count()
    n_hi = cube.q(part=C(p_size=Range(hi=1_000_000))).fact.df.count()
    assert n_hi == n_all  # one-sided bound covering everything


def test_fun_override_apply(cube, duck):
    out = cube.apply(["supplier"], fun="max").fact.df.select(
        "s_suppkey", F.col("sum_qty").cast("double").alias("sum_qty")
    )
    # max-of-partials over the (orderkey,partkey,suppkey) grain
    sql = """
      WITH grain AS (
        SELECT l_orderkey, l_partkey, l_suppkey,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
        FROM lineitem GROUP BY 1,2,3)
      SELECT l_suppkey AS s_suppkey, CAST(MAX(sum_qty) AS DOUBLE) AS sum_qty
      FROM grain GROUP BY 1
    """
    assert_df_matches_sql(out, duck, sql)


def test_dim_matching_reorders_and_drops(spark):
    df = spark.createDataFrame([(1, "x", 2.0)], "a int, b string, v double")
    fact = Fact.build(df, ["a"], [Measure("v")])
    extra = Dimension("zz", "zz_key", spark.createDataFrame([(1,)], "zz_key int"))
    da = Dimension("da", "a", spark.createDataFrame([(1, "x")], "a int, attr string"))
    dc = DataCube(fact, {"zz": extra, "da": da})
    assert list(dc.dims) == ["da"]  # extra dim dropped, matched by key name


def test_reserved_grouping_name(spark):
    df = spark.createDataFrame([(1, 2.0)], "a int, v double")
    fact = Fact.build(df, ["a"], [Measure("v")])
    d = Dimension("grouping", "a", spark.createDataFrame([(1,)], "a int"))
    with pytest.raises(ValueError):
        DataCube(fact, {"grouping": d})


def test_extract_custom_j_global(cube, duck):
    # A4 [[.cube: j-only extract (no by) -> one global row
    out = cube.extract(j={"n_parts": F.countDistinct("p_partkey")})
    sql = "SELECT COUNT(DISTINCT l_partkey) AS n_parts FROM lineitem"
    assert_df_matches_sql(out, duck, sql)


def test_extract_defaults_to_measures(cube, duck):
    # j=None aggregates the cube's own measures at the by-grain
    out = cube.extract(by=["supplier.r_name"]).select(
        "r_name", F.col("revenue").cast("double").alias("revenue")
    )
    sql = """
      SELECT r_name,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY 1
    """
    assert_df_matches_sql(out, duck, sql)


def test_positional_equals_named_selectors(cube):
    """Metamorphic (reference tests-sub-.data.cube.R:282-297): the same
    query positionally (dim declaration order) and by name is identical."""
    pos = cube[..., C(1, 2, 3), Collapse()]  # (orders skipped, part, supplier)
    named = cube.q(part=C(1, 2, 3), supplier=Collapse())
    assert pos.fact.id_vars == named.fact.id_vars
    a = sorted(map(tuple, pos.fact.df.collect()))
    b = sorted(map(tuple, named.fact.df.collect()))
    assert a == b


def test_mixed_positional_and_named_selectors(cube):
    """Metamorphic (reference parse.dots positional shift,
    R/data.cube.R:140-160; spec tests tests-sub-.data.cube.R:141-150,
    290-297): named selectors claim their dims first, positional args fill
    the REMAINING dims in declaration order — positional, named, and mixed
    spellings of one query are identical."""
    # dims order: (orders, part, supplier)
    named = cube.q(part=C(1, 2, 3), supplier=C(r_name=["ASIA"]), orders=Collapse())
    # orders claimed by name => positional args fill (part, supplier)
    mixed1 = cube.q(C(1, 2, 3), C(r_name=["ASIA"]), orders=Collapse())
    # part claimed by name => positional args fill (orders, supplier)
    mixed2 = cube.q(Collapse(), C(r_name=["ASIA"]), part=C(1, 2, 3))
    positional = cube.q(Collapse(), C(1, 2, 3), C(r_name=["ASIA"]))
    ref = sorted(map(tuple, named.fact.df.collect()))
    for other in (mixed1, mixed2, positional):
        assert other.fact.id_vars == named.fact.id_vars
        assert sorted(map(tuple, other.fact.df.collect())) == ref
    # over-supplying positional selectors for the unnamed dims errors
    import pytest as _pytest
    with _pytest.raises(ValueError):
        cube.q(C(1), C(2), part=C(3), supplier=C(4), orders=C(5))


def test_merge_delta_equals_full_build(spark, tables):
    """Incremental maintenance metamorphic: cube(a).merge_delta(b) ==
    cube(a union b) for decomposable measures."""
    ev = tables["events"]
    a = ev.where(F.col("event_id") % 2 == 0)
    b = ev.where(F.col("event_id") % 2 == 1)
    mk = lambda df: from_table(
        df, {"etype": "event_type", "user": "user_id"},
        [Measure("sum_value", F.col("value").cast("decimal(18,6)"), agg="sum"),
         Measure("n_events", "event_id", agg="count")],
    )
    full = mk(ev)
    merged = mk(a).merge_delta(b)
    fa = sorted(map(tuple, full.fact.df.collect()))
    fb = sorted(map(tuple, merged.fact.df.collect()))
    assert fa == fb
    assert sorted(r[0] for r in merged.dims["user"].members().collect()) == \
           sorted(r[0] for r in full.dims["user"].members().collect())
    # grain mismatch is rejected
    other = from_table(ev, {"etype": "event_type"},
                       [Measure("n_events", "event_id", agg="count")])
    with pytest.raises(ValueError):
        full.fact.merge(other.fact)


def test_dataframe_valued_filter_semi_join(cube, spark):
    """Reference level$subset mode (b) (R/level.R:31-45): a DataFrame filter
    value runs as a keyed broadcast semi-join and matches the literal dice."""
    sel = spark.createDataFrame([("EUROPE",), ("ASIA",)], "r_name string")
    a = sorted(map(tuple, cube.q(supplier=C(r_name=sel)).fact.df.collect()))
    b = sorted(map(tuple,
                   cube.q(supplier=C(r_name=["EUROPE", "ASIA"])).fact.df.collect()))
    assert a == b and len(a) > 0


def test_table_valued_key_dice(cube, spark):
    """dc.q(dim=df) semi-joins the dimension key against the frame."""
    keys = spark.createDataFrame([(0,), (1,), (2,)], "s_suppkey bigint")
    a = sorted(map(tuple, cube.q(supplier=keys).fact.df.collect()))
    b = sorted(map(tuple, cube.q(supplier=C(0, 1, 2)).fact.df.collect()))
    assert a == b and len(a) > 0
    assert "supplier" in cube.q(supplier=keys).dims  # table dice never drops


def test_chained_query_equals_combined(cube):
    """Metamorphic (reference dc[...][...] chaining): filtering in two
    steps equals one combined query, including the re-aggregation."""
    chained = cube.q(supplier=C(r_name=["EUROPE", "ASIA"]))\
                  .q(orders=Collapse(o_orderpriority=["1-URGENT", "2-HIGH"]))
    combined = cube.q(supplier=C(r_name=["EUROPE", "ASIA"]),
                      orders=Collapse(o_orderpriority=["1-URGENT", "2-HIGH"]))
    a = sorted(map(tuple, chained.fact.df.collect()))
    b = sorted(map(tuple, combined.fact.df.collect()))
    assert a == b and len(a) > 0
    assert set(chained.dims) == set(combined.dims) == {"supplier", "part"}


def test_collapse_then_aggregate_equals_direct(cube):
    """Collapse first, then attribute-aggregate on the smaller cube ==
    aggregating the full cube (decomposable measures)."""
    small = cube.q(part=Collapse(), orders=Collapse())
    a = sorted((r["r_name"], float(r["revenue"]))
               for r in small.aggregate(["supplier.r_name"])
               .select("r_name", F.col("revenue").cast("double")).collect())
    b = sorted((r["r_name"], float(r["revenue"]))
               for r in cube.aggregate(["supplier.r_name"])
               .select("r_name", F.col("revenue").cast("double")).collect())
    assert a == b


def test_anyof_or_filters(cube, duck):
    """AnyOf: OR across attribute filter sets; AND within each set."""
    from data_cube_spark import AnyOf

    q = cube.q(supplier=AnyOf({"r_name": ["EUROPE"]}, {"n_name": ["JAPAN"]}),
               part=Collapse(), orders=Collapse())
    out = q.fact.df.select("s_suppkey",
                           F.col("revenue").cast("double").alias("revenue"))
    sql = """
      SELECT l_suppkey AS s_suppkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      FROM lineitem
      WHERE l_suppkey IN (
        SELECT s_suppkey FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE' OR n_name = 'JAPAN')
      GROUP BY 1
    """
    assert_df_matches_sql(out, duck, sql)
    # the surviving dimension's members match the OR predicate
    assert "supplier" in q.dims
    n_or = q.dims["supplier"].base.count()
    n_europe = cube.q(supplier=C(r_name=["EUROPE"])).dims["supplier"].base.count()
    assert n_or >= n_europe


def test_anyof_collapsed_prefilters_before_collapse(cube, duck):
    from data_cube_spark import AnyOf

    q = cube.q(supplier=AnyOf({"r_name": ["EUROPE"]},
                              {"n_name": ["JAPAN"]}).collapsed(),
               part=Collapse())
    out = q.fact.df.select("o_orderkey",
                           F.col("sum_qty").cast("double").alias("sum_qty"))
    sql = """
      SELECT l_orderkey AS o_orderkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem
      WHERE l_suppkey IN (
        SELECT s_suppkey FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE' OR n_name = 'JAPAN')
      GROUP BY 1
    """
    assert_df_matches_sql(out, duck, sql)


def test_remove_delta_inverts_merge(spark, tables):
    """cube(a ∪ b).remove_delta(b) == cube(a) for sum/count measures;
    grains whose rows are all retracted disappear."""
    from data_cube_spark.build import from_table
    from data_cube_spark.model import Measure

    ev = tables["events"]
    measures = [
        Measure("sum_value", F.col("value").cast("decimal(18,6)"), agg="sum"),
        Measure("n_events", "event_id", agg="count"),
    ]
    a = ev.where(F.col("event_id") % 3 != 0)
    b = ev.where(F.col("event_id") % 3 == 0)
    full = from_table(ev, {"event_type": "event_type"}, measures)
    got = {r["event_type"]: (float(r["sum_value"]), r["n_events"])
           for r in full.remove_delta(b).fact.df.collect()}
    want = {r["event_type"]: (float(r["sum_value"]), r["n_events"])
            for r in from_table(a, {"event_type": "event_type"},
                                measures).fact.df.collect()}
    assert got == want

    # retracting EVERYTHING empties the fact (count gate drops all grains)
    assert full.remove_delta(ev).fact.df.count() == 0


def test_remove_delta_rejects_non_subtractable(spark, tables):
    from data_cube_spark.build import from_table
    from data_cube_spark.model import Measure

    ev = tables["events"].limit(100)
    with pytest.raises(ValueError, match="count measure"):
        from_table(ev, {"event_type": "event_type"},
                   [Measure("sum_value", "value", agg="sum")]
                   ).remove_delta(ev)
    with pytest.raises(ValueError, match="not subtractable"):
        from_table(ev, {"event_type": "event_type"},
                   [Measure("max_value", "value", agg="max"),
                    Measure("n", "event_id", agg="count")]
                   ).remove_delta(ev)


def test_summary_navigator_answers_and_falls_back(spark, cube):
    """with_summary registers a materialized aggregate; aggregate() must
    answer same-grain and coarser queries from it (InMemoryTableScan, no
    fact scan) with results identical to the fact path, and silently fall
    back for attrs outside the summary grain."""
    from data_cube_spark.plans import explain_str
    from data_cube_spark.sources.star import tpch_cube

    import os
    dc = tpch_cube(spark, os.environ.get("SPARK_GRAFT_TEST_SF_DIR",
                                         "/root/testdata/sf0.001"))
    base_ym = dc.aggregate(["orders.d_year", "orders.d_month"]).collect()
    base_y = dc.aggregate(["orders.d_year"]).collect()
    base_r = dc.aggregate(["r_name"]).collect()
    dc.with_summary(["orders.d_year", "orders.d_month"])

    nav_y_df = dc.aggregate(["orders.d_year"])
    assert "InMemoryTableScan" in explain_str(nav_y_df, "simple")

    def key(rows):
        return sorted(tuple(str(v) for v in r) for r in rows)

    assert key(dc.aggregate(["orders.d_year", "orders.d_month"]).collect()) == key(base_ym)
    assert key(nav_y_df.collect()) == key(base_y)
    assert key(dc.aggregate(["r_name"]).collect()) == key(base_r)
    # fun override bypasses the navigator by construction (the rewrite
    # only fires for fun=None); its result must match the fact path
    fresh = tpch_cube(spark, os.environ.get("SPARK_GRAFT_TEST_SF_DIR",
                                            "/root/testdata/sf0.001"))
    assert key(dc.aggregate(["orders.d_year"], fun="max").collect()) == \
        key(fresh.aggregate(["orders.d_year"], fun="max").collect())


def test_summary_navigator_refuses_inexact_measures(spark, tables):
    """A cube with a mean measure registers no summary (mean-of-partials
    is an approximation, not an exact regrain)."""
    from data_cube_spark.build import from_table
    from data_cube_spark.model import Measure

    dc = from_table(
        tables["lineitem"].select("l_orderkey", "l_quantity"),
        {"order": "l_orderkey"},
        [Measure("avg_qty", "l_quantity", agg="mean")],
    )
    dc.with_summary(["order.l_orderkey"])
    assert dc._summaries == []


def test_cube_plan_report(cube_cold):
    rep = cube_cold.q().plan_report()
    assert rep["nested_loop_joins"] == 0
    assert rep["scans"] >= 1


def test_pristine_level_resolution_equals_restricted(cube):
    """r14 invariant the pristine-level rewrite rests on: a diced
    dimension resolving attributes against its UNRESTRICTED level tables
    (``Level.pristine``) yields exactly the rows of the restricted
    formulation, because the base join keeps only surviving keys. Also
    pins that ``Level.df`` KEEPS the restricted lineage (the save_cube /
    schema_info(counts=True) contract)."""
    from pyspark.sql import functions as F

    for dname, filters in (
        ("supplier", {"r_name": ["EUROPE"]}),
        ("orders", {"cr_name": ["ASIA"], "d_year": [1996]}),
    ):
        dim = cube.dims[dname].subset(filters)
        # denormalized() (pristine path) == explicit restricted-level joins
        wide = dim.denormalized()
        ref = dim.base
        for lk, lvl in dim.levels.items():
            add = [a for a in lvl.attrs if a not in ref.columns]
            if add:
                ref = ref.join(lvl.df.select(lk, *add), lk, "left")
        ref = ref.select(*wide.columns)
        assert sorted(map(tuple, wide.collect())) \
            == sorted(map(tuple, ref.collect()))
        # Level.df stays restricted: every level key in df survives in base
        for lk, lvl in dim.levels.items():
            extra = (lvl.df.select(lk)
                     .join(dim.base.select(lk), lk, "left_anti").count())
            assert extra == 0, f"{dname}.{lk}: unrestricted rows in .df"


def test_pristine_chained_subset_equals_joint(cube):
    """Chained dices through pristine routing match the joint dice and
    the attr_table output matches the restricted formulation."""
    d1 = cube.dims["supplier"].subset({"r_name": ["EUROPE"]}).subset(
        {"n_name": ["FRANCE", "GERMANY"]})
    d2 = cube.dims["supplier"].subset(
        {"r_name": ["EUROPE"], "n_name": ["FRANCE", "GERMANY"]})
    assert sorted(map(tuple, d1.base.collect())) \
        == sorted(map(tuple, d2.base.collect()))
    at = d1.attr_table(["n_name", "r_name"])
    ref = d2.attr_table(["n_name", "r_name"])
    assert sorted(map(tuple, at.collect())) \
        == sorted(map(tuple, ref.collect()))
