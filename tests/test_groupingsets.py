"""Grouping sets: rollup/cube level codes, prefix selection, the rollup-cube
double-counting contract (reference tests/tests-021-rollup.R)."""

from pyspark.sql import functions as F

from data_cube_spark.groupingsets import LEVEL_COL, cube_table, rollup_cube, rollup_table
from data_cube_spark.selectors import Collapse, CubeOp, RollupOp

from tests.conftest import assert_df_matches_sql


def test_rollup_levels_match_oracle(tables, duck):
    df = tables["lineitem"]
    out = rollup_table(
        df,
        ["l_returnflag", "l_linestatus"],
        [F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty")],
    )
    sql = """
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(GROUPING(l_returnflag) + GROUPING(l_linestatus) AS INT) AS grouping_level
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """
    assert_df_matches_sql(out, duck, sql)


def test_rollup_level_selection(tables):
    df = tables["lineitem"]
    aggs = [F.sum("l_quantity").alias("q")]
    all_lv = rollup_table(df, ["l_returnflag", "l_linestatus"], aggs)
    some = rollup_table(df, ["l_returnflag", "l_linestatus"], aggs, levels=[0, 2])
    lv = {r[LEVEL_COL] for r in some.select(LEVEL_COL).distinct().collect()}
    assert lv == {0, 2}
    # level 0 of the selection == leaf grain of the full rollup
    n_leaf = all_lv.where(F.col(LEVEL_COL) == 0).count()
    assert some.where(F.col(LEVEL_COL) == 0).count() == n_leaf


def test_rollup_index0_equals_plain_aggregate(tables):
    """Metamorphic: rollup restricted to level 0 == plain group-by
    (reference tests/tests-021-rollup.R:61-65)."""
    df = tables["lineitem"]
    a = (
        rollup_table(df, ["l_returnflag"], [F.sum("l_quantity").alias("q")], levels=[0])
        .drop(LEVEL_COL)
        .collect()
    )
    b = df.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("q")).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_cube_grouping_sets_match_oracle(tables, duck):
    df = tables["lineitem"]
    out = cube_table(
        df,
        ["l_returnflag", "l_linestatus"],
        [F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty")],
    ).drop(LEVEL_COL)
    sql = """
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(GROUPING_ID(l_returnflag, l_linestatus) AS BIGINT) AS grouping_id
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """
    assert_df_matches_sql(out, duck, sql)


def test_rollup_cube_double_counting_contract(cube):
    """A rollup cube contains every grain: summing a measure across all
    levels multiplies the grand total (reference tests/tests-021-rollup.R:20-27)."""
    rc = rollup_cube(cube, ["supplier.r_name"])
    total = cube.grand_total().collect()[0]["sum_qty"]
    across = rc.fact.df.agg(F.sum("sum_qty").alias("s")).collect()[0]["s"]
    assert float(across) == float(total) * 2  # leaf level + grand total


def test_rollup_cube_binds_grouping_dimension(cube):
    rc = rollup_cube(cube, ["supplier.r_name", "part.p_brand"])
    assert "grouping" in rc.dims
    lv = sorted(r[0] for r in rc.dims["grouping"].members().collect())
    assert lv == [0, 1, 2]


def test_rollup_cube_renormalizes_multi_attr_dims(cube):
    """Reference R/rollup.R:85-95 dimensional contract: a dimension
    contributing >= 2 attributes comes back NORMALIZED — the fact carries a
    generated surrogate key, the attrs live in a bound dimension table —
    and denormalize() round-trips to the flat form."""
    from data_cube_spark.export import denormalize

    rc = rollup_cube(cube, ["supplier.r_name", "supplier.n_name"])
    # fact: surrogate key + level code, no flat attr columns
    assert "supplier_sk" in rc.fact.df.columns
    assert "r_name" not in rc.fact.df.columns
    assert rc.fact.id_vars == ["supplier_sk", LEVEL_COL]
    # bound dimension holds the attr combos keyed by the surrogate
    dim = rc.dims["supplier"]
    assert dim.key == "supplier_sk"
    combos = dim.denormalized().select("r_name", "n_name").collect()
    assert len(combos) == len({tuple(r) for r in combos})
    # flat (normalize=False) and denormalized-normalized forms agree
    flat = rollup_cube(cube, ["supplier.r_name", "supplier.n_name"],
                       normalize=False)
    cols = ["r_name", "n_name", LEVEL_COL, "sum_qty"]
    nones_last = lambda t: tuple((x is None, x) for x in t)
    a = sorted(map(tuple, denormalize(rc).select(*cols).collect()), key=nones_last)
    b = sorted(map(tuple, flat.fact.df.select(*cols).collect()), key=nones_last)
    assert a == b
    # the normalized rollup cube stays queryable: slice one grouping level
    leaf = rc.q(grouping=0)
    assert leaf.fact.df.count() == flat.fact.df.where(
        F.col(LEVEL_COL) == 0).count()


def test_grouping_query_rollup_selector(cube):
    """`+` selector: rollup over the dimension's hierarchy keys while other
    dims are collapsed (the reference's intended unfinished semantics)."""
    from data_cube_spark.selectors import Collapse

    q = cube.q(supplier=RollupOp(), part=Collapse(), orders=Collapse())
    # supplier geo hierarchy: region -> nation -> supplier (+ grand total)
    lv = sorted(r[0] for r in q.dims["grouping"].members().collect())
    assert lv == [0, 1, 2, 3]
    grand = q.fact.df.where(F.col(LEVEL_COL) == 3)
    assert grand.count() == 1


def test_grouping_query_cube_selector_with_fixed_dim(cube):
    from data_cube_spark.selectors import Collapse

    q = cube.q(part=CubeOp(), orders=Collapse())
    # supplier stays at key grain in every grouping set
    assert "s_suppkey" in q.fact.df.columns
    lv = sorted(r[0] for r in q.dims["grouping"].members().collect())
    assert lv == [0, 1]


def test_grouping_selector_prefilter(cube, duck):
    """`+`/`^` selector args filter the dimension BEFORE grouping (same
    contract as Collapse pre-filter)."""
    from data_cube_spark.selectors import Collapse

    q = cube.q(supplier=RollupOp(r_name=["EUROPE", "ASIA"]),
               part=Collapse(), orders=Collapse())
    out = q.fact.df.select(
        "n_regionkey", "n_nationkey", "s_suppkey",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("grouping_level").cast("int").alias("grouping_level"),
    )
    sql = """
      SELECT n_regionkey, n_nationkey, s_suppkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(GROUPING(n_regionkey) + GROUPING(n_nationkey)
                  + GROUPING(s_suppkey) AS INT) AS grouping_level
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name IN ('EUROPE','ASIA')
      GROUP BY ROLLUP (n_regionkey, n_nationkey, s_suppkey)
    """
    assert_df_matches_sql(out, duck, sql)


def test_capply_returns_regrained_chainable_cube(cube):
    """capply rolls dimensions to the attribute grain and stays queryable
    (reference R/cube.R:210-217)."""
    rc = cube.capply(["supplier.r_name", "part.p_brand"])
    assert set(rc.dims) == {"supplier", "part"}
    assert rc.dims["supplier"].key == "r_name"
    n_regions = rc.dims["supplier"].base.count()
    assert n_regions == 5
    # chain: dice the regrained cube by its new key
    sliced = rc.q(supplier=["EUROPE"])
    assert sliced.fact.df.count() > 0
    assert {r.r_name for r in sliced.fact.df.select("r_name").collect()} == {"EUROPE"}


def test_rollup_fun_override_level0_equals_aggregate(cube):
    """Metamorphic: rollup with FUN at level 0 == aggregate with the same
    FUN (reference rollup FUN arg, R/rollup.R:65)."""
    rc = rollup_cube(cube, ["supplier.r_name"], fun="max", levels=[0])
    a = sorted(
        (r["r_name"], float(r["sum_qty"]))
        for r in rc.fact.df.select("r_name", "sum_qty").collect()
    )
    agg = cube.aggregate(["supplier.r_name"], fun="max")
    b = sorted(
        (r["r_name"], float(r["sum_qty"]))
        for r in agg.select("r_name", "sum_qty").collect()
    )
    assert a == b


def test_rollup_named_hierarchy(cube, duck):
    """RollupOp(hierarchy=...) selects which hierarchy of a multi-hierarchy
    dimension to group by (here the orders calendar instead of the default
    customer-geo path)."""
    q = cube.q(orders=RollupOp(hierarchy="monthly"),
               part=Collapse(), supplier=Collapse())
    out = q.fact.df.select(
        F.col("d_year").cast("int").alias("d_year"),
        F.col("d_quarter").cast("int").alias("d_quarter"),
        F.col("d_month").cast("int").alias("d_month"),
        F.col("d_date").cast("string").alias("d_date"), "o_orderkey",
        F.col("revenue").cast("double").alias("revenue"),
        F.col("grouping_level").cast("int").alias("grouping_level"),
    )
    sql = """
      SELECT CAST(year(o_orderdate) AS INT) AS d_year,
             CAST(quarter(o_orderdate) AS INT) AS d_quarter,
             CAST(month(o_orderdate) AS INT) AS d_month,
             CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS d_date, o_orderkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue,
             CAST(GROUPING(year(o_orderdate)) + GROUPING(quarter(o_orderdate))
                  + GROUPING(month(o_orderdate)) + GROUPING(CAST(o_orderdate AS DATE))
                  + GROUPING(o_orderkey) AS INT) AS grouping_level
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY ROLLUP (year(o_orderdate), quarter(o_orderdate),
                       month(o_orderdate), CAST(o_orderdate AS DATE), o_orderkey)
    """
    assert_df_matches_sql(out, duck, sql)


def test_rollup_unknown_hierarchy_errors(cube):
    import pytest as _pytest

    with _pytest.raises(KeyError):
        cube.q(orders=RollupOp(hierarchy="nope"), part=Collapse(),
               supplier=Collapse()).fact.df.columns


def test_rollup_cube_level_slices_equal_prefix_aggregates(cube):
    """Reference identity (tests-021-rollup.R:72-81): slicing a rollup cube
    by grouping level equals the plain aggregate at that prefix — and
    requires the rollup cube to be re-queryable through q()."""
    from data_cube_spark.export import denormalize
    from data_cube_spark.selectors import C

    rc = rollup_cube(cube, ["supplier.r_name", "supplier.n_name"])
    # level 0 == aggregate by (r_name, n_name); the normalized rollup cube
    # keeps attrs in the bound dimension, so compare through denormalize
    leaf = denormalize(rc.q(grouping=[0])).select(
        "r_name", "n_name", F.col("revenue").cast("double").alias("revenue"))
    agg = cube.aggregate(["supplier.r_name", "supplier.n_name"]).select(
        "r_name", "n_name", F.col("revenue").cast("double").alias("revenue"))
    assert sorted(map(tuple, leaf.collect())) == sorted(map(tuple, agg.collect()))
    # level 2 == one grand-total row
    assert rc.q(grouping=[2]).fact.df.count() == 1
    # attribute dice through the normalized dimension keeps only rows where
    # that key survives (rolled rows have NULL keys and drop)
    eur = denormalize(rc.q(supplier=C(r_name=["EUROPE"])))
    assert eur.where(F.col("r_name").isNull()).count() == 0
    assert eur.count() > 0
