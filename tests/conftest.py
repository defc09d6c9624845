import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from data_cube_spark.session import get_spark

    s = get_spark("data-cube-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tables(spark):
    from data_cube_spark.sources.star import load_tables

    return load_tables(spark, SF_DIR)


@pytest.fixture(scope="session")
def cube(spark):
    from data_cube_spark.sources.star import tpch_cube

    return tpch_cube(spark, SF_DIR).persist()


@pytest.fixture(scope="session")
def cube_cold(spark):
    """Unpersisted cube — plans read straight from parquet, so pushdown /
    scan-shape assertions see FileScan nodes."""
    from data_cube_spark.sources.star import tpch_cube

    return tpch_cube(spark, SF_DIR)


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def assert_df_matches_sql(df, duck_con, sql, sort_by=None, rel_tol=1e-9):
    """Differential oracle: Spark DataFrame vs DuckDB result, order-insensitive,
    column-name keyed (the driver's comparison model)."""
    import math

    pdf = df.toPandas()
    oracle = duck_con.execute(sql).fetchdf()
    assert sorted(pdf.columns) == sorted(oracle.columns), (
        f"columns differ: {sorted(pdf.columns)} vs {sorted(oracle.columns)}"
    )
    cols = sorted(pdf.columns)
    a = pdf[cols].sort_values(cols, na_position="last").reset_index(drop=True)
    b = oracle[cols].sort_values(cols, na_position="last").reset_index(drop=True)
    assert len(a) == len(b), f"row counts differ: {len(a)} vs {len(b)}"
    for c in cols:
        av, bv = a[c].tolist(), b[c].tolist()
        for x, y in zip(av, bv):
            if x is None and y is None:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                assert math.isclose(x, y, rel_tol=rel_tol, abs_tol=1e-9), f"{c}: {x} != {y}"
            else:
                assert str(x) == str(y), f"{c}: {x!r} != {y!r}"
