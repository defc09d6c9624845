"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``   — flagship query on /root/testdata/sf0.001.
- ``queries()``      — one entry per implemented operator (SURVEY.md §2 +
                       north-star pipeline ops), each ``(spark, sf_dir) -> DataFrame``.
- ``oracle_sql()``   — matching DuckDB SQL per query (omitted only for
                       genuinely non-SQL-expressible ops: MinHash/SimHash/LSH
                       candidates and the mapInPandas fake decode).

Implementation lives in :mod:`data_cube_spark.registry`.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: revenue by supplier region through the cube engine."""
    from data_cube_spark.registry import QUERIES

    return QUERIES["flagship_revenue_by_region"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from data_cube_spark.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from data_cube_spark.registry import ORACLE

    return dict(ORACLE)
