"""Shared imports, SQL fragments and helpers for the registry
family modules (split from the original single-file registry;
determinism conventions documented in the package __init__).
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


__all__ = [
    "QueryFn",
    "SQL_QTY",
    "SQL_REV",
    "SQL_CHARGE",
    "SQL_GRAIN",
    "_m",
    "_MEASURE_SQL",
    "_NORM_SQL",
    "_lang_counts_sql",
    "NGRAM_MAX_DF",
    "MIXTURE_WEIGHTS",
    "MIXTURE_DEFAULT",
    "PACK_CAPACITY",
    "PACK_SHARDS",
    "_rev_expr",
    "F",
    "Window",
    "DataFrame",
    "SparkSession",
    "Callable",
    "denormalize",
    "pivot_format",
    "add_surrogate_key",
    "topk_per_group",
    "rollup_cube",
    "Measure",
    "dedup",
    "multimodal",
    "similarity",
    "text",
    "_hex_threshold",
    "LANG_STOPWORDS",
    "AnyOf",
    "C",
    "Collapse",
    "CubeOp",
    "Range",
    "RollupOp",
    "load_tables",
    "parquet_rows",
    "tpch_cube",
    "sessionize_batch",
    "tumbling_agg",
]


QueryFn = Callable[[SparkSession, str], DataFrame]

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

def _rev_expr():
    """Exact decimal line revenue (built lazily: F.col needs a live session)."""
    return (F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)")))

NGRAM_MAX_DF = 100

MIXTURE_WEIGHTS = {"src0": 1.0, "src1": 0.5, "src2": 0.1}

MIXTURE_DEFAULT = 0.05

PACK_CAPACITY = 512

PACK_SHARDS = 8
