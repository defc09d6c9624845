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

from data_cube_spark.registry._shared import NGRAM_MAX_DF, QueryFn  # noqa: F401
from data_cube_spark.registry.catalog import QUERIES, run_query  # noqa: F401
from data_cube_spark.registry.oracles import ORACLE  # noqa: F401

__all__ = ["QUERIES", "ORACLE", "QueryFn", "run_query", "NGRAM_MAX_DF"]
