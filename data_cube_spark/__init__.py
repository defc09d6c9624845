"""data_cube_spark — a PySpark-native OLAP cube engine.

A brand-new engine with the query and data-processing capabilities of the
R package ``jangorecki/data.cube`` (reference studied at /root/reference),
re-expressed Spark-first: every operator is declared through the DataFrame
API so Catalyst/Tungsten pick the physical strategy (broadcast star joins,
partial aggregation, predicate pushdown, grouping sets in one shuffle).

Layout
------
- :mod:`data_cube_spark.model`       Measure, Level, Hierarchy, Dimension, Fact, DataCube
- :mod:`data_cube_spark.selectors`   query-spec objects (dice / slice / collapse / rollup / cube)
- :mod:`data_cube_spark.build`       constructors (from_table, from_star, from_array)
- :mod:`data_cube_spark.export`      denormalize / pivot / format / to_array / schema
- :mod:`data_cube_spark.groupingsets` rollup & cube grouping sets with level codes
- :mod:`data_cube_spark.functions`   scalar helpers (calendar, currency format, agg whitelist)
- :mod:`data_cube_spark.sources`     star-schema loaders over parquet (TPC-H-ish test tables)
- :mod:`data_cube_spark.operators`   large-scale pipeline ops (dedup, similarity, text, multimodal)
- :mod:`data_cube_spark.streaming`   Structured Streaming cube maintenance
- :mod:`data_cube_spark.plans`       physical-plan assertions (pushdown, broadcast, shuffle count)
"""

from data_cube_spark.model import DataCube, Dimension, Fact, Hierarchy, Level, Measure
from data_cube_spark.selectors import AnyOf, C, Collapse, CubeOp, Range, RollupOp, Selector

__all__ = [
    "DataCube",
    "Dimension",
    "Fact",
    "Hierarchy",
    "Level",
    "Measure",
    "AnyOf",
    "C",
    "Collapse",
    "CubeOp",
    "Range",
    "RollupOp",
    "Selector",
]

__version__ = "0.9.0"
