from data_cube_spark.sources.star import load_tables, tpch_cube

__all__ = ["load_tables", "tpch_cube"]
