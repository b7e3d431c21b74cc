from pypers_spark.sources.registry import TABLES, load_table, load_tables  # noqa: F401
