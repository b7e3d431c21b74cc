from pypers_spark.sources.registry import TABLES, load_table, load_tables  # noqa: F401
from pypers_spark.sources.io import (  # noqa: F401
    read_binary_files,
    read_csv,
    read_orc,
    read_json,
    read_parquet,
    read_text,
    write_csv,
    write_json,
    write_orc,
    write_parquet,
    write_text,
)
