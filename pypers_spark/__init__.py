"""pypers_spark — a PySpark-native pipeline engine with the capabilities
of kostrykin/pypers (repype), re-expressed Spark-first.

The orchestration core (Config/Stage/Pipeline/Task/Batch/Status/
Benchmark/CLI) mirrors repype's public API (see SURVEY.md §2.A), but the
pipeline data object is a dict of lazy Spark DataFrames, persistence is
parquet, and the operator library (operators/, functions/) provides the
analytic + LLM-training-data operators designed for 100 TB scale.
"""

from pypers_spark.version import __version__  # noqa: F401
