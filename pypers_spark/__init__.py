"""pypers_spark — a PySpark-native pipeline engine with the capabilities
of kostrykin/pypers (repype), re-expressed Spark-first.

The orchestration core (Config/Stage/Pipeline/Task/Batch/Status/
Benchmark/CLI) mirrors repype's public API (see SURVEY.md §2.A), but the
pipeline data object is a dict of lazy Spark DataFrames, persistence is
parquet, and the operator library (operators/, functions/) provides the
analytic + LLM-training-data operators designed for 100 TB scale.
"""

from pypers_spark.version import __version__  # noqa: F401


def __getattr__(name):
    # Lazy top-level exports: keep `import pypers_spark` light (no
    # pyspark import cost until a symbol is actually used).
    surface = {
        "Config": ("pypers_spark.config", "Config"),
        "Stage": ("pypers_spark.stage", "Stage"),
        "Pipeline": ("pypers_spark.pipeline", "Pipeline"),
        "create_pipeline": ("pypers_spark.pipeline", "create_pipeline"),
        "Task": ("pypers_spark.task", "Task"),
        "Batch": ("pypers_spark.batch", "Batch"),
        "RunContext": ("pypers_spark.batch", "RunContext"),
        "Status": ("pypers_spark.status", "Status"),
        "StatusReader": ("pypers_spark.status", "StatusReader"),
        "Benchmark": ("pypers_spark.benchmark", "Benchmark"),
        "get_session": ("pypers_spark.session", "get_session"),
        "current_session": ("pypers_spark.session", "current_session"),
    }
    if name in surface:
        import importlib

        module, attr = surface[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'pypers_spark' has no attribute {name!r}")
