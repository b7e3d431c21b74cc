"""Operator ↔ Stage bridge: run any registry query inside a pipeline.

Closes the loop between the two halves of the engine (SURVEY.md §3):
the operator library's plain functions become pipeline Stages, so a
task spec can declare e.g.::

    pipeline:
      - pypers_spark.operators.stages.LoadTablesStage
      - pypers_spark.operators.stages.QueryStage
    config:
      load-tables: {sf_dir: /root/testdata/sf0.001}
      query: {name: q1_pricing_summary}

and get sha-dirtiness, pickup resume, and parquet persistence of the
query result for free. The query stays a lazy plan until Task.store.
"""

from __future__ import annotations

from pypers_spark.stage import Stage


class LoadTablesStage(Stage):
    """Opens the table registry (lazy scans) for a scale-factor dir."""

    outputs = ("tables",)

    def process(self, pipeline, config, status=None, **inputs):
        from pypers_spark.session import current_session
        from pypers_spark.sources import load_tables

        sf_dir = config["sf_dir"]
        return {"tables": load_tables(current_session(), sf_dir)}


class QueryStage(Stage):
    """Runs one named operator from the registry over the open tables.

    The result is a lazy DataFrame field named ``result`` — persisted as
    parquet by the owning task, so changing the query name (or the
    operator's implementation, via the registry module's bytecode
    reaching the stage sha through ``configure``) re-runs it.
    """

    inputs = ("tables",)
    outputs = ("result",)

    def process(self, pipeline, config, status=None, tables=None, **inputs):
        from pypers_spark.operators import REGISTRY

        name = config["name"]
        return {"result": REGISTRY[name](tables)}


class CheckpointStage(Stage):
    """Parquet-checkpoint boundary as a first-class pipeline stage.

    Replaces the ``result`` field with its checkpoint-backed twin,
    ``checkpointed`` (functions/checkpoint.py): the first run writes
    the artifact once per (key, plan+data digest); every later run —
    including the next driver process — reads columnar parquet instead
    of recomputing the upstream plan. Put it after an expensive
    derivation stage, e.g.::

        pipeline:
          - pypers_spark.operators.stages.LoadTablesStage
          - pypers_spark.operators.stages.QueryStage
          - pypers_spark.operators.stages.CheckpointStage
        config:
          checkpoint: {key: my_pipeline.result}

    The digest mechanism mirrors Task sha-dirtiness at DataFrame
    granularity, so a changed query or changed input data invalidates
    the checkpoint automatically.
    """

    consumes = ("result",)
    outputs = ("checkpointed",)

    def process(self, pipeline, config, status=None, result=None, **inputs):
        from pypers_spark.functions.checkpoint import table_checkpoint

        key = config.get("key", "stage.checkpoint")
        return {"checkpointed": table_checkpoint(result, key)}
