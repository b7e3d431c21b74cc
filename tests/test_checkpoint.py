"""Parquet-checkpoint boundary (functions/checkpoint.py + CheckpointStage)."""

from __future__ import annotations

import os

import pytest
import yaml

from pyspark.sql import functions as F

from pypers_spark.functions.checkpoint import table_checkpoint, checkpoint_dir


@pytest.fixture
def ckpt_dir(tmp_path, monkeypatch):
    d = tmp_path / "ckpt"
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", str(d))
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT", "1")
    return d


def test_checkpoint_written_once_and_read_back(spark, tables, ckpt_dir):
    df = tables["documents"].select("doc_id", F.length("text").alias("n"))
    out1 = table_checkpoint(df, "test.docs_len")
    rows1 = out1.count()
    files = list((ckpt_dir / "test.docs_len").iterdir())
    assert len(files) == 1  # one digest directory
    mtime = os.path.getmtime(files[0])
    out2 = table_checkpoint(df, "test.docs_len")
    assert out2.count() == rows1
    assert os.path.getmtime(files[0]) == mtime  # not rewritten
    # checkpoint-backed plan reads the checkpoint parquet, not the
    # original computation
    assert all("test.docs_len" in f for f in out2.inputFiles())


def test_checkpoint_invalidated_by_plan_change(spark, tables, ckpt_dir):
    df1 = tables["documents"].select("doc_id", F.length("text").alias("n"))
    df2 = tables["documents"].select("doc_id", (F.length("text") * 2).alias("n"))
    out1 = table_checkpoint(df1, "test.inval")
    n1 = out1.count()
    d1 = set(os.listdir(ckpt_dir / "test.inval"))
    out2 = table_checkpoint(df2, "test.inval")
    d2 = set(os.listdir(ckpt_dir / "test.inval"))
    assert d1 < d2 and len(d2) == 2  # new digest; LIVE one kept (r11:
    # sessions alternating scale factors under one key flip digests —
    # pruning a digest still memoized in _OPEN deletes parquet under a
    # live persisted DataFrame → flaky FAILED_READ on cache misses)
    out1.unpersist()  # force the next count to re-read the parquet
    assert out1.count() == n1  # files survived the second write
    # values follow the new plan
    row = out2.orderBy("doc_id").first()
    assert row["n"] % 2 == 0
    # once no memo holds a digest, a later write prunes it
    import pypers_spark.functions.checkpoint as cp

    for kd in [kd for kd in cp._OPEN if kd[0] == "test.inval"]:
        del cp._OPEN[kd]
    df3 = tables["documents"].select("doc_id", (F.length("text") * 3).alias("n"))
    table_checkpoint(df3, "test.inval")
    assert len(os.listdir(ckpt_dir / "test.inval")) == 1


def test_checkpoint_disabled_falls_back_to_persist(spark, tables, ckpt_dir, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT", "0")
    df = tables["documents"].select("doc_id")
    out = table_checkpoint(df, "test.disabled")
    assert out.count() > 0
    assert not (ckpt_dir / "test.disabled").exists()


def test_signature_table_goes_through_checkpoint(spark, tables, ckpt_dir):
    """The dedup gram/signature tables go through the checkpoint: the
    artifact exists after the first invocation and the table's plan
    reads it back (no shingle/hash recomputation), without rewriting."""
    from pypers_spark.operators import dedup

    dedup.dd_ngram_jaccard(tables).count()
    assert (ckpt_dir / "dedup.gram_sets").is_dir()
    digests = list((ckpt_dir / "dedup.gram_sets").iterdir())
    assert len(digests) == 1
    mtime = os.path.getmtime(digests[0])
    gsets = dedup._gram_table(tables)
    assert all("dedup.gram_sets" in f for f in gsets.inputFiles())
    assert os.path.getmtime(digests[0]) == mtime  # reused, not rewritten
    sigs = dedup._signature_table(tables)
    sigs.count()
    assert all("dedup.signature_table" in f for f in sigs.inputFiles())


def test_checkpoint_stage_in_task(tmp_path, sf_dir, spark, ckpt_dir):
    """CheckpointStage is a first-class pipeline stage: the task runs,
    the checkpoint artifact exists, and the result is unchanged."""
    (tmp_path / "q").mkdir(parents=True)
    (tmp_path / "q" / "task.yml").write_text(
        yaml.safe_dump(
            {
                "runnable": True,
                "input_ids": [1],
                "pipeline": [
                    "pypers_spark.operators.stages.LoadTablesStage",
                    "pypers_spark.operators.stages.QueryStage",
                    "pypers_spark.operators.stages.CheckpointStage",
                ],
                "marginal_stages": ["load-tables"],
                "config": {
                    "load-tables": {"sf_dir": sf_dir},
                    "query": {"name": "txt_token_count"},
                    "checkpoint": {"key": "test.task_result"},
                },
            }
        )
    )
    from pypers_spark.batch import Batch

    batch = Batch()
    batch.load(tmp_path / "q")
    rc = batch.context(tmp_path / "q")
    data = rc.run()
    assert (ckpt_dir / "test.task_result").is_dir()
    assert data[1]["checkpointed"].count() > 0


def test_default_checkpoint_scope_is_per_process(spark, tables, monkeypatch, tmp_path):
    """Measurement-honesty rule (r11): with no explicit checkpoint dir,
    artifacts are scoped to THIS driver process — a later invocation
    never reads what an earlier one persisted — and dead processes'
    directories are pruned on first use."""
    import pypers_spark.functions.checkpoint as cp

    monkeypatch.delenv("SPARK_GRAFT_CHECKPOINT_DIR", raising=False)
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT", "1")
    monkeypatch.setattr(cp.tempfile, "gettempdir", lambda: str(tmp_path))
    monkeypatch.setattr(cp, "_PRUNED", False)

    base = tmp_path / "pypers_spark_checkpoints"
    # a directory from a dead driver (pid 1 is init — never "dead"; use
    # an impossible pid instead) and one from a live pid (our own)
    stale = base / "proc-99999999"
    stale.mkdir(parents=True)
    (stale / "marker").write_text("x")

    assert f"proc-{os.getpid()}" in cp.checkpoint_dir()

    df = tables["documents"].select("doc_id", F.length("text").alias("n"))
    out = table_checkpoint(df, "test.proc_scope")
    assert out.count() > 0
    # artifact landed under this process's scope
    assert (base / f"proc-{os.getpid()}" / "test.proc_scope").is_dir()
    # the dead process's directory was pruned
    assert not stale.exists()
