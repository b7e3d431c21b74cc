"""End-to-end curation pipeline test: the flagship Stage composition."""

from __future__ import annotations

import shutil

import pytest

from pypers_spark.batch import Batch


@pytest.fixture
def example_task(tmp_path, sf_dir):
    src = "examples/training_data_pipeline/task.yml"
    dst = tmp_path / "curation"
    dst.mkdir()
    text = open(src).read().replace("/root/testdata/sf0.001", sf_dir)
    (dst / "task.yml").write_text(text)
    return dst


def test_curation_pipeline_end_to_end(example_task, spark):
    batch = Batch()
    batch.load(example_task)
    rc = batch.context(example_task)
    assert [s.id for s in rc.pipeline.stages] == [
        "ingest-documents", "exact-dedup", "quality-filter",
        "repetition-filter", "token-stats",
    ]
    data = rc.run()
    curated = data[1]["curated"]
    stats = data[1]["lang_stats"]
    n_docs = spark.read.parquet(f"{batch.task(example_task).resolve_path('data/1/curated.parquet')}").count()
    assert n_docs == curated.count() > 0
    assert {"n_tokens_ws", "n_tokens_bpeish", "quality"} <= set(curated.columns)
    # consumed intermediates are not persisted
    assert not (example_task / "data" / "1" / "docs.parquet").exists()
    assert not (example_task / "data" / "1" / "filtered.parquet").exists()
    assert not (example_task / "data" / "1" / "gated.parquet").exists()
    # repetition gates enforced
    assert curated.filter("dup_2gram_frac > 0.3 OR top_token_frac > 0.5").count() == 0
    # quality floor enforced
    assert curated.filter("quality < 0.5").count() == 0
    # rollup consistent with the corpus
    total = stats.groupBy().sum("n_docs").collect()[0][0]
    assert total == n_docs


def test_curation_is_one_catalyst_plan(example_task, spark):
    """The stages compose into ONE Catalyst plan over a single SOURCE:
    the repetition-metric aggregation branch re-scans the same file
    (columnar, pruned to doc_id/text) rather than caching — every
    FileScan in the plan reads the one source, and no scan reads
    columns the composed pipeline doesn't need."""
    batch = Batch()
    batch.load(example_task)
    rc = batch.context(example_task)
    data, _, _ = rc.pipeline.process(input_id=1, config=rc.config)
    explained = data["lang_stats"]._jdf.queryExecution().toString()
    n_scans = explained.count("FileScan")
    assert 1 <= n_scans <= 3
    assert explained.count("documents.parquet") >= n_scans  # all same source
    # column pruning: no scan reads columns the pipeline doesn't need
    read_schemas = [seg.split(">")[0] for seg in explained.split("ReadSchema: ")[1:]]
    assert read_schemas and all("n_chars" not in rs for rs in read_schemas)
    # no Python row UDFs anywhere in the composed pipeline
    assert "BatchEvalPython" not in explained