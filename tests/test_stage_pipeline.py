"""Stage + Pipeline unit tests (parity behaviors from reference
tests/test_stage.py and tests/test_pipeline.py), exercised with plain
values AND lazy DataFrames as pipeline fields."""

from __future__ import annotations

import pytest

from pypers_spark.config import Config
from pypers_spark.pipeline import (
    Pipeline,
    ProcessingControl,
    StageError,
    create_config_entry,
    create_pipeline,
)
from pypers_spark.stage import Stage, suggest_stage_id


# -- helpers ------------------------------------------------------------------


class Alpha(Stage):
    outputs = ("a",)

    def process(self, pipeline, config, status=None, **inputs):
        return {"a": config.get("value", 1)}


class Beta(Stage):
    inputs = ("a",)
    outputs = ("b",)

    def process(self, pipeline, config, status=None, a=None, **inputs):
        return {"b": a * 2}


class GammaConsumer(Stage):
    consumes = ("a",)
    inputs = ("b",)
    outputs = ("c",)

    def process(self, pipeline, config, status=None, a=None, b=None, **inputs):
        return {"c": a + b}


def make_pipeline():
    return create_pipeline([GammaConsumer(), Beta(), Alpha()])


# -- suggest_stage_id ---------------------------------------------------------


def test_suggest_stage_id():
    assert suggest_stage_id("TheGreatMapperStage") == "the-great-mapper"
    assert suggest_stage_id("TheGreat123PCMapper") == "the-great-123-pc-mapper"
    assert suggest_stage_id("Alpha") == "alpha"
    with pytest.raises(AssertionError):
        suggest_stage_id("_")


# -- ordering -----------------------------------------------------------------


def test_create_pipeline_topological_order():
    p = make_pipeline()
    assert [s.id for s in p.stages] == ["alpha", "beta", "gamma-consumer"]


def test_create_pipeline_rejects_ambiguous_outputs():
    class Dup(Stage):
        id = "dup"
        outputs = ("a",)

        def process(self, pipeline, config, status=None, **inputs):
            return {"a": 0}

    with pytest.raises(AssertionError):
        create_pipeline([Alpha(), Dup()])


def test_create_pipeline_unresolvable():
    class NeedsMissing(Stage):
        inputs = ("nope",)
        outputs = ("x",)

        def process(self, pipeline, config, status=None, **inputs):
            return {"x": 0}

    with pytest.raises(RuntimeError):
        create_pipeline([NeedsMissing()])


# -- processing ---------------------------------------------------------------


def test_process_end_to_end_and_consume():
    p = make_pipeline()
    data, config, times = p.process(input_id=7, config=Config())
    assert data["input_id"] == 7
    assert data["b"] == 2
    assert data["c"] == 3
    assert "a" not in data  # consumed
    assert set(times) == {"alpha", "beta", "gamma-consumer"}


def test_process_respects_config_namespaces():
    p = make_pipeline()
    data, _, _ = p.process(input_id=0, config=Config({"alpha": {"value": 10}}))
    assert data["b"] == 20


def test_process_disabled_stage_is_skipped():
    p = create_pipeline([Alpha()])
    data, _, times = p.process(input_id=0, config=Config({"alpha": {"enabled": False}}))
    assert "a" not in data
    assert times["alpha"] == 0.0


def test_first_stage_requires_data():
    p = make_pipeline()
    with pytest.raises(ValueError):
        p.process(input_id=0, config=Config(), first_stage="beta")


def test_first_stage_resume_with_data():
    p = make_pipeline()
    data, _, times = p.process(
        input_id=0, config=Config(), first_stage="beta", data={"a": 5}
    )
    assert data["b"] == 10
    assert "alpha" not in times


def test_first_stage_plus_suffix():
    p = make_pipeline()
    data, _, times = p.process(
        input_id=0, config=Config(), first_stage="alpha+", data={"a": 5}
    )
    assert "alpha" not in times and "beta" in times


def test_first_after_last_noop():
    p = make_pipeline()
    data, _, times = p.process(
        input_id=0, config=Config(), first_stage="beta", last_stage="alpha", data={"a": 1}
    )
    assert times == {}


def test_extra_stages_closure():
    p = make_pipeline()
    # gamma needs a (consumed) and b; running only gamma pulls alpha+beta in.
    extra = p.get_extra_stages(first_stage="gamma-consumer", last_stage=None, available_inputs=[])
    assert set(extra) == {"alpha", "beta"}


def test_stage_error_wrapping():
    class Boom(Stage):
        outputs = ("x",)

        def process(self, pipeline, config, status=None, **inputs):
            raise RuntimeError("inner")

    p = create_pipeline([Boom()])
    with pytest.raises(StageError) as err:
        p.process(input_id=0, config=Config())
    assert err.value.stage.id == "boom"


def test_processing_control():
    ctrl = ProcessingControl(first_stage="b", last_stage="c")
    assert [ctrl.step(s) for s in "abcd"] == [False, True, True, False]


# -- callbacks / events -------------------------------------------------------


def test_stage_callbacks():
    events = []
    stage = Alpha()
    stage.add_callback("after", lambda stage, event, **kw: events.append(event))
    p = create_pipeline([stage])
    p.process(input_id=0, config=Config())
    assert events == ["end"]
    events.clear()
    p.process(input_id=0, config=Config({"alpha": {"enabled": False}}))
    assert events == ["skip"]


# -- fields -------------------------------------------------------------------


def test_fields_and_persistent_fields():
    p = make_pipeline()
    assert p.fields == frozenset({"input_id", "a", "b", "c"})
    assert p.persistent_fields == frozenset({"input_id", "b", "c"})


# -- sha ----------------------------------------------------------------------


def test_stage_sha_changes_with_implementation():
    class V1(Stage):
        id = "v"
        outputs = ("x",)

        def process(self, pipeline, config, status=None, **inputs):
            return {"x": 1}

    class V2(Stage):
        id = "v"
        outputs = ("x",)

        def process(self, pipeline, config, status=None, **inputs):
            return {"x": 2}

    assert V1().sha == V1().sha
    assert V1().sha != V2().sha


# -- AF_ hyperparameter factors ----------------------------------------------


def test_create_config_entry_defaults_and_constraints():
    c = Config()
    create_config_entry(c, "s/key", factor=10, default_user_factor=2)
    assert c["s/key"] == 20
    c2 = Config({"s": {"AF_key": 3}})
    create_config_entry(c2, "s/key", factor=10, default_user_factor=2)
    assert c2["s/key"] == 30
    c3 = Config()
    create_config_entry(c3, "s/key", 10, 2, type=int, min=5, max=15)
    assert c3["s/key"] == 15


def test_pipeline_configure_applies_stage_rules():
    class Tuned(Stage):
        outputs = ("t",)

        def process(self, pipeline, config, status=None, **inputs):
            return {"t": config["gain"]}

        def configure(self, pipeline, input_id, *args, **kwargs):
            return {"gain": [2.0, 1.0]}

    p = create_pipeline([Tuned()])
    config = p.configure(Config(), input_id=0)
    assert config["tuned/gain"] == 2.0
    data, _, _ = p.process(input_id=0, config=config)
    assert data["t"] == 2.0


# -- DataFrame fields compose into one lazy plan ------------------------------


def test_stages_compose_lazy_dataframe_plan(spark, sf_dir):
    from pyspark.sql import functions as F

    class Scan(Stage):
        outputs = ("li",)

        def process(self, pipeline, config, status=None, **inputs):
            return {"li": spark.read.parquet(f"{sf_dir}/lineitem.parquet")}

    class Filter(Stage):
        inputs = ("li",)
        outputs = ("filtered",)

        def process(self, pipeline, config, status=None, li=None, **inputs):
            return {"filtered": li.filter(F.col("l_quantity") < 10)}

    class Project(Stage):
        inputs = ("filtered",)
        outputs = ("result",)

        def process(self, pipeline, config, status=None, filtered=None, **inputs):
            return {"result": filtered.select("l_orderkey", "l_quantity")}

    p = create_pipeline([Project(), Scan(), Filter()])
    data, _, _ = p.process(input_id=0, config=Config())
    # The filter written in stage 3 must reach the scan from stage 2:
    # cross-stage Catalyst optimization through the composed plan.
    explained = data["result"]._jdf.queryExecution().toString()
    assert "LessThan(l_quantity" in explained, explained
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in explained
    assert data["result"].count() > 0


def test_pipeline_append_after():
    p = create_pipeline([Alpha(), Beta()])
    class Mid(Stage):
        inputs = ("a",)
        outputs = ("m",)
        def process(self, pipeline, config, status=None, a=None, **inputs):
            return {"m": a}
    idx = p.append(Mid(), after="alpha")
    assert idx == 1
    assert [s.id for s in p.stages] == ["alpha", "mid", "beta"]
    with pytest.raises(RuntimeError):
        p.append(Mid())  # duplicate id


def test_remove_callback():
    events = []
    cb = lambda stage, event, **kw: events.append(event)
    stage = Alpha()
    stage.add_callback("after", cb)
    stage.remove_callback("after", cb)
    p = create_pipeline([stage])
    p.process(input_id=0, config=Config())
    assert events == []


def test_signature_tracks_dict_values_and_set_order():
    class WithDict(Stage):
        id = "wd"
        outputs = ("x",)
        thresholds = {"a": 1}

        def process(self, pipeline, config, status=None, **inputs):
            return {"x": 0}

    class WithDict2(WithDict):
        id = "wd"
        thresholds = {"a": 2}

    assert WithDict().sha != WithDict2().sha  # dict VALUES must count

    class WithSet(Stage):
        id = "ws"
        outputs = ("x",)
        tags = {"zeta", "alpha", "mid"}

        def process(self, pipeline, config, status=None, **inputs):
            return {"x": 0}

    assert WithSet().sha == WithSet().sha


def test_first_stage_plus_on_last_stage_is_noop():
    p = make_pipeline()
    data, _, times = p.process(
        input_id=0, config=Config(), first_stage="gamma-consumer+", data={"c": 1}
    )
    assert times == {}


def test_first_stage_plus_unknown_raises():
    p = make_pipeline()
    with pytest.raises(ValueError):
        p.process(input_id=0, config=Config(), first_stage="nope+", data={})
