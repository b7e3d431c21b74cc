"""Incremental-resume parity matrix (reference tests/test_task.py:790-1006).

The reference pins find_first_diverging_stage / find_pickup_task with an
explicit scenario matrix — unchanged / removed / added / changed stage /
changed config, and every (task, ancestor) pickup combination over a
three-task chain. These tests mirror that matrix case-for-case against
digests written in the exact format Task.store produces, so resume
semantics cannot drift from the reference silently.
"""

from __future__ import annotations

import json

import pytest

from pypers_spark.config import Config
from pypers_spark.pipeline import create_pipeline
from pypers_spark.stage import Stage
from pypers_spark.task import Task


def make_stage(sid: str, inputs=(), outputs=()) -> Stage:
    cls = type(
        "S_" + sid.replace("-", "_"),
        (Stage,),
        {
            "id": sid,
            "inputs": tuple(inputs),
            "outputs": tuple(outputs),
            "process": lambda self, pipeline, config, status=None, **kw: {
                o: None for o in self.outputs
            },
        },
    )
    return cls()


def three_stage_pipeline():
    return create_pipeline(
        [
            make_stage("stage1", outputs=["output1.1"]),
            make_stage("stage2", inputs=["output1.1"], outputs=["output2.1", "output2.2"]),
            make_stage(
                "stage3",
                inputs=["output1.1", "output2.1", "output2.2"],
                outputs=["output3.1"],
            ),
        ]
    )


def write_digests(task: Task, pipeline, config: Config) -> None:
    """Exactly what Task.store persists for resume bookkeeping."""
    task.digest_sha_filepath.write_text(
        json.dumps(
            {
                "stages": {s.id: s.sha for s in pipeline.stages},
                "task": task.compute_sha(config),
            }
        )
    )
    task.digest_task_filepath.write_text(
        json.dumps(task.get_full_spec_with_config(config))
    )


# -- find_first_diverging_stage matrix ---------------------------------------


@pytest.fixture
def completed_task(tmp_path):
    task = Task(path=tmp_path, spec={"runnable": True})
    pipeline = three_stage_pipeline()
    config = task.create_config()
    write_digests(task, pipeline, config)
    return task, pipeline, config


def test_unchanged(completed_task):
    task, pipeline, config = completed_task
    assert task.find_first_diverging_stage(pipeline, config) is None
    # replacing a stage with an identically-defined one is no change
    pipeline.stages[1] = make_stage(
        "stage2", inputs=["output1.1"], outputs=["output2.1", "output2.2"]
    )
    assert task.find_first_diverging_stage(pipeline, config) is None


def test_removed_stage(completed_task):
    task, pipeline, config = completed_task
    pipeline.stages[1:] = pipeline.stages[2:]
    assert task.find_first_diverging_stage(pipeline, config) is None


def test_added_stage(completed_task):
    task, pipeline, config = completed_task
    pipeline.stages.append(
        make_stage("stage4", inputs=["output3.1"], outputs=["output4.1"])
    )
    assert (
        task.find_first_diverging_stage(pipeline, config) is pipeline.stages[3]
    )


def test_changed_stage(completed_task):
    task, pipeline, config = completed_task
    pipeline.stages[1] = make_stage(
        "stage2",
        inputs=["output1.1"],
        outputs=["output2.1", "output2.2", "output2.3"],
    )
    assert (
        task.find_first_diverging_stage(pipeline, config) is pipeline.stages[1]
    )


def test_changed_config(completed_task):
    task, pipeline, config = completed_task
    config["stage2/key"] = "value"
    assert (
        task.find_first_diverging_stage(pipeline, config) is pipeline.stages[1]
    )


# -- find_pickup_task matrix --------------------------------------------------


@pytest.fixture
def task_chain(tmp_path):
    """Three chained tasks (task N+1's parent is task N), no digests yet."""
    tasks: list[Task] = []
    for i in range(3):
        path = tmp_path / f"t{i}"
        path.mkdir()
        tasks.append(
            Task(path=path, spec={"runnable": True}, parent=tasks[-1] if tasks else None)
        )
    pipeline = three_stage_pipeline()
    configs = [task.create_config() for task in tasks]
    return tasks, pipeline, configs


def test_task1_nothing_to_pickup_from(task_chain):
    tasks, pipeline, configs = task_chain
    assert tasks[0].find_pickup_task(pipeline, configs[0]) == {
        "task": None,
        "first_diverging_stage": pipeline.stages[0],
    }


def test_task2_nothing_to_pickup_from(task_chain):
    tasks, pipeline, configs = task_chain
    configs[0]["stage1/key"] = "value1.1"
    write_digests(tasks[0], pipeline, configs[0])
    configs[1]["stage1/key"] = "value2.1"  # differs from the parent digest
    assert tasks[1].find_pickup_task(pipeline, configs[1]) == {
        "task": None,
        "first_diverging_stage": pipeline.stages[0],
    }


def test_task1_pickup_from_task1(task_chain):
    tasks, pipeline, configs = task_chain
    configs[0]["stage1/key"] = "value1.1"
    configs[0]["stage2/key"] = "value2.1"
    write_digests(tasks[0], pipeline, configs[0])
    configs[0]["stage2/key"] = "value2.2"
    assert tasks[0].find_pickup_task(pipeline, configs[0]) == {
        "task": tasks[0],
        "first_diverging_stage": pipeline.stages[1],
    }


def test_task1_pickup_from_task1_without_changes(task_chain):
    tasks, pipeline, configs = task_chain
    configs[0]["stage1/key"] = "value1.1"
    configs[0]["stage2/key"] = "value2.1"
    write_digests(tasks[0], pipeline, configs[0])
    assert tasks[0].find_pickup_task(pipeline, configs[0]) == {
        "task": tasks[0],
        "first_diverging_stage": None,
    }


def test_task2_pickup_from_task1(task_chain):
    tasks, pipeline, configs = task_chain
    configs[0]["stage1/key"] = "value1.1"
    write_digests(tasks[0], pipeline, configs[0])
    configs[1]["stage1/key"] = "value1.1"
    configs[1]["stage2/key"] = "value2.1"
    assert tasks[1].find_pickup_task(pipeline, configs[1]) == {
        "task": tasks[0],
        "first_diverging_stage": pipeline.stages[1],
    }


def test_task2_pickup_from_task1_without_changes(task_chain):
    tasks, pipeline, configs = task_chain
    configs[0]["stage1/key"] = "value1.1"
    write_digests(tasks[0], pipeline, configs[0])
    configs[1]["stage1/key"] = "value1.1"
    assert tasks[1].find_pickup_task(pipeline, configs[1]) == {
        "task": tasks[0],
        "first_diverging_stage": None,
    }


def test_task3_pickup_from_task1(task_chain):
    tasks, pipeline, configs = task_chain
    configs[0]["stage1/key"] = "value1.1"
    write_digests(tasks[0], pipeline, configs[0])
    configs[2]["stage1/key"] = "value1.1"
    configs[2]["stage2/key"] = "value2.1"
    assert tasks[2].find_pickup_task(pipeline, configs[2]) == {
        "task": tasks[0],
        "first_diverging_stage": pipeline.stages[1],
    }


def test_task3_pickup_from_task2(task_chain):
    tasks, pipeline, configs = task_chain
    configs[0]["stage1/key"] = "value1.1"
    configs[0]["stage2/key"] = "value2.1"
    configs[1]["stage1/key"] = "value1.2"
    configs[1]["stage2/key"] = "value2.2"
    write_digests(tasks[0], pipeline, configs[0])
    write_digests(tasks[1], pipeline, configs[1])
    configs[2]["stage1/key"] = "value1.2"
    configs[2]["stage2/key"] = "value2.3"
    assert tasks[2].find_pickup_task(pipeline, configs[2]) == {
        "task": tasks[1],
        "first_diverging_stage": pipeline.stages[1],
    }
