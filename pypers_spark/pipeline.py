"""Processing pipeline (SURVEY.md §2.A A3-A6).

Parity with the reference ``repype.pipeline`` (reference:
pipeline.py:133): ordered stages, ``process`` with
``first_stage``/``last_stage`` windows (including the ``stage+``
suffix), dependency-closure ``get_extra_stages``, topological
``create_pipeline`` with consume-conflict resolution, ``fields`` /
``persistent_fields``, scope-based path resolution, and AF_-factor
hyperparameter adaptation.

Spark-native shift: because stages transform lazy DataFrames, running
the full pipeline builds ONE composite Catalyst plan; `first_stage`
resume loads parent parquet checkpoints as fresh lazy scans (task.py),
so partial runs keep full pushdown below the resume point.
"""

from __future__ import annotations

import builtins
import pathlib
from typing import Any, Dict, FrozenSet, Iterable, List, Optional, Sequence, Tuple, Type

from pypers_spark.config import Config
from pypers_spark.stage import PipelineData, Stage


class ProcessingControl:
    """Tracks whether stage execution is inside the [first, last] window."""

    def __init__(self, first_stage: Optional[str] = None, last_stage: Optional[str] = None):
        self.started = first_stage is None
        self.first_stage = first_stage
        self.last_stage = last_stage

    def step(self, stage_id: str) -> bool:
        """True if ``stage_id`` falls inside the processing window."""
        if not self.started and stage_id == self.first_stage:
            self.started = True
        inside = self.started
        if stage_id == self.last_stage:
            self.started = False
        return inside


def create_config_entry(
    config: Config,
    key: str,
    factor: float,
    default_user_factor: float,
    type: Optional[Type] = None,
    min: Optional[float] = None,
    max: Optional[float] = None,
) -> None:
    """Create hyperparameter ``key`` as ``factor * AF_key`` unless set.

    ``AF_key`` is the sibling hyperparameter prefixed with ``AF_``
    (defaulting to ``default_user_factor``); optional type/min/max
    constraints post-process the value.
    """
    parts = key.split("/")
    af_key = "/".join(parts[:-1] + [f"AF_{parts[-1]}"])
    config.set_default(key, factor * config.get(af_key, default_user_factor), True)
    if type is not None:
        config.update(key, func=type)
    if min is not None:
        config.update(key, func=lambda v: builtins.max((v, min)))
    if max is not None:
        config.update(key, func=lambda v: builtins.min((v, max)))


class StageError(Exception):
    """Wraps a failure inside a stage run."""

    def __init__(self, stage: Stage):
        super().__init__(f"An error occured while executing the stage: {stage.id}")
        self.stage = stage


class Pipeline:
    """An ordered list of stages plus path-resolution scopes."""

    def __init__(
        self,
        stages: Iterable[Stage] = (),
        scopes: Dict[str, pathlib.Path] | None = None,
    ):
        self.stages: List[Stage] = list(stages)
        self.scopes: Dict[str, pathlib.Path] = dict(scopes or {})

    def process(
        self,
        input_id,
        config: Config,
        first_stage: Optional[str] = None,
        last_stage: Optional[str] = None,
        data: Optional[PipelineData] = None,
        status=None,
        **kwargs,
    ) -> Tuple[PipelineData, Config, Dict[str, float]]:
        """Run the stage window over the pipeline data object.

        ``first_stage`` may end with ``+`` meaning "the stage after".
        Stages outside the window whose outputs are needed (consumed
        fields, missing inputs) are pulled in via
        :meth:`get_extra_stages`. Returns ``(data, config, times)``.
        """
        config = config.copy()
        if self.stages and first_stage == self.stages[0].id:
            first_stage = None
        if first_stage is not None and first_stage.endswith("+"):
            base = self.find(first_stage[:-1], None)
            if base is None:
                raise ValueError(f'unknown stage id: "{first_stage[:-1]}"')
            if base + 1 >= len(self.stages):
                # "after the last stage" — nothing to run.
                return data, config, {}
            first_stage = self.stages[base + 1].id
        if (
            first_stage is not None
            and last_stage is not None
            and self.find(first_stage) > self.find(last_stage)
        ):
            return data, config, {}
        if first_stage is not None and first_stage != self.stages[0].id and data is None:
            raise ValueError('argument "data" must be provided if "first_stage" is used')

        if data is None:
            data = {}
        if input_id is not None:
            data["input_id"] = input_id

        extra_stages = self.get_extra_stages(first_stage, last_stage, data.keys())
        ctrl = ProcessingControl(first_stage, last_stage)
        times: Dict[str, float] = {}
        for stage in self.stages:
            stage_config = config.get(stage.id, {})
            if ctrl.step(stage.id) or stage.id in extra_stages:
                try:
                    dt = stage.run(
                        pipeline=self, input_id=input_id, data=data,
                        config=stage_config, status=status, **kwargs,
                    )
                except Exception as exc:
                    raise StageError(stage) from exc
                times[stage.id] = dt
            else:
                stage.skip(
                    pipeline=self, input_id=input_id, data=data,
                    config=stage_config, status=status, **kwargs,
                )
        return data, config, times

    def get_extra_stages(
        self,
        first_stage: Optional[str],
        last_stage: Optional[str],
        available_inputs: Iterable[str],
    ) -> List[str]:
        """Stages outside the window that must still run to satisfy inputs."""
        available = set(available_inputs) | {"input_id"}
        required: set = set()
        producer: Dict[str, Stage] = {}
        extra: List[str] = []
        ctrl = ProcessingControl(first_stage, last_stage)
        for stage in self.stages:
            for output in stage.outputs:
                producer[output] = stage
            if ctrl.step(stage.id):
                required |= set(stage.inputs)
                available |= set(stage.outputs)
        while True:
            missing = required - available
            if not missing:
                return extra
            stage = producer[next(iter(missing))]
            required |= set(stage.inputs)
            available |= set(stage.outputs)
            extra.append(stage.id)

    def find(self, stage_id: str, not_found_dummy: Any = float("inf")) -> Any:
        """Index of the stage with ``stage_id`` (or ``not_found_dummy``)."""
        for idx, stage in enumerate(self.stages):
            if stage.id == stage_id:
                return idx
        return not_found_dummy

    def stage(self, stage_id: str) -> Optional[Stage]:
        idx = self.find(stage_id, None)
        return self.stages[idx] if idx is not None else None

    def append(self, stage: Stage, after: Optional[str | int] = None) -> int:
        """Add a stage (optionally after a given stage id/index); returns its index."""
        for existing in self.stages:
            if existing is stage:
                raise RuntimeError(f'Stage "{stage.id}" already added')
            if existing.id == stage.id:
                raise RuntimeError(f'Stage with ID "{stage.id}" already added')
        if after is None:
            self.stages.append(stage)
            return len(self.stages) - 1
        if isinstance(after, str):
            after = self.find(after)
        assert -1 <= after < len(self.stages)
        self.stages.insert(after + 1, stage)
        return after + 1

    def configure(self, base_config: Config, input_id, *args, **kwargs) -> Config:
        """Apply every stage's AF_-factor adaptation rules to a config copy."""
        config = base_config.copy()
        for stage in self.stages:
            for key, spec in stage.configure(self, input_id, *args, **kwargs).items():
                assert len(spec) in (2, 3), (
                    f"{type(stage).__name__}.configure returned spec of length {len(spec)}"
                )
                extra = spec[2] if len(spec) == 3 else {}
                create_config_entry(config, f"{stage.id}/{key}", *spec[:2], **extra)
        return config

    def resolve(self, scope: str, input_id=None) -> Optional[pathlib.Path]:
        """Path for ``scope`` with ``input_id`` substituted, or None."""
        if input_id is None or scope not in self.scopes:
            return None
        return pathlib.Path(str(self.scopes[scope]) % input_id).resolve()

    @property
    def fields(self) -> FrozenSet[str]:
        """All fields the pipeline produces (incl. ``input_id``)."""
        out = {"input_id"}
        for stage in self.stages:
            out |= set(stage.outputs)
        return frozenset(out)

    @property
    def persistent_fields(self) -> FrozenSet[str]:
        """Produced fields minus consumed ones — what a task persists."""
        out = set(self.fields)
        for stage in self.stages:
            out -= set(stage.consumes)
        return frozenset(out)

    def __eq__(self, other: object) -> bool:
        return (
            isinstance(other, type(self))
            and self.stages == other.stages
            and self.scopes == other.scopes
        )


def create_pipeline(
    stages: Sequence[Stage],
    *args,
    pipeline_cls: Type[Pipeline] = Pipeline,
    **kwargs,
) -> Pipeline:
    """Build a pipeline with automatic topological stage ordering.

    A stage is schedulable once all its inputs are available; among the
    schedulable, a stage that consumes a field still required by another
    remaining stage is deferred (consume-conflict rule).
    """
    ids = [stage.id for stage in stages]
    assert len(ids) == len(set(ids)), "ambiguous stage identifiers"
    outputs = ["input_id"] + [o for stage in stages for o in stage.outputs]
    assert len(outputs) == len(set(outputs)), "ambiguous outputs"

    available = {"input_id"}
    remaining = list(stages)
    pipeline = pipeline_cls(*args, **kwargs)
    while remaining:
        chosen = None
        for cand in remaining:
            if not set(cand.inputs).issubset(available):
                continue
            consumes = set(getattr(cand, "consumes", ()))
            conflict = any(
                other is not cand and consumes and consumes.issubset(set(other.inputs))
                for other in remaining
            )
            if not conflict:
                chosen = cand
                break
        if chosen is None:
            raise RuntimeError(
                f"Failed to resolve total ordering (pipeline so far: {pipeline.stages}, "
                f"available input fields: {available}, remaining stages: {remaining})"
            )
        remaining.remove(chosen)
        pipeline.append(chosen)
        available |= set(getattr(chosen, "outputs", ()))
        available -= set(getattr(chosen, "consumes", ()))
    return pipeline
