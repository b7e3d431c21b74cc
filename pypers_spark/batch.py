"""Batch execution over a task tree (SURVEY.md §2.A A13).

Parity with the reference ``repype.batch`` (reference: batch.py:132):
recursive ``task.yml`` discovery, task identity by path, ``contexts`` /
``pending`` run-context lists, an async ``run`` that executes pending
tasks in deterministic path order, and ``cancel``.

Spark-native shift: the reference forks one OS process per task to get
isolation and parallelism. Under Spark the parallelism belongs *inside*
the cluster — every task's jobs should get all executors — so tasks run
async-sequentially in-process against the shared SparkSession, and
cancellation goes through ``SparkContext.cancelAllJobs`` rather than a
process kill (reference: batch.py:309).
"""

from __future__ import annotations

import asyncio
import pathlib
import traceback
from typing import Dict, List, Optional, Type

import yaml

from pypers_spark import status as status_mod
from pypers_spark.config import Config
from pypers_spark.pipeline import Pipeline, StageError
from pypers_spark.task import Task, TaskData


class RunContext:
    """The pipeline + config a runnable task will run with."""

    def __init__(self, task: Task):
        assert task.runnable
        self.task = task
        self.pipeline: Pipeline = task.create_pipeline()
        self.config: Config = task.create_config()
        self.pending: str = task.is_pending(self.pipeline, self.config)

    def run(self, *args, **kwargs) -> TaskData:
        return self.task.run(self.config, *args, pipeline=self.pipeline, **kwargs)

    def __eq__(self, other: object) -> bool:
        return (
            isinstance(other, type(self))
            and self.task == other.task
            and self.pipeline == other.pipeline
            and self.config == other.config
            and self.pending == other.pending
        )

    def __repr__(self) -> str:
        return f'<{type(self).__name__} "{self.task.path}">'


class Batch:
    """Tasks discovered from a directory tree, keyed by path."""

    def __init__(self, task_cls: Type[Task] = Task):
        self.tasks: Dict[pathlib.Path, Task] = {}
        self.task_cls = task_cls
        self._running: Optional[asyncio.Task] = None
        self._running_set: set = set()
        self._cancelled = False

    @property
    def resolved_tasks(self) -> Dict[pathlib.Path, Task]:
        return {task.path.resolve(): task for task in self.tasks.values()}

    def task(self, path, spec: Optional[dict] = None) -> Optional[Task]:
        """Load (or return the already-loaded) task at ``path``.

        The spec comes from the ``spec`` argument or the directory's
        ``task.yml``; parent tasks are attached by directory nesting.
        """
        assert path is not None
        path = pathlib.Path(path)
        task = self.resolved_tasks.get(path.resolve())
        if spec is None:
            spec_filepath = path / "task.yml"
            if not spec_filepath.is_file():
                return task
            with spec_filepath.open("r") as fh:
                spec = yaml.safe_load(fh)
        if task is None:
            parent = self.task(path.parent) if path.parent else None
            task = self.task_cls(path=path, spec=spec, parent=parent)
            assert path not in self.tasks
            self.tasks[path] = task
            return task
        assert task.spec == spec, (
            f"{path}: spec {spec} does not match previously loaded {task.spec}"
        )
        return task

    def load(self, root_path) -> None:
        """Discover every ``task.yml`` under ``root_path`` (recursively)."""
        root_path = pathlib.Path(root_path)
        assert root_path.is_dir()
        for spec_path in sorted(root_path.glob("**/task.yml")):
            self.task(spec_path.parent)

    @property
    def contexts(self) -> List[RunContext]:
        return [RunContext(task) for task in self.tasks.values() if task.runnable]

    @property
    def pending(self) -> List[RunContext]:
        return [rc for rc in self.contexts if rc.pending]

    def context(self, path) -> Optional[RunContext]:
        # Resolve the task first, then build ONE RunContext — going
        # through self.contexts would construct pipeline+config for
        # every runnable task per lookup (the CLI dry-run listing calls
        # this once per listed task, which would be quadratic).
        target = pathlib.Path(path).resolve()
        for task in self.tasks.values():
            if task.runnable and task.path.resolve() == target:
                return RunContext(task)
        return None

    async def run(
        self,
        contexts: Optional[List[RunContext]] = None,
        status=None,
        fail_fast: bool = True,
        max_concurrency: int = 1,
    ) -> bool:
        """Run the pending tasks (deterministic path order).

        Returns True if every task completed. A task error records an
        ``error`` status entry (with traceback and failing stage).

        ``fail_fast=True`` (the default, matching the reference: its
        Batch.run stops and returns False on the first task error —
        reference batch.py:293-301; its one-process-per-task design is
        about clean per-task memory, not continue-on-error) stops the
        batch at the first failure.

        ``fail_fast=False`` is an extension for long unattended sweeps:
        the batch continues with the remaining tasks, but DESCENDANTS of
        a failed task are skipped (recorded as ``skipped`` status
        entries) — they would pick up the failed parent's missing or
        stale outputs and cascade. Cancellation always stops the batch.

        ``max_concurrency > 1`` runs up to that many INDEPENDENT tasks
        at once against the shared SparkSession — the Spark-native
        answer to the reference's one-OS-process-per-task parallelism
        (reference batch.py:132): each task's jobs are submitted from
        its own thread under its own FAIR scheduler pool
        (``spark.scheduler.pool`` local property), so the cluster
        scheduler time-slices executors between concurrent tasks
        instead of the OS time-slicing processes. Ancestor/descendant
        tasks are still serialized (a child must observe its parent's
        outputs), each task keeps its own derived status file, and
        fail_fast stops NEW tasks after the first failure (in-flight
        tasks drain).
        """
        self._cancelled = False
        contexts = self.pending if contexts is None else contexts
        contexts = sorted(contexts, key=lambda rc: rc.task.path.resolve())
        if max_concurrency > 1:
            return await self._run_concurrent(
                contexts, status, fail_fast, max_concurrency
            )
        n_failed = 0
        failed_paths: list = []
        for rc_idx, rc in enumerate(contexts):
            if self._cancelled:
                return False
            rc_path = rc.task.path.resolve()
            failed_anc = next(
                (p for p in failed_paths if p == rc_path or p in rc_path.parents), None
            )
            if failed_anc is not None:
                status_mod.update(
                    status,
                    info="skipped",
                    task=str(rc_path),
                    reason=f"ancestor task failed: {failed_anc}",
                )
                n_failed += 1
                continue
            task_status = status_mod.derive(status)
            status_mod.update(
                task_status,
                info="enter",
                task=str(rc.task.path.resolve()),
                step=rc_idx,
                step_count=len(contexts),
            )
            try:
                # To a thread so the event loop (status readers, UIs)
                # stays responsive while Spark jobs run. The active
                # SparkSession is thread-local — re-activate it in the
                # worker thread so stages see the same session.
                def _run_in_thread(rc=rc, task_status=task_status):
                    from pypers_spark.session import current_session

                    spark = current_session()
                    try:
                        spark.sparkContext.setLocalProperty(
                            "spark.jobGroup.id", str(rc.task.path)
                        )
                    except Exception:
                        pass
                    try:
                        return rc.run(status=task_status)
                    finally:
                        # to_thread reuses worker threads — clear the
                        # attribution so later work from this thread
                        # doesn't inherit a stale job group.
                        try:
                            spark.sparkContext.setLocalProperty(
                                "spark.jobGroup.id", None
                            )
                        except Exception:
                            pass

                self._running = asyncio.ensure_future(asyncio.to_thread(_run_in_thread))
                await self._running
            except asyncio.CancelledError:
                status_mod.update(
                    status,
                    info="interrupted",
                    task=str(rc.task.path.resolve()),
                    traceback=traceback.format_exc(),
                    stage=None,
                )
                return False
            except Exception as exc:
                status_mod.update(
                    status,
                    info="error",
                    task=str(rc.task.path.resolve()),
                    traceback=traceback.format_exc(),
                    stage=exc.stage.id if isinstance(exc, StageError) else None,
                )
                if fail_fast:
                    return False
                n_failed += 1
                failed_paths.append(rc.task.path.resolve())
            finally:
                self._running = None
        return n_failed == 0

    async def _run_concurrent(
        self,
        contexts: List[RunContext],
        status,
        fail_fast: bool,
        max_concurrency: int,
    ) -> bool:
        """Scheduler-shared parallel run (see ``run``'s docstring).

        Every context gets a coroutine; a semaphore bounds how many hold
        a run slot. Before taking a slot a task awaits the completion
        events of its in-run ancestors (path-prefix relation), so
        parent->child ordering is preserved without a global barrier,
        and failure of an ancestor converts the descendant into the same
        ``skipped`` status entry the sequential path records.
        """
        sem = asyncio.Semaphore(max_concurrency)
        paths = [rc.task.path.resolve() for rc in contexts]
        done = {p: asyncio.Event() for p in paths}
        results: Dict[pathlib.Path, bool] = {}
        state = {"failed": False}

        async def run_one(rc_idx: int, rc: RunContext) -> None:
            rc_path = rc.task.path.resolve()
            ok = False
            try:
                ancestors = [p for p in paths if p in rc_path.parents]
                for p in ancestors:
                    await done[p].wait()
                failed_anc = next(
                    (p for p in ancestors if results.get(p) is False), None
                )
                if failed_anc is not None:
                    status_mod.update(
                        status,
                        info="skipped",
                        task=str(rc_path),
                        reason=f"ancestor task failed: {failed_anc}",
                    )
                    return
                async with sem:
                    if self._cancelled or (state["failed"] and fail_fast):
                        status_mod.update(
                            status,
                            info="skipped",
                            task=str(rc_path),
                            reason="batch stopped",
                        )
                        return
                    task_status = status_mod.derive(status)
                    status_mod.update(
                        task_status,
                        info="enter",
                        task=str(rc_path),
                        step=rc_idx,
                        step_count=len(contexts),
                    )

                    def _run_in_thread(rc=rc, rc_idx=rc_idx, task_status=task_status):
                        from pypers_spark.session import current_session

                        spark = current_session()
                        try:
                            # Per-task FAIR pool: concurrent tasks'
                            # jobs share executors by scheduler
                            # weight instead of queueing FIFO behind
                            # each other. Thread-pool threads are
                            # reused, so set (never inherit) both
                            # properties at entry and clear at exit.
                            spark.sparkContext.setLocalProperty(
                                "spark.scheduler.pool", f"batch-{rc_idx}"
                            )
                            spark.sparkContext.setLocalProperty(
                                "spark.jobGroup.id", str(rc.task.path)
                            )
                        except Exception:
                            pass
                        try:
                            return rc.run(status=task_status)
                        finally:
                            # Clear BOTH properties: to_thread reuses
                            # worker threads, and a stale jobGroup.id
                            # would mis-attribute (and expose to
                            # collateral cancelJobGroup) later work
                            # submitted from the same thread.
                            for prop in (
                                "spark.scheduler.pool",
                                "spark.jobGroup.id",
                            ):
                                try:
                                    spark.sparkContext.setLocalProperty(
                                        prop, None
                                    )
                                except Exception:
                                    pass

                    fut = asyncio.ensure_future(asyncio.to_thread(_run_in_thread))
                    self._running_set.add(fut)
                    try:
                        await fut
                    finally:
                        self._running_set.discard(fut)
                    ok = True
            except asyncio.CancelledError:
                status_mod.update(
                    status,
                    info="interrupted",
                    task=str(rc_path),
                    traceback=traceback.format_exc(),
                    stage=None,
                )
            except Exception as exc:
                status_mod.update(
                    status,
                    info="error",
                    task=str(rc_path),
                    traceback=traceback.format_exc(),
                    stage=exc.stage.id if isinstance(exc, StageError) else None,
                )
            finally:
                results[rc_path] = ok
                if not ok:
                    state["failed"] = True
                done[rc_path].set()

        futures = [
            asyncio.ensure_future(run_one(i, rc)) for i, rc in enumerate(contexts)
        ]
        try:
            await asyncio.gather(*futures, return_exceptions=True)
        finally:
            self._running_set.clear()
        return not self._cancelled and all(results.get(p, False) for p in paths)

    async def cancel(self) -> None:
        """Cancel the currently running task(s) (if any)."""
        self._cancelled = True
        pending = [f for f in ([self._running] + list(self._running_set)) if f]
        if pending:
            from pyspark.sql import SparkSession

            spark = SparkSession.getActiveSession()
            if spark is not None:
                spark.sparkContext.cancelAllJobs()
            for f in pending:
                f.cancel()
