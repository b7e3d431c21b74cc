"""Headless interactive watch console (SURVEY.md §2.A A16 extension).

Parity surface for the reference Textual TUI (reference:
repype/textual/app.py:1 Repype app, batch.py:52 BatchScreen with the
a/e/d/r/R/x bindings, run.py:82 RunScreen with live progress and
ctrl-c cancel, editor.py:1 EditorScreen, confirm.py:1 confirm dialog),
re-expressed as a line-oriented console app: the same actions, driven
by command words instead of key bindings, rendering the task tree and
live run status to any text stream. No curses/textual dependency — it
works over ssh, inside CI logs, and under plain pytest.

Commands (1:1 with the reference bindings):

    t            show the task tree + summary        (BatchScreen tree)
    x <path>     queue/unqueue a pending task        (binding ``x``)
    a <parent> <name>   add a sub-task; the spec body is read as YAML
                 lines terminated by a single ``.``  (binding ``a``)
    e <path>     edit a task's spec, same YAML input (binding ``e``)
    d <path>     delete task + sub-tasks, confirmed  (binding ``d``)
    R <path>     reset a task, confirmed             (binding ``R``)
    r            run queued (or all pending) tasks   (binding ``r``)
    c            cancel the active run               (RunScreen ctrl-c)
    q            quit

All state-changing actions are also plain methods (``action_*``) so
tests drive them directly, mirroring the reference's
tests/textual/test_batch.py scenarios.
"""

from __future__ import annotations

import asyncio
import pathlib
import shutil
import sys
from typing import Iterator, List, Optional, TextIO, Type

import yaml

from pypers_spark import status as status_mod
from pypers_spark.batch import Batch
from pypers_spark.task import Task


def find_root_tasks(batch: Batch) -> Iterator[Task]:
    """Root tasks of the batch (reference: textual/batch.py:29)."""
    for task in batch.tasks.values():
        if task.parent is None:
            yield task


def find_sub_tasks(batch: Batch) -> Iterator[Task]:
    """Non-root tasks, parents before children (reference: textual/batch.py:41)."""
    tasks = sorted(
        (task for task in batch.tasks.values() if task.parent),
        key=lambda task: len(str(task.path)),
    )
    yield from tasks


class WatchApp:
    """Line-oriented task manager + run watcher over a batch directory."""

    def __init__(
        self,
        path,
        task_cls: Type[Task] = Task,
        input_stream: Optional[TextIO] = None,
        output_stream: Optional[TextIO] = None,
    ):
        self.path = pathlib.Path(path).resolve()
        self.task_cls = task_cls
        self.inp = input_stream if input_stream is not None else sys.stdin
        self.out = output_stream if output_stream is not None else sys.stdout
        self.batch = Batch(task_cls)
        self.batch.load(self.path)
        self.queued: List[pathlib.Path] = []
        self._run_task: Optional[asyncio.Task] = None
        self.success_count = 0

    # -- plumbing -------------------------------------------------------------

    def print(self, text: str = "") -> None:
        print(text, file=self.out)

    def _readline(self) -> Optional[str]:
        """One input line without the newline; None at EOF."""
        line = self.inp.readline()
        if line == "":
            return None
        return line.rstrip("\n")

    def _read_yaml_body(self) -> Optional[dict]:
        """Read YAML lines up to a lone ``.``; None on parse error
        (mirrors the editor screen's save-error handling — report,
        don't crash; reference: textual/editor.py:150)."""
        lines: List[str] = []
        while True:
            line = self._readline()
            if line is None or line.strip() == ".":
                break
            lines.append(line)
        try:
            spec = yaml.safe_load("\n".join(lines)) or {}
            if not isinstance(spec, dict):
                raise ValueError("task spec must be a YAML mapping")
            return spec
        except Exception as exc:
            self.print(f"🔴 Invalid task spec: {exc}")
            return None

    def _resolve(self, token: str) -> Optional[Task]:
        """A task by absolute path, path relative to the root, or name."""
        candidates = [
            pathlib.Path(token),
            self.path / token,
        ]
        for task in self.batch.tasks.values():
            for cand in candidates:
                try:
                    if task.path.resolve() == cand.resolve():
                        return task
                except OSError:
                    continue
        return None

    def reload(self) -> None:
        """Reload the task tree (reference: textual/batch.py:113) and
        drop completed/vanished tasks from the queue."""
        self.batch.tasks.clear()
        self.batch.load(self.path)
        pending = {rc.task.path.resolve() for rc in self.batch.pending}
        self.queued = [p for p in self.queued if p in pending]

    def confirm(self, prompt: str, default: str = "no") -> bool:
        """y/n confirmation (reference: textual/confirm.py:1)."""
        self.print(f"{prompt} [y/n, default {default}]")
        answer = (self._readline() or "").strip().lower()
        if not answer:
            answer = default
        return answer in ("y", "yes")

    # -- rendering ------------------------------------------------------------

    def task_label(self, task: Task) -> str:
        parts = [str(task.path)]
        if not task.runnable:
            parts.append("(not runnable)")
        else:
            rc = self.batch.context(task.path)
            if rc is not None and rc.pending:
                parts.append(f"[pending: {rc.pending}]")
            else:
                parts.append("[completed]")
        if task.path.resolve() in self.queued:
            parts.append("[queued]")
        return " ".join(parts)

    def render_tree(self) -> None:
        """Task tree + summary (reference: textual/batch.py:113,138)."""
        self.print("Loaded tasks")
        for task in find_root_tasks(self.batch):
            self.print(f"{'  ' * 1}- {self.task_label(task)}")
            for sub in find_sub_tasks(self.batch):
                if sub.root is task:
                    depth = 1 + len(list(sub.parents))
                    self.print(f"{'  ' * depth}- {self.task_label(sub)}")
        self.print(
            f"Tasks: {len(self.queued)} queued / {len(self.batch.pending)} pending"
        )

    # -- actions (1:1 with the reference BatchScreen bindings) ----------------

    def action_toggle_task(self, token: str) -> None:
        """Queue/unqueue a pending task (reference: textual/batch.py:248)."""
        task = self._resolve(token)
        if task is None:
            self.print(f"No such task: {token}")
            return
        p = task.path.resolve()
        if p in self.queued:
            self.queued.remove(p)
            self.print(f"Unqueued: {p}")
            return
        if not task.runnable or not any(
            rc.task.path.resolve() == p for rc in self.batch.pending
        ):
            # completed / non-runnable tasks cannot be queued
            self.print(f"Not pending, cannot queue: {p}")
            return
        self.queued.append(p)
        self.print(f"Queued: {p}")

    def action_add_task(self, parent_token: str, name: str, spec: Optional[dict]) -> None:
        """Create a sub-task under a parent (reference: textual/batch.py:161)."""
        parent = self._resolve(parent_token)
        if parent is None:
            self.print(f"No such task: {parent_token}")
            return
        if spec is None:
            return  # parse error already reported
        target = parent.path / name
        if target.exists():
            self.print(f"🔴 Already exists: {target}")
            return
        target.mkdir(parents=True)
        (target / "task.yml").write_text(yaml.safe_dump(spec))
        self.reload()
        self.print(f"Created: {target}")

    def action_edit_task(self, token: str, spec: Optional[dict]) -> None:
        """Replace a task's spec (reference: textual/batch.py:174)."""
        task = self._resolve(token)
        if task is None:
            self.print(f"No such task: {token}")
            return
        if spec is None:
            return
        (task.path / "task.yml").write_text(yaml.safe_dump(spec))
        self.reload()
        self.print(f"Saved: {task.path / 'task.yml'}")

    def action_delete_task(self, token: str) -> None:
        """Delete a task directory + sub-tasks (reference: textual/batch.py:186)."""
        task = self._resolve(token)
        if task is None:
            self.print(f"No such task: {token}")
            return
        if not self.confirm(
            f"Delete the task and all sub-tasks?\n{task.path}", default="no"
        ):
            self.print("Aborted.")
            return
        shutil.rmtree(task.path)
        self.reload()
        self.print(f"Deleted: {task.path}")

    def action_reset_task(self, token: str) -> None:
        """Reset a task (reference: textual/batch.py:221)."""
        task = self._resolve(token)
        if task is None:
            self.print(f"No such task: {token}")
            return
        if not self.confirm(f"Reset the task?\n{task.path}", default="no"):
            self.print("Aborted.")
            return
        task.reset()
        self.reload()
        self.print(f"Reset: {task.path}")

    async def action_run(self) -> int:
        """Run the queued (or all pending) tasks with live console
        status; returns the success count (reference: textual/run.py:82
        RunScreen — same contract as its dismiss result)."""
        from pypers_spark.cli import StatusReaderConsoleAdapter

        self.reload()
        if self.queued:
            contexts = [
                rc
                for rc in self.batch.pending
                if rc.task.path.resolve() in self.queued
            ]
        else:
            contexts = self.batch.pending
        if not contexts:
            self.print("No pending tasks to run.")
            return 0
        self.print(f"Running {len(contexts)} task(s)...")
        before = {rc.task.path.resolve() for rc in contexts}

        class _Reader(StatusReaderConsoleAdapter):
            def handle_new_status(reader, positions, status, intermediate):  # noqa: N805
                # permanent lines only: a watch log must replay cleanly
                if not intermediate:
                    self.print(reader.full_format(positions, status, intermediate))

        with status_mod.create() as status:
            reader = _Reader(status.filepath, batch=self.batch)
            async with reader:
                self._run_task = asyncio.ensure_future(
                    self.batch.run(contexts, status=status)
                )
                try:
                    await self._run_task
                finally:
                    self._run_task = None
        self.reload()
        still_pending = {rc.task.path.resolve() for rc in self.batch.pending}
        self.success_count = len(before - still_pending)
        self.print(f"{self.success_count} task(s) completed")
        return self.success_count

    async def action_cancel(self) -> None:
        """Cancel the active run (reference: textual/run.py ctrl-c)."""
        if self._run_task is not None:
            await self.batch.cancel()
            self.print("Cancelling...")

    # -- repl -----------------------------------------------------------------

    async def repl(self) -> None:
        """Read commands until ``q``/EOF. While a run is active, input
        is still consumed so ``c`` can cancel it (the RunScreen's
        close-while-running scenario)."""
        self.render_tree()
        eof = False
        while not eof:
            line = await asyncio.to_thread(self._readline)
            if line is None:
                break
            if not line.strip():
                continue
            cmd, *args = line.split()
            if cmd == "q":
                break
            elif cmd == "t":
                self.reload()
                self.render_tree()
            elif cmd == "x" and args:
                self.action_toggle_task(args[0])
            elif cmd == "a" and len(args) >= 2:
                self.action_add_task(args[0], args[1], self._read_yaml_body())
            elif cmd == "e" and args:
                self.action_edit_task(args[0], self._read_yaml_body())
            elif cmd == "d" and args:
                self.action_delete_task(args[0])
            elif cmd == "R" and args:
                self.action_reset_task(args[0])
            elif cmd == "r":
                run = asyncio.ensure_future(self.action_run())
                while not run.done():
                    if eof:
                        await run
                        break
                    nxt = await asyncio.to_thread(self._readline)
                    if nxt is None:
                        eof = True  # EOF — let the run finish, then exit
                        continue
                    if nxt.strip() == "c":
                        await self.action_cancel()
                await run
            elif cmd == "c":
                await self.action_cancel()
            else:
                self.print(f"Unknown command: {line}")
        self.print("Bye.")


def run_watch(path, task_cls: Type[Task] = Task, **streams) -> None:
    """Entry point for ``python -m pypers_spark <path> --watch``."""
    asyncio.run(WatchApp(path, task_cls, **streams).repl())
