"""Command-line interface for batch processing (SURVEY.md §2.A A16).

Parity with the reference ``repype.cli`` (reference: cli.py:263):
``path`` + ``--run`` / ``--reset`` / ``--task`` / ``--task-dir``
argument surface, dry-run task listing with pending reasons, and a
console status renderer with nesting indentation, intermediate-line
overwrites, and progress bars.
"""

from __future__ import annotations

import asyncio
import json
import os
import pathlib
import time
from typing import List, Optional, Type

from pypers_spark import status as status_mod
from pypers_spark.batch import Batch
from pypers_spark.task import Task


def format_hms(seconds: float) -> str:
    """``h:mm:ss`` (or ``mm:ss`` under an hour)."""
    seconds = round(seconds)
    h, m, s = seconds // 3600, (seconds % 3600) // 60, seconds % 60
    base = f"{m:02d}:{s:02d}"
    return base if h == 0 else f"{h:d}:{base}"


class StatusReaderConsoleAdapter(status_mod.StatusReader):
    """Renders status updates as indented console lines.

    Intermediate updates redraw in place (carriage return); permanent
    updates print a line. Indentation follows the nesting depth; a blank
    line separates blocks at different depths. Set
    ``PYPERS_CLI_INTERMEDIATE=0`` to mute intermediate updates.
    """

    progress_bar_length = 20

    def __init__(self, *args, indent: int = 2, batch: Optional[Batch] = None, **kwargs):
        self.indent = indent
        self.batch = batch
        self.margin: Optional[str] = None
        self._carry = 0  # length of the intermediate line to overwrite
        # Initialized here: a progress status can be first OBSERVED at
        # step > 0 (the poller may miss step 0), and the ETA branch must
        # not crash the reader task on a missing attribute.
        self._progress_t0 = time.time()
        super().__init__(*args, **kwargs)

    def clear_line(self, line: str) -> str:
        line = line.replace("\n", " ")
        return line + " " * max(0, self._carry - len(line))

    def handle_new_status(self, positions: List[int], status, intermediate: bool) -> None:
        if intermediate:
            if not bool(json.loads(os.environ.get("PYPERS_CLI_INTERMEDIATE", "1"))):
                return
            text = self.clear_line("") if status is None else self.full_format(
                positions, status, intermediate=True
            )
            lines = text.split("\n")
            if len(lines) > 1:
                print("\n".join(lines[:-1]))
            print(lines[-1], end="\r")
            self._carry = len(lines[-1])
        else:
            print(self.full_format(positions, status, intermediate=False))
            self._carry = 0

    def full_format(self, positions: List[int], status, intermediate: bool) -> str:
        text = str(self.format(positions, status, intermediate))
        margin = " " * self.indent * (len(positions) - 1)
        if self.margin is not None and margin != self.margin and text.split("\n")[0].strip():
            text = "\n" + text
        self.margin = margin
        lines = [margin + line for line in text.split("\n")]
        lines[0] = self.clear_line(lines[0])
        return "\n".join(lines)

    def format_dry_run_task(self, task_path: str) -> str:
        rc = self.batch.context(task_path) if self.batch else None
        suffix = f" ({rc.pending})" if rc is not None and rc.pending else ""
        return f"- {task_path}{suffix}"

    def format(self, positions: List[int], status, intermediate: bool):
        """One status element → display text (see reference cli.py:162)."""
        if not isinstance(status, dict):
            return status
        info = status.get("info")
        if info == "batch":
            text = f'\n{len(status["batch"])} task(s) selected for running'
            if not status["run"]:
                text += '\nDRY RUN: use "--run" to run the tasks instead'
                if status["batch"]:
                    text += "\n\nSelected tasks:\n" + "\n".join(
                        self.format_dry_run_task(p) for p in status["batch"]
                    )
            return text
        if info == "enter":
            return f'\n({status["step"] + 1}/{status["step_count"]}) Entering task: {status["task"]}'
        if info == "start":
            if status.get("pickup") or status.get("first_stage"):
                return f'Picking up from: {status["pickup"]} ({status["first_stage"] or "copy"})'
            return "Starting from scratch"
        if info == "process":
            return f'({status["step"] + 1}/{status["step_count"]}) Processing: {status["input_id"]}'
        if info == "start-stage":
            return f'Running stage: {status["stage"]}'
        if info == "storing":
            return "Storing results..."
        if info == "completed":
            return "Results have been stored ✅"
        if info == "error":
            parts = ["\n🔴 An error occurred while processing"]
            if status.get("stage") is not None:
                parts.append(f'the stage "{status["stage"]}" of')
            parts.append(f'the task {status["task"]}:\n')
            return " ".join(parts) + "-" * 80 + "\n" + status["traceback"] + "-" * 80
        if info == "interrupted":
            return "🔴 Batch run interrupted"
        if info == "progress":
            step, max_steps = status.get("step"), status.get("max_steps")
            if step == 0:
                self._progress_t0 = time.time()
                eta = ""
            else:
                speed = (time.time() - self._progress_t0) / step
                eta = ", ETA: " + format_hms(speed * (max_steps - step))
            bar = (self.progress_bar_length * step // max_steps) * "="
            bar += (self.progress_bar_length - len(bar)) * " "
            text = f"[{bar}] {100 * step / max_steps:.1f}% ({step} / {max_steps}{eta})"
            if details := status.get("details"):
                text = f"{details} {text}"
            return text
        return status


def main(
    path,
    run: bool = False,
    reset: bool = False,
    tasks: List = (),
    task_dirs: List = (),
    task_cls: Type[Task] = Task,
    status_reader_cls: Type[status_mod.StatusReader] = StatusReaderConsoleAdapter,
):
    """Build the batch-processing coroutine (see reference cli.py:301)."""
    assert not (run and reset), "Cannot run and reset at the same time"
    path = pathlib.Path(path).resolve()
    batch = Batch(task_cls)
    batch.load(path)

    if tasks or task_dirs:
        tasks = [pathlib.Path(p).resolve() for p in tasks]
        task_dirs = [pathlib.Path(p).resolve() for p in task_dirs]
        contexts = [
            rc
            for rc in (batch.contexts if reset else batch.pending)
            if rc.task.path in tasks
            or rc.task.path in task_dirs
            or any(d in rc.task.path.parents for d in task_dirs)
        ]
    else:
        contexts = batch.pending

    async def _main() -> bool:
        if reset:
            print(f"\n{len(contexts)} task(s) selected:")
            print("\n".join(f"- {rc.task.path}" for rc in contexts))
            confirm = input(
                "\nReset the selected tasks? Enter the number of selected tasks to confirm: "
            )
            try:
                if int(confirm) == len(contexts):
                    for rc in contexts:
                        rc.task.reset()
                    return True
            except ValueError:
                pass
            print("Aborted.")
            return False

        with status_mod.create() as status:
            status_mod.update(
                status,
                info="batch",
                batch=[str(rc.task.path.resolve()) for rc in contexts],
                run=run,
            )
            reader = status_reader_cls(status.filepath, batch=batch)
            async with reader:
                if run:
                    return await batch.run(contexts, status=status)
                return True

    return _main


def run_cli_ex(*args, **kwargs) -> bool:
    """Run the CLI with options given explicitly; returns success."""
    return asyncio.run(main(*args, **kwargs)())


def run_cli(
    task_cls: Type[Task] = Task,
    status_reader_cls: Type[status_mod.StatusReader] = StatusReaderConsoleAdapter,
) -> bool:
    """Parse argv and run the CLI; returns success."""
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("path", help="Root directory for batch processing.")
    parser.add_argument(
        "--task", help="Run only the given task.", type=str, default=[], action="append"
    )
    parser.add_argument(
        "--task-dir",
        help="Run only the given task and those from its sub-directories.",
        type=str,
        default=[],
        action="append",
    )
    op_mode = parser.add_mutually_exclusive_group()
    op_mode.add_argument("--run", help="Run the selected tasks.", action="store_true")
    op_mode.add_argument("--reset", help="Reset the selected tasks.", action="store_true")
    op_mode.add_argument(
        "--watch",
        help="Interactive console mode: task tree, queueing, live run "
        "progress, cancel (headless counterpart of the reference's "
        "Textual TUI).",
        action="store_true",
    )
    args = parser.parse_args()
    if args.watch:
        from pypers_spark.watch import run_watch

        run_watch(args.path, task_cls)
        return True
    return run_cli_ex(
        args.path, args.run, args.reset, args.task, args.task_dir, task_cls, status_reader_cls
    )
