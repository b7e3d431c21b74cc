"""Headless watch console (pypers_spark/watch.py) — scenarios mirror
the reference Textual TUI tests (reference: tests/textual/test_batch.py
toggle/add/edit/delete/reset/run scenarios, tests/textual/test_run.py
success/two-tasks/cancel)."""

from __future__ import annotations

import asyncio
import io

import pytest
import yaml

from pypers_spark.watch import WatchApp, find_root_tasks, find_sub_tasks


def make_app(root, inp: str = "") -> WatchApp:
    return WatchApp(root, input_stream=io.StringIO(inp), output_stream=io.StringIO())


def out_of(app: WatchApp) -> str:
    return app.out.getvalue()


@pytest.fixture
def batch_dir(tmp_path, sf_dir):
    spec = {
        "runnable": True,
        "input_ids": [1],
        "pipeline": [
            "tests.test_task_batch.ScanDocs",
            "tests.test_task_batch.CountChars",
        ],
        "config": {"scan-docs": {"path": f"{sf_dir}/documents.parquet"}},
    }
    (tmp_path / "task1").mkdir()
    (tmp_path / "task1" / "task.yml").write_text(yaml.safe_dump(spec))
    (tmp_path / "task1" / "sub").mkdir()
    (tmp_path / "task1" / "sub" / "task.yml").write_text(
        yaml.safe_dump({"config": {"count-chars": {"min_chars": 100}}})
    )
    return tmp_path


def test_tree_lists_roots_and_subtasks(batch_dir):
    app = make_app(batch_dir)
    roots = list(find_root_tasks(app.batch))
    subs = list(find_sub_tasks(app.batch))
    assert [t.path.name for t in roots] == ["task1"]
    assert [t.path.name for t in subs] == ["sub"]
    app.render_tree()
    text = out_of(app)
    assert "task1" in text and "sub" in text
    assert "pending" in text  # runnable + never run
    assert "0 queued / 2 pending" in text


def test_toggle_task_queues_and_unqueues(batch_dir):
    app = make_app(batch_dir)
    app.action_toggle_task("task1")
    assert len(app.queued) == 1
    app.action_toggle_task("task1")
    assert app.queued == []
    app.action_toggle_task("no/such/task")
    assert "No such task" in out_of(app)


def test_add_task_creates_spec_and_appears_in_tree(batch_dir):
    app = make_app(batch_dir)
    app.action_add_task("task1", "extra", {"config": {"count-chars": {"min_chars": 5}}})
    assert (batch_dir / "task1" / "extra" / "task.yml").is_file()
    assert any(t.path.name == "extra" for t in find_sub_tasks(app.batch))
    # duplicate name is refused
    app.action_add_task("task1", "extra", {})
    assert "Already exists" in out_of(app)


def test_edit_task_rewrites_spec(batch_dir):
    app = make_app(batch_dir)
    app.action_edit_task("task1/sub", {"config": {"count-chars": {"min_chars": 7}}})
    spec = yaml.safe_load((batch_dir / "task1" / "sub" / "task.yml").read_text())
    assert spec["config"]["count-chars"]["min_chars"] == 7


def test_yaml_body_parse_error_is_reported_not_raised(batch_dir):
    app = make_app(batch_dir, inp="config: [unclosed\n.\n")
    assert app._read_yaml_body() is None
    assert "Invalid task spec" in out_of(app)


def test_delete_task_confirmed(batch_dir):
    app = make_app(batch_dir, inp="y\n")
    app.action_delete_task("task1/sub")
    assert not (batch_dir / "task1" / "sub").exists()
    assert not any(t.path.name == "sub" for t in find_sub_tasks(app.batch))


def test_delete_task_declined_keeps_directory(batch_dir):
    app = make_app(batch_dir, inp="n\n")
    app.action_delete_task("task1/sub")
    assert (batch_dir / "task1" / "sub").exists()
    assert "Aborted" in out_of(app)


def test_run_completes_tasks_and_reports_count(batch_dir, spark):
    app = make_app(batch_dir)
    n = asyncio.run(app.action_run())
    assert n == 2  # task1 + task1/sub
    text = out_of(app)
    assert "2 task(s) completed" in text
    assert "Entering task" in text  # live status lines were rendered
    assert not app.batch.pending


def test_run_only_queued_tasks(batch_dir, spark):
    app = make_app(batch_dir)
    app.action_toggle_task("task1")
    n = asyncio.run(app.action_run())
    assert n == 1
    assert len(app.batch.pending) == 1  # sub still pending


def test_reset_task_confirmed_makes_it_pending_again(batch_dir, spark):
    app = make_app(batch_dir)
    asyncio.run(app.action_run())
    assert not app.batch.pending
    app2 = make_app(batch_dir, inp="y\n")
    app2.action_reset_task("task1/sub")
    assert len(app2.batch.pending) == 1


def test_repl_end_to_end_run_and_quit(batch_dir, spark):
    app = make_app(batch_dir, inp="t\nr\nq\n")
    asyncio.run(app.repl())
    text = out_of(app)
    assert "Loaded tasks" in text
    assert "2 task(s) completed" in text
    assert "Bye." in text


def test_repl_cancel_during_run(batch_dir, spark):
    """`c` while a run is active cancels the batch (RunScreen ctrl-c)."""
    import pypers_spark.batch as batch_mod

    class SlowIO(io.StringIO):
        """Feeds `r`, then `c` after the run has started."""

        def __init__(self, app_holder):
            super().__init__()
            self.app_holder = app_holder
            self.lines = iter(["r\n"])
            self.sent_cancel = False

        def readline(self):
            try:
                return next(self.lines)
            except StopIteration:
                pass
            if not self.sent_cancel:
                self.sent_cancel = True
                import time

                # wait for the run future to exist, then cancel
                for _ in range(600):
                    if self.app_holder and self.app_holder[0]._run_task is not None:
                        break
                    time.sleep(0.05)
                return "c\n"
            return ""

    holder = []
    app = WatchApp(
        batch_dir, input_stream=SlowIO(holder), output_stream=io.StringIO()
    )
    holder.append(app)
    asyncio.run(app.repl())
    text = out_of(app)
    # either the cancel landed mid-run (interrupted) or the run finished
    # first (completed) — both leave the repl cleanly
    assert "Bye." in text
