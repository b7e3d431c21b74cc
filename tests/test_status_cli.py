"""Status, StatusReader, Benchmark, and CLI tests (parity behaviors from
reference tests/test_status.py, test_benchmark.py, test_cli.py)."""

from __future__ import annotations

import asyncio
import json

import yaml

from pypers_spark import status as status_mod
from pypers_spark.benchmark import Benchmark
from pypers_spark.cli import StatusReaderConsoleAdapter, format_hms, run_cli_ex


# -- status -------------------------------------------------------------------


def test_status_write_and_file():
    with status_mod.create() as status:
        status.write("Hello, World!")
        assert json.loads(status.filepath.read_text()) == ["Hello, World!"]


def test_status_derive_nesting():
    with status_mod.create() as status:
        child = status.derive()
        child.write("inner")
        status_mod.update(status, info="outer")
        data = status_mod.load(status.filepath)
        assert data == [["inner"], {"info": "outer"}]


def test_status_intermediate_is_overwritten():
    with status_mod.create() as status:
        status.intermediate({"info": "working"})
        data = status_mod.load(status.filepath)
        assert data[-1] == {"content_type": "intermediate", "status": {"info": "working"}}
        status.write("done")
        data = status_mod.load(status.filepath)
        assert data == ["done"]


def test_status_progress_iterator():
    with status_mod.create() as status:
        seen = list(status.progress([10, 20, 30]))
        assert seen == [10, 20, 30]
        # After exhaustion the intermediate is cleared.
        assert status_mod.load(status.filepath) == []


def test_status_none_shortcuts():
    status_mod.update(None, info="x")
    assert status_mod.derive(None) is None
    assert list(status_mod.progress(None, [1, 2])) == [1, 2]


def test_status_reader_receives_elements():
    events = []

    class Reader(status_mod.StatusReader):
        def handle_new_status(self, positions, status, intermediate):
            events.append((tuple(positions), status, intermediate))

    async def scenario():
        with status_mod.create() as status:
            async with Reader(status.filepath, delay=0.01):
                status.write("one")
                child = status.derive()
                child.write({"info": "nested"})
                status.intermediate({"info": "temp"})
                await asyncio.sleep(0.1)
                status.write("two")
                await asyncio.sleep(0.1)

    asyncio.run(scenario())
    payloads = [e[1] for e in events]
    assert "one" in payloads
    assert {"info": "nested"} in payloads
    assert {"info": "temp"} in payloads
    assert "two" in payloads
    nested_pos = next(e[0] for e in events if e[1] == {"info": "nested"})
    assert len(nested_pos) == 2  # nested one level deep


# -- benchmark ----------------------------------------------------------------


def test_benchmark_roundtrip(tmp_path):
    fp = tmp_path / "times.csv"
    b = Benchmark(fp)
    b["stage1", "input-1"] = 10.0
    b.save()
    b2 = Benchmark(fp)
    assert b2["stage1", "input-1"] == 10.0
    assert b == b2


def test_benchmark_retain(tmp_path):
    b = Benchmark(tmp_path / "t.csv")
    b["s1", "a"] = 1.0
    b["s2", "a"] = 2.0
    b["s1", "b"] = 3.0
    b.retain(["s1"], ["a"])
    assert list(b.df.index) == ["s1"]
    assert list(b.df.columns) == ["a"]


# -- cli ----------------------------------------------------------------------


def test_format_hms():
    assert format_hms(62) == "01:02"
    assert format_hms(3723) == "1:02:03"


def _write_task(path, sf_dir, runnable=True):
    path.mkdir(parents=True, exist_ok=True)
    (path / "task.yml").write_text(
        yaml.safe_dump(
            {
                "runnable": runnable,
                "input_ids": [1],
                "pipeline": [
                    "tests.test_task_batch.ScanDocs",
                    "tests.test_task_batch.CountChars",
                    "tests.test_task_batch.Summarize",
                ],
                "config": {"scan-docs": {"path": f"{sf_dir}/documents.parquet"}},
            }
        )
    )


def test_cli_dry_run_lists_tasks(tmp_path, sf_dir, capsys):
    _write_task(tmp_path / "jobs" / "t1", sf_dir)
    ok = run_cli_ex(tmp_path / "jobs", run=False)
    out = capsys.readouterr().out
    assert ok
    assert "1 task(s) selected for running" in out
    assert "DRY RUN" in out
    assert "t1 (incomplete)" in out


def test_cli_run_executes_tasks(tmp_path, sf_dir, spark, capsys):
    _write_task(tmp_path / "jobs" / "t1", sf_dir)
    ok = run_cli_ex(tmp_path / "jobs", run=True)
    out = capsys.readouterr().out
    assert ok
    assert "Entering task" in out
    assert "Results have been stored" in out
    assert (tmp_path / "jobs" / "t1" / ".sha.json").is_file()
    # Second invocation: nothing pending.
    ok = run_cli_ex(tmp_path / "jobs", run=True)
    out = capsys.readouterr().out
    assert ok and "0 task(s) selected for running" in out


def test_cli_task_selection(tmp_path, sf_dir, capsys):
    _write_task(tmp_path / "jobs" / "t1", sf_dir)
    _write_task(tmp_path / "jobs" / "t2", sf_dir)
    ok = run_cli_ex(tmp_path / "jobs", run=False, tasks=[tmp_path / "jobs" / "t1"])
    out = capsys.readouterr().out
    assert ok and "1 task(s) selected for running" in out


def test_cli_task_dir_selection(tmp_path, sf_dir, capsys):
    _write_task(tmp_path / "jobs" / "grp" / "t1", sf_dir)
    _write_task(tmp_path / "jobs" / "grp" / "t2", sf_dir)
    _write_task(tmp_path / "jobs" / "other", sf_dir)
    ok = run_cli_ex(tmp_path / "jobs", run=False, task_dirs=[tmp_path / "jobs" / "grp"])
    out = capsys.readouterr().out
    assert ok and "2 task(s) selected for running" in out


def test_dir_watcher_fires_on_write(tmp_path):
    """inotify watcher (Linux): events arrive for writes in the dir."""
    from pypers_spark.status import _DirWatcher

    w = _DirWatcher.create(tmp_path)
    if w is None:
        import pytest

        pytest.skip("inotify unavailable on this platform")
    try:
        assert not w.drain()
        (tmp_path / "x.json").write_text("[]")
        import time

        time.sleep(0.05)
        assert w.drain()
    finally:
        w.close()


def test_status_reader_event_driven_low_latency(tmp_path):
    """Reader observes a write well inside one polling delay when
    event-driven (delay=5s would make a polling reader miss it)."""
    import asyncio
    import time

    from pypers_spark import status as status_mod

    async def scenario():
        seen = []

        class Reader(status_mod.StatusReader):
            def handle_new_status(self, positions, status, intermediate):
                seen.append((time.monotonic(), status))

        with status_mod.create() as status:
            reader = Reader(status.filepath, delay=5.0)
            async with reader:
                await asyncio.sleep(0.1)
                t0 = time.monotonic()
                status.write({"info": "ping"})
                for _ in range(100):
                    if any(s == {"info": "ping"} for _, s in seen):
                        break
                    await asyncio.sleep(0.02)
                lat = next(t for t, s in seen if s == {"info": "ping"}) - t0
                return lat

    from pypers_spark.status import _DirWatcher

    if _DirWatcher.create(tmp_path) is None:
        import pytest

        pytest.skip("inotify unavailable on this platform")
    latency = asyncio.run(scenario())
    assert latency < 1.0  # event-driven, not the 5 s polling delay


# -- Status.progress edge matrix (reference test_status.py:180-289) -----------


def test_status_progress_break_clears_intermediate():
    """Leaving the loop early (break) must still clear the intermediate —
    the reference guarantees this via the generator's finally block."""
    with status_mod.create() as status:
        for item in status.progress(range(3)):
            data = status_mod.load(status.filepath)
            assert data[-1]["status"]["info"] == "progress"
            break
        assert status_mod.load(status.filepath) == []


def test_status_progress_empty_iterable():
    with status_mod.create() as status:
        items = list(status.progress([]))
        assert items == []
        assert status_mod.load(status.filepath) == []


def test_status_progress_generator_with_iterations():
    """Generators have no len(); the explicit iterations count is used."""

    def gen():
        return
        yield  # pragma: no cover

    with status_mod.create() as status:
        assert list(status.progress(gen(), iterations=0)) == []
        assert status_mod.load(status.filepath) == []


def test_status_progress_iterations_overrun_raises():
    """More items than the declared iterations is an AssertionError, and
    the intermediate is still cleared on the way out."""
    import pytest

    with status_mod.create() as status:
        with pytest.raises(AssertionError):
            for _ in status.progress(range(3), iterations=2):
                pass
        assert status_mod.load(status.filepath) == []


def test_status_progress_error_in_loop_clears_intermediate():
    class Boom(Exception):
        pass

    import pytest

    with status_mod.create() as status:
        with pytest.raises(Boom):
            for item in status.progress(range(3)):
                raise Boom()
        assert status_mod.load(status.filepath) == []


def test_status_progress_reports_fields():
    """Per-step payload carries info/details/progress/step/max_steps with
    progress = step/total (reference test_status.py:143-176)."""
    with status_mod.create() as status:
        for idx, item in enumerate(status.progress(range(3), details="details")):
            data = status_mod.load(status.filepath)
            assert data[-1]["status"] == {
                "info": "progress",
                "details": "details",
                "progress": idx / 3,
                "step": idx,
                "max_steps": 3,
            }
            assert item == idx
