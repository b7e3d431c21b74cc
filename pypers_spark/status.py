"""Hierarchical progress reporting (SURVEY.md §2.A A14).

Parity with the reference ``repype.status`` (reference: status.py:39):
each :class:`Status` owns a JSON file of status entries; child statuses
created via :meth:`Status.derive` are linked through ``expand`` markers
so a reader can reassemble the full nested progress tree; intermediate
entries are overwritten by the next update. :class:`StatusReader`
monitors the tree EVENT-DRIVEN like the reference (reference:
status.py:9-14 uses watchdog observers): every file of one status tree
lives in the root's directory, so a single Linux inotify watch (ctypes,
no third-party dependency) wakes the reader on each write; where
inotify is unavailable (non-Linux, network filesystems without event
support) it falls back to the original mtime polling, which works on
any shared filesystem a cluster driver writes to.
"""

from __future__ import annotations

import asyncio
import ctypes
import ctypes.util
import json
import os
import pathlib
import tempfile
import uuid
from typing import Any, Iterable, Iterator, Optional, Union


class Status:
    """A nested, file-backed progress reporter."""

    def __init__(self, parent: Optional["Status"] = None, path: Optional[str] = None):
        assert (parent is None) != (path is None), "exactly one of parent/path required"
        self.id = uuid.uuid4()
        self.parent = parent
        self.path = pathlib.Path(path) if path else None
        self.data: list = []
        self._intermediate: Optional[Status] = None

    @property
    def root(self) -> "Status":
        return self.parent.root if self.parent else self

    @property
    def filepath(self) -> pathlib.Path:
        return self.root.path / f"{self.id}.json"

    def update(self) -> None:
        """Flush current entries (plus a linked intermediate, if any) to disk."""
        data = self.data
        if self._intermediate is not None:
            data = data + [
                {"expand": str(self._intermediate.filepath), "content_type": "intermediate"}
            ]
        self.filepath.write_text(json.dumps(data))

    def derive(self) -> "Status":
        """Create a child status linked into this one via an expand marker."""
        self.intermediate(None)
        child = Status(parent=self)
        self.data.append({"expand": str(child.filepath)})
        child.update()
        self.update()
        return child

    def write(self, status: Union[str, dict, list]) -> None:
        """Append a permanent entry (clears any intermediate)."""
        self._intermediate = None
        self.data.append(status)
        self.update()

    def intermediate(self, status: Optional[Union[str, dict]] = None) -> None:
        """Set (or clear, with ``None``) the overwritable intermediate entry."""
        if status is None:
            self._intermediate = None
            self.update()
            return
        fresh = self._intermediate is None
        if fresh:
            self._intermediate = Status(parent=self)
        self._intermediate.data = [status]
        self._intermediate.update()
        if fresh:
            self.update()

    def progress(
        self,
        iterable: Iterable,
        iterations: Optional[int] = None,
        details: Optional[Union[str, dict]] = None,
    ) -> Iterator[Any]:
        """Yield items while reporting intermediate per-step progress."""
        total = len(iterable) if iterations is None else iterations  # type: ignore[arg-type]
        try:
            for step, item in enumerate(iterable):
                assert step < total
                self.intermediate(
                    {
                        "info": "progress",
                        "details": details,
                        "progress": step / total,
                        "step": step,
                        "max_steps": total,
                    }
                )
                yield item
        finally:
            self.intermediate(None)


def create():
    """Context manager yielding a Status rooted in a fresh temp directory."""

    class _Ctx:
        def __enter__(self) -> Status:
            self._dir = tempfile.TemporaryDirectory()
            return Status(path=self._dir.name)

        def __exit__(self, *exc) -> None:
            self._dir.cleanup()

    return _Ctx()


def update(status: Optional[Status], intermediate: bool = False, **kwargs) -> None:
    """Write ``kwargs`` as a status entry; no-op when ``status`` is None."""
    if status is None:
        return
    if intermediate:
        status.intermediate(kwargs)
    else:
        status.write(kwargs)


def derive(status: Optional[Status]) -> Optional[Status]:
    """Child of ``status``, or None when ``status`` is None."""
    return status.derive() if status is not None else None


def progress(status: Optional[Status], iterable: Iterable, **kwargs) -> Iterator[Any]:
    """Progress-reporting iteration; plain iteration when ``status`` is None."""
    if status is None:
        return iter(iterable)
    return status.progress(iterable, **kwargs)


def _expand(element: Any, seen: set) -> Any:
    """Recursively inline ``expand`` markers by reading the linked files."""
    if isinstance(element, dict) and "expand" in element:
        path = pathlib.Path(element["expand"])
        if str(path) in seen:
            return None
        seen.add(str(path))
        try:
            child = json.loads(path.read_text())
        except (OSError, json.JSONDecodeError):
            return None
        expanded = [_expand(item, seen) for item in child]
        if element.get("content_type") == "intermediate":
            # An intermediate link carries exactly one entry; surface it
            # marked so readers can tell it will be overwritten.
            inner = expanded[0] if expanded else None
            return {"content_type": "intermediate", "status": inner}
        return expanded
    return element


def load(filepath: pathlib.Path | str) -> list:
    """Read a status file and inline the full nested tree."""
    try:
        data = json.loads(pathlib.Path(filepath).read_text())
    except (OSError, json.JSONDecodeError):
        return []
    return [_expand(el, set()) for el in data]


def _flatten(data: list, prefix: tuple = ()) -> Iterator[tuple]:
    """Yield ``(positions, element)`` for every non-list node of the tree."""
    for idx, element in enumerate(data):
        pos = prefix + (idx,)
        if isinstance(element, list):
            yield from _flatten(element, pos)
        else:
            yield pos, element


class _DirWatcher:
    """Linux inotify watch over one directory (ctypes, stdlib-only).

    ``fd`` is a non-blocking inotify descriptor suitable for
    ``loop.add_reader``. Use :meth:`create`, which returns None when
    inotify is unavailable (non-Linux, restricted sandboxes) so callers
    can fall back to polling.
    """

    _IN_NONBLOCK = 0x800
    # IN_MODIFY | IN_CLOSE_WRITE | IN_MOVED_TO | IN_CREATE
    _MASK = 0x2 | 0x8 | 0x80 | 0x100

    def __init__(self, dirpath: pathlib.Path):
        libc_name = ctypes.util.find_library("c")
        if libc_name is None:
            raise OSError("no libc")
        self._libc = ctypes.CDLL(libc_name, use_errno=True)
        self.fd = self._libc.inotify_init1(self._IN_NONBLOCK)
        if self.fd < 0:
            raise OSError(ctypes.get_errno(), "inotify_init1 failed")
        wd = self._libc.inotify_add_watch(
            self.fd, str(dirpath).encode(), self._MASK
        )
        if wd < 0:
            err = ctypes.get_errno()
            os.close(self.fd)
            raise OSError(err, f"inotify_add_watch failed for {dirpath}")

    @classmethod
    def create(cls, dirpath: pathlib.Path) -> Optional["_DirWatcher"]:
        try:
            return cls(dirpath)
        except Exception:
            return None

    def drain(self) -> bool:
        """Consume queued events; True if any were pending."""
        any_events = False
        while True:
            try:
                if not os.read(self.fd, 65536):
                    break
                any_events = True
            except BlockingIOError:
                break
            except OSError:
                break
        return any_events

    def close(self) -> None:
        try:
            os.close(self.fd)
        except OSError:
            pass


class StatusReader:
    """Async monitor for a status-file tree.

    Watches the root status directory (every file of the tree lives
    there — ``Status.filepath`` roots all children in ``root.path``)
    with inotify and calls :meth:`handle_new_status` once per new or
    changed element — the same per-element protocol the reference
    reader exposes (reference: status.py:391, watchdog-based). Without
    inotify it degrades to mtime polling every ``delay`` seconds; with
    it, ``delay`` only bounds the safety-net re-check interval. Use as
    an async context manager.
    """

    def __init__(self, filepath: pathlib.Path | str, delay: float = 0.05, **kwargs):
        self.filepath = pathlib.Path(filepath)
        self.delay = delay
        self.data: list = []
        self._seen: dict = {}
        self._last_intermediate_pos: Optional[tuple] = None
        self._task: Optional[asyncio.Task] = None
        self._watcher: Optional[_DirWatcher] = None

    async def __aenter__(self) -> "StatusReader":
        # The watch must exist BEFORE the caller's next write: events
        # raised between entry and the first callback are queued on the
        # inotify fd, so nothing is lost to startup ordering. The
        # fd-ready callback drains and checks DIRECTLY on the event
        # loop (no wait_for between event and re-render — Python 3.11's
        # wait_for can also swallow task cancellation when it races a
        # timeout, so the watch path deliberately avoids it).
        self._watcher = _DirWatcher.create(self.filepath.parent)
        if self._watcher is not None:
            asyncio.get_running_loop().add_reader(
                self._watcher.fd, self._on_fs_event
            )
        self._check()
        self._task = asyncio.ensure_future(self._loop())
        return self

    def _on_fs_event(self) -> None:
        if self._watcher is not None:
            self._watcher.drain()
        self._check()

    async def __aexit__(self, *exc) -> None:
        if self._task is not None:
            self._task.cancel()
            try:
                await self._task
            except asyncio.CancelledError:
                pass
            self._task = None
        if self._watcher is not None:
            asyncio.get_running_loop().remove_reader(self._watcher.fd)
            self._watcher.close()
            self._watcher = None
        self._check()

    def _check(self) -> None:
        data = load(self.filepath)
        if data == self.data:
            return
        self.data = data
        intermediate_pos = None
        for pos, element in _flatten(data):
            is_intermediate = isinstance(element, dict) and element.get("content_type") == "intermediate"
            if is_intermediate:
                element = element.get("status")
                intermediate_pos = pos
                if element is None:
                    continue
            if self._seen.get(pos) != element or is_intermediate:
                if self._seen.get(pos) == element:
                    continue
                self._seen[pos] = element
                self.handle_new_status(list(pos), element, intermediate=is_intermediate)
        if self._last_intermediate_pos is not None and intermediate_pos is None:
            # The intermediate line was cleared — tell the handler.
            self.handle_new_status(list(self._last_intermediate_pos), None, intermediate=True)
            self._seen.pop(self._last_intermediate_pos, None)
        self._last_intermediate_pos = intermediate_pos

    async def _loop(self) -> None:
        # With inotify the callback does the real work and this loop is
        # only a safety net (e.g. a writer on another host over a
        # shared filesystem inotify can't see); without it, this IS the
        # mtime-polling reader.
        interval = self.delay if self._watcher is None else max(self.delay * 10, 0.5)
        while True:
            await asyncio.sleep(interval)
            self._check()

    def handle_new_status(self, positions: list, status, intermediate: bool) -> None:
        """Override to react to one status element (default: no-op)."""
