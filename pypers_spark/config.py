"""Hyperparameter configuration (SURVEY.md §2.A A1).

Behavioral parity with the reference ``repype.config.Config``
(reference: config.py:17): nested dicts addressed by ``/``-separated
path keys, ``get``/``pop``/``set_default``/``update``/``merge``/``copy``,
YAML rendering, and a SHA-1 digest over the canonical JSON form (the
digest is what drives task dirtiness checks).

Implementation is original; only the observable contract matches.
"""

from __future__ import annotations

import hashlib
import json
from typing import Any, Callable


def _plain(value: Any) -> Any:
    """Unwrap a Config to its dict entries; pass anything else through."""
    return value.entries if isinstance(value, Config) else value


class Config:
    """A nested hyperparameter mapping with ``/``-path key access.

    ``Config(d)`` wraps the dict ``d`` without copying; ``Config(other)``
    deep-copies another Config; ``Config()`` starts empty.
    """

    entries: dict

    def __init__(self, other: dict | Config | None = None):
        if other is None:
            self.entries = {}
        elif isinstance(other, dict):
            self.entries = other
        elif isinstance(other, Config):
            self.entries = json.loads(json.dumps(other.entries))
        else:
            raise ValueError(f"cannot build Config from {other!r}")

    # -- path-key plumbing ---------------------------------------------------

    def _descend(self, key: str, make: bool) -> tuple[Config, str]:
        """Walk all but the last path segment; return (leaf config, leaf key).

        With ``make=True`` missing intermediate namespaces are created,
        otherwise they appear as empty (and mutate nothing permanent).
        """
        node = self
        parts = key.split("/")
        for part in parts[:-1]:
            node = node.get(part, {}) if not make else node
            if make:
                node = node.set_default(part, {})
        return node, parts[-1]

    # -- accessors -----------------------------------------------------------

    def get(self, key: str, default: Any) -> Any:
        """Value of ``key``; sets and returns ``default`` when unset."""
        if "/" in key:
            node, leaf = self._descend(key, make=False)
            return node.get(leaf, default)
        if key not in self.entries:
            self.entries[key] = _plain(default)
        value = self.entries[key]
        return Config(value) if isinstance(value, dict) else value

    def pop(self, key: str, default: Any) -> Any:
        """Remove ``key`` and return its value (``default`` when unset)."""
        if "/" in key:
            node, leaf = self._descend(key, make=False)
            return node.pop(leaf, default)
        return self.entries.pop(key, default)

    def set_default(self, key: str, default: Any, override_none: bool = False) -> Any:
        """Set ``key`` to ``default`` unless already set; return the value.

        ``override_none=True`` treats an explicit ``None`` as unset.
        """
        if "/" in key:
            parts = key.split("/")
            node = self
            for part in parts[:-1]:
                node = node.set_default(part, {}, override_none)
            return node.set_default(parts[-1], default, override_none)
        if key not in self.entries or (override_none and self.entries[key] is None):
            self.entries[key] = _plain(default)
        return self[key]

    def update(self, key: str, func: Callable[[Any], Any]) -> Any:
        """Map the current value of ``key`` (``None`` when unset) to a new one."""
        if "/" in key:
            node, leaf = self._descend(key, make=False)
            return node.update(leaf, func)
        self.entries[key] = _plain(func(self.entries.get(key)))
        return self.entries[key]

    def merge(self, other: dict | Config) -> Config:
        """Deep-merge ``other`` into this config (other wins); returns self."""
        for key, value in _plain(other).items():
            if isinstance(value, dict):
                self.get(key, {}).merge(value)
            else:
                self.entries[key] = value
        return self

    def copy(self) -> Config:
        """Deep copy."""
        return Config(self)

    def __getitem__(self, key: str) -> Any:
        if "/" in key:
            node = self
            for part in key.split("/"):
                node = node[part]
            return node
        value = self.entries[key]
        return Config(value) if isinstance(value, dict) else value

    def __setitem__(self, key: str, value: Any) -> Config:
        self.update(key, lambda _prev: value)
        return self

    def __contains__(self, key: str) -> bool:
        try:
            self[key]
            return True
        except KeyError:
            return False

    # -- rendering + digest --------------------------------------------------

    @property
    def yaml(self) -> str:
        """YAML rendering (scalars via repr, two-space nesting)."""

        def lines(d: dict, depth: int):
            pad = "  " * depth
            for k, v in d.items():
                if isinstance(v, dict):
                    yield f"{pad}{k}:"
                    yield from lines(v, depth + 1)
                else:
                    yield f"{pad}{k}: {v!r}"

        return "\n".join(lines(self.entries, 0))

    @property
    def sha(self):
        """SHA-1 over canonical JSON — the dirtiness digest."""
        return hashlib.sha1(json.dumps(self.entries).encode("utf8"))

    def __str__(self) -> str:
        return json.dumps(self.entries, indent=2)

    def __repr__(self) -> str:
        return f"<{type(self).__name__}, {str(self.entries)}>"

    def __eq__(self, other: object) -> bool:
        return isinstance(other, Config) and str(self) == str(other)
