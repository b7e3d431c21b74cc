"""Stage×input run-time bookkeeping (SURVEY.md §2.A A15).

Parity with the reference ``repype.benchmark.Benchmark`` (reference:
benchmark.py:21): a stage-by-input DataFrame of values persisted as
CSV, with ``[stage, input]`` get/set, ``retain`` filtering, and
``save``.
"""

from __future__ import annotations

import pathlib
from typing import Generic, Iterable, Tuple, TypeVar

import pandas as pd

ValueType = TypeVar("ValueType")


class Benchmark(Generic[ValueType]):
    """Stage×input benchmark matrix backed by a CSV file."""

    def __init__(self, filepath):
        self.filepath = pathlib.Path(filepath)
        self.df = (
            pd.read_csv(self.filepath, index_col=0) if self.filepath.is_file() else pd.DataFrame()
        )

    def set(self, other: "Benchmark") -> "Benchmark":
        """Adopt another benchmark's data (copied); returns self."""
        self.df = other.df.copy()
        return self

    def __getitem__(self, where: Tuple[str, object]) -> ValueType:
        # Input-id columns are keyed as strings throughout: the CSV
        # roundtrip stringifies column labels, and mixing int/str keys
        # would fork duplicate columns and silently drop inherited
        # times on pickup resume.
        stage_id, input_id = where
        return self.df.at[stage_id, str(input_id)]

    def __setitem__(self, where: Tuple[str, object], value: ValueType) -> "Benchmark":
        stage_id, input_id = where
        self.df.at[stage_id, str(input_id)] = value
        return self

    def retain(self, stage_ids: Iterable[str], input_ids: Iterable) -> "Benchmark":
        """Drop rows/columns outside the given stages/inputs (order kept)."""
        self.df.columns = [str(c) for c in self.df.columns]
        keep_stages = frozenset(stage_ids) & frozenset(self.df.index)
        keep_inputs = frozenset(str(i) for i in input_ids) & frozenset(self.df.columns)
        rows = sorted(keep_stages, key=self.df.index.get_loc)
        cols = sorted(keep_inputs, key=self.df.columns.get_loc)
        self.df = self.df.loc[rows, cols]
        return self

    def save(self) -> None:
        self.df.to_csv(self.filepath)

    def __eq__(self, other: object) -> bool:
        return isinstance(other, Benchmark) and self.df.equals(other.df)
