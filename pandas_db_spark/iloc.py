"""Positional access (``iloc``) — reference ``pandasdb/table.py:19-106`` and
``pandasdb/column.py:19-103`` (SQLite's implicit 1-based ``_rowid_``).

Spark DataFrames are unordered, so the ordinal is synthesized lazily and only
here (SURVEY.md §7 hard-part #1): ``plans.ordinal.with_ordinal`` numbers rows
distributed (per-partition window + broadcast offsets — no global sort, no
Python boundary).  Fetch is then an ordinal-predicate filter, which Spark
evaluates with a full scan but zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pandas_db_spark.plans.ordinal import ORDINAL_COL, with_ordinal


class IndexLoc:
    """``iloc[int | slice | list]`` with the reference's exact contract:
    negative indices, IndexError out-of-bounds, repeatable/unordered lists
    returned in requested order, TypeError otherwise."""

    def __init__(self, df: DataFrame, scalar: bool = False):
        self._df = df
        self._scalar = scalar  # single-column mode → return cells not tuples

    def _len(self) -> int:
        return self._df.count()

    def _resolve(self, idx: int, n: int) -> int:
        pos = idx + n if idx < 0 else idx
        if pos < 0 or pos >= n:
            raise IndexError(
                f"index {idx} is out of range for table with {n} rows"
            )
        return pos

    def _fetch(self, positions: list[int]) -> list:
        """Fetch the given 0-based ordinals, returned in ``positions`` order."""
        if not positions:
            return []
        odf = with_ordinal(self._df)
        unique = sorted(set(positions))
        rows = odf.filter(F.col(ORDINAL_COL).isin(unique)).collect()
        by_pos = {row[ORDINAL_COL]: row for row in rows}
        out = []
        for p in positions:
            row = by_pos[p]
            vals = tuple(row[c] for c in self._df.columns)
            out.append(vals[0] if self._scalar else vals)
        return out

    def __getitem__(self, item):
        if isinstance(item, int):
            n = self._len()
            return self._fetch([self._resolve(item, n)])[0]
        if isinstance(item, slice):
            n = self._len()
            return self._fetch(list(range(*item.indices(n))))
        if isinstance(item, list):
            n = self._len()
            return self._fetch([self._resolve(i, n) for i in item])
        raise TypeError(
            f"Index must be of type: int, list, or slice, not: {type(item).__name__}"
        )
