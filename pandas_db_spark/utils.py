"""Small utilities mirroring reference ``pandasdb/utils.py`` behaviors."""

from __future__ import annotations

from typing import Iterable, Iterator


def rename_duplicate_cols(names: list[str]) -> list[str]:
    """``a, b, a → a, b, a_2`` — positional duplicate renaming applied to raw
    SQL results (reference ``utils.py:177-197``, tested
    ``tests/test_utils.py:152-161``)."""
    seen: dict[str, int] = {}
    out: list[str] = []
    for name in names:
        if name in seen:
            seen[name] += 1
            out.append(f"{name}_{seen[name]}")
        else:
            seen[name] = 1
            out.append(name)
    return out


def concat(*items, sep: str = " ") -> Iterator[str]:
    """Zip-concatenate strings/iterables-of-strings with a separator
    (reference ``utils.py:127-152`` — string concatenation, *not* relational
    union).  Scalars are broadcast against iterables."""
    iterables: list[Iterable[str] | None] = []
    scalars: list[tuple[int, str]] = []
    for i, item in enumerate(items):
        if isinstance(item, str):
            scalars.append((i, item))
            iterables.append(None)
        else:
            iterables.append(iter(item))

    def gen():
        live = [it for it in iterables if it is not None]
        if not live:
            yield sep.join(s for _, s in scalars)
            return
        while True:
            row: list[str] = []
            try:
                for i, it in enumerate(iterables):
                    if it is None:
                        row.append(next(s for j, s in scalars if j == i))
                    else:
                        row.append(next(it))
            except StopIteration:
                return
            yield sep.join(row)

    return gen()


def normalize_col(name: str) -> str:
    """Lowercase/underscore column normalization used by CSV ingest
    (reference ``utils.py:214-239``)."""
    return name.strip().lower().replace(" ", "_").replace("-", "_")


def get_mb_size(*objs) -> float:
    """Deep in-memory footprint of the given object(s) in megabytes
    (reference ``utils.py:155-163``, which uses ``pympler.asizeof``; this
    engine reuses its own cache sizer — same contract, no extra
    dependency).  Note this measures DRIVER-side Python objects (cached
    dicts, pandas frames); Spark DataFrames are lazy plans, so their
    'size' here is the plan object, not the data."""
    from pandas_db_spark.cache import deep_sizeof

    return sum(deep_sizeof(o) for o in objs) / 1e6


def get_gb_size(*objs) -> float:
    """Deep in-memory footprint in gigabytes (reference ``utils.py:166-174``)."""
    return get_mb_size(*objs) / 1e3


def convert_db_to_sql(db_file, sql_file) -> None:
    """Dump a SQLite ``.db`` file to a ``.sql`` text script (reference
    ``utils.py:200-211``).  Stdlib ``iterdump`` streams line-by-line, so the
    file never needs to fit in memory at once.  For Spark-registered tables
    use :func:`pandas_db_spark.sources.registry.write_sql_script` (same text
    format, streamed from executors)."""
    import sqlite3

    conn = sqlite3.connect(str(db_file))
    try:
        with open(sql_file, "w") as fh:
            for stmt in conn.iterdump():
                fh.write(f"{stmt}\n")
    finally:
        conn.close()
