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


def col_iterator(db, *, numeric_only: bool = False):
    """Yield every Column object across all tables of a Database
    (reference ``utils.py:41-50``); ``numeric_only`` filters on the
    column's declared type — metadata only, no jobs run."""
    for _, table in db.items():
        for _, col in table.items():
            if not numeric_only or col.data_is_numeric():
                yield col


def sort_iterable_with_none_values(it) -> list:
    """``sorted`` that tolerates None values — Nones sort first
    (reference ``utils.py:52-58``)."""
    return sorted(it, key=lambda x: (x is not None, x))


def convert_csvs_to_db(db_file, csv_files, set_lowercase: bool = True,
                       **kwargs) -> None:
    """CSV files → one SQLite ``.db`` (reference ``utils.py:214-239``):
    table per file named after its stem, spaces/dashes in names become
    underscores, optional lowercasing.  Driver-side by design — the ``.db``
    format is the reference's small-data interchange; the scale ingest path
    is :func:`pandas_db_spark.sources.registry.load_csv`."""
    import sqlite3
    from pathlib import Path

    import pandas as pd

    conn = sqlite3.connect(str(db_file))
    try:
        for csv in csv_files:
            df = pd.read_csv(csv, **kwargs)
            cols = [c.replace(" ", "_").replace("-", "_")
                    for c in df.columns]
            if set_lowercase:
                cols = [c.lower() for c in cols]
            df.columns = cols
            name = Path(csv).stem.replace(" ", "_").replace("-", "_")
            df.to_sql(name=name, con=conn, index=False)
        conn.commit()
    finally:
        conn.close()


def convert_sql_to_db(sql_file, db_file) -> None:
    """Replay a ``.sql`` script into a ``.db`` file
    (reference ``utils.py:242-252``)."""
    import sqlite3

    conn = sqlite3.connect(str(db_file))
    try:
        with open(sql_file, encoding="utf-8") as fh:
            conn.executescript(fh.read())
        conn.commit()
    finally:
        conn.close()


def load_sql_to_sqlite(sql_file):
    """``.sql`` script → live in-memory sqlite3 connection
    (reference ``utils.py:255-266``)."""
    import sqlite3

    conn = sqlite3.connect(":memory:", check_same_thread=False)
    with open(sql_file, encoding="utf-8") as fh:
        conn.executescript(fh.read())
    return conn


def schema_diff(old_df, new_df) -> dict:
    """Schema drift report between two frames (yesterday's corpus vs
    today's ingest): ``{"added": {name: type}, "removed": {name: type},
    "changed": {name: (old_type, new_type)}, "unchanged": [names]}``.

    Pure metadata — zero Spark jobs; types compared as Catalyst
    ``simpleString`` (so ``decimal(18,2)`` vs ``decimal(10,0)`` IS a
    change).  The ingest-gate companion of ``operators.chunking.
    snapshot_diff`` (which diffs rows): run both before appending a new
    drop to a 100 TB table — a silent widening upstream otherwise turns
    into a scan-time schema-merge surprise later."""
    old = {f.name: f.dataType.simpleString() for f in old_df.schema.fields}
    new = {f.name: f.dataType.simpleString() for f in new_df.schema.fields}
    return {
        "added": {k: v for k, v in new.items() if k not in old},
        "removed": {k: v for k, v in old.items() if k not in new},
        "changed": {k: (old[k], new[k])
                    for k in old.keys() & new.keys() if old[k] != new[k]},
        "unchanged": sorted(k for k in old.keys() & new.keys()
                            if old[k] == new[k]),
    }


# ---------------------------------------------------------------------
# Driver-side xxhash64 (r14): Spark's only string hash, reimplemented
# from the public xxHash spec (github.com/Cyan4973/xxHash) so that
# DRIVER-side bucket probes (a handful of known literals, e.g. a BM25
# query's term -> tbucket mapping) cost zero Spark jobs.  Bit-identical
# to ``F.xxhash64(string_col)``: Spark hashes the UTF-8 bytes with
# XXH64 and the default seed 42, returning the result as a SIGNED long
# — verified against the JVM over random unicode strings
# (tests/test_utils_hash.py).  Integer-only arithmetic; never used in a
# distributed expression (executors keep using the JVM builtin).

_XXH_M = (1 << 64) - 1
_XXH_P1 = 0x9E3779B185EBCA87
_XXH_P2 = 0xC2B2AE3D27D4EB4F
_XXH_P3 = 0x165667B19E3779F9
_XXH_P4 = 0x85EBCA77C2B2AE63
_XXH_P5 = 0x27D4EB2F165667C5


def _xxh_rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _XXH_M


def _xxh_round(acc: int, inp: int) -> int:
    acc = (acc + inp * _XXH_P2) & _XXH_M
    return (_xxh_rotl(acc, 31) * _XXH_P1) & _XXH_M


def xxhash64_str(s: str, seed: int = 42) -> int:
    """XXH64 of ``s``'s UTF-8 bytes as Spark's ``xxhash64`` computes it
    (default seed 42), returned as a SIGNED 64-bit int — see the block
    comment above."""
    data = s.encode("utf-8")
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _XXH_P1 + _XXH_P2) & _XXH_M
        v2 = (seed + _XXH_P2) & _XXH_M
        v3 = seed & _XXH_M
        v4 = (seed - _XXH_P1) & _XXH_M
        while i + 32 <= n:
            v1 = _xxh_round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _xxh_round(v2, int.from_bytes(data[i + 8:i + 16],
                                               "little"))
            v3 = _xxh_round(v3, int.from_bytes(data[i + 16:i + 24],
                                               "little"))
            v4 = _xxh_round(v4, int.from_bytes(data[i + 24:i + 32],
                                               "little"))
            i += 32
        h = (_xxh_rotl(v1, 1) + _xxh_rotl(v2, 7) + _xxh_rotl(v3, 12)
             + _xxh_rotl(v4, 18)) & _XXH_M
        for v in (v1, v2, v3, v4):
            h = ((h ^ _xxh_round(0, v)) * _XXH_P1 + _XXH_P4) & _XXH_M
    else:
        h = (seed + _XXH_P5) & _XXH_M
    h = (h + n) & _XXH_M
    while i + 8 <= n:
        h ^= _xxh_round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_xxh_rotl(h, 27) * _XXH_P1 + _XXH_P4) & _XXH_M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _XXH_P1) & _XXH_M
        h = (_xxh_rotl(h, 23) * _XXH_P2 + _XXH_P3) & _XXH_M
        i += 4
    while i < n:
        h ^= (data[i] * _XXH_P5) & _XXH_M
        h = (_xxh_rotl(h, 11) * _XXH_P1) & _XXH_M
        i += 1
    h ^= h >> 33
    h = (h * _XXH_P2) & _XXH_M
    h ^= h >> 29
    h = (h * _XXH_P3) & _XXH_M
    h ^= h >> 32
    return h - (1 << 64) if h >= 1 << 63 else h
