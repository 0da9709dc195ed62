"""Ordinal (stable row-number) synthesis — the one physical pattern the
reference got for free from SQLite's 1-based ``_rowid_`` (``pandasdb/table.py:19-106``)
and that Spark's unordered DataFrames lack.

Design (SURVEY.md §7 hard-part #1): stay JVM-side and distributed.  Instead of
a global ``row_number()`` window (single-partition shuffle — dies at scale) or
``rdd.zipWithIndex`` (pickles every row through Python), we:

1. tag rows with ``spark_partition_id()``;
2. number rows *within* each partition with a per-partition window ordered by
   ``monotonically_increasing_id()`` (mid is monotonic within a partition, so
   this preserves source order without moving data);
3. compute per-partition row counts (a tiny agg — one row per partition),
   collect them to the driver, turn them into cumulative offsets;
4. broadcast-join the offsets back and add.

Cost at 100 TB: one narrow window per partition + one O(#partitions) agg.
No full shuffle, no Python boundary.  The ordinal is attached lazily — only
``iloc`` / head-tail repr paths call this; ordinary transforms never pay it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ORDINAL_COL = "__pdbs_ord__"
_PID_COL = "__pdbs_pid__"
_POS_COL = "__pdbs_pos__"


def with_ordinal(df: DataFrame, zero_based: bool = True) -> DataFrame:
    """Return ``df`` with a stable ordinal column ``ORDINAL_COL`` appended.

    Ordering is the DataFrame's current row order (partition order, then
    in-partition order) — the same contract as SQLite's ``_rowid_`` over a
    deterministic scan.
    """
    tagged = df.withColumn(_PID_COL, F.spark_partition_id()).withColumn(
        "__pdbs_mid__", F.monotonically_increasing_id()
    )
    w = Window.partitionBy(_PID_COL).orderBy("__pdbs_mid__")
    numbered = tagged.withColumn(_POS_COL, F.row_number().over(w))

    counts = (
        tagged.groupBy(_PID_COL).count().orderBy(_PID_COL).collect()
    )
    offsets = {}
    running = 0
    for row in counts:
        offsets[row[_PID_COL]] = running
        running += row["count"]

    base = 0 if zero_based else 1
    offset_expr = F.lit(base)
    if offsets:
        mapping = F.create_map(
            *[F.lit(x) for pid_off in offsets.items() for x in pid_off]
        )
        offset_expr = mapping[F.col(_PID_COL)] + base

    out = numbered.withColumn(
        ORDINAL_COL, (F.col(_POS_COL) - 1 + offset_expr).cast("long")
    )
    return out.drop(_PID_COL, _POS_COL, "__pdbs_mid__")
