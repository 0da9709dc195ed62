"""Reshape operators: pivot (long→wide) and incremental upsert/merge.

Reference scope: pandas-db exposes neither (its TODO list stops at
group-by); both are table-stakes for an analytics engine, so they are
beyond-parity additions with exact SQL oracles.

Scale notes:

* ``pivot_agg`` REQUIRES the pivot value list.  Spark's implicit form
  first runs a distinct job over the pivot column and then builds a
  column per value — on a high-cardinality column that is a schema with
  millions of columns, i.e. a driver OOM.  Pinning the values keeps the
  plan a single keyed shuffle with one aggregate per (row key, value).
* ``upsert`` is the incremental-refresh primitive: new/changed rows
  replace rows with the same key, everything else carries over.  Shape:
  one left-anti join (broadcast when the delta is small — the common
  case: a day's delta vs years of history) + a union; the history table
  never shuffles when the delta broadcasts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def pivot_agg(df: DataFrame, key_cols: Sequence[str], pivot_col: str,
              values: Sequence, aggs: Sequence[Column] | None = None,
              ) -> DataFrame:
    """Wide table: one row per ``key_cols``, one column (per agg) per
    pivot value.  ``values`` is mandatory — see module scale note.
    Default agg: ``count(*)`` named per value."""
    if not values:
        raise ValueError("pivot_agg: pivot values must be listed "
                         "explicitly (implicit discovery scans the "
                         "column and can explode the schema)")
    aggs = list(aggs) if aggs is not None else [F.count(F.lit(1))]
    return (df.groupBy(*key_cols)
            .pivot(pivot_col, list(values))
            .agg(*aggs))


def fixed_width_hist(df: DataFrame, value_col: str,
                     width_cents: int = 500) -> DataFrame:
    """Exact fixed-width histogram of a money-like double column:
    ``(bucket, lo_cents, n)`` where ``bucket = cents div width_cents``
    and ``cents = CAST(value AS DECIMAL(18,2)) · 100`` — the same
    integer-cents device as the stateful streaming totals, so bucket
    assignment is bit-identical across engines (no float boundary
    ambiguity, unlike ``width_bucket`` on raw doubles).  One keyed
    shuffle with map-side combine; the profiling primitive for value
    distributions."""
    if width_cents <= 0:
        raise ValueError("fixed_width_hist: width_cents must be positive")
    cents = (F.col(value_col).cast("decimal(18,2)") * 100).cast("long")
    return (df.select(cents.alias("__c"))
            .select(F.expr(f"__c div {width_cents}").alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"))
            .select("bucket",
                    (F.col("bucket") * width_cents).alias("lo_cents"),
                    "n"))


def upsert(target: DataFrame, updates: DataFrame,
           key_cols: Sequence[str] | str,
           broadcast_updates: bool = True) -> DataFrame:
    """Rows of ``updates`` replace same-key rows of ``target``; all other
    target rows survive.  Column sets must match (checked).  With
    ``broadcast_updates`` (default — deltas are small) the anti-join is
    a map-side hash probe and the history never shuffles."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if set(target.columns) != set(updates.columns):
        raise ValueError(
            "upsert: column sets differ — target has "
            f"{sorted(set(target.columns) - set(updates.columns))} extra, "
            f"updates has {sorted(set(updates.columns) - set(target.columns))}")
    probe = updates.select(*keys)
    if broadcast_updates:
        probe = F.broadcast(probe)
    kept = target.join(probe, keys, "left_anti")
    return kept.unionByName(updates)
