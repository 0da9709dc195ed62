"""Temporal joins Spark has no native operator for: as-of join and
range (interval) join.

Both are implemented as *shuffle-minimal compositions* of built-in
operators — no cross join, no per-row Python:

* :func:`asof_join` — "latest right row at or before each left row" is not
  a join here at all: tag the sides, union them, and take a keyed
  running-``last`` window over the right side's payload.  One shuffle on
  the ``by`` keys; state per window frame is O(1) (only the previous right
  row's payload).  This is the plan a 100 TB tick-data as-of wants —
  ``merge_asof``-style broadcast variants die when both sides are large.
* :func:`range_join` — "left points inside right intervals" joins on a
  coarse time *bucket*: intervals explode to the buckets they span, points
  map to exactly one bucket, the equi-join runs hash-partitioned on
  (keys..., bucket), and the exact containment predicate filters within
  buckets.  Candidate volume scales with interval/bucket ratio, never
  |L|×|R|.

The reference has no temporal surface; these are the beyond-parity custom
operators named in the build mandate (as-of join / range join).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__side"
_TS = "__ts"


_PAY = "__rpay"
_CHUNK = "__chunk"


def asof_join(left: DataFrame, right: DataFrame, by: Sequence[str],
              left_ts: str = "ts", right_ts: str = "ts",
              suffix: str = "_r",
              tolerance_s: int | None = None,
              chunk_s: int | None = None) -> DataFrame:
    """Left as-of join: every ``left`` row gains the payload of the latest
    ``right`` row with ``right_ts <= left_ts`` within the same ``by`` keys
    (ties at equal timestamps match, like DuckDB/pandas ``>=`` as-of);
    unmatched left rows keep NULLs.

    The entire right payload travels as ONE struct through a single
    ``last(ignorenulls=True)`` — the matched output row is always a single
    right row, and a right row whose payload column is legitimately NULL
    stays NULL (it is never back-filled from an older row).

    ``tolerance_s`` nulls the match when it is older than the given number
    of seconds (pandas ``merge_asof(tolerance=...)`` semantics).

    ``chunk_s`` (hot-key hardening): when set, the running-``last`` window
    partitions on ``(by..., floor(ts / chunk_s))`` instead of ``by`` alone,
    so one power-law key (a user with 10⁸ events) is processed by many
    tasks — one per time chunk — instead of serializing through a single
    window task.  A boundary pass then carries the last right row of each
    chunk forward: per-(key, chunk) last-right payloads (a tiny aggregate,
    one row per key per chunk) get a running-``last`` over chunks, and
    left rows with no in-chunk predecessor coalesce to that carry-in.  The
    big side shuffles once on (by, chunk); the boundary frame is O(#keys ×
    #chunks).  Pick ``chunk_s`` near (time span / desired parallelism per
    key).  Default ``None`` keeps the single-window plan (one Exchange).

    Right payload columns arrive suffixed (``value`` → ``value_r``).  If
    several right rows share (by, right_ts) the surviving payload is
    plan-order-dependent — deduplicate the right side first for a
    deterministic result."""
    by = list(by)
    rvals = [c for c in right.columns if c not in by and c != right_ts]
    matched_cols = [f"{right_ts}{suffix}"] + [f"{c}{suffix}" for c in rvals]

    l2 = (left.withColumn(_SIDE, F.lit(1))
              .withColumn(_TS, F.col(left_ts)))
    r2 = right.select(
        *by,
        F.lit(0).alias(_SIDE),
        F.col(right_ts).alias(_TS),
        F.struct(
            F.col(right_ts).alias(f"{right_ts}{suffix}"),
            *[F.col(c).alias(f"{c}{suffix}") for c in rvals],
        ).alias(_PAY),
    )
    both = l2.unionByName(r2, allowMissingColumns=True)

    # right rows (side=0) sort before left rows at equal ts → `last` at a
    # left row sees the equal-ts right row: inclusive (<=) semantics.
    # Left rows carry a NULL struct, which ignorenulls skips.
    if chunk_s is None:
        w = (Window.partitionBy(*by).orderBy(_TS, _SIDE)
                   .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        out = (both.withColumn(_PAY, F.last(_PAY, ignorenulls=True).over(w))
                   .filter(F.col(_SIDE) == 1))
    else:
        both = both.withColumn(
            _CHUNK, F.floor(F.col(_TS).cast("timestamp").cast("long")
                            / chunk_s))
        w_in = (Window.partitionBy(*by, _CHUNK).orderBy(_TS, _SIDE)
                      .rowsBetween(Window.unboundedPreceding,
                                   Window.currentRow))
        within = (both.withColumn(_PAY,
                                  F.last(_PAY, ignorenulls=True).over(w_in))
                      .filter(F.col(_SIDE) == 1))
        # boundary carry: last right payload of each (key, chunk) — a
        # map-side-combining aggregate on the window's own shuffle keys —
        # then a running-last over *chunks* (frame is one row per key per
        # chunk, so the hot key costs #chunks rows here, not #events).
        per_chunk = (both.filter(F.col(_SIDE) == 0)
                         .groupBy(*by, _CHUNK)
                         .agg(F.max_by(_PAY, F.col(_TS)).alias(_PAY)))
        all_chunks = both.select(*by, _CHUNK).distinct()
        w_carry = (Window.partitionBy(*by).orderBy(_CHUNK)
                         .rowsBetween(Window.unboundedPreceding, -1))
        carry = (all_chunks.join(per_chunk, by + [_CHUNK], "left")
                           .withColumn("__carry",
                                       F.last(_PAY, ignorenulls=True)
                                        .over(w_carry))
                           .select(*by, _CHUNK, "__carry"))
        out = (within.join(carry, by + [_CHUNK])
                     .withColumn(_PAY, F.coalesce(_PAY, F.col("__carry")))
                     .drop("__carry", _CHUNK))

    if tolerance_s is not None:
        # NTZ → timestamp is value-preserving (session tz pinned UTC in
        # session.py); NTZ has no direct long cast.
        fresh = (F.col(_TS).cast("timestamp").cast("long")
                 - F.col(_PAY)[f"{right_ts}{suffix}"]
                   .cast("timestamp").cast("long")) <= tolerance_s
        out = out.withColumn(_PAY, F.when(fresh, F.col(_PAY)))

    return out.select(
        *[c for c in left.columns],
        *[F.col(f"{_PAY}.{c}").alias(c) for c in matched_cols],
    )


def range_join(points: DataFrame, intervals: DataFrame,
               by: Sequence[str] = (), point_ts: str = "ts",
               lo: str = "lo", hi: str = "hi",
               bucket_s: int = 3600) -> DataFrame:
    """Interval-containment join: rows of ``points`` matched to every
    ``intervals`` row with ``lo <= point_ts <= hi`` (and equal ``by`` keys).

    Plan: intervals explode to the ``bucket_s``-second buckets they span,
    points map to one bucket, equi-join on (by..., bucket), exact predicate
    inside the bucket.  Pick ``bucket_s`` near the typical interval length:
    candidate volume ≈ |matches| + |intervals| × (len/bucket_s).  Long-tail
    intervals fatten the explode linearly — cap them upstream or raise
    ``bucket_s``."""
    by = list(by)

    def _epoch(c):  # NTZ-safe epoch seconds (session tz pinned UTC)
        return F.col(c).cast("timestamp").cast("long")

    p_bucket = F.floor(_epoch(point_ts) / bucket_s)
    i_buckets = F.sequence(F.floor(_epoch(lo) / bucket_s),
                           F.floor(_epoch(hi) / bucket_s))

    p = points.withColumn("__bucket", p_bucket)
    i = intervals.withColumn("__bucket", F.explode(i_buckets))
    joined = p.join(i, by + ["__bucket"])
    return (joined.filter((F.col(point_ts) >= F.col(lo))
                          & (F.col(point_ts) <= F.col(hi)))
                  .drop("__bucket"))
