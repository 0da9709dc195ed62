"""Rolling (moving-frame) and cumulative aggregates over keyed, ordered data.

Reference scope: pandas-db exposes no window surface at all (its TODO
stops at group-by — reference ``table.py`` has none); rolling means /
running totals are table-stakes for event analytics, so these are
beyond-parity additions with exact SQL oracles.

Scale shape: every function here is ONE keyed shuffle (the window's
``partitionBy``) followed by a per-key sort INSIDE each task — there is
no global sort and no single-task window (an empty ``partitionBy`` is
rejected).  At 100 TB the cost is the same exchange a group-by would
pay; skewed keys fall under AQE's skew handling like any other keyed
exchange.

Float discipline: SUM/AVG over a frame depends on accumulation order,
so both are computed over an exact DECIMAL cast (associative —
engine-independent) and divided exactly for the mean; results cast back
to double only at the end (one correctly-rounded operation).

Input contract (same as ``stats.corr_matrix``): the cast ROUNDS
``value_col`` at ``scale`` fractional digits (default 2 — currency
cents) and NULLs values beyond the decimal's integer range
(~10^(18-scale)); pass a wider ``scale`` for higher-precision inputs.

Determinism: callers MUST pass ``tiebreak_cols`` reaching a total order
(e.g. the primary key) — with ties in ``order_col`` alone, ROWS frames
are partition-order dependent in any engine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, WindowSpec, functions as F


def _check_scale(scale: int) -> None:
    """``decimal(18, scale)`` has ``18 - scale`` integer digits, so a
    larger ``scale`` buys precision by SHRINKING the representable value
    range (scale=10 NULLs values ≥ ~1e8); scale > 18 is not a valid
    decimal type at all.  Validated here with a clear error instead of
    the analysis-time decimal failure (r8, per ADVICE r7)."""
    if not 0 <= scale <= 18:
        raise ValueError(
            f"rolling: scale must be in [0, 18], got {scale} — the "
            "exact cast is decimal(18, scale), which has 18 - scale "
            "integer digits")


def _keyed_window(key_cols: Sequence[str], order_cols: Sequence[str]
                  ) -> WindowSpec:
    if not key_cols:
        raise ValueError(
            "rolling: empty key_cols would funnel the whole table "
            "through ONE task's window sort — partition by a key, or "
            "use plans/ordinal.py's shuffle-free numbering for global "
            "order")
    return Window.partitionBy(*key_cols).orderBy(*[F.asc(c) for c in order_cols])


def rolling_rows(df: DataFrame, key_cols: Sequence[str] | str,
                 order_col: str, value_col: str, n: int,
                 tiebreak_cols: Sequence[str] = (),
                 out_prefix: str = "roll", scale: int = 2) -> DataFrame:
    """Trailing-``n``-rows sum/mean/count of ``value_col`` per key (the
    current row plus the n-1 before it in ``order_col`` order).  Adds
    ``{out_prefix}_sum / _avg / _n`` columns; input columns untouched.
    ``value_col`` is rounded at ``scale`` digits by the exact-decimal
    cast (module docstring)."""
    if n <= 0:
        raise ValueError("rolling_rows: n must be positive")
    _check_scale(scale)
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    w = (_keyed_window(keys, [order_col, *tiebreak_cols])
         .rowsBetween(-(n - 1), Window.currentRow))
    exact = F.col(value_col).cast(f"decimal(18,{scale})")
    s = F.sum(exact).over(w)
    cnt = F.count(exact).over(w)
    # avg = exact-sum-as-double / count-as-double: ONE IEEE division of
    # two exactly-agreed operands, so engines match bit-for-bit (decimal
    # division would round at engine-specific quotient scales).
    return (df.withColumn(f"{out_prefix}_sum", s.cast("double"))
              .withColumn(f"{out_prefix}_avg",
                          s.cast("double") / cnt.cast("double"))
              .withColumn(f"{out_prefix}_n", cnt.cast("long")))


def rolling_range(df: DataFrame, key_cols: Sequence[str] | str,
                  ts_col: str, value_col: str, window_s: int,
                  out_prefix: str = "roll", scale: int = 2) -> DataFrame:
    """Trailing TIME-window aggregate: for each row, the sum/count of
    ``value_col`` over this key's rows with ``ts`` in
    ``(row.ts - window_s, row.ts]``.  RANGE frames bound by VALUE, not
    row count, so ties in ``ts`` all see the same frame — no tiebreak
    needed and the result is fully deterministic.

    The frame is keyed on integer epoch seconds (Spark RANGE frames need
    a numeric order column); sub-second timestamps truncate to the
    second — document granularity to callers rather than multiplying
    into micros and risking long overflow on interval arithmetic."""
    if window_s <= 0:
        raise ValueError("rolling_range: window_s must be positive")
    _check_scale(scale)
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    sec = F.unix_timestamp(F.col(ts_col))
    tmp = df.withColumn("__sec", sec)
    w = (_keyed_window(keys, ["__sec"])
         .rangeBetween(-(window_s - 1), Window.currentRow))
    exact = F.col(value_col).cast(f"decimal(18,{scale})")
    s = F.sum(exact).over(w)
    cnt = F.count(exact).over(w)
    return (tmp.withColumn(f"{out_prefix}_sum", s.cast("double"))
               .withColumn(f"{out_prefix}_n", cnt.cast("long"))
               .drop("__sec"))


def cumulative(df: DataFrame, key_cols: Sequence[str] | str,
               order_col: str, value_col: str,
               tiebreak_cols: Sequence[str] = (),
               out_prefix: str = "cum", scale: int = 2) -> DataFrame:
    """Running (unbounded-preceding) sum and row index of ``value_col``
    per key in ``order_col`` order — the running-total / running-count
    primitive.  ``value_col`` is rounded at ``scale`` digits by the
    exact-decimal cast (module docstring)."""
    _check_scale(scale)
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    w = (_keyed_window(keys, [order_col, *tiebreak_cols])
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    exact = F.col(value_col).cast(f"decimal(18,{scale})")
    return (df.withColumn(f"{out_prefix}_sum",
                          F.sum(exact).over(w).cast("double"))
              .withColumn(f"{out_prefix}_n",
                          F.count(F.lit(1)).over(w).cast("long")))
