"""Streaming data-quality monitor — the expectation suite
(operators/quality.py) evaluated continuously over a stream.

Shape: the SAME single-aggregate + in-plan unpivot as the batch
`check_expectations`, run as a streaming aggregation in COMPLETE output
mode — Spark keeps one tiny state row of running counters (O(#rules)
longs, no watermark needed because the aggregate is unkeyed and
monotone), and every trigger overwrites the sink with the totals so far.
After an ``availableNow`` replay the converged table equals the batch
suite exactly — which is how the oracle checks it.

Restrictions (enforced, not discovered mid-job):

* only ROW-level rules — distinct aggregates (the ``unique`` rule) are
  unsupported inside streaming aggregations by Spark; key-uniqueness on
  a stream is a dedup concern, see ``streaming/dedup.py``
  (``dropDuplicatesWithinWatermark``);
* complete mode holds the one result row per rule in the sink — trivial
  state, but it means the monitor reports corpus-to-date totals, not
  per-window ones.  For windowed quality trends, compose the rule
  conditions with ``streaming/windows.py`` aggregates instead.

Reference scope: no reference analogue (the reference has no streaming
at all, SURVEY §2.10) — beyond-parity, same mandate as the rest of
``streaming/``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

from pandas_db_spark.operators.quality import Rule, check_expectations


def stream_expectations(stream_df: DataFrame,
                        rules: Sequence[Rule]) -> DataFrame:
    """The expectation suite as a streaming aggregation plan (one row
    per rule, running totals).  Row-level rules only — see module
    docstring."""
    bad = [r.name for r in rules if r.kind != "row"]
    if bad:
        raise ValueError(
            f"stream_expectations: rules {bad} need distinct aggregates, "
            "which Spark does not support in streaming aggregations — "
            "check key uniqueness with streaming/dedup.py instead")
    return check_expectations(stream_df, rules)


def run_quality_monitor(stream_df: DataFrame, rules: Sequence[Rule],
                        sink_name: str) -> DataFrame:
    """Drive the monitor over all available data (availableNow trigger,
    complete mode) into a named in-memory sink; returns the sink table —
    converged totals equal the batch ``check_expectations`` row for row."""
    out = stream_expectations(stream_df, rules)
    qr = (out.writeStream.format("memory").queryName(sink_name)
          .outputMode("complete").trigger(availableNow=True).start())
    try:
        qr.processAllAvailable()
    finally:
        qr.stop()
    return stream_df.sparkSession.table(sink_name)
