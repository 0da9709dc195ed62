"""Streaming deduplication — drop duplicate events at ingest time.

LLM training pipelines dedupe *on the way in* (a re-crawled page, a
re-delivered Kafka record, a retried upload) long before the heavyweight
corpus-level MinHash pass runs.  Two operators:

* :func:`dedup_stream` — exact key dedup with **bounded state**:
  ``dropDuplicatesWithinWatermark`` keeps a key in the state store only
  until the watermark passes it, so state is O(keys per watermark window),
  not O(all keys ever) — the only formulation that survives an unbounded
  stream.  Guarantee: any two duplicates arriving within the watermark of
  each other dedupe; late beyond-watermark replays can slip through (tune
  the watermark to the source's redelivery horizon).
* :func:`dedup_stream_unbounded` — ``dropDuplicates`` on the keys with no
  watermark: exact forever, state grows with distinct keys.  Correct for
  bounded backfills (availableNow replays of a finite corpus), where it
  converges to exactly the batch ``distinct`` answer.

Batch oracle: the converged availableNow run of the unbounded form equals
``df.dropDuplicates(keys)`` — asserted in tests/test_streaming.py.

The reference has no streaming surface (SURVEY §2.10); beyond-parity.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(stream_df: DataFrame, keys: Sequence[str],
                 ts_col: str = "ts",
                 watermark: str = "2 hours") -> DataFrame:
    """Watermark-bounded exact dedup on ``keys`` (state evicted as the
    watermark advances).  ``ts_col`` is cast to TIMESTAMP for the watermark
    (session tz pinned UTC → value-preserving for NTZ sources)."""
    stream_df = stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (stream_df.withWatermark(ts_col, watermark)
                     .dropDuplicatesWithinWatermark(list(keys)))


def dedup_stream_unbounded(stream_df: DataFrame,
                           keys: Sequence[str]) -> DataFrame:
    """Exact dedup with unbounded state — for finite backfills only."""
    return stream_df.dropDuplicates(list(keys))
