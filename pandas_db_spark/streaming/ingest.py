"""Streaming dedup ingest — the rolling-corpus pipeline, end to end.

Every micro-batch of incoming documents is (1) exact-deduped in-batch,
(2) deduped against the ACCUMULATED fingerprint store of everything
ingested before it, then (3) survivors are appended to the corpus sink
and their digests appended to the store — so the corpus never admits a
document it has already seen, across batches, restarts and days.  This
is the composition the whole dedup module builds toward:
``foreachBatch`` + :func:`operators.dedup.dedup_incremental` +
:func:`operators.dedup.fingerprint_store`.

Why ``foreachBatch`` and not a stateful operator: the dedup state (one
digest per EVER-ingested doc) must outlive the streaming query and be
shared with batch jobs — a parquet store does both; Spark's own
``dropDuplicatesWithinWatermark`` (see ``streaming/dedup.py``) bounds
its state by TIME and forgets, which is the right tool within a stream
but not across a corpus's lifetime.

Exactly-once note (honest, not hand-waved): ``foreachBatch`` gives
at-least-once on restart — a batch replay would re-append its
survivors.  The replayed batch deduplicates against the store it
already wrote, so CORPUS duplicates cannot arise from replays of LATER
batches, but a crash between the corpus append and the store append can
replay that one batch's rows into the corpus twice.  Production
hardening is batch-id-keyed idempotent writes (partition the sink by
``batch_id`` and overwrite-by-partition) — parameterized here via
``partition_by_batch``; the checkpoint location makes replays rare
rather than impossible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def run_dedup_ingest(stream_df: DataFrame, text_col: str, id_col: str,
                     corpus_dir: str, store_dir: str,
                     checkpoint_dir: str,
                     partition_by_batch: bool = True) -> None:
    """Drive the ingest over all available input (availableNow trigger).

    ``corpus_dir`` receives surviving documents (parquet, appended);
    ``store_dir`` the (digest, id) fingerprints.  Both readable by any
    batch job between runs; re-running with new input continues where
    the store left off."""
    from pandas_db_spark.operators.dedup import (dedup_incremental,
                                                 fingerprint_store)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            store = spark.read.parquet(store_dir)
        except Exception:   # first batch ever: empty store
            store = spark.createDataFrame([], "digest string, id long")
        kept_ids = dedup_incremental(batch_df, store, text_col, id_col)
        kept = batch_df.join(F.broadcast(kept_ids), id_col, "left_semi")
        if partition_by_batch:
            kept = kept.withColumn("batch_id", F.lit(batch_id))
            (kept.write.mode("append").partitionBy("batch_id")
                 .parquet(corpus_dir))
        else:
            kept.write.mode("append").parquet(corpus_dir)
        (fingerprint_store(kept.drop("batch_id"), text_col, id_col)
         .write.mode("append").parquet(store_dir))

    qr = (stream_df.writeStream.foreachBatch(handle)
          .option("checkpointLocation", checkpoint_dir)
          .trigger(availableNow=True).start())
    try:
        qr.processAllAvailable()
    finally:
        qr.stop()
