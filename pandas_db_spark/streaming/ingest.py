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
                     partition_by_batch: bool = True,
                     mode: str = "exact",
                     threshold: float = 0.8) -> None:
    """Drive the ingest over all available input (availableNow trigger).

    ``corpus_dir`` receives surviving documents (parquet, appended);
    ``store_dir`` the dedup state.  Both readable by any batch job
    between runs; re-running with new input continues where the store
    left off.

    ``mode="exact"`` (default): store = (digest, id) fingerprints,
    a new doc is dropped only on exact normalized-text identity.
    ``mode="near"``: store = (id, sig) MinHash signatures
    (:func:`operators.dedup.minhash_store`); a new doc is dropped when
    its exact-verified Jaccard vs ANY stored doc reaches ``threshold`` —
    NOTE the verify step re-shingles matched store docs, so the near
    mode also persists the store docs' id+text beside the signatures
    (``store_dir + "/docs"``), read back only for candidates."""
    from pandas_db_spark.operators.dedup import (dedup_incremental,
                                                 fingerprint_store,
                                                 minhash_incremental,
                                                 minhash_store)

    if mode not in ("exact", "near"):
        raise ValueError(f"run_dedup_ingest: unknown mode {mode!r}")

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if mode == "exact":
            try:
                store = spark.read.parquet(store_dir)
            except Exception:   # first batch ever: empty store
                store = spark.createDataFrame([], "digest string, id long")
            kept_ids = dedup_incremental(batch_df, store, text_col, id_col)
        else:
            try:
                sigs = spark.read.parquet(store_dir + "/sigs")
                docs = spark.read.parquet(store_dir + "/docs")
            except Exception:
                sigs = spark.createDataFrame([], f"{id_col} long, "
                                                 "sig array<long>")
                docs = spark.createDataFrame([], f"{id_col} long, "
                                                 f"{text_col} string")
            kept_ids = minhash_incremental(
                batch_df, docs, text_col, id_col,
                threshold=threshold, store_sigs=sigs)
        kept = batch_df.join(F.broadcast(kept_ids), id_col, "left_semi")
        if partition_by_batch:
            kept = kept.withColumn("batch_id", F.lit(batch_id))
            (kept.write.mode("append").partitionBy("batch_id")
                 .parquet(corpus_dir))
        else:
            kept.write.mode("append").parquet(corpus_dir)
        kept = kept.drop("batch_id")
        if mode == "exact":
            (fingerprint_store(kept, text_col, id_col)
             .write.mode("append").parquet(store_dir))
        else:
            (minhash_store(kept, text_col, id_col)
             .write.mode("append").parquet(store_dir + "/sigs"))
            (kept.select(id_col, text_col)
             .write.mode("append").parquet(store_dir + "/docs"))

    qr = (stream_df.writeStream.foreachBatch(handle)
          .option("checkpointLocation", checkpoint_dir)
          .trigger(availableNow=True).start())
    try:
        qr.processAllAvailable()
    finally:
        qr.stop()
