"""Sequence packing — assign documents to fixed token-budget training
sequences, the standard chunking step between a cleaned corpus and a
pre-training dataloader (no reference analogue; beyond-parity LLM op).

Semantics: **token-offset chunking.**  Documents are laid end-to-end in
``id_col`` order; a document belongs to the sequence where its first token
lands: ``seq_id = floor(global_start_offset / budget)``.  This is the
deterministic, order-stable contract (identical closed form in the DuckDB
oracle) — unlike greedy bin packing it is decomposable, which is what makes
it scale:

    global_start_offset = chunk_offset(chunk) + local_offset_within_chunk

* ``chunk = floor(id / chunk_ids)`` — a DETERMINISTIC coarse partition key,
  so the expensive window below is hash-partitioned by chunk, never a
  single-partition global sort (the classic scale-killer of
  ``SUM() OVER (ORDER BY ...)`` with no PARTITION BY);
* ``local_offset`` — per-chunk exclusive running sum of token counts
  (distributed window, one keyed shuffle);
* ``chunk_offset`` — exclusive running sum of per-chunk totals: one tiny
  agg job (a few rows per TB), offsets computed on the driver and
  broadcast-joined back — same pattern as ``plans/ordinal.py``, so the
  plan stays O(1) size in chunk count.

At 100 TB with ``chunk_ids=100_000``: ~10⁴-10⁵ chunk rows through the
driver (a few MB), everything else stays distributed.
"""

from __future__ import annotations

from collections import OrderedDict

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pandas_db_spark.session import tiny_df

# LRU of persisted token frames (same discipline as plans/ordinal.py):
# repeated packing calls over the same corpus reuse one cached frame;
# evicted entries are unpersisted so a long-lived session calling
# pack_sequences over many distinct corpora stays bounded.
_TOKS_CACHE_CAP = 8
_toks_cache: OrderedDict[int, DataFrame] = OrderedDict()


def _persisted_toks(toks: DataFrame) -> DataFrame:
    from pyspark.storagelevel import StorageLevel

    try:
        key = toks.semanticHash()
    except Exception:
        return toks.persist(StorageLevel.MEMORY_AND_DISK)
    if key in _toks_cache:
        _toks_cache.move_to_end(key)
        return _toks_cache[key]
    out = toks.persist(StorageLevel.MEMORY_AND_DISK)
    _toks_cache[key] = out
    while len(_toks_cache) > _TOKS_CACHE_CAP:
        _, old = _toks_cache.popitem(last=False)
        try:
            old.unpersist()
        except Exception:
            pass
    return out


def pack_sequences(docs: DataFrame, budget: int = 2048,
                   text_col: str = "text", id_col: str = "doc_id",
                   chunk_ids: int = 100_000) -> DataFrame:
    """(id, n_tokens, start_offset, seq_id) — one row per document.

    ``budget`` is the tokens-per-sequence target.  A document longer than
    the remaining room in its sequence spills into the next one(s) — the
    dataloader's packing buffer handles the actual split; this operator
    provides the deterministic assignment and offsets it needs.
    """
    from pyspark.sql.types import NumericType

    from pandas_db_spark.functions.text import token_count

    id_field = docs.schema[id_col]
    if not isinstance(id_field.dataType, NumericType):
        # A non-numeric id would make __chunk NULL and silently drop every
        # row at the offset join. The chunk decomposition needs RANGES of
        # the id, so a hash of a string id cannot substitute.
        raise TypeError(
            f"pack_sequences requires a numeric id_col for deterministic "
            f"range chunking; {id_col!r} is "
            f"{id_field.dataType.simpleString()} — derive a dense numeric "
            f"key first (e.g. via zipWithIndex at ingest).")

    toks = docs.select(
        F.col(id_col),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
        (F.col(id_col) / F.lit(chunk_ids)).cast("long").alias("__chunk"),
    )
    # Persist via the module LRU: the per-chunk-totals job below and the
    # returned plan must see the SAME tokenization of the same files
    # (plans/ordinal.py closes the identical two-jobs hole the same way),
    # and it saves the second full scan+tokenize.  3 longs/row; evictions
    # unpersist, so many-corpora sessions stay bounded.
    toks = _persisted_toks(toks)

    # distributed exclusive cumsum within each deterministic chunk
    w = (Window.partitionBy("__chunk").orderBy(id_col)
               .rowsBetween(Window.unboundedPreceding, -1))
    local = toks.withColumn(
        "__local_off",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long"))

    # tiny per-chunk totals -> exclusive offsets, broadcast back
    totals = (toks.groupBy("__chunk").agg(F.sum("n_tokens").alias("__t"))
                  .orderBy("__chunk").collect())
    rows, running = [], 0
    for r in totals:
        rows.append((r["__chunk"], running))
        running += r["__t"]
    spark = docs.sparkSession
    offsets = tiny_df(spark, rows or [(0, 0)],
                      "__chunk long, __chunk_off long")

    out = (local.join(F.broadcast(offsets), "__chunk")
                .withColumn("start_offset",
                            (F.col("__chunk_off") + F.col("__local_off"))
                            .cast("long"))
                .withColumn("seq_id",
                            (F.col("start_offset") / F.lit(budget))
                            .cast("long"))
                .drop("__chunk", "__chunk_off", "__local_off"))
    return out.select(id_col, "n_tokens", "start_offset", "seq_id")


def pack_summary(docs: DataFrame, budget: int = 2048,
                 text_col: str = "text", id_col: str = "doc_id",
                 chunk_ids: int = 100_000) -> DataFrame:
    """(seq_id, n_docs, total_tokens) — one row per packed sequence.
    ``total_tokens`` counts each member document's full length, so boundary
    documents make some sequences exceed ``budget`` — by design (see module
    docstring); the p99 overhang is bounded by the p99 document length."""
    packed = pack_sequences(docs, budget, text_col, id_col, chunk_ids)
    return (packed.groupBy("seq_id")
                  .agg(F.count(F.lit(1)).alias("n_docs"),
                       F.sum("n_tokens").alias("total_tokens")))


def length_buckets(docs: DataFrame, boundaries: list[int],
                   batch_size: int, text_col: str = "text",
                   id_col: str = "doc_id", n_salts: int = 64) -> DataFrame:
    """Length-bucketed batch assignment — group documents of similar
    token length and deal each bucket into fixed-size batches, the
    standard padding-waste reducer for sequence-model training (public
    "bucketing by sequence length" pattern from the Sockeye/fairseq
    literature).

    Contract (deterministic, closed-form — identical in the SQL oracle):

    * ``bucket``  = index of the first boundary ≥ n_tokens (len(boundaries)
      for longer docs);
    * ``salt``    = ``id % n_salts`` — a deterministic sub-bucket;
    * ``batch``   = 0-based position of the doc within its (bucket, salt)
      group in ``id`` order, integer-divided by ``batch_size``.

    A batch is identified by (bucket, salt, batch); every batch holds
    ``batch_size`` same-bucket docs except possibly the last batch of
    each salt group — at most ``n_salts`` ragged batches per bucket,
    the documented price of scale safety.

    100 TB note: the only shuffle is the window keyed on
    (bucket, salt) — per-task row count is ~N/(buckets·n_salts), tuned
    by ``n_salts``; there is no global sort and no driver collect.  The
    whole-corpus global-order variant (salt-free) is exactly the
    single-task window this decomposition exists to avoid.
    """
    from pyspark.sql.types import NumericType

    from pandas_db_spark.functions.text import token_count

    if batch_size <= 0 or n_salts <= 0:
        raise ValueError("length_buckets: batch_size and n_salts must "
                         "be positive")
    if not boundaries or sorted(boundaries) != list(boundaries):
        raise ValueError("length_buckets: boundaries must be a "
                         "non-empty ascending list")
    if not isinstance(docs.schema[id_col].dataType, NumericType):
        raise TypeError("length_buckets requires a numeric id_col (the "
                        "salt is id % n_salts; see pack_sequences)")

    n = token_count(F.col(text_col)).cast("long")
    bucket = F.lit(len(boundaries))
    for i in range(len(boundaries) - 1, -1, -1):
        bucket = F.when(n <= boundaries[i], F.lit(i)).otherwise(bucket)
    toks = docs.select(
        F.col(id_col),
        n.alias("n_tokens"),
        bucket.cast("int").alias("bucket"),
        (F.col(id_col) % F.lit(n_salts)).cast("int").alias("salt"))

    w = Window.partitionBy("bucket", "salt").orderBy(id_col)
    return toks.withColumn(
        "batch",
        ((F.row_number().over(w) - 1) / F.lit(batch_size))
        .cast("long"))
