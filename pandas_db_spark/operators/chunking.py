"""Document chunking: sliding token windows for embedding / retrieval
indexing.

The packing operator (``operators/packing.py``) concatenates short docs
up to a token budget; chunking is its inverse — long documents split
into overlapping windows so each piece fits an embedding model's context
and boundary information isn't lost.  Together they normalize a corpus's
length distribution from both ends.

Plan: pure JVM higher-order expressions — ``sequence`` generates the
window starts, ``transform`` + ``slice`` + ``array_join`` materialize
each chunk, ``posexplode`` emits one row per chunk.  Zero Python, zero
shuffle: chunking is embarrassingly row-parallel, so the operator is a
narrow map whatever the corpus size; only the downstream consumer
shuffles.

Chunk rule (mirrored exactly by the SQL oracle): windows start at token
1, 1+stride, 1+2·stride, … for every start ≤ n_tokens, each taking up to
``max_tokens`` tokens; the final window may be shorter.  ``stride =
max_tokens − overlap``.

Reference scope: beyond-parity (the reference has no text operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pandas_db_spark.functions.text import tokens


def chunk_documents(df: DataFrame, text_col: str, id_col: str,
                    max_tokens: int = 64, overlap: int = 16) -> DataFrame:
    """Split each document into overlapping token windows.

    Returns ``(doc_id, chunk_id, n_tokens, chunk_text)`` — ``chunk_id``
    is the 0-based window index within its document (deterministic, no
    global ordering involved), ``n_tokens`` the window's actual length.
    """
    if max_tokens <= 0:
        raise ValueError("chunk_documents: max_tokens must be positive")
    if not 0 <= overlap < max_tokens:
        raise ValueError(
            "chunk_documents: overlap must satisfy 0 <= overlap < "
            f"max_tokens (got overlap={overlap}, max_tokens={max_tokens})")
    stride = max_tokens - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    starts = F.sequence(F.lit(1), n, F.lit(stride))
    chunks = F.transform(
        starts, lambda s: F.array_join(F.slice(toks, s, max_tokens), " "))
    return (df.select(F.col(id_col).alias("doc_id"),
                      F.size(toks).alias("__n"),
                      F.posexplode(chunks).alias("chunk_id", "chunk_text"))
            .select("doc_id",
                    F.col("chunk_id").cast("long").alias("chunk_id"),
                    F.least(F.lit(max_tokens),
                            F.col("__n") - F.col("chunk_id") * stride)
                    .cast("long").alias("n_tokens"),
                    "chunk_text"))


def snapshot_diff(old: DataFrame, new: DataFrame, id_col: str,
                  text_col: str) -> DataFrame:
    """Corpus snapshot diff for incremental recrawls: classify every id
    as ``added`` (only in new), ``removed`` (only in old), ``changed``
    (both, content hash differs) or ``unchanged``.

    Content comparison is by sha2-256 digest, so the full-outer join
    shuffles (id, 64-byte digest) pairs — never document bodies; at
    100 TB the join input is ~1% of corpus bytes.  Downstream: process
    only ``added ∪ changed``, the incremental-pipeline contract."""
    def digests(df: DataFrame, name: str) -> DataFrame:
        return df.select(F.col(id_col).alias("id"),
                         F.sha2(F.col(text_col), 256).alias(name))
    o = digests(old, "old_digest")
    nw = digests(new, "new_digest")
    joined = o.join(nw, "id", "full_outer")
    status = (F.when(F.col("old_digest").isNull(), F.lit("added"))
              .when(F.col("new_digest").isNull(), F.lit("removed"))
              .when(F.col("old_digest") != F.col("new_digest"),
                    F.lit("changed"))
              .otherwise(F.lit("unchanged")))
    return joined.select("id", status.alias("status"))
