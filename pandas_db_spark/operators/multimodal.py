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

The ``documents`` table stands in for a media corpus: payload =
UTF-8 bytes of ``text``.
"""

from __future__ import annotations

from typing import Iterator

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


def decode_media(media: DataFrame, id_col: str = "doc_id",
                 codec: str = "fake") -> DataFrame:
    """Decode payloads to (id, width, height, channels) via an Arrow-batched
    ``mapInPandas`` pass — the partitioning, batch shape, and output schema
    are the real production plumbing; only the codec body is swappable.

    ``codec="fake"``: deterministic metadata from byte length
    (width = n % 640, height = (n*7) % 480, channels = 3) — lets the full
    pipeline run and be verified without image libraries.
    """
    if codec not in ("fake",):
        raise NotImplementedError(
            f"codec={codec!r}: real decoders (PIL/ffmpeg) are not available "
            "in this environment; plug the library call into the marked line "
            "of _decode_batch — schema and batching are already production-"
            "shaped.")

    out_schema = f"{id_col} long, width int, height int, channels int"

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            n = pdf["payload"].map(len)
            yield pd.DataFrame({
                id_col: pdf[id_col],
                # REAL CODEC GOES HERE: e.g. PIL.Image.open(io.BytesIO(b))
                "width": (n % FAKE_WIDTH_MOD).astype("int32"),
                "height": (n * 7 % FAKE_HEIGHT_MOD).astype("int32"),
                "channels": 3,
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
