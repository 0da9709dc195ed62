"""Eval-set decontamination — find training documents that share verbatim
n-grams with a held-out evaluation set (the standard pre-training hygiene
step; no reference analogue; beyond-parity LLM op).

Plan shape at 100 TB:

* the EVAL side is small by construction (benchmarks are thousands of
  documents, not billions) → its exploded (shingle, eval_id) index is
  **broadcast**; the training corpus never shuffles;
* the train side is one narrow explode → broadcast-hash-join → groupBy on
  (train_id, eval_id) hits — one keyed shuffle over MATCHES only, which
  for a clean corpus is ~zero rows;
* contamination is counted on DISTINCT shingles per side, so a 1000×
  repetition of one leaked line counts once (matching how decontamination
  thresholds are specified in practice).

``n`` defaults to 8 words — long enough that natural re-use is rare, short
enough to catch paraphrase-free leakage; the knob every published
decontamination setup exposes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _shingle_index(df: DataFrame, text_col: str, id_col: str, n: int,
                   out_id: str) -> DataFrame:
    from pandas_db_spark.functions.text import word_shingles

    # explode_outer, NOT explode: plain explode makes Catalyst infer a
    # `size(__sh) > 0 AND __sh IS NOT NULL` filter and push it below any
    # upstream Exchange — which re-evaluates the whole n-gram concat HOF
    # a second time, single-threaded, in the scan stage (measured 2× the
    # query cost at sf0.1).  word_shingles never returns an empty array
    # (short docs degrade to one whole-doc shingle), so filtering the
    # GENERATED column — which cannot be pushed below its own Generate —
    # is semantically identical and keeps the HOF evaluated exactly once,
    # after the repartition.
    return (df.select(F.col(id_col).alias(out_id),
                      word_shingles(F.col(text_col), n).alias("__sh"))
              .select(out_id, F.explode_outer("__sh").alias("shingle"))
              .where(F.col("shingle").isNotNull()))


def contamination_pairs(train: DataFrame, eval_df: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        n: int = 8, min_shared: int = 1) -> DataFrame:
    """(train_id, eval_id, n_shared) for every train/eval pair sharing at
    least ``min_shared`` distinct n-grams, n_shared descending then ids."""
    from pandas_db_spark.operators.dedup import _ensure_parallelism

    # The n-gram concat HOF is the CPU cost here; a train corpus arriving
    # as few splits (single local file) would serialize it on one core.
    tr = _shingle_index(_ensure_parallelism(train), text_col, id_col, n,
                        "train_id")
    ev = _shingle_index(eval_df, text_col, id_col, n, "eval_id")
    hits = tr.join(F.broadcast(ev), "shingle")
    return (hits.groupBy("train_id", "eval_id")
                .agg(F.count(F.lit(1)).alias("n_shared"))
                .filter(F.col("n_shared") >= min_shared)
                .orderBy(F.desc("n_shared"), "train_id", "eval_id"))


def decontaminate(train: DataFrame, eval_df: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  n: int = 8, min_shared: int = 1) -> DataFrame:
    """Training corpus minus contaminated documents: one broadcast-probe
    pass + a left-anti join on the (tiny) flagged-id set."""
    flagged = (contamination_pairs(train, eval_df, text_col, id_col,
                                   n, min_shared)
               .select(F.col("train_id").alias(id_col)).distinct())
    return train.join(flagged, id_col, "left_anti")


def contamination_pairs_fuzzy(train: DataFrame, eval_df: DataFrame,
                              text_col: str = "text",
                              id_col: str = "doc_id",
                              threshold: float = 0.8, n: int = 3,
                              num_perm: int = 128, bands: int = 32,
                              rows: int = 4,
                              persist: bool = True) -> DataFrame:
    """``(train_id, eval_id, jaccard)`` for every cross-corpus pair with
    exact shingle Jaccard >= ``threshold`` — FUZZY decontamination (the
    Dolma / The-Pile recipe: eval overlap at near-duplicate level, where
    :func:`contamination_pairs` catches only verbatim shared n-grams).

    Same machinery as the dedup family (``minhash_signatures`` +
    ``_band_keys`` + exact verify), but the candidate step is a plain
    equi-JOIN of the two sides' band keys on (band, bh) — only CROSS
    pairs surface, never within-corpus ones, and the join shape lets
    AQE broadcast the (typically tiny) eval side.  Recall is the usual
    banded bound, ~1 - 5e-8 at the defaults for t = 0.8; precision is
    exact (integer |A∩B| / |A∪B|, one correctly-rounded division —
    bit-stable for the oracle)."""
    from pandas_db_spark.operators.dedup import (_band_keys,
                                                 _shared_shingles,
                                                 minhash_signatures)
    sht = _shared_shingles(train, text_col, id_col, n, persist)
    she = _shared_shingles(eval_df, text_col, id_col, n, persist)
    kt = (_band_keys(minhash_signatures(sht, id_col, num_perm),
                     id_col, bands, rows)
          .select(F.col(id_col).alias("train_id"), "band", "bh"))
    ke = (_band_keys(minhash_signatures(she, id_col, num_perm),
                     id_col, bands, rows)
          .select(F.col(id_col).alias("eval_id"), "band", "bh"))
    cand = (kt.join(ke, ["band", "bh"])
              .select("train_id", "eval_id").distinct())
    a = sht.select(F.col(id_col).alias("train_id"),
                   F.col("shingles").alias("sh_a"))
    b = she.select(F.col(id_col).alias("eval_id"),
                   F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (cand.join(a, "train_id").join(b, "eval_id")
                .select("train_id", "eval_id",
                        (inter.cast("double") / union).alias("jaccard"))
                .filter(F.col("jaccard") >= threshold))


def decontaminate_fuzzy(train: DataFrame, eval_df: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        threshold: float = 0.8, n: int = 3,
                        **kw) -> DataFrame:
    """Training corpus minus near-duplicate-contaminated documents."""
    flagged = (contamination_pairs_fuzzy(train, eval_df, text_col, id_col,
                                         threshold, n, **kw)
               .select(F.col("train_id").alias(id_col)).distinct())
    return train.join(flagged, id_col, "left_anti")


# ---------------------------------------------------------------------
# Bloom-filter decontamination — the constant-memory probe path
# ---------------------------------------------------------------------
#
# `contamination_pairs` broadcasts the eval shingle INDEX (one row per
# distinct eval n-gram — gigabytes once the eval suite holds millions of
# documents).  The Bloom path compresses that index into a fixed bitmap
# (~2 MB per 100k shingles at the default sizing) that rides a single
# TorrentBroadcast to every executor; the probe is then an
# embarrassingly-parallel scan with NO join at all — each training
# shingle tests k bit positions in local memory.  Only the (tiny) set of
# HIT rows ever shuffles.  False negatives are impossible (every set bit
# stays set), so nothing contaminated survives; false positives are
# deterministic (seeded xxhash64) and sized to ~f^k ≈ 4e-11 per probe at
# the default fill, i.e. expected zero wrongly-dropped docs below ~10^10
# training shingles — and the knobs (`m_bits`, `k_hashes`) scale that
# bound for larger corpora.

_BLOOM_DEFAULT_K = 8


def _bloom_pow2_bits(n_shingles: int, k_hashes: int) -> int:
    """Smallest power-of-two bit count keeping fill ≈ ≤ 5% — fill
    f = 1 - exp(-k·n/m) ≤ 0.05 needs m ≥ k·n/0.0513; the next power of
    two also makes `pos % m` a mask."""
    target = max(1 << 16, int(k_hashes * max(n_shingles, 1) / 0.0513))
    m = 1 << 16
    while m < target:
        m <<= 1
    return m


def _bloom_position_cols(h, m_bits: int, k_hashes: int):
    """k bit positions from one signed-64 xxhash64 value, derived
    JVM-side by double hashing over the FULL 64-bit hash:
    pos_j = (h + j·(rotl(h, 21)|1)) mod m.  Both the base and the stride
    use ALL 64 hash bits (reduced mod m up front), so every word of an
    m_bits > 2^32 bitmap is reachable — the r9 halves scheme capped
    positions at ~2^35 and left the upper bitmap dead for
    multi-billion-shingle sizings.  The rotated-odd stride cycles all of
    a power-of-two m.  Masking BEFORE the combine keeps every
    intermediate < k·m < 2^63, so ANSI mode never overflows and the
    JVM build matches the probe's numpy uint64 math bit-for-bit.
    Everything stays in whole-stage codegen."""
    mask = m_bits - 1
    base = h.bitwiseAND(F.lit(mask))
    stride = (F.shiftleft(h, 21)
              .bitwiseOR(F.shiftrightunsigned(h, 43))
              .bitwiseOR(F.lit(1))
              .bitwiseAND(F.lit(mask)))
    return [((base + F.lit(j) * stride).bitwiseAND(F.lit(mask)))
            for j in range(k_hashes)]


# One TorrentBroadcast per distinct bitmap per SparkContext — NOT one per
# call: run_dedup_ingest probes the same Bloom inside every foreachBatch
# micro-batch, and a fresh broadcast per batch leaks the full bitmap on
# the driver for the stream's lifetime.  Keyed by the array's identity
# with a weakref guard (CPython reuses ids after GC; a dead ref means the
# slot may be recycled and must not alias the old broadcast).
_BLOOM_BC_CACHE: dict[int, tuple] = {}


def _bloom_broadcast(sc, words: np.ndarray):
    import weakref

    def _release(bc):
        # ADVICE r10: dropping the dict entry alone strands the
        # broadcast's executor blocks + driver spill file until app
        # exit; release them eagerly (non-blocking — probes in flight
        # hold their own reference).
        try:
            bc.unpersist(blocking=False)
        except Exception:
            pass  # context already stopped — nothing to release

    hit = _BLOOM_BC_CACHE.get(id(words))
    if hit is not None:
        ref, cached_sc, bc = hit
        if ref() is words and cached_sc is sc:
            return bc
        _release(bc)
        del _BLOOM_BC_CACHE[id(words)]
    for k in [k for k, (ref, _, _) in _BLOOM_BC_CACHE.items()
              if ref() is None]:
        _release(_BLOOM_BC_CACHE[k][2])
        del _BLOOM_BC_CACHE[k]
    bc = sc.broadcast(words)
    _BLOOM_BC_CACHE[id(words)] = (weakref.ref(words), sc, bc)
    return bc


def build_ngram_bloom(eval_df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", n: int = 8,
                      m_bits: int | None = None,
                      k_hashes: int = _BLOOM_DEFAULT_K):
    """Bloom filter over the eval set's distinct word n-grams.

    Returns ``(words, m_bits, k_hashes)`` where ``words`` is the bitmap
    as a ``numpy.uint64`` array of length ``m_bits/64``.  The build is
    pure JVM until the final ≤ m/64-row collect: shingle → xxhash64 →
    k positions → (word index, OR of set bits) via ``bit_or`` — the
    driver never sees a shingle, only the finished bitmap words.

    ``m_bits=None`` (default) auto-sizes to ~5% fill from a count of the
    distinct eval shingles (one action over the eval side — small by
    construction; pass an explicit power-of-two ``m_bits`` to stay
    action-free)."""
    sh = (_shingle_index(eval_df, text_col, id_col, n, "__eid")
          .select("shingle").distinct())
    if m_bits is None:
        m_bits = _bloom_pow2_bits(sh.count(), k_hashes)
    if m_bits & (m_bits - 1):
        raise ValueError("m_bits must be a power of two")
    if m_bits > 1 << 55:
        # keeps base + j·stride < k·m < 2^63 (exact under ANSI longs);
        # 2^55 bits is a 4.5 PB bitmap — far past broadcastable anyway
        raise ValueError("m_bits must be <= 2**55")
    h = F.xxhash64("shingle")
    pos = F.explode(F.array(*_bloom_position_cols(h, m_bits, k_hashes)))
    # F.shiftleft only takes a literal shift; the SQL ShiftLeft expression
    # accepts a column, so the per-position bit goes through selectExpr.
    set_words = (sh.select(pos.alias("pos"))
                   .selectExpr("shiftrightunsigned(pos, 6) AS w",
                               "shiftleft(1L, CAST(pos & 63 AS INT)) AS bit")
                   .groupBy("w").agg(F.bit_or("bit").alias("bits"))
                   .collect())
    words = np.zeros(m_bits >> 6, dtype=np.uint64)
    for row in set_words:
        words[int(row["w"])] = np.uint64(row["bits"] & 0xFFFFFFFFFFFFFFFF)
    return words, m_bits, k_hashes


def bloom_contaminated(train: DataFrame, bloom, text_col: str = "text",
                       id_col: str = "doc_id", n: int = 8,
                       min_shared: int = 1) -> DataFrame:
    """Training doc ids whose text shares ≥ ``min_shared`` distinct
    n-grams with the Bloom'd eval set — ``(train_id, n_shared)``.

    The probe is join-free: shingles hash JVM-side (the same xxhash64
    the build used), and one vectorized Arrow UDF tests the k bit
    positions against the broadcast bitmap in numpy.  Misses are
    filtered BEFORE the groupBy, so the only shuffle carries hit rows."""
    from pandas_db_spark.operators.dedup import _ensure_parallelism

    train = _ensure_parallelism(train)  # shingle HOF must not serialize
    words, m_bits, k_hashes = bloom
    mask = np.uint64(m_bits - 1)
    bc = _bloom_broadcast(train.sparkSession.sparkContext, words)

    @F.pandas_udf("boolean")
    def member(hs: pd.Series) -> pd.Series:
        bitmap = bc.value
        h = hs.to_numpy(dtype=np.int64).view(np.uint64)
        base = h & mask
        stride = (((h << np.uint64(21)) | (h >> np.uint64(43)))
                  | np.uint64(1)) & mask
        hit = np.ones(len(h), dtype=bool)
        for j in range(k_hashes):
            pos = (base + np.uint64(j) * stride) & mask
            w = bitmap[(pos >> np.uint64(6)).astype(np.int64)]
            hit &= ((w >> (pos & np.uint64(63))) & np.uint64(1)) != 0
        return pd.Series(hit)

    sh = _shingle_index(train, text_col, id_col, n, "train_id")
    hits = sh.where(member(F.xxhash64("shingle")))
    return (hits.groupBy("train_id")
                .agg(F.count(F.lit(1)).alias("n_shared"))
                .filter(F.col("n_shared") >= min_shared))


def decontaminate_bloom(train: DataFrame, eval_df: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        n: int = 8, min_shared: int = 1,
                        m_bits: int | None = None,
                        k_hashes: int = _BLOOM_DEFAULT_K) -> DataFrame:
    """Training corpus minus Bloom-flagged documents.  Zero false
    negatives by construction (contaminated docs can never survive);
    the deterministic false-positive mass is sized to ~zero docs at the
    default fill and shrinks further with ``m_bits``/``k_hashes``."""
    bloom = build_ngram_bloom(eval_df, text_col, id_col, n, m_bits,
                              k_hashes)
    flagged = (bloom_contaminated(train, bloom, text_col, id_col, n,
                                  min_shared)
               .select(F.col("train_id").alias(id_col)))
    return train.join(flagged, id_col, "left_anti")
