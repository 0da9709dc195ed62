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
