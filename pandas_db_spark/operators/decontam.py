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
