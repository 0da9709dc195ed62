"""End-to-end LLM training-corpus cleaning — the operators composed the way
a real ingest pipeline runs them:

    annotate (lang-ID, quality, token count)      narrow map, pure JVM
      → filter (language + quality gates)         pushed ahead of all joins
      → exact dedup (keep smallest id)            1 shuffle on sha2 digest
      → MinHash-LSH near-dedup (keep-first)       banded, never all-pairs
      → surviving docs + their annotations

Order matters at 100 TB and is load-bearing here:

* gates run FIRST — every later stage (shingling, signatures, verify
  joins) only touches documents that can still survive;
* exact dedup runs BEFORE fuzzy — a k-clone cluster shares every MinHash
  band, so deduping clones first removes k² bucket-pair blowups;
* annotations are computed once on the narrow scan and carried through,
  not recomputed per stage.

Everything is deterministic (keep-smallest-id policies), so the whole
pipeline is one oracle-checkable query (``pipeline_clean_corpus``).

The reference has no pipeline surface; this is the north-star composition
over the ``documents`` table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clean_corpus(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", lang: str | None = "en",
                 min_quality: float | None = 0.3,
                 near_dup_threshold: float = 0.8,
                 transitive: bool = False) -> DataFrame:
    """Returns surviving documents as (id, lang_pred, quality, n_tokens).

    ``lang=None`` / ``min_quality=None`` skip the respective gate.
    ``transitive=True`` resolves near-dup pairs through connected
    components (operators/graph.keep_components): chained near-dups
    A~B~C keep exactly one survivor and the kept set is invariant to
    which equivalent pairs the LSH generator emitted; the default
    pairwise policy stays for oracle parity with the one-query SQL
    replica (a recursive closure is the r6 oracle for the CC queries)."""
    from pandas_db_spark.functions import text as X
    from pandas_db_spark.operators import dedup as D

    t = F.col(text_col)
    annotated = docs.select(
        F.col(id_col), t.alias(text_col),
        X.lang_id(t).alias("lang_pred"),
        X.quality_score(t).alias("quality"),
        X.token_count(t).alias("n_tokens"),
    )
    kept = annotated
    if lang is not None:
        kept = kept.filter(F.col("lang_pred") == lang)
    if min_quality is not None:
        kept = kept.filter(F.col("quality") >= min_quality)

    exact_ids = D.exact_dedup_keep(kept, text_col, id_col)
    kept = kept.join(exact_ids, id_col, "semi")

    pairs = D.minhash_pairs(kept, text_col, id_col,
                            threshold=near_dup_threshold)
    if transitive:
        from pandas_db_spark.operators.graph import keep_components
        survivors = keep_components(kept, pairs, id_col)
    else:
        survivors = D.keep_first(kept, pairs, id_col)
    return survivors.select(id_col, "lang_pred", "quality", "n_tokens")
