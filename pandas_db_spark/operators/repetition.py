"""The Gopher repetition-rule battery (Rae et al. 2021, table A1 —
the MassiveText filters beyond the scalar quality rules in
``functions.text.gopher_flags``): duplicate line / paragraph fractions
and the n-gram character-fraction family.  Every published pre-training
pipeline (Gopher, RefinedWeb, Dolma, FineWeb) applies this battery
before dedup.

Scale shape: per-document repetition needs per-(doc, value) counts.  A
per-row higher-order-function formulation is O(len²) interpreted work
per document (a 10k-line doc would cost 10⁸ lambda steps in one task);
instead everything here EXPLODES once per granularity and aggregates —
three Generate passes (lines, paragraphs, one combined pass for all
nine n-gram sizes), keyed shuffles on (doc, value) whose width is the
corpus token count, linear at any document length.  No Python in the
plan.

Metric definitions (pinned, since published implementations vary):

* duplicate fraction (lines / paragraphs): occurrences beyond the first
  of each distinct value, over total values — Σ(cnt−1) / Σcnt;
* duplicate character fraction: Σ((cnt−1)·len(value)) / len(text);
* top n-gram character fraction (n = 2, 3, 4): cnt·len(gram) of the
  most frequent n-gram (ties: lexicographically smallest) / len(text);
* duplicate n-gram character fraction (n = 5..10): Σ over grams with
  cnt ≥ 2 of cnt·len(gram) / len(text) — the occurrence-sum form
  (overlaps counted per occurrence), the common implementation.

Every threshold compare is cross-multiplied to INTEGER arithmetic, so
the flags hash bit-identically across engines.  Documents with no
values at a granularity (no newline, fewer than n words) pass that rule
vacuously (zero repetition mass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# (threshold numerator per 100) — Rae et al. table A1
TOP_NGRAM_LIMITS = {2: 20, 3: 18, 4: 16}
DUP_NGRAM_LIMITS = {5: 15, 6: 14, 7: 13, 8: 12, 9: 11, 10: 10}
DUP_FRAC_LIMIT = 30        # duplicate line/paragraph fraction <= 0.30
DUP_CHAR_FRAC_LIMIT = 20   # duplicate line/paragraph char fraction <= 0.20


def _value_dup_stats(df: DataFrame, id_col: str, value_col,
                     prefix: str) -> DataFrame:
    """(id, {prefix}_n, {prefix}_dup, {prefix}_dupch) from one explode +
    two-level aggregation over a per-doc value array."""
    ex = df.select(id_col, F.explode(value_col).alias("__v"))
    cnt = ex.groupBy(id_col, "__v").agg(F.count(F.lit(1)).alias("__c"))
    return (cnt.groupBy(id_col).agg(
        F.sum("__c").alias(f"{prefix}_n"),
        F.sum(F.col("__c") - 1).alias(f"{prefix}_dup"),
        F.sum((F.col("__c") - 1) * F.length("__v"))
         .alias(f"{prefix}_dupch")))


def gopher_repetition_flags(df: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id") -> DataFrame:
    """Per-document boolean flags for the 13 Gopher repetition rules
    plus ``repetition_keep`` (their AND) — see module docstring for the
    pinned metric definitions and the explode-not-HOF scale argument."""
    text = F.col(text_col)
    base = df.select(id_col, F.length(text).alias("__tc"),
                     F.split(text, "\n").alias("__lines"),
                     F.split(text, "\n\n").alias("__paras"),
                     F.split(F.trim(text), r"\s+").alias("__toks"))

    lines = _value_dup_stats(base, id_col, F.col("__lines"), "line")
    paras = _value_dup_stats(base, id_col, F.col("__paras"), "para")

    # one Generate for all nine n-gram sizes: per doc, an array of
    # (n, gram) structs flattened across n
    toks = F.col("__toks")

    def tagged_grams(n: int):
        # the lambda must take EXACTLY ONE parameter: pyspark binds a
        # two-parameter HOF lambda as (element, index), so the usual
        # `lambda i, n=n:` default-capture trick silently rebinds n to
        # the index column — capture n through this factory instead
        return F.when(
            F.size(toks) >= n,
            F.transform(F.sequence(F.lit(0), F.size(toks) - n),
                        lambda i: F.struct(
                            F.lit(n).alias("n"),
                            F.concat_ws(" ", F.slice(toks, i + 1, n))
                             .alias("g")))
        ).otherwise(F.array().cast("array<struct<n:int,g:string>>"))

    gram_arrays = [tagged_grams(n)
                   for n in list(TOP_NGRAM_LIMITS) + list(DUP_NGRAM_LIMITS)]
    ex = (base.select(id_col,
                      F.explode(F.flatten(F.array(*gram_arrays)))
                       .alias("__s"))
              .select(id_col, F.col("__s.n").alias("__n"),
                      F.col("__s.g").alias("__g")))
    cnt = ex.groupBy(id_col, "__n", "__g").agg(
        F.count(F.lit(1)).alias("__c"))

    w = Window.partitionBy(id_col, "__n").orderBy(F.desc("__c"),
                                                  F.asc("__g"))
    top = (cnt.where(F.col("__n").isin(list(TOP_NGRAM_LIMITS)))
              .withColumn("__rn", F.row_number().over(w))
              .where(F.col("__rn") == 1)
              .groupBy(id_col)
              .agg(*[F.max(F.when(F.col("__n") == n,
                                  F.col("__c") * F.length("__g")))
                     .alias(f"top{n}") for n in TOP_NGRAM_LIMITS]))
    dup = (cnt.where(F.col("__n").isin(list(DUP_NGRAM_LIMITS))
                     & (F.col("__c") >= 2))
              .groupBy(id_col)
              .agg(*[F.sum(F.when(F.col("__n") == n,
                                  F.col("__c") * F.length("__g")))
                     .alias(f"dup{n}") for n in DUP_NGRAM_LIMITS]))

    out = (base.select(id_col, "__tc")
               .join(lines, id_col, "left").join(paras, id_col, "left")
               .join(top, id_col, "left").join(dup, id_col, "left"))

    def z(c):  # granularities with no values pass vacuously
        return F.coalesce(F.col(c), F.lit(0)).cast("long")

    tc = F.col("__tc").cast("long")
    flags = {
        "dup_line_ok": 100 * z("line_dup") <= DUP_FRAC_LIMIT * z("line_n"),
        "dup_line_char_ok": 100 * z("line_dupch")
                            <= DUP_CHAR_FRAC_LIMIT * tc,
        "dup_para_ok": 100 * z("para_dup") <= DUP_FRAC_LIMIT * z("para_n"),
        "dup_para_char_ok": 100 * z("para_dupch")
                            <= DUP_CHAR_FRAC_LIMIT * tc,
    }
    for n, lim in TOP_NGRAM_LIMITS.items():
        flags[f"top_{n}gram_ok"] = 100 * z(f"top{n}") <= lim * tc
    for n, lim in DUP_NGRAM_LIMITS.items():
        flags[f"dup_{n}gram_ok"] = 100 * z(f"dup{n}") <= lim * tc
    keep = F.lit(True)
    for c in flags.values():
        keep = keep & c
    flags["repetition_keep"] = keep
    return out.select(id_col, *[c.alias(name)
                                for name, c in flags.items()])
