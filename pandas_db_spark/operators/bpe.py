"""Distributed BPE (byte-pair-encoding) tokenizer training.

The missing link between corpus curation and a trainable dataset: the
merge table a BPE tokenizer needs, learned from the corpus itself
(Sennrich et al. 2016 — the standard public algorithm, word-level
variant: pairs never merge across word boundaries).

Algorithm (exact, not sampled — sampling is the caller's choice):

    repeat n_merges times:
      1. count adjacent symbol pairs across all word segmentations,
         weighted by word frequency;
      2. pick the most frequent pair (ties: lexicographically smallest —
         an explicit determinism contract, where naive implementations
         inherit dict order);
      3. merge that pair into one symbol everywhere it occurs.

Scale shape — the trick that makes iterative BPE tractable on Spark:

* the corpus collapses ONCE to its word-frequency table (`groupBy word`
  — one shuffle; 100 TB of text is ~10⁷ distinct words, i.e. megabytes)
  and every merge round then runs over the word table, NOT the corpus;
* each round is one aggregate job over the persisted word table: pair
  counts via a JVM higher-order ``aggregate`` over the symbol arrays —
  no Python in the loop — then a driver-side top-1 (the only collect:
  one row per round);
* the merge rewrite is a narrow ``aggregate``-fold over each word's
  symbol array (again pure JVM), checkpointed every few rounds to stop
  lineage growth — the same localCheckpoint discipline as
  ``operators/graph.py``'s iterative connected components.

Not SQL-expressible (iterative fixpoint) — correctness is established
against a line-for-line reference implementation in the test suite
instead of a DuckDB oracle, the same policy as ``ann_ivf``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_EOW = "</w>"   # end-of-word marker, standard in the public algorithm


def word_freqs(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over whitespace-tokenized text — the ONE corpus pass;
    everything iterative happens on this (tiny) table."""
    return (docs.select(F.explode(F.split(F.trim(F.col(text_col)),
                                          r"\s+")).alias("word"))
                .where(F.col("word") != "")
                .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))


def _initial_symbols(words: DataFrame) -> DataFrame:
    """Split each word into characters + end-of-word marker."""
    chars = F.split(F.col("word"), "")
    return words.select(
        "word", "freq",
        F.concat(F.filter(chars, lambda c: c != F.lit("")),
                 F.array(F.lit(_EOW))).alias("syms"))


def _pair_counts(seg: DataFrame) -> DataFrame:
    """(a, b, count) of adjacent symbol pairs, freq-weighted — one JVM
    explode over zip(syms, syms[1:]), one shuffle of pair keys."""
    pairs = F.expr(
        "transform(slice(syms, 1, size(syms) - 1), "
        "(s, i) -> struct(s AS a, syms[i + 1] AS b))")  # [] is 0-based
    return (seg.where(F.size("syms") > 1)
               .select(F.explode(pairs).alias("p"), "freq")
               .groupBy("p.a", "p.b")
               .agg(F.sum("freq").alias("count")))


def _merge_pair(seg: DataFrame, a: str, b: str) -> DataFrame:
    """Rewrite every adjacent (a, b) into the fused symbol — a pure-JVM
    left fold: append each symbol, fusing when the accumulator's tail is
    `a` and the incoming symbol is `b` (left-to-right, non-overlapping —
    the reference algorithm's scan order)."""
    merged = F.expr(
        f"""aggregate(syms, cast(array() as array<string>),
            (acc, s) -> CASE WHEN size(acc) > 0
                              AND element_at(acc, -1) = {_lit(a)}
                              AND s = {_lit(b)}
                        THEN concat(slice(acc, 1, size(acc) - 1),
                                    array(concat({_lit(a)}, {_lit(b)})))
                        ELSE concat(acc, array(s)) END)""")
    return seg.select("word", "freq", merged.alias("syms"))


def _lit(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"


def bpe_train(docs: DataFrame, text_col: str, n_merges: int,
              checkpoint_every: int = 8) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the ordered
    merge list (the tokenizer artifact).  Driver traffic: ONE row per
    round.  See module docstring for the scale argument."""
    from pyspark import StorageLevel

    if n_merges <= 0:
        raise ValueError("bpe_train: n_merges must be positive")
    seg = _initial_symbols(word_freqs(docs, text_col))
    seg = seg.persist(StorageLevel.MEMORY_AND_DISK)
    merges: list[tuple[str, str]] = []
    try:
        for i in range(n_merges):
            top = (_pair_counts(seg)
                   .orderBy(F.desc("count"), F.asc("a"), F.asc("b"))
                   .limit(1).collect())
            if not top or top[0]["count"] < 2:
                break  # nothing left worth merging
            a, b = top[0]["a"], top[0]["b"]
            merges.append((a, b))
            nxt = _merge_pair(seg, a, b)
            if (i + 1) % checkpoint_every == 0:
                # truncate lineage: n_merges chained array-folds would
                # otherwise grow the plan linearly (graph.py discipline)
                nxt = nxt.localCheckpoint(eager=True)
            else:
                nxt = nxt.persist(StorageLevel.MEMORY_AND_DISK)
            seg.unpersist()
            seg = nxt
    finally:
        seg.unpersist()
    return merges


def bpe_segment(docs: DataFrame, text_col: str,
                merges: list[tuple[str, str]], id_col: str,
                checkpoint_every: int = 16) -> DataFrame:
    """Apply a learned merge list: (id, tokens array<string>) per doc.
    Same JVM fold as training, applied per word then flattened —
    ``checkpoint_every`` bounds plan depth for long merge lists."""
    seg = docs.select(
        F.col(id_col),
        F.expr(f"""transform(split(trim({text_col}), '\\\\s+'),
                   w -> concat(filter(split(w, ''), c -> c != ''),
                               array('{_EOW}')))""").alias("wsyms"))
    for i, (a, b) in enumerate(merges):
        fold = (
            f"""transform(wsyms, syms ->
                aggregate(syms, cast(array() as array<string>),
                 (acc, s) -> CASE WHEN size(acc) > 0
                                   AND element_at(acc, -1) = {_lit(a)}
                                   AND s = {_lit(b)}
                             THEN concat(slice(acc, 1, size(acc) - 1),
                                         array(concat({_lit(a)},
                                                      {_lit(b)})))
                             ELSE concat(acc, array(s)) END))""")
        seg = seg.select(id_col, F.expr(fold).alias("wsyms"))
        if (i + 1) % checkpoint_every == 0:
            seg = seg.localCheckpoint(eager=True)
    return seg.select(id_col, F.flatten("wsyms").alias("tokens"))
