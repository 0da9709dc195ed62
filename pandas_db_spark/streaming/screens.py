"""Composable per-micro-batch ingest screens (r11, VERDICT r10 Next #7).

A *screen* is any callable ``DataFrame -> DataFrame`` applied to each
micro-batch inside :func:`streaming.ingest.run_dedup_ingest`'s
``foreachBatch`` handler, BEFORE decontamination and dedup — the
published curation order (C4/RefinedWeb/Gopher all screen before they
dedup, so junk neither costs dedup work nor seeds the stores).  The
contract every screen here honors, and custom screens must too:

* **Stateless and per-row deterministic** — a replayed micro-batch
  (crash between the corpus write and a store append) must screen to
  the identical survivor set, or the dynamic-partition replay breaks
  exactly-once corpus semantics.  No screen may consult the corpus,
  the stores, or any cross-batch state.
* **Narrow** — a projection/filter at the scan; no shuffle, no action.
  Screens compose by ordinary function composition, so N screens are
  still ONE narrow stage at 100 TB.

The factories below wrap the round-10 web-curation battery
(``functions.text``) in this contract.  The corpus-GLOBAL stage of
``pipeline_web_clean`` — :func:`operators.dedup.strip_common_paragraphs`
— is deliberately NOT a screen: boilerplate is defined by cross-corpus
paragraph counts, which a micro-batch cannot know; run it as the
periodic BATCH job over the accumulated corpus directory (exactly how
RefinedWeb schedules its global passes), which the ingest pytest pins
end-to-end against the all-at-once batch pipeline.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Screen = Callable[[DataFrame], DataFrame]


def make_url_screen(url_col: str, blocked_domains: list[str]) -> Screen:
    """Drop rows whose URL fails :func:`functions.text.url_flags`'s
    ``url_keep`` (blocked/IP/digit-heavy/unparseable) — RefinedWeb
    §3.1: URL filtering runs before any content look."""
    from pandas_db_spark.functions.text import url_flags

    def screen(df: DataFrame) -> DataFrame:
        return df.where(url_flags(F.col(url_col),
                                  blocked_domains)["url_keep"])
    return screen


def make_blocklist_screen(text_col: str, words: list[str]) -> Screen:
    """Drop rows containing any blocklisted word
    (:func:`functions.text.blocklist_flags` — C4 §2.2)."""
    from pandas_db_spark.functions.text import blocklist_flags

    def screen(df: DataFrame) -> DataFrame:
        return df.where(blocklist_flags(F.col(text_col),
                                        words)["blocklist_ok"])
    return screen


def make_c4_line_screen(text_col: str) -> Screen:
    """REWRITE ``text_col`` to its C4-line-filtered form
    (:func:`functions.text.c4_clean_lines`): lines failing the
    terminal-punctuation / ≥5-words / javascript rules are removed,
    survivors re-join.  Rows whose every line fails become empty-text
    rows — compose with :func:`make_c4_page_screen` to drop them."""
    from pandas_db_spark.functions.text import c4_clean_lines

    def screen(df: DataFrame) -> DataFrame:
        return df.withColumn(
            text_col, c4_clean_lines(F.col(text_col))["clean_text"])
    return screen


def make_c4_page_screen(text_col: str) -> Screen:
    """Drop rows failing the C4 PAGE rules
    (:func:`functions.text.c4_page_flags`: lorem ipsum, code braces,
    policy phrases, ≥3 sentences) — apply AFTER
    :func:`make_c4_line_screen`, as the paper orders."""
    from pandas_db_spark.functions.text import c4_page_flags

    def screen(df: DataFrame) -> DataFrame:
        return df.where(c4_page_flags(F.col(text_col))["c4_keep"])
    return screen
