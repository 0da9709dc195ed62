"""Explain-plan introspection used by the perf tests to assert that plans stay
good: filters pushed to the parquet scan, columns pruned, small dims
broadcast, codegen spans present.  (These are properties SURVEY.md §4 notes
Catalyst gives for free — the tests keep us honest that nothing in the façade
breaks them.)"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters pushed down to the parquet scan (``PushedFilters: [...]``)."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the source (``ReadSchema``) — asserts pruning."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        body = m.group(1)
        for field in body.split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def wholestage_codegen_spans(df: DataFrame) -> int:
    return len(re.findall(r"WholeStageCodegen", formatted_plan(df)))
