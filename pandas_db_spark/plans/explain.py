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


def _simple_plan(df: DataFrame) -> str:
    """Physical plan as a single tree (the formatted form prints every
    operator twice — tree + numbered details — which would double node
    counts)."""
    return df._jdf.queryExecution().executedPlan().toString()


def exchange_count(df: DataFrame) -> int:
    """Shuffle count in the physical plan (excludes broadcast exchanges
    — those move only the small side)."""
    plan = _simple_plan(df)
    return len(re.findall(r"Exchange", plan)) - len(
        re.findall(r"BroadcastExchange", plan))


def plan_report(df: DataFrame) -> dict:
    """One-call scale diagnostic for a DataFrame's plan — the questions
    the 100 TB checklist asks, as a dict:

    ``shuffles`` (non-broadcast Exchange count), ``broadcast_joins``,
    ``pushed_filters``, ``read_columns`` (scan-level pruning),
    ``codegen_spans``, ``python_udfs`` (row-at-a-time Python in the hot
    path — should be 0; Arrow-batched pandas evals are listed
    separately as ``arrow_evals``)."""
    plan = _simple_plan(df)
    return {
        "shuffles": exchange_count(df),
        "broadcast_joins": len(re.findall(r"BroadcastHashJoin", plan)),
        "pushed_filters": pushed_filters(df),
        "read_columns": read_schema_columns(df),
        # simple-plan form marks codegen stages as "*(n)"; count distinct
        # stage ids (the formatted form's "WholeStageCodegen" spans)
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "python_udfs": len(re.findall(r"BatchEvalPython", plan)),
        # every Arrow-batched Python stage: scalar pandas UDFs
        # (ArrowEvalPython) AND the mapInPandas / applyInPandas family
        # (MapInPandas / FlatMapGroupsInPandas / …InPandasWithState) —
        # counting only ArrowEvalPython under-reported the batch UDFs
        "arrow_evals": len(re.findall(
            r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas"
            r"|FlatMapCoGroupsInPandas|ApplyInPandasWithState", plan)),
    }
