"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual registry lives in ``pandas_db_spark/queries.py`` (one entry
per SURVEY.md §2 operator + the LLM-pipeline operators); this module is
a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the TPC-H-Q1-flavored
    pricing summary (filter → groupBy → exact-decimal aggregates) through
    the pandas_db_spark façade."""
    from pandas_db_spark.session import apply_runtime_conf
    from pandas_db_spark.queries import REGISTRY

    apply_runtime_conf(spark)
    fn, _ = REGISTRY["groupby_q1"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + LLM ops."""
    from pandas_db_spark.queries import queries as _queries
    return _queries()


def oracle_sql() -> dict[str, str]:
    """Matching DuckDB SQL per query (omitted for genuinely
    non-SQL-expressible ops → driver records a rows-only check)."""
    from pandas_db_spark.queries import oracle_sql as _oracle_sql
    return _oracle_sql()
