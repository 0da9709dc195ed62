"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall-clock over the headline set (collect() to exhaust
the plan, but results stay on the executors until the final fetch — no
driver-side loops).  Query set covers the engine's main cost centers: scan +
filter pushdown, hash-agg groupBy, broadcast join, partitioned window, raw
SQL join, and the LLM-pipeline operators (dedup / ANN / text analysis).
"""

from __future__ import annotations

import json
import os
import sys
import time


HEADLINE = [
    "groupby_q1",        # filter → hash agg (map-side partial)
    "join_native",       # broadcast join + agg
    "join_supplier_volume",  # fact + 2 broadcast dims, decimal-exact revenue
    "join_sql",          # raw SQL 3-table join
    "window_rank",       # partitioned window (keyed shuffle)
    "join_asof",         # as-of join: union + keyed running-last, 1 shuffle
    "join_range",        # interval join: bucket-exploded equi join
    "join_salted",       # skew-salted large-large join
    "sort_limit",        # global top-k (TakeOrderedAndProject)
    "filter_gt",         # pushdown scan
    "agg_sum_avg",       # single-pass column aggregates
    "value_counts",      # groupBy count + order
    # LLM-pipeline operators (added as they land in the registry)
    "dedup_exact",
    "dedup_minhash",
    "dedup_embedding",
    "text_quality",
    "ann_topk",
    "events_tumbling",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from pandas_db_spark.session import get_spark
    import __spark_entry__ as ent

    spark = get_spark()
    registry = ent.queries()

    # Warm the JVM + parquet footers + Python UDF workers once so the numbers
    # measure the engine, not session/interpreter startup.
    try:
        registry["filter_gt"](spark, sf_dir).count()
        from pyspark.sql import functions as F, types as T
        noop = F.pandas_udf(lambda s: s, T.LongType())
        spark.range(1000, numPartitions=int(
            os.environ.get("SPARK_GRAFT_CPUS", "32"))).select(
            noop("id")).count()
    except Exception:
        pass

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = registry.get(name)
        if fn is None:
            continue
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            df.collect()
            dt = time.perf_counter() - t0
        except Exception:
            dt = float("nan")
        timings[name] = round(dt, 4)
        if dt == dt:  # not NaN
            total += dt

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    print(json.dumps({
        "metric": "headline_total_wall",
        "value": round(total, 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
