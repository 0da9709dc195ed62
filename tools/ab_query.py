"""A/B harness for ONE query: fresh JVM, bench-identical methodology
(one untimed warm run absorbing JIT/codegen, then best-of-N collect()
plus best-of-N noop-sink engine time), so a code change's effect is
measured like-for-like against BENCH_LOCAL numbers.

Usage:  python tools/ab_query.py <query> [iters] [--plan OUT.txt] [--sf DIR]

Emits one JSON line: {"query": ..., "best": s, "runs": [...],
"engine": s, "engine_runs": [...], "rows": n}.

The plan capture writes ``explain("formatted")`` of the query's returned
DataFrame — for iterative/store queries that is the SERVED frame (the
loop/store jobs have already run by then), which is exactly what
plans/r14/*_before|after.txt record.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:]]
    plan_out = None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--plan" in args:
        i = args.index("--plan")
        plan_out = args[i + 1]
        del args[i:i + 2]
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i:i + 2]
    name = args[0]
    iters = int(args[1]) if len(args) > 1 else 3

    from pandas_db_spark.session import get_spark
    from pandas_db_spark.queries import REGISTRY

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    fn, _ = REGISTRY[name]

    # bench-identical warmup: parquet footers + pandas-UDF worker spin-up
    try:
        REGISTRY["filter_gt"][0](spark, sf_dir).count()
        from pyspark.sql import functions as F, types as T
        noop = F.pandas_udf(lambda s: s, T.LongType())
        spark.range(1000, numPartitions=int(
            os.environ.get("SPARK_GRAFT_CPUS", "32"))).select(
            noop("id")).count()
    except Exception:
        pass
    # untimed first run (the bench's first-of-group warm run)
    fn(spark, sf_dir).collect()

    runs, rows = [], 0
    for _ in range(iters):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        rows = len(df.collect())
        runs.append(round(time.perf_counter() - t0, 4))
    engine_runs = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        engine_runs.append(round(time.perf_counter() - t0, 4))
    if plan_out:
        df = fn(spark, sf_dir)
        with open(plan_out, "w") as fh:
            fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
    print(json.dumps({"query": name, "best": min(runs), "runs": runs,
                      "engine": min(engine_runs),
                      "engine_runs": engine_runs, "rows": rows,
                      "sf_dir": sf_dir}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
