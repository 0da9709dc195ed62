"""Fourth-decade rungs for the two r14 stores added after the first
SF10_STORES_r14 run: the grouped quantile summary and the KMV
distinct-sample store.  Same protocol as tools/measure_store_sf10.py
(narrow sf10stores parquet, two parity batches, ITERS runs with the
first as in-process warm-up); appends the results into
SF10_STORES_r14.json.

Usage: python tools/measure_store_sf10_p2.py
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF10 = os.path.join(REPO, "benchdata", "sf10stores")
ITERS = 3


def main() -> int:
    from pyspark.sql import functions as F
    from pandas_db_spark.session import get_spark
    from pandas_db_spark.streaming.monitor import (
        append_grouped_quantile_batch, append_kmv_batch,
        grouped_quantile_estimates, kmv_estimate)

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    dest = os.path.join(REPO, "SF10_STORES_r14.json")
    out = json.load(open(dest))

    # grouped quantile at sf10: 10M values, a synthetic 8-way key
    ev = (spark.read.parquet(f"{SF10}/events_value.parquet")
          .withColumn("route", (F.col("event_id") % 8).cast("string")))
    runs, extra = [], {}
    for it in range(ITERS):
        store = tempfile.mkdtemp(prefix="sf10_gq_")
        secs = []
        try:
            for bi in range(2):
                t0 = time.time()
                append_grouped_quantile_batch(
                    ev.where(F.col("event_id") % 2 == bi), bi, store,
                    "route", "value", k=64)
                secs.append(round(time.time() - t0, 2))
            if it == ITERS - 1:
                per = (spark.read.parquet(store + "/gqsummary")
                       .groupBy("batch_id", "key").count()
                       .agg(F.max("count")).collect()[0][0])
                served = grouped_quantile_estimates(
                    spark, store, [0.5, 0.99]).collect()
                ok = True
                for r in served:
                    sub = ev.where((F.col("route") == r["key"])
                                   & F.col("value").isNotNull())
                    tgt = -(-int(r["q_ppm"]) * int(r["n"]) // 1_000_000)
                    c = sub.agg(
                        F.sum(F.when(F.col("value") <= float(r["value"]),
                                     1).otherwise(0)).alias("le"),
                        F.sum(F.when(F.col("value") < float(r["value"]),
                                     1).otherwise(0)).alias("lt")
                    ).collect()[0]
                    ok &= (int(c["le"]) >= tgt and int(c["lt"])
                           <= tgt - 1 + int(r["err_ub"]))
                extra = {"n_keys": 8,
                         "max_rows_per_key_batch": int(per),
                         "n_per_key": int(served[0]["n"]),
                         "guarantee_holds": bool(ok)}
        finally:
            shutil.rmtree(store, ignore_errors=True)
        runs.append(secs)
    out["grouped_quantile_sf10"] = {
        "store": "grouped_quantile", "k": 64,
        "batch_secs_runs": runs, **extra}
    print(out["grouped_quantile_sf10"], flush=True)
    json.dump(out, open(dest, "w"), indent=1)

    # KMV at sf10: the 120M-token / 45.7M-distinct HH stream
    li = spark.read.parquet(f"{SF10}/lineitem_keys.parquet")
    docs = li.select(
        F.col("l_orderkey").alias("doc_id"),
        F.concat(F.lit("h"), (F.col("l_orderkey") % 100).cast("string"),
                 F.lit(" r"),
                 (F.col("l_orderkey") * 10 + F.col("l_linenumber"))
                 .cast("string")).alias("text"))
    runs, extra = [], {}
    for it in range(ITERS):
        store = tempfile.mkdtemp(prefix="sf10_kmv_")
        secs = []
        try:
            for bi in range(2):
                t0 = time.time()
                append_kmv_batch(
                    docs.where(F.col("doc_id") % 2 == bi), bi, store,
                    k=256)
                secs.append(round(time.time() - t0, 2))
            if it == ITERS - 1:
                est = kmv_estimate(spark, store).collect()[0]
                n_exact = 45686200  # countDistinct receipt, first run
                extra = {"n_exact": n_exact,
                         "estimate": float(est["estimate"]),
                         "rel_err_pct": round(
                             (float(est["estimate"]) - n_exact)
                             / n_exact * 100, 2),
                         "rse_pct_bound": round(
                             100.0 / (256 - 2) ** 0.5, 2),
                         "n_sample": int(est["n_sample"])}
        finally:
            shutil.rmtree(store, ignore_errors=True)
        runs.append(secs)
    out["kmv_sf10"] = {"store": "kmv", "k": 256,
                       "batch_secs_runs": runs, **extra}
    print(out["kmv_sf10"], flush=True)
    out["loadavg_end"] = os.getloadavg()[0]
    json.dump(out, open(dest, "w"), indent=1)
    print("appended to SF10_STORES_r14.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
