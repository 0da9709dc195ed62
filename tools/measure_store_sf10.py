"""Fourth-decade (sf10) receipts for the streaming monitor stores
(VERDICT r13 Next #6), plus the full qsummary decade ladder (Next #5
done-criterion).

Protocol (the SF10_MINHASH_r12 / make_sf10 precedent): synthesize the
sf10 decade once as NARROW parquet — only the columns the folds read —
by unioning 10 key-offset replicas of the sf1 bench corpus:

* ``lineitem_keys`` (l_orderkey, l_partkey, l_linenumber; 10x sf1 rows):
  l_orderkey offsets by replica (so parity batching still splits ~50/50
  and the rare-tail token space grows with the corpus), l_partkey stays
  (the heavy-head term distribution is corpus-intrinsic, not row-count-
  bound);
* ``events_value`` (event_id, value; 10x sf1 rows): event_id offsets,
  the value distribution is replicated unchanged (the histogram/
  quantile folds must see a 10x stream over the SAME domain — that is
  exactly the flat-store claim under test).

Each store then folds its stream as two parity micro-batches, ITERS
times (iteration 1 is the in-process warm-up; the estimator is the
median of the remaining runs — single shared JVM, so the GC-spike
caveat of SF10_MINHASH_r12 applies and all runs are recorded).  What
must stay FLAT as the stream grows 10x:

* heavy hitters (Misra-Gries, cap 4096): summary rows <= cap;
* distinct sketch (HLL lg_k=12):         ONE sketch row per batch;
* histogram (250 bins):                  <= n_bins+2 rows per batch;
* quantile summary (k=256):              <= k rows per batch — measured
  at EVERY decade sf0.001 -> sf10 (its first ladder), with the served
  p50/p99 rank-checked against the exact stream at each decade.

Writes SF10_STORES_r14.json at the repo root.

Usage: python tools/measure_store_sf10.py [--skip-synth]
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
SF1 = os.path.join(REPO, "benchdata", "sf1")
SF10 = os.path.join(REPO, "benchdata", "sf10stores")
OFF = 100_000_000_000
ITERS = 3


def synth(spark) -> None:
    from pyspark.sql import functions as F
    from pandas_db_spark.sources.registry import read_parquet

    if not os.path.isdir(os.path.join(SF10, "lineitem_keys.parquet")):
        li = read_parquet(spark, f"{SF1}/lineitem.parquet").select(
            "l_orderkey", "l_partkey", "l_linenumber")
        reps = [li.select((F.col("l_orderkey") + F.lit(j * OFF))
                          .cast("long").alias("l_orderkey"),
                          "l_partkey", "l_linenumber")
                for j in range(10)]
        out = reps[0]
        for r in reps[1:]:
            out = out.unionByName(r)
        (out.repartition(32)
         .write.mode("overwrite")
         .parquet(f"{SF10}/lineitem_keys.parquet"))
    if not os.path.isdir(os.path.join(SF10, "events_value.parquet")):
        ev = read_parquet(spark, f"{SF1}/events.parquet").select(
            "event_id", "value")
        reps = [ev.select((F.col("event_id") + F.lit(j * OFF))
                          .cast("long").alias("event_id"), "value")
                for j in range(10)]
        out = reps[0]
        for r in reps[1:]:
            out = out.unionByName(r)
        (out.repartition(8)
         .write.mode("overwrite")
         .parquet(f"{SF10}/events_value.parquet"))


def hh_stream(spark):
    """The r13 HH-ladder stream shape at sf10: heavy head (100 hot
    terms) + near-unique rare tail per row."""
    from pyspark.sql import functions as F
    li = spark.read.parquet(f"{SF10}/lineitem_keys.parquet")
    return li.select(
        F.col("l_orderkey").alias("doc_id"),
        F.concat(F.lit("h"), (F.col("l_orderkey") % 100).cast("string"),
                 F.lit(" r"),
                 (F.col("l_orderkey") * 10 + F.col("l_linenumber"))
                 .cast("string")).alias("text"))


def fold_hh(spark) -> dict:
    from pyspark.sql import functions as F
    from pandas_db_spark.streaming.monitor import (
        append_heavy_hitters_batch, heavy_hitters_meta)
    docs = hh_stream(spark)
    runs, rows_meta = [], {}
    for it in range(ITERS):
        store = tempfile.mkdtemp(prefix="sf10_hh_")
        secs = []
        try:
            for bi in range(2):
                t0 = time.time()
                append_heavy_hitters_batch(
                    docs.where(F.col("doc_id") % 2 == bi), bi, store,
                    capacity=4096)
                secs.append(round(time.time() - t0, 2))
            if it == ITERS - 1:
                srows = (spark.read.parquet(store + "/summary")
                         .where(F.col("batch_id") == 1).count())
                meta = heavy_hitters_meta(spark, store).collect()[-1]
                rows_meta = {"summary_rows": srows,
                             "n_tokens": int(meta["n_tokens"]),
                             "err_ub": int(meta["err_ub"]),
                             "err_ub_worst_case":
                                 int(meta["n_tokens"]) // 4097}
        finally:
            shutil.rmtree(store, ignore_errors=True)
        runs.append(secs)
    return {"store": "heavy_hitters_mg", "capacity": 4096,
            "batch_secs_runs": runs, **rows_meta}


def fold_sketch(spark) -> dict:
    from pyspark.sql import functions as F
    from pandas_db_spark.streaming.monitor import (
        append_distinct_sketch_batch, distinct_estimate)
    docs = hh_stream(spark)
    runs, extra = [], {}
    for it in range(ITERS):
        store = tempfile.mkdtemp(prefix="sf10_sk_")
        secs = []
        try:
            for bi in range(2):
                t0 = time.time()
                append_distinct_sketch_batch(
                    docs.where(F.col("doc_id") % 2 == bi), bi, store)
                secs.append(round(time.time() - t0, 2))
            if it == ITERS - 1:
                est = distinct_estimate(spark, store).collect()[0]
                srows = spark.read.parquet(store + "/sketches").count()
                extra = {"sketch_rows": srows,
                         "n_tokens": int(est["n_tokens"]),
                         "estimate": int(est["estimate"])}
        finally:
            shutil.rmtree(store, ignore_errors=True)
        runs.append(secs)
    return {"store": "distinct_sketch", "lg_k": 12,
            "batch_secs_runs": runs, **extra}


def fold_hist(spark) -> dict:
    from pyspark.sql import functions as F
    from pandas_db_spark.streaming.monitor import (
        append_histogram_batch, histogram_quantile_bounds)
    ev = spark.read.parquet(f"{SF10}/events_value.parquet")
    runs, extra = [], {}
    for it in range(ITERS):
        store = tempfile.mkdtemp(prefix="sf10_hist_")
        secs = []
        try:
            for bi in range(2):
                t0 = time.time()
                append_histogram_batch(
                    ev.where(F.col("event_id") % 2 == bi), bi, store,
                    "value", lo=0.0, hi=500.0, n_bins=250)
                secs.append(round(time.time() - t0, 2))
            if it == ITERS - 1:
                hrows = (spark.read.parquet(store + "/hist")
                         .groupBy("batch_id").count()
                         .agg(F.max("count")).collect()[0][0])
                qs = histogram_quantile_bounds(
                    spark, store, [0.5, 0.99]).collect()
                extra = {"max_rows_per_batch": int(hrows),
                         "n": int(qs[0]["n"]),
                         "p50_bracket": [qs[0]["bin_lo"], qs[0]["bin_hi"]],
                         "p99_bracket": [qs[1]["bin_lo"], qs[1]["bin_hi"]]}
        finally:
            shutil.rmtree(store, ignore_errors=True)
        runs.append(secs)
    return {"store": "histogram", "n_bins": 250,
            "batch_secs_runs": runs, **extra}


def fold_qsummary(spark, src: str, sf: str, iters: int) -> dict:
    """One qsummary decade rung: 2-batch fold (k=256), serve p50/p99,
    exact rank check of the one-sided guarantee against the stream."""
    from pyspark.sql import functions as F
    from pandas_db_spark.streaming.monitor import (
        append_quantile_summary_batch, quantile_estimates)
    ev = spark.read.parquet(src).select("event_id", "value")
    runs, extra = [], {}
    for it in range(iters):
        store = tempfile.mkdtemp(prefix="sf10_qs_")
        secs = []
        try:
            for bi in range(2):
                t0 = time.time()
                append_quantile_summary_batch(
                    ev.where(F.col("event_id") % 2 == bi), bi, store,
                    "value", k=256)
                secs.append(round(time.time() - t0, 2))
            if it == iters - 1:
                srows = (spark.read.parquet(store + "/qsummary")
                         .groupBy("batch_id").count()
                         .agg(F.max("count")).collect()[0][0])
                served = quantile_estimates(
                    spark, store, [0.5, 0.99]).collect()
                ok = True
                for r in served:
                    tgt = -(-int(r["q_ppm"]) * int(r["n"]) // 1_000_000)
                    cnt = ev.where(F.col("value").isNotNull()).agg(
                        F.sum(F.when(F.col("value") <= float(r["value"]),
                                     1).otherwise(0)).alias("le"),
                        F.sum(F.when(F.col("value") < float(r["value"]),
                                     1).otherwise(0)).alias("lt")
                    ).collect()[0]
                    ok &= (int(cnt["le"]) >= tgt
                           and int(cnt["lt"])
                           <= tgt - 1 + int(r["err_ub"]))
                extra = {"max_rows_per_batch": int(srows),
                         "n": int(served[0]["n"]),
                         "err_ub": int(served[0]["err_ub"]),
                         "p50": float(served[0]["value"]),
                         "p99": float(served[1]["value"]),
                         "guarantee_holds": bool(ok)}
        finally:
            shutil.rmtree(store, ignore_errors=True)
        runs.append(secs)
    return {"sf": sf, "k": 256, "batch_secs_runs": runs, **extra}


def main() -> int:
    from pandas_db_spark.session import get_spark
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    out = {"iters": ITERS, "loadavg_start": os.getloadavg()[0],
           "estimator": ("median of post-warm-up runs; iteration 1 of "
                         "each fold absorbs JIT/page-cache warm-up — "
                         "single shared JVM, the SF10_MINHASH_r12 "
                         "GC-spike caveat applies"),
           "sf10_synth": ("10 key-offset replicas of benchdata/sf1 "
                          "(narrow columns only; l_partkey/value "
                          "distributions replicated unchanged — the "
                          "flat-store claim is about stream SIZE)")}
    if "--skip-synth" not in sys.argv:
        t0 = time.time()
        synth(spark)
        out["synth_sec"] = round(time.time() - t0, 1)
    # qsummary decade ladder (its first): sf0.001 -> sf10
    qs_ladder = []
    for sf, src in [("0.001", "/root/testdata/sf0.001/events.parquet"),
                    ("0.01", "/root/testdata/sf0.01/events.parquet"),
                    ("0.1", "/root/testdata/sf0.1/events.parquet"),
                    ("1", f"{SF1}/events.parquet"),
                    ("10", f"{SF10}/events_value.parquet")]:
        if not os.path.exists(src):
            continue
        qs_ladder.append(fold_qsummary(spark, src, sf, ITERS))
        print("qsummary", sf, qs_ladder[-1], flush=True)
    out["qsummary_ladder"] = qs_ladder
    dest = os.path.join(REPO, "SF10_STORES_r14.json")

    def dump():
        out["loadavg_end"] = os.getloadavg()[0]
        with open(dest, "w") as fh:
            json.dump(out, fh, indent=1)

    dump()
    # r13 stores, fourth decade (partial results persist per section)
    for fn in (fold_hist, fold_sketch, fold_hh):
        rec = fn(spark)
        out[rec["store"] + "_sf10"] = rec
        print(rec, flush=True)
        dump()
    print("written SF10_STORES_r14.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
