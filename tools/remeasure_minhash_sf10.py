"""Tighten the one noisy fifth-decade ladder row (VERDICT r11 #4):
dedup_minhash_incremental's sf10 runs spread 30.4/48.7 s in
SF10_SCALING_r11.json (GC wobble at loadavg 3).  Re-measure that row
alone on an idle machine with >= 5 iterations and per-iteration JVM
hygiene (clearCache + explicit System.gc between runs) so the warm-run
spread — not just the best-of — is the evidence.

Usage: python tools/remeasure_minhash_sf10.py [iters] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

SFS = [("sf1", "/root/repo/benchdata/sf1"),
       ("sf10", "/root/repo/benchdata/sf10")]


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    sys.path.insert(0, "/root/repo")
    from pandas_db_spark.session import get_spark
    from pandas_db_spark.queries import REGISTRY
    from pyspark.sql import functions as F

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    fn, _ = REGISTRY["dedup_minhash_incremental"]
    out = {"iters": iters, "loadavg_start": os.getloadavg()[0],
           "query": "dedup_minhash_incremental", "sfs": {}}
    for sf, d in SFS:
        if not os.path.exists(d):
            continue
        runs = []
        for _ in range(iters):
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            t0 = time.time()
            q = fn(spark, d)
            q.agg(F.bit_xor(F.xxhash64(*q.columns))).collect()
            runs.append(round(time.time() - t0, 2))
            print(sf, runs[-1], flush=True)
        # the traces DESCEND for several runs (tiered JIT + page-cache
        # warm-up), then sit flat EXCEPT one GC-pause spike in roughly
        # every 8 runs (~35% over median; clearCache + System.gc between
        # iters does not prevent it).  So the estimator is the MEDIAN of
        # the steady-state last half, and the spread is reported both
        # raw and with the single largest run trimmed.
        warm = sorted(runs[len(runs) // 2:])
        trimmed = warm[:-1] if len(warm) > 2 else warm
        row = {"best_sec": min(runs), "runs": runs,
               "steady_state_runs": runs[len(runs) // 2:],
               "steady_median_sec": warm[len(warm) // 2],
               "steady_spread_pct": round(
                   100 * (warm[-1] - warm[0]) / warm[0], 1),
               "trimmed_spread_pct": round(
                   100 * (trimmed[-1] - trimmed[0]) / trimmed[0], 1)}
        out["sfs"][sf] = row
    if "sf1" in out["sfs"] and "sf10" in out["sfs"]:
        out["growth_sf1_to_sf10"] = round(
            out["sfs"]["sf10"]["best_sec"]
            / out["sfs"]["sf1"]["best_sec"], 2)
    out["loadavg_end"] = os.getloadavg()[0]
    blob = json.dumps(out)
    print(blob)
    if out_path:
        with open(out_path, "w") as f:
            f.write(blob)


if __name__ == "__main__":
    main()
