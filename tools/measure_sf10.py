"""Fifth scale decade (VERDICT r9 #6): sf1 -> sf10 growth for the three
operators whose 100 TB story previously rested on one measured decade —
dedup_embedding_ivf, strip_dup_spans, dedup_minhash_incremental.

sf10 = tools/make_sf10.py (500k docs / 200k vectors, documents +
embeddings only).  Same hash-sum engine estimator as the other ladders;
both decades are measured in THIS session so the ratio is load-matched.

Usage: python tools/measure_sf10.py [iters] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

SFS = [("sf1", "/root/repo/benchdata/sf1"),
       ("sf10", "/root/repo/benchdata/sf10")]

QUERIES = ["dedup_embedding_ivf", "strip_dup_spans",
           "dedup_minhash_incremental",
           # r11: the winnowed span-index escape hatch, measured so the
           # 100 TB constant-factor knob has a number (VERDICT r10 #3)
           "span_candidates_winnowed"]


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    sys.path.insert(0, "/root/repo")
    from pandas_db_spark.session import get_spark
    from pandas_db_spark.queries import REGISTRY
    from pyspark.sql import functions as F

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    out = {"iters": iters, "loadavg_start": os.getloadavg()[0],
           "queries": {}}
    for name in QUERIES:
        fn, _ = REGISTRY[name]
        row = {}
        for sf, d in SFS:
            if not os.path.exists(d):
                continue
            runs = []
            for _ in range(iters):
                t0 = time.time()
                q = fn(spark, d)
                q.agg(F.bit_xor(F.xxhash64(*q.columns))).collect()
                runs.append(round(time.time() - t0, 2))
            row[sf] = {"best_sec": min(runs), "runs": runs}
            print(name, sf, row[sf], flush=True)
        if "sf1" in row and "sf10" in row:
            row["growth_sf1_to_sf10"] = round(
                row["sf10"]["best_sec"] / row["sf1"]["best_sec"], 2)
        out["queries"][name] = row
    out["loadavg_end"] = os.getloadavg()[0]
    blob = json.dumps(out)
    print(blob)
    if out_path:
        with open(out_path, "w") as f:
            f.write(blob)


if __name__ == "__main__":
    main()
