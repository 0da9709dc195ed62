"""Engine-growth ladder for the late-r9 curation operators.

Times the session's new headline queries (Bloom decontamination, Gopher
rules + repetition battery, per-domain cap, hybrid RRF retrieval,
normalization dedup, A-ES weighted sampling) at sf0.01 / sf0.1 / sf1
with a HASH-SUM engine estimator — agg(bit_xor(xxhash64(*cols))) — which
forces EVERY output column to be computed without fetching rows.  A
plain count() is NOT a valid estimator for projection-heavy queries:
Catalyst prunes unused columns and eliminates left joins whose build
side is an aggregate on the join key, so count() of the Gopher-flag
queries measured a bare scan (caught when the bench's collect() showed
10x the "measured" time).  sf1 is the synthesized
decade (tools/make_sf1.py): 100x docs vs sf0.01, so the per-decade
growth ratio is the 100 TB evidence.

Usage: python tools/measure_curation_scaling.py [iters] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

SFS = [("sf0.01", "/root/testdata/sf0.01"),
       ("sf0.1", "/root/testdata/sf0.1"),
       ("sf1", "/root/repo/benchdata/sf1")]

QUERIES = ["decontam_bloom", "gopher_rules", "cap_per_source",
           "hybrid_topk", "text_normalize_dedup", "sample_weighted_n",
           "gopher_repetition"]


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    sys.path.insert(0, "/root/repo")
    from pandas_db_spark.session import get_spark
    from pandas_db_spark.queries import REGISTRY

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    out = {"iters": iters, "loadavg_start": os.getloadavg()[0],
           "queries": {}}
    for name in QUERIES:
        fn, _ = REGISTRY[name]
        row = {}
        for sf, d in SFS:
            if not os.path.isdir(d) and not os.path.exists(d):
                continue
            runs = []
            for _ in range(iters):
                from pyspark.sql import functions as F
                t0 = time.time()
                q = fn(spark, d)
                q.agg(F.bit_xor(F.xxhash64(*q.columns))).collect()
                runs.append(round(time.time() - t0, 2))
            n = fn(spark, d).count()
            row[sf] = {"best_sec": min(runs), "runs": runs, "rows": n}
            print(name, sf, row[sf], flush=True)
        if "sf0.1" in row and "sf1" in row:
            row["growth_sf01_to_sf1"] = round(
                row["sf1"]["best_sec"] / row["sf0.1"]["best_sec"], 2)
        out["queries"][name] = row
    out["loadavg_end"] = os.getloadavg()[0]
    blob = json.dumps(out)
    print(blob)
    if out_path:
        with open(out_path, "w") as f:
            f.write(blob)


if __name__ == "__main__":
    main()
