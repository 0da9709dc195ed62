"""Engine-growth ladder for arbitrary registry queries.

Generalizes tools/measure_curation_scaling.py: pass query names on the
command line and get the same sf0.01 / sf0.1 / sf1 ladder with the
HASH-SUM engine estimator — ``agg(bit_xor(xxhash64(*cols)))`` — which
forces EVERY output column to be computed without fetching rows (a
plain count() lets Catalyst prune projection-heavy plans down to a bare
scan; see the r9 tool's docstring for the incident).

Usage: python tools/measure_query_scaling.py OUT.json [iters] q1 q2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

SFS = [("sf0.01", "/root/testdata/sf0.01"),
       ("sf0.1", "/root/testdata/sf0.1"),
       ("sf1", "/root/repo/benchdata/sf1")]


def main() -> None:
    out_path = sys.argv[1]
    iters = int(sys.argv[2])
    names = sys.argv[3:]
    sys.path.insert(0, "/root/repo")
    from pandas_db_spark.session import get_spark
    from pandas_db_spark.queries import REGISTRY
    from pyspark.sql import functions as F

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    out = {"iters": iters, "loadavg_start": os.getloadavg()[0],
           "queries": {}}
    for name in names:
        fn, _ = REGISTRY[name]
        row = {}
        for sf, d in SFS:
            if not os.path.isdir(d) and not os.path.exists(d):
                continue
            runs = []
            for _ in range(iters):
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
    with open(out_path, "w") as f:
        f.write(blob)


if __name__ == "__main__":
    main()
