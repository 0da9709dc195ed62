"""Engine-growth comparison: flat sign-LSH dedup vs IVF-routed dedup.

VERDICT r8 #3: `dedup_embedding` (flat banding) was the steepest scaling
row at the sf1 rehearsal — 5.1x engine growth for the 10x sf0.1->sf1
step, residual = moderate-similarity cluster mass that collides in every
band.  This tool times BOTH dedup routes (flat `cosine_pairs_lsh` +
keep_first vs `cosine_pairs_ivf` + keep_first) at sf0.01 / sf0.1 / sf1
with a count() estimator (engine time — survivor ids only, no driver
row fetch) and reports per-decade growth, best of N runs.

Usage: python tools/measure_ivf_scaling.py [iters] [out.json]
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
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    sys.path.insert(0, "/root/repo")
    from pandas_db_spark.session import get_spark
    from pandas_db_spark.operators import dedup as D
    from pandas_db_spark.operators import similarity as S
    from pandas_db_spark.sources.registry import read_parquet

    spark = get_spark(app_name="ivf-scaling")
    spark.sparkContext.setLogLevel("ERROR")

    results = {"iters": iters, "loadavg_start": os.getloadavg()[0],
               "routes": {"flat_lsh": {}, "ivf": {}}}
    for sf, path in SFS:
        if not os.path.exists(f"{path}/embeddings.parquet"):
            continue
        emb = read_parquet(spark, f"{path}/embeddings.parquet") \
            .select("vec_id", "embedding")
        n = emb.count()
        for route in ("flat_lsh", "ivf"):
            runs = []
            for _ in range(iters):
                t0 = time.time()
                if route == "flat_lsh":
                    pairs = S.cosine_pairs_lsh(emb, threshold=0.95, n=n)
                else:
                    pairs = S.cosine_pairs_ivf(emb, threshold=0.95, n=n)
                survivors = D.keep_first(emb, pairs, "vec_id") \
                    .select("vec_id").count()
                runs.append(round(time.time() - t0, 2))
            results["routes"][route][sf] = {
                "n": n, "best_sec": min(runs), "runs": runs,
                "survivors": survivors,
            }
            print(sf, route, results["routes"][route][sf], flush=True)
    for route, row in results["routes"].items():
        if "sf0.1" in row and "sf1" in row:
            row["growth_sf01_to_sf1"] = round(
                row["sf1"]["best_sec"] / row["sf0.1"]["best_sec"], 2)
    results["loadavg_end"] = os.getloadavg()[0]
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
