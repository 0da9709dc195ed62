"""Per-batch cost of the streaming drift monitor across store growth.

The monitor's 100 TB claim is that per-batch cost is VOCAB-sized, not
corpus-sized: each batch folds the persisted per-batch count tables
(|vocab| rows each) and joins the reference vocab once.  This drives
N batches of sf0.1 documents through append_drift_batch and reports the
per-batch wall — flat-ness across N is the receipt.

Usage: python tools/bench_drift_monitor.py [n_batches] [out.json]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_path = sys.argv[2] if len(sys.argv) > 2 else \
        "/root/repo/BENCH_DRIFT_r12.json"
    from pandas_db_spark.session import get_spark
    from pandas_db_spark.sources.registry import read_parquet
    from pandas_db_spark.streaming.monitor import (append_drift_batch,
                                                   drift_history)
    from pyspark.sql import functions as F

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    d = read_parquet(
        spark, "/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text").localCheckpoint(eager=True)
    ref = d.where(F.col("doc_id") % (n_batches + 1) == n_batches)
    mon = tempfile.mkdtemp(prefix="pds_bench_mon_")
    walls = []
    try:
        for b in range(n_batches):
            batch = d.where(F.col("doc_id") % (n_batches + 1) == b)
            t0 = time.time()
            append_drift_batch(batch, b, mon,
                               reference_df=ref if b == 0 else None)
            walls.append(round(time.time() - t0, 2))
        hist = [tuple(map(int, r))
                for r in drift_history(spark, mon).collect()]
    finally:
        shutil.rmtree(mon, ignore_errors=True)
    half = len(walls) // 2
    rep = {"n_batches": n_batches, "per_batch_s": walls,
           "first_half_mean": round(sum(walls[:half]) / half, 2),
           "second_half_mean": round(sum(walls[half:])
                                     / (len(walls) - half), 2),
           "final_row": hist[-1]}
    with open(out_path, "w") as f:
        json.dump(rep, f, indent=1)
    print(json.dumps(rep))


if __name__ == "__main__":
    main()
