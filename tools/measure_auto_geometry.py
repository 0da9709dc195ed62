"""Measure sign-LSH candidate volume at n=10^6: auto geometry vs fixed.

VERDICT r8 #7: the claim that auto_sign_geometry keeps candidate volume
LINEAR in corpus size was analytic beyond n=2e4 (the `n=1e9 -> 569x35`
figure).  This tool synthesizes 1M decorrelated unit vectors (seeded,
deterministic), hashes them under (a) the auto geometry for n=1e6 and
(b) the r7-era fixed (64, 16), and counts candidate pairs WITHOUT
expanding them: candidates = sum over buckets of C(size, 2), computed
from bucket sizes — the same pre-dedup multiset the r8 scaling study
counted.

Usage: python tools/measure_auto_geometry.py [n] [out.json] [dim]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import pandas as pd

from pyspark.sql import functions as F


def make_vectors(spark, n: int, dim: int = 64, parts: int = 64):
    """n decorrelated unit vectors, seeded per partition (deterministic,
    generated executor-side — nothing large touches the driver)."""
    per = (n + parts - 1) // parts

    def gen(batches):
        for pdf in batches:
            for p in pdf["p"]:
                rng = np.random.RandomState(1234 + int(p))
                lo = int(p) * per
                cnt = max(0, min(per, n - lo))
                if not cnt:
                    continue
                m = rng.standard_normal((cnt, dim))
                m /= np.linalg.norm(m, axis=1, keepdims=True)
                yield pd.DataFrame({
                    "vec_id": np.arange(lo, lo + cnt, dtype=np.int64),
                    "embedding": list(m.astype(np.float32)),
                })

    base = spark.range(parts).select(F.col("id").alias("p")) \
        .repartition(parts, "p")
    return base.mapInPandas(gen, "vec_id long, embedding array<float>")


def candidate_count(keyed) -> int:
    """Sum over (band, bh) buckets of C(size, 2) — candidate pair volume
    without materializing a single pair."""
    row = (keyed.groupBy("band", "bh").count()
           .agg(F.sum(F.col("count") * (F.col("count") - 1) / 2)
                .alias("c")).collect()[0])
    return int(row["c"] or 0)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    sys.path.insert(0, "/root/repo")
    from pandas_db_spark.session import get_spark
    from pandas_db_spark.operators.similarity import (_sign_bands,
                                                      auto_sign_geometry)

    spark = get_spark(app_name="auto-geometry-measure")
    spark.sparkContext.setLogLevel("ERROR")
    vecs = make_vectors(spark, n, dim=dim).persist()
    assert vecs.count() == n

    results = {"n": n, "dim": dim, "threshold": 0.95, "geometries": {}}
    ab, ar = auto_sign_geometry(n, 0.95)
    for label, (bands, rows) in (("auto", (ab, ar)), ("fixed_r7", (64, 16))):
        t0 = time.time()
        keyed = _sign_bands(vecs, "vec_id", "embedding", dim, bands, rows, 42)
        cand = candidate_count(keyed)
        results["geometries"][label] = {
            "bands": bands, "rows": rows, "candidates": cand,
            "candidates_per_vector": round(cand / n, 3),
            "wall_sec": round(time.time() - t0, 1),
        }
        print(label, results["geometries"][label], flush=True)
    vecs.unpersist()
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
