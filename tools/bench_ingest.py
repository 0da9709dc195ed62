"""Streaming dedup-ingest throughput receipt (VERDICT r8 #8).

Feeds ``n_batches`` batches of ``batch_docs`` documents (or vectors)
through ``run_dedup_ingest`` one at a time — each call adds ONE new
input file and re-runs the availableNow trigger against the same
checkpoint, so exactly one micro-batch processes per call — and records
per-batch wall time as the persisted store accumulates.  The store-probe
claim under test: per-batch cost should stay ~FLAT as the store grows
(the store is probed via band keys + left-semi candidate fetch, never
scanned for verification), modulo the O(store-files) listing cost that
compaction bounds.

Each batch is 10% duplicates of earlier batches (so the probe path does
real work) and 90% novel.

Usage: python tools/bench_ingest.py [mode] [n_batches] [batch_docs] [out.json]
       mode in {near, embedding}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np


_VOCAB = np.array([f"w{i}" for i in range(5000)])


def doc_text(rng, words: int = 60) -> str:
    return " ".join(_VOCAB[rng.randint(0, len(_VOCAB), size=words)])


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "near"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    batch_docs = int(sys.argv[3]) if len(sys.argv) > 3 else 5000
    out_path = sys.argv[4] if len(sys.argv) > 4 else None

    sys.path.insert(0, "/root/repo")
    from pandas_db_spark.session import get_spark
    from pandas_db_spark.streaming.ingest import run_dedup_ingest

    spark = get_spark(app_name=f"ingest-bench-{mode}")
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix=f"ingest_bench_{mode}_")
    src = os.path.join(root, "in")
    rng = np.random.RandomState(7)
    times = []
    try:
        for b in range(n_batches):
            lo = b * batch_docs
            ids = list(range(lo, lo + batch_docs))
            n_dup = batch_docs // 10 if b else 0
            if mode == "embedding":
                rows = []
                for i, vid in enumerate(ids):
                    if i < n_dup:
                        # exact copy of a vector from an earlier batch
                        # (same per-id seed an earlier novel row used)
                        src_rng = np.random.RandomState(
                            100000 + int(rng.randint(lo)))
                        v = src_rng.standard_normal(64)
                    else:
                        v = np.random.RandomState(100000 + vid) \
                            .standard_normal(64)
                    v = (v / np.linalg.norm(v)).astype(float)
                    rows.append((vid, [float(x) for x in v]))
                schema = "vec_id long, embedding array<float>"
                id_col, payload_col = "vec_id", "embedding"
            else:
                rows = []
                for i, vid in enumerate(ids):
                    if i < n_dup:
                        drng = np.random.RandomState(
                            200000 + int(rng.randint(lo)))
                        rows.append((vid, doc_text(drng)))
                    else:
                        rows.append((vid, doc_text(
                            np.random.RandomState(200000 + vid))))
                schema = "doc_id long, text string"
                id_col, payload_col = "doc_id", "text"
            (spark.createDataFrame(rows, schema)
             .coalesce(1).write.parquet(f"{src}/b{b:03d}"))

            t0 = time.time()
            stream = (spark.readStream.schema(schema).parquet(f"{src}/b*"))
            run_dedup_ingest(
                stream, payload_col, id_col,
                corpus_dir=os.path.join(root, "corpus"),
                store_dir=os.path.join(root, "store"),
                checkpoint_dir=os.path.join(root, "ckpt"),
                mode=mode,
                threshold=0.95 if mode == "embedding" else 0.8,
                expected_corpus=n_batches * batch_docs)
            dt = time.time() - t0
            times.append(round(dt, 2))
            print(f"batch {b:02d}: {dt:.2f}s", flush=True)
        corpus_n = spark.read.parquet(os.path.join(root, "corpus")).count()
    finally:
        shutil.rmtree(root, ignore_errors=True)

    half = len(times) // 2
    result = {
        "metric": f"ingest_per_batch_sec_{mode}",
        "mode": mode, "n_batches": n_batches, "batch_docs": batch_docs,
        "per_batch_sec": times,
        "mean_first_half": round(sum(times[:half]) / half, 2),
        "mean_second_half": round(sum(times[half:]) / (len(times) - half), 2),
        "corpus_rows": corpus_n,
        "loadavg": os.getloadavg()[0],
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
